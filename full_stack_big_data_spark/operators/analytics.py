"""Product-analytics operators over the event stream: funnel, retention,
anomaly detection.

The reference's query surface stops at interval counts over the event
stream (``/root/reference/README.md:45-55``); these are the three queries
every team actually runs on that same stream once the counts exist. All
three follow the engine's determinism rules (decimal-exact sufficient
statistics, date formatting to strings) so each carries a full
differential oracle.

Scale posture: funnel stages and retention cohorts are user-keyed
aggregates — every shuffle is user- or (cohort, day)-cardinality, never
event-cardinality; anomaly detection broadcasts a per-type stats table
(5 rows) back onto the stream so the outlier filter is map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..engine.catalog import Catalog
from ..functions.text import tokens_sql
from .registry import register

Z_THRESHOLD = 3.0


@register(
    "q_funnel",
    oracle="""
WITH u AS (
  SELECT DISTINCT user_id FROM events
), t1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id
), t2 AS (
  SELECT e.user_id, MIN(ts) AS t2 FROM events e JOIN t1 ON e.user_id = t1.user_id
  WHERE event_type = 'click' AND ts > t1 GROUP BY e.user_id
), t3 AS (
  SELECT e.user_id, MIN(ts) AS t3 FROM events e JOIN t2 ON e.user_id = t2.user_id
  WHERE event_type = 'purchase' AND ts > t2 GROUP BY e.user_id
)
SELECT CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
            WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS funnel_stage,
       COUNT(*) AS n_users
FROM u LEFT JOIN t1 USING (user_id) LEFT JOIN t2 USING (user_id)
       LEFT JOIN t3 USING (user_id)
GROUP BY funnel_stage
""",
    description="ordered view→click→purchase funnel: users per deepest stage reached",
    tags=("events", "funnel", "analytics"),
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel: a click only counts after the user's
    first view, a purchase only after that click (strict event-time
    order, not mere type presence).

    The correlated "first X after Y" steps are expressed as three
    cascaded min-aggregates, each joining the previous stage's per-user
    timestamp — every intermediate is user-cardinality, so at 100 TB the
    event table is scanned once per stage (filtered map-side on
    event_type, pushed to parquet) and nothing event-sized ever
    shuffles.
    """
    ev = Catalog(spark, sf_dir).events.select("user_id", "event_type", "ts")
    users = ev.select("user_id").distinct()
    t1 = (ev.where(F.col("event_type") == "view")
          .groupBy("user_id").agg(F.min("ts").alias("t1")))
    t2 = (ev.where(F.col("event_type") == "click").join(t1, "user_id")
          .where(F.col("ts") > F.col("t1"))
          .groupBy("user_id").agg(F.min("ts").alias("t2")))
    t3 = (ev.where(F.col("event_type") == "purchase").join(t2, "user_id")
          .where(F.col("ts") > F.col("t2"))
          .groupBy("user_id").agg(F.min("ts").alias("t3")))
    stage = (F.when(F.col("t3").isNotNull(), 3)
             .when(F.col("t2").isNotNull(), 2)
             .when(F.col("t1").isNotNull(), 1).otherwise(0))
    return (
        users.join(t1, "user_id", "left").join(t2, "user_id", "left")
        .join(t3, "user_id", "left")
        .select(stage.alias("funnel_stage"))
        .groupBy("funnel_stage").agg(F.count("*").alias("n_users"))
    )


@register(
    "q_retention_cohorts",
    oracle="""
WITH first AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day FROM events GROUP BY user_id
), act AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
)
SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
       CAST(date_diff('day', cohort_day, d) AS BIGINT) AS day_offset,
       COUNT(*) AS n_users
FROM act JOIN first USING (user_id)
GROUP BY 1, 2
""",
    description="cohort retention: users active N days after their first-seen day",
    tags=("events", "retention", "analytics"),
)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic retention triangle: cohort = first-seen day, cell =
    distinct users active ``day_offset`` days later.

    Two user-keyed shuffles (first-seen min, distinct active days) and a
    (cohort, offset)-keyed count — the distinct collapses the event
    table to ≤ users × days rows before anything joins, so the join
    sides are both user-scale. Dates format to strings at the edge
    (engine-neutral temporal rule).
    """
    ev = Catalog(spark, sf_dir).events
    first = (ev.groupBy("user_id")
             .agg(F.min(F.to_date("ts")).alias("cohort_day")))
    act = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    return (
        act.join(first, "user_id")
        .select(F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
                F.datediff("d", "cohort_day").cast("bigint").alias("day_offset"))
        .groupBy("cohort_day", "day_offset")
        .agg(F.count("*").alias("n_users"))
    )


@register(
    "q_anomaly_zscore",
    oracle=f"""
WITH s AS (
  SELECT event_type, COUNT(*) AS n,
         SUM(CAST(value AS DECIMAL(18,4))) AS sx,
         SUM(CAST(value AS DECIMAL(18,4)) * CAST(value AS DECIMAL(18,4))) AS sxx
  FROM events GROUP BY event_type
), st AS (
  SELECT event_type,
         CAST(sx AS DOUBLE) / n AS mean,
         SQRT(GREATEST(CAST(sxx AS DOUBLE) / n
                       - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n), 0)) AS std
  FROM s
)
SELECT event_id, e.event_type, value,
       CAST(ROUND(CASE WHEN std > 0 THEN (value - mean) / std END, 6) AS DOUBLE) AS z
FROM events e JOIN st ON e.event_type = st.event_type
WHERE CASE WHEN std > 0 THEN (value - mean) / std END > {Z_THRESHOLD}
""",
    description=f"per-type z-score outliers (z > {Z_THRESHOLD}) from decimal-exact moments, broadcast stats",
    tags=("events", "anomaly", "broadcast-join"),
)
def q_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flag events whose value is > {Z}σ above their type's mean.

    The stats table is one row per event_type, derived from decimal-exact
    sums (same portability rule as ``q_stats_moments`` — native stddev is
    merge-order-dependent) and explicitly broadcast, so the outlier pass
    is a map-side filter over the stream: one event-table scan, zero
    event-sized shuffle, output ∝ anomalies.
    """
    ev = Catalog(spark, sf_dir).events
    x = F.col("value").cast("decimal(18,4)")  # 2-decimal data; headroom for the squared sums
    s = ev.groupBy("event_type").agg(
        F.count("*").alias("n"), F.sum(x).alias("sx"), F.sum(x * x).alias("sxx"))
    mean = F.col("sx").cast("double") / F.col("n")
    # GREATEST(·, 0) under the sqrt: a zero-variance group's sxx/n−mean²
    # rounds to a tiny negative in doubles (DuckDB SQRT hard-errors);
    # the CASE gate keeps ANSI Spark from a DIVIDE_BY_ZERO on std = 0 —
    # degenerate groups (constant value, single event) have no outliers.
    st = s.select(
        "event_type", mean.alias("mean"),
        F.sqrt(F.greatest(
            F.col("sxx").cast("double") / F.col("n") - mean * mean,
            F.lit(0.0))).alias("std"))
    z = F.when(F.col("std") > 0,
               (F.col("value") - F.col("mean")) / F.col("std"))
    return (
        ev.join(F.broadcast(st), "event_type")
        .where(z > Z_THRESHOLD)
        .select("event_id", "event_type", "value",
                F.round(z, 6).cast("double").alias("z"))
    )


@register(
    "q_unpivot",
    oracle="""
SELECT l_orderkey, l_linenumber, metric,
       CAST(val AS DOUBLE) AS val
FROM (
  SELECT l_orderkey, l_linenumber,
         CAST(l_quantity AS DOUBLE) AS quantity,
         CAST(l_extendedprice AS DOUBLE) AS extendedprice,
         CAST(l_discount AS DOUBLE) AS discount,
         CAST(l_tax AS DOUBLE) AS tax
  FROM lineitem WHERE l_orderkey % 500 = 0
) UNPIVOT (val FOR metric IN (quantity, extendedprice, discount, tax))
""",
    description="wide→long unpivot (melt) of the four lineitem measures",
    tags=("relational", "unpivot", "map-only"),
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long melt — the inverse of pivot (``q_pivot_status_priority``),
    completing the reshape pair. Map-only: unpivot is a per-row expand
    (rows ×4 here), no shuffle at any scale. NULL measures DIVERGE
    across engines — DuckDB's UNPIVOT drops them, Spark's ``unpivot``
    keeps them — so the NULL filter below pins the SQL-standard
    (dropping) semantics explicitly rather than relying on the fixture
    being non-null. Measures are pre-cast to one type because an
    unpivot value column must be homogeneous.
    """
    li = Catalog(spark, sf_dir).lineitem
    w = (li.where(F.col("l_orderkey") % 500 == 0)
         .select("l_orderkey", "l_linenumber",
                 F.col("l_quantity").cast("double").alias("quantity"),
                 F.col("l_extendedprice").cast("double").alias("extendedprice"),
                 F.col("l_discount").cast("double").alias("discount"),
                 F.col("l_tax").cast("double").alias("tax")))
    return (w.unpivot(["l_orderkey", "l_linenumber"],
                      ["quantity", "extendedprice", "discount", "tax"],
                      "metric", "val")
            .where(F.col("val").isNotNull()))


@register(
    "q_gapfill_hours",
    oracle="""
WITH bounds AS (
  SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
  FROM events
), spine AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM bounds
), types AS (
  SELECT DISTINCT event_type FROM events
), actual AS (
  SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT strftime(spine.hour, '%Y-%m-%d %H:%M:%S') AS hour, types.event_type,
       CAST(COALESCE(n, 0) AS BIGINT) AS n_events
FROM spine CROSS JOIN types
LEFT JOIN actual ON actual.hour = spine.hour AND actual.event_type = types.event_type
""",
    description="dense hourly series per event type: calendar spine × types, zero-filled gaps",
    tags=("events", "gapfill", "timeseries"),
)
def q_gapfill_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-fill the hourly series — downstream time-series models need
    DENSE series, and "no rows that hour" must become an explicit 0.

    The hour spine is generated (``sequence`` over the min/max bounds —
    a 1-row broadcast), crossed with the distinct type dimension (tiny),
    and the actual hourly counts left-join onto it. Spine × types is
    hours × |types| rows — calendar-sized, never event-sized — so the
    only event-cardinality work is the one partial-agg groupBy.
    """
    ev = Catalog(spark, sf_dir).events
    bounds = ev.agg(F.date_trunc("hour", F.min("ts")).alias("lo"),
                    F.date_trunc("hour", F.max("ts")).alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hour"))
    types = ev.select("event_type").distinct()
    actual = (ev.groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
              .agg(F.count("*").alias("n")))
    return (
        spine.crossJoin(F.broadcast(types))
        .join(actual, ["hour", "event_type"], "left")
        .select(F.date_format("hour", "yyyy-MM-dd HH:mm:ss").alias("hour"),
                "event_type",
                F.coalesce("n", F.lit(0)).cast("bigint").alias("n_events"))
    )


@register(
    "q_cumulative_users",
    oracle="""
WITH first_seen AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS d0 FROM events GROUP BY user_id
), new_by_day AS (
  SELECT d0 AS d, COUNT(*) AS n_new FROM first_seen GROUP BY d0
), days AS (
  SELECT DISTINCT CAST(ts AS DATE) AS d FROM events
)
SELECT strftime(d, '%Y-%m-%d') AS day,
       CAST(COALESCE(n_new, 0) AS BIGINT) AS n_new_users,
       CAST(SUM(COALESCE(n_new, 0)) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS cumulative_users
FROM days LEFT JOIN new_by_day USING (d)
""",
    description="running distinct-user count via the first-seen decomposition (no windowed COUNT DISTINCT)",
    tags=("events", "window", "analytics"),
)
def q_cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users per day — the metric behind every
    "total signups" chart.

    Windowed COUNT(DISTINCT) doesn't exist in Spark (and would hold
    O(users) state per frame anywhere): the standard decomposition is
    first-seen day per user → new-users per day → running SUM. Every
    shuffle is user- or day-cardinality. The final window is ordered
    over days — day-cardinality rows, so the single-partition window is
    calendar-sized (fine at any event volume; years fit in one task).
    """
    ev = Catalog(spark, sf_dir).events
    from pyspark.sql import Window
    first = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("d0"))
    new_by_day = first.groupBy(F.col("d0").alias("d")).agg(F.count("*").alias("n_new"))
    days = ev.select(F.to_date("ts").alias("d")).distinct()
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    filled = (days.join(new_by_day, "d", "left")
              .select("d", F.coalesce("n_new", F.lit(0)).alias("n_new")))
    return filled.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("n_new").cast("bigint").alias("n_new_users"),
        F.sum("n_new").over(w).cast("bigint").alias("cumulative_users"),
    )


# ---------------------------------------------------------------------------
# Robust anomaly detection (median / MAD).
# ---------------------------------------------------------------------------

MAD_K = 1.4826          # MAD → σ consistency constant (normal data)
MAD_Z = 3.5             # modified z-score cutoff (Iglewicz–Hoaglin)


@register(
    "q_anomaly_mad",
    oracle=f"""
WITH med AS (
  SELECT event_type, median(value) AS med FROM events GROUP BY event_type
), dev AS (
  SELECT e.event_type, e.value, abs(e.value - m.med) AS ad
  FROM events e JOIN med m USING (event_type)
), mad AS (
  SELECT event_type, median(ad) AS mad FROM dev GROUP BY event_type
)
SELECT d.event_type, COUNT(*) AS n_events,
       ROUND(m.med, 6) AS med_r, ROUND(x.mad, 6) AS mad_r,
       CAST(SUM(CASE WHEN x.mad > 0
                      AND d.ad > {MAD_Z} * {MAD_K} * x.mad
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM dev d JOIN med m USING (event_type) JOIN mad x USING (event_type)
GROUP BY d.event_type, m.med, x.mad
""",
    description=f"robust per-type outlier counts: modified z-score "
                f"|v−med| > {MAD_Z}·{MAD_K}·MAD",
    tags=("events", "anomaly", "robust", "broadcast-join"),
)
def q_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD outlier detection — the robust complement to
    ``q_anomaly_zscore``: mean and stddev are themselves dragged by the
    outliers they're meant to find (one 1000× spike inflates σ until
    nothing is 3σ out), while the median and the median absolute
    deviation have a 50% breakdown point. Cutoff is the modified
    z-score |v − med| > MAD_Z·MAD_K·MAD (3.5·1.4826).

    Exact medians are inherently rank-based, so this is a TWO-pass
    operator by problem statement (median of deviations needs the
    median first). Both per-type stats tables are one row per
    event_type and broadcast; the event table is scanned, never
    shuffled on its own size. At 100 TB the one-pass alternative is the
    sketch path (``q_approx_quantiles_grouped``'s mergeable summaries)
    with the same downstream modified-z filter — this operator is the
    exact semantics those sketches approximate.
    """
    ev = Catalog(spark, sf_dir).events
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med"))
    dev = (ev.join(F.broadcast(med), "event_type")
           .select("event_type", "value", "med",
                   F.abs(F.col("value") - F.col("med")).alias("ad")))
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(ad, 0.5)").alias("mad"))
    out = F.when((F.col("mad") > 0)
                 & (F.col("ad") > MAD_Z * MAD_K * F.col("mad")), 1).otherwise(0)
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "med", "mad")
        .agg(F.count("*").alias("n_events"),
             F.sum(out).cast("bigint").alias("n_outliers"))
        .select("event_type", "n_events",
                F.round("med", 6).alias("med_r"),
                F.round("mad", 6).alias("mad_r"), "n_outliers")
    )


# ---------------------------------------------------------------------------
# Marketing attribution (last-touch).
# ---------------------------------------------------------------------------

ATTR_TOUCH_TYPES = ("click", "view")


@register(
    "q_attribution_last_touch",
    oracle=f"""
WITH t AS (
  SELECT user_id, ts,
         MAX(event_id) AS touch_id,
         arg_max(event_type, event_id) AS touch_type
  FROM events WHERE event_type IN {ATTR_TOUCH_TYPES!r}
  GROUP BY user_id, ts
), p AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id AS purchase_id, p.user_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
       t.touch_id, t.touch_type,
       epoch_us(p.ts) - epoch_us(t.ts) AS usecs_since_touch
FROM p ASOF JOIN t ON p.user_id = t.user_id AND t.ts <= p.ts
""",
    description="last-touch attribution: each purchase credited to the user's most recent prior click/view (as-of composition)",
    tags=("events", "attribution", "asof"),
)
def q_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Credit every purchase to the latest preceding marketing touch
    (click or view) by the same user — last-touch attribution, the
    canonical event-stream enrichment a product-analytics warehouse
    serves. This is an as-of join by construction, so it reuses the
    union+window composition (``operators/asof.py``): ONE user-keyed
    shuffle of touches+purchases, a per-key sort, a carry-forward
    window — zero fan-out on users with thousands of touches, where the
    naive inequality-join explodes quadratically.

    Touches are deduplicated to one per (user, ts) first (max event_id,
    its type via max_by) so equal-timestamp carry-forward is
    deterministic in both engines; the inclusive tie (touch at the
    purchase instant counts) is pinned by sort order (right side sorts
    before left at equal ts) and matches DuckDB ASOF's ``<=``.
    """
    from .asof import asof_join

    ev = Catalog(spark, sf_dir).events
    touches = (
        ev.where(F.col("event_type").isin(*ATTR_TOUCH_TYPES))
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("touch_id"),
             F.max_by("event_type", "event_id").alias("touch_type"))
    )
    purchases = ev.where(F.col("event_type") == "purchase")
    l = purchases.select(F.col("user_id").alias("k"),
                         F.col("event_id").alias("purchase_id"),
                         "user_id", "ts")
    r = touches.select(F.col("user_id").alias("k"),
                       F.col("ts").alias("touch_ts"),
                       "touch_id", "touch_type")
    out = asof_join(l, r, key="k", left_ts="ts", right_ts="touch_ts",
                    payload=["touch_id", "touch_type", "touch_ts"])
    # exact integer age — a minutes DIVISION lands doubles on .5e-6
    # rounding ties where the engines' round() implementations disagree
    usecs = F.unix_micros("ts") - F.unix_micros("touch_ts")
    return out.select(
        "purchase_id", "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("purchase_ts"),
        "touch_id", "touch_type",
        usecs.alias("usecs_since_touch"),
    )


# ---------------------------------------------------------------------------
# Active-user accounting (DAU + rolling 7-day).
# ---------------------------------------------------------------------------

ROLLING_DAYS = 7


@register(
    "q_active_users_rolling",
    oracle=f"""
WITH ud AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
), dau AS (
  SELECT day, COUNT(*) AS dau FROM ud GROUP BY day
), w AS (
  SELECT DISTINCT ud.user_id, ud.day + CAST(r.i AS INTEGER) AS day
  FROM ud CROSS JOIN range({ROLLING_DAYS}) r(i)
), wau AS (
  SELECT day, COUNT(*) AS wau FROM w GROUP BY day
)
SELECT strftime(d.day, '%Y-%m-%d') AS day, d.dau, w.wau
FROM dau d JOIN wau w USING (day)
""",
    description=f"daily active users + rolling {ROLLING_DAYS}-day actives per day, bounded-explode rolling distinct",
    tags=("events", "activity", "agg"),
)
def q_active_users_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU and trailing-ROLLING_DAYS (7)-day active users per day. Rolling
    COUNT DISTINCT cannot merge from daily partials (distinct isn't
    additive across days), and the naive day-range self-join reads the
    user-day table once per day in the window. The scalable form:
    each (user, day) observation contributes to exactly
    ROLLING_DAYS (7) window endpoints, so EXPLODE it onto day..day+6,
    distinct, and count — fan-out bounded by the window length (a
    constant), two hash shuffles, no quadratic pass. Days are reported
    only where the corpus has events (inner join vs the DAU set), so
    trailing window endpoints past the last day don't fabricate rows.
    """
    ev = Catalog(spark, sf_dir).events
    ud = ev.select(F.to_date("ts").alias("day"), "user_id").distinct()
    dau = ud.groupBy("day").agg(F.count("*").alias("dau"))
    w = (ud.select("user_id",
                   F.explode(F.sequence(F.lit(0), F.lit(ROLLING_DAYS - 1)))
                    .alias("i"), "day")
         .select("user_id", F.date_add("day", F.col("i")).alias("day"))
         .distinct())
    wau = w.groupBy("day").agg(F.count("*").alias("wau"))
    return (dau.join(wau, "day")
            .select(F.date_format("day", "yyyy-MM-dd").alias("day"),
                    "dau", "wau"))


# ---------------------------------------------------------------------------
# Pareto frontier (skyline) — the multi-objective curation filter.
# ---------------------------------------------------------------------------

SKYLINE_BUCKETS = 32


@register(
    "q_skyline_2d",
    oracle=f"""
WITH pts0 AS (
  SELECT doc_id,
         len({tokens_sql('text')}) AS d1,
         len(list_distinct({tokens_sql('text')})) AS d2
  FROM documents
), pts AS (
  SELECT d1, d2, CAST(COUNT(*) AS BIGINT) AS n_docs,
         MIN(doc_id) AS example_doc_id
  FROM pts0 GROUP BY d1, d2
)
SELECT CAST(d1 AS BIGINT) AS n_tokens, CAST(d2 AS BIGINT) AS n_distinct,
       n_docs, example_doc_id
FROM pts p
WHERE NOT EXISTS (
  SELECT 1 FROM pts q
  WHERE q.d1 >= p.d1 AND q.d2 >= p.d2 AND (q.d1 > p.d1 OR q.d2 > p.d2))
""",
    description="2-D Pareto frontier (skyline) of documents on "
                "(token count, distinct-token count), bucketed two-phase",
    tags=("analytics", "custom"),
)
def q_skyline_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-objective curation filter: the Pareto frontier of documents
    over two quality axes — no kept point is beaten on BOTH token count
    and vocabulary richness. Single-axis thresholds (the
    ``text_quality_stratified`` shape) trade the axes off by fiat; the
    skyline is the "no-regret" candidate set a curator tunes between.

    Scale (the distributive-skyline plan): (1) collapse the corpus to
    DISTINCT value pairs (one map-side-combinable shuffle — the pair
    table, not the corpus, is what skyline cost depends on); (2) LOCAL
    frontier per hash bucket via one sorted window (dominated iff a
    preceding pair in (d1 desc, d2 desc) order carries d2 ≥ mine —
    exact for distinct pairs). Filtering is safe because skyline is
    distributive: a global-frontier point is undominated in every
    subset. (3) GLOBAL frontier over the ≤ buckets·frontier survivors
    — the one unbucketed window runs on the reduced set, the standard
    two-phase skyline; adversarially anti-correlated data degrades
    that bound and would take a third phase, noted not needed here.
    The bucket hash never reaches results (engine-local ``xxhash64``
    is fine — any bucketing yields the same frontier).
    """
    from pyspark.sql import Window

    from ..functions.text import tokens

    d = Catalog(spark, sf_dir).documents
    tok = tokens("text")
    pts = (d.select("doc_id",
                    F.size(tok).cast("bigint").alias("d1"),
                    F.size(F.array_distinct(tok)).cast("bigint").alias("d2"))
           .groupBy("d1", "d2")
           .agg(F.count("*").cast("bigint").alias("n_docs"),
                F.min("doc_id").alias("example_doc_id")))
    prec = Window.orderBy(F.col("d1").desc(), F.col("d2").desc()) \
                 .rowsBetween(Window.unboundedPreceding, -1)
    local_w = Window.partitionBy("bucket") \
                    .orderBy(F.col("d1").desc(), F.col("d2").desc()) \
                    .rowsBetween(Window.unboundedPreceding, -1)
    local = (pts.withColumn("bucket",
                            F.pmod(F.xxhash64("d1", "d2"),
                                   F.lit(SKYLINE_BUCKETS)))
             .withColumn("mx", F.max("d2").over(local_w))
             .where(F.col("mx").isNull() | (F.col("mx") < F.col("d2")))
             .drop("bucket", "mx"))
    return (local.withColumn("mx", F.max("d2").over(prec))
            .where(F.col("mx").isNull() | (F.col("mx") < F.col("d2")))
            .select(F.col("d1").alias("n_tokens"),
                    F.col("d2").alias("n_distinct"),
                    "n_docs", "example_doc_id"))


# ---------------------------------------------------------------------------
# Market-basket co-occurrence: pair support and lift.
# ---------------------------------------------------------------------------

BASKET_MIN_COUNT = 2  # pairs must co-occur in at least this many orders


@register(
    "q_market_basket",
    oracle=f"""
WITH li AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), n AS (
  SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM lineitem
), item AS (
  SELECT l_partkey, COUNT(*) AS n_item FROM li GROUP BY l_partkey
), pair AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS n_both
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING COUNT(*) >= {BASKET_MIN_COUNT}
)
SELECT part_a, part_b, n_both,
       ia.n_item AS n_a, ib.n_item AS n_b,
       CAST(ROUND(n_both * 1.0 / n_orders, 6) AS DOUBLE) AS support,
       CAST(ROUND(n_both * 1.0 * n_orders / (ia.n_item * 1.0 * ib.n_item), 6) AS DOUBLE) AS lift
FROM pair
JOIN item ia ON ia.l_partkey = part_a
JOIN item ib ON ib.l_partkey = part_b
CROSS JOIN n
""",
    description=f"market-basket pair mining: parts co-purchased in >= {BASKET_MIN_COUNT} orders, with support and lift",
    tags=("lineitem", "basket", "analytics"),
)
def q_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-pair mining (the 2-itemset core of association rules).

    Plan: ONE fact shuffle total — the basket build (distinct items per
    order, sorted so pair orientation is canonical). Pairs then generate
    MAP-SIDE inside each basket with a nested array transform; fan-out
    is basket-size² (TPC-H baskets are <= 7 items), never corpus-sized.
    The alternative self-join on l_orderkey shuffles the item list twice
    and joins it; this shape replaces both with per-row array work.
    Pair counting shuffles the (already map-side-combined) pair stream,
    per-item counts ride a broadcast (the part dimension is
    catalog-sized), and the basket total is a broadcast scalar.

    Determinism: support/lift divide single BIGINT counts in one double
    expression — no sum-of-float anywhere.
    """
    cat = Catalog(spark, sf_dir)
    # Basket table: 3 consumers (pairs, item counts, order total) —
    # persist so the fact shuffle happens once.
    baskets = (cat.lineitem.groupBy("l_orderkey")
               .agg(F.sort_array(F.collect_set("l_partkey")).alias("items"))
               .persist())
    n = baskets.agg(F.count("*").alias("n_orders"))
    item = (baskets.select(F.explode("items").alias("pk"))
            .groupBy("pk").agg(F.count("*").alias("n_item")))
    # All ordered pairs (a < b) within a basket, generated per row from
    # the sorted item array: element i pairs with every later element.
    pair_structs = F.flatten(F.transform(
        "items",
        lambda x, i: F.transform(
            F.slice("items", i + 2, F.size("items") - i - 1),
            lambda y: F.struct(x.alias("part_a"), y.alias("part_b")))))
    pair = (
        baskets.select(F.explode(pair_structs).alias("p"))
        .groupBy(F.col("p.part_a").alias("part_a"),
                 F.col("p.part_b").alias("part_b"))
        .agg(F.count("*").alias("n_both"))
        .where(F.col("n_both") >= BASKET_MIN_COUNT)
    )
    ia = item.select(F.col("pk").alias("part_a"), F.col("n_item").alias("n_a"))
    ib = item.select(F.col("pk").alias("part_b"), F.col("n_item").alias("n_b"))
    return (
        pair.join(F.broadcast(ia), "part_a").join(F.broadcast(ib), "part_b")
        .crossJoin(F.broadcast(n))
        .select("part_a", "part_b", "n_both", "n_a", "n_b",
                F.round(F.col("n_both") / F.col("n_orders"), 6)
                 .cast("double").alias("support"),
                # Promote to double BEFORE the products: BIGINT*BIGINT
                # n_both*n_orders (and n_a*n_b) can exceed 2^63 at the
                # 100 TB posture and ANSI mode makes that an error, not
                # a wrap (r4 advisory). Matches the oracle's `* 1.0 *`.
                F.round(F.col("n_both").cast("double") * F.col("n_orders")
                        / (F.col("n_a").cast("double") * F.col("n_b")), 6)
                 .cast("double").alias("lift"))
    )


# ---------------------------------------------------------------------------
# A/B experiment read-out: Welch's t-test from decimal-exact sums.
# ---------------------------------------------------------------------------

AB_TREATMENT, AB_CONTROL = "click", "view"
AB_Z_CRIT = 1.96  # two-sided 5% on the normal approximation


@register(
    "q_abtest_welch",
    oracle=f"""
WITH s AS (
  SELECT event_type, COUNT(*) AS n,
         SUM(CAST(value AS DECIMAL(18,4))) AS sx,
         SUM(CAST(value AS DECIMAL(18,4)) * CAST(value AS DECIMAL(18,4))) AS sxx
  FROM events WHERE event_type IN ('{AB_TREATMENT}', '{AB_CONTROL}')
  GROUP BY event_type
), w AS (
  SELECT
    MAX(CASE WHEN event_type = '{AB_TREATMENT}' THEN n END) AS n_t,
    MAX(CASE WHEN event_type = '{AB_CONTROL}' THEN n END) AS n_c,
    MAX(CASE WHEN event_type = '{AB_TREATMENT}' THEN CAST(sx AS DOUBLE) END) AS sx_t,
    MAX(CASE WHEN event_type = '{AB_CONTROL}' THEN CAST(sx AS DOUBLE) END) AS sx_c,
    MAX(CASE WHEN event_type = '{AB_TREATMENT}' THEN CAST(sxx AS DOUBLE) END) AS sxx_t,
    MAX(CASE WHEN event_type = '{AB_CONTROL}' THEN CAST(sxx AS DOUBLE) END) AS sxx_c
  FROM s
), m AS (
  SELECT n_t, n_c,
         sx_t / n_t AS mean_t, sx_c / n_c AS mean_c,
         (sxx_t - sx_t * sx_t / n_t) / (n_t - 1) AS var_t,
         (sxx_c - sx_c * sx_c / n_c) / (n_c - 1) AS var_c
  FROM w
)
SELECT n_t, n_c,
       CAST(ROUND(mean_t, 6) AS DOUBLE) AS mean_t,
       CAST(ROUND(mean_c, 6) AS DOUBLE) AS mean_c,
       CAST(ROUND((mean_t - mean_c) / SQRT(var_t / n_t + var_c / n_c), 6) AS DOUBLE) AS t_stat,
       CAST(ROUND((var_t / n_t + var_c / n_c) * (var_t / n_t + var_c / n_c)
                  / ((var_t / n_t) * (var_t / n_t) / (n_t - 1)
                     + (var_c / n_c) * (var_c / n_c) / (n_c - 1)), 4) AS DOUBLE) AS welch_df,
       CAST(ABS((mean_t - mean_c) / SQRT(var_t / n_t + var_c / n_c)) > {AB_Z_CRIT} AS INT) AS significant
FROM m
""",
    description=f"Welch two-sample t-test: '{AB_TREATMENT}' vs '{AB_CONTROL}' event values, "
                "t-stat + Welch-Satterthwaite df from decimal-exact sums",
    tags=("events", "statistics", "analytics"),
)
def q_abtest_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment read-out without equal-variance assumptions.

    Welch's t-statistic and Welch-Satterthwaite degrees of freedom, both
    derived from the same decimal-exact sufficient statistics discipline
    as ``q_stats_moments`` (relational_ext.py): Σx and Σx² accumulate as
    DECIMAL (order-independent partial aggregates), and every float op
    happens once, in an expression tree mirrored verbatim in the oracle.
    At 100 TB this is one filtered scan + a 2-group partial aggregate —
    the cheapest query in the engine no matter how big the experiment.

    The significance flag uses the two-sided 5% normal critical value —
    with experiment-scale n, t_(df) is indistinguishable from z, and a
    constant threshold keeps the contract hashable.
    """
    ev = Catalog(spark, sf_dir).events
    x = F.col("value").cast("decimal(18,4)")
    s = (ev.where(F.col("event_type").isin(AB_TREATMENT, AB_CONTROL))
         .groupBy("event_type")
         .agg(F.count("*").alias("n"),
              F.sum(x).alias("sx"), F.sum(x * x).alias("sxx")))
    pick = lambda col, t: F.max(F.when(F.col("event_type") == t, F.col(col)))
    w = s.agg(
        pick("n", AB_TREATMENT).alias("n_t"),
        pick("n", AB_CONTROL).alias("n_c"),
        pick("sx", AB_TREATMENT).cast("double").alias("sx_t"),
        pick("sx", AB_CONTROL).cast("double").alias("sx_c"),
        pick("sxx", AB_TREATMENT).cast("double").alias("sxx_t"),
        pick("sxx", AB_CONTROL).cast("double").alias("sxx_c"),
    )
    m = w.select(
        "n_t", "n_c",
        (F.col("sx_t") / F.col("n_t")).alias("mean_t"),
        (F.col("sx_c") / F.col("n_c")).alias("mean_c"),
        ((F.col("sxx_t") - F.col("sx_t") * F.col("sx_t") / F.col("n_t"))
         / (F.col("n_t") - 1)).alias("var_t"),
        ((F.col("sxx_c") - F.col("sx_c") * F.col("sx_c") / F.col("n_c"))
         / (F.col("n_c") - 1)).alias("var_c"),
    )
    se_t, se_c = F.col("var_t") / F.col("n_t"), F.col("var_c") / F.col("n_c")
    t_stat = (F.col("mean_t") - F.col("mean_c")) / F.sqrt(se_t + se_c)
    df = ((se_t + se_c) * (se_t + se_c)
          / (se_t * se_t / (F.col("n_t") - 1)
             + se_c * se_c / (F.col("n_c") - 1)))
    return m.select(
        "n_t", "n_c",
        F.round("mean_t", 6).cast("double").alias("mean_t"),
        F.round("mean_c", 6).cast("double").alias("mean_c"),
        F.round(t_stat, 6).cast("double").alias("t_stat"),
        F.round(df, 4).cast("double").alias("welch_df"),
        (F.abs(t_stat) > AB_Z_CRIT).cast("int").alias("significant"),
    )


# ---------------------------------------------------------------------------
# Event-sequence transition matrix (first-order Markov chain).
# ---------------------------------------------------------------------------

@register(
    "q_user_transitions",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
), tr AS (
  SELECT prev_type, event_type AS next_type, COUNT(*) AS n_transitions
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT prev_type, next_type, n_transitions,
       CAST(ROUND(n_transitions * 1.0
                  / SUM(n_transitions) OVER (PARTITION BY prev_type), 6) AS DOUBLE) AS prob
FROM tr
""",
    description="first-order Markov transition matrix over per-user event sequences",
    tags=("events", "sequence", "analytics"),
)
def q_user_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What users do NEXT: per-user event sequences folded into a
    transition-count matrix with row-normalized probabilities.

    The sequence step is a lag window PARTITIONED BY user_id — at 100 TB
    that is a user-cardinality hash shuffle with per-user sorts (millions
    of independent partitions, no global sort), the same shape as
    ``q_sessionize``. Ordering ties break on event_id so the lag is
    deterministic under any partitioning. The transition matrix itself
    is |event_types|² rows; its normalizing window is over that tiny
    table, not the event stream.
    """
    from pyspark.sql import Window

    ev = Catalog(spark, sf_dir).events
    seq = ev.select(
        "event_type",
        F.lag("event_type").over(
            Window.partitionBy("user_id").orderBy("ts", "event_id"))
         .alias("prev_type"))
    tr = (seq.where(F.col("prev_type").isNotNull())
          .groupBy("prev_type", F.col("event_type").alias("next_type"))
          .agg(F.count("*").alias("n_transitions")))
    return tr.select(
        "prev_type", "next_type", "n_transitions",
        F.round(F.col("n_transitions")
                / F.sum("n_transitions").over(Window.partitionBy("prev_type")),
                6).cast("double").alias("prob"))


# ---------------------------------------------------------------------------
# RFM customer segmentation: quartile bins without a global sort.
# ---------------------------------------------------------------------------

@register(
    "q_rfm_segmentation",
    oracle="""
WITH c AS (
  SELECT o_custkey,
         date_diff('day', CAST(MAX(o_orderdate) AS DATE),
                   (SELECT CAST(MAX(o_orderdate) AS DATE) FROM orders)) AS recency_days,
         COUNT(*) AS frequency,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) * 100 AS BIGINT) AS monetary_cents
  FROM orders GROUP BY o_custkey
), q AS (
  SELECT CAST(ROUND(4 * quantile_cont(recency_days, 0.25), 0) AS BIGINT) AS r1,
         CAST(ROUND(4 * quantile_cont(recency_days, 0.50), 0) AS BIGINT) AS r2,
         CAST(ROUND(4 * quantile_cont(recency_days, 0.75), 0) AS BIGINT) AS r3,
         CAST(ROUND(4 * quantile_cont(frequency, 0.25), 0) AS BIGINT) AS f1,
         CAST(ROUND(4 * quantile_cont(frequency, 0.50), 0) AS BIGINT) AS f2,
         CAST(ROUND(4 * quantile_cont(frequency, 0.75), 0) AS BIGINT) AS f3,
         CAST(ROUND(4 * quantile_cont(monetary_cents, 0.25), 0) AS BIGINT) AS m1,
         CAST(ROUND(4 * quantile_cont(monetary_cents, 0.50), 0) AS BIGINT) AS m2,
         CAST(ROUND(4 * quantile_cont(monetary_cents, 0.75), 0) AS BIGINT) AS m3
  FROM c
)
SELECT CASE WHEN 4 * recency_days < r1 THEN 0 WHEN 4 * recency_days < r2 THEN 1
            WHEN 4 * recency_days < r3 THEN 2 ELSE 3 END AS r_bin,
       CASE WHEN 4 * frequency < f1 THEN 0 WHEN 4 * frequency < f2 THEN 1
            WHEN 4 * frequency < f3 THEN 2 ELSE 3 END AS f_bin,
       CASE WHEN 4 * monetary_cents < m1 THEN 0 WHEN 4 * monetary_cents < m2 THEN 1
            WHEN 4 * monetary_cents < m3 THEN 2 ELSE 3 END AS m_bin,
       COUNT(*) AS n_customers,
       MIN(monetary_cents) AS min_monetary_cents,
       MAX(monetary_cents) AS max_monetary_cents
FROM c CROSS JOIN q
GROUP BY 1, 2, 3
""",
    description="RFM segmentation: quartile-binned recency/frequency/monetary "
                "per customer, broadcast boundaries, map-side binning",
    tags=("orders", "segmentation", "analytics"),
)
def q_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer RFM segments, built the scalable way.

    Per-customer recency (days since last order, against the corpus max
    date), frequency (order count) and monetary (decimal-exact lifetime
    total, in integer cents) roll up in ONE customer-keyed aggregate;
    the nine quartile boundaries compute in a second 1-row pass and
    broadcast; bin assignment is map-side; the segment report is a
    64-row aggregate. No ``ntile``-over-everything — a global-sort
    window would funnel every customer through one task (the ceiling
    ``q_feature_binning_equidepth`` documents; this operator is its
    3-dimensional production shape).

    Determinism: all three metrics are integers, so the 4× quantile
    trick (quartile interpolation positions are quarters → 4× the
    interpolated value is integer-exact in double) makes every bin
    decision an integer comparison; bin 0 is best-recency / lowest-
    frequency / lowest-spend quartile.
    """
    o = Catalog(spark, sf_dir).orders
    gmax = o.agg(F.max(F.col("o_orderdate").cast("date")).alias("gmax"))
    c = (o.crossJoin(F.broadcast(gmax))
         .groupBy("o_custkey")
         .agg(F.datediff(F.first("gmax"),
                         F.max(F.col("o_orderdate").cast("date")))
               .cast("bigint").alias("recency_days"),
              F.count("*").alias("frequency"),
              (F.sum(F.col("o_totalprice").cast("decimal(18,4)")) * 100)
               .cast("bigint").alias("monetary_cents")))
    q = c.agg(*[
        F.round(4 * F.percentile(col, F.lit(p)), 0).cast("bigint").alias(a)
        for col, pfx in (("recency_days", "r"), ("frequency", "f"),
                         ("monetary_cents", "m"))
        for p, a in ((0.25, f"{pfx}1"), (0.50, f"{pfx}2"), (0.75, f"{pfx}3"))
    ])

    def bin_(col, pfx):
        v = 4 * F.col(col)
        return (F.when(v < F.col(f"{pfx}1"), 0)
                .when(v < F.col(f"{pfx}2"), 1)
                .when(v < F.col(f"{pfx}3"), 2)
                .otherwise(3))

    return (c.crossJoin(F.broadcast(q))
            .groupBy(bin_("recency_days", "r").alias("r_bin"),
                     bin_("frequency", "f").alias("f_bin"),
                     bin_("monetary_cents", "m").alias("m_bin"))
            .agg(F.count("*").alias("n_customers"),
                 F.min("monetary_cents").alias("min_monetary_cents"),
                 F.max("monetary_cents").alias("max_monetary_cents")))
