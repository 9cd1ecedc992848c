"""Time-series aggregates beyond plain windows: time-weighted averages
and counter-reset-aware rates.

The reference's analytics surface is interval COUNTS over the event
stream (``/root/reference/README.md:45-55``); real time-series stores
(continuous aggregates like ``q_hypertable_rollup``) pair those with two
more families that plain GROUP BY cannot express:

- **Time-weighted average** (``q_time_weighted_avg``): a gauge sampled
  at irregular intervals must weight each observation by how long it
  held (last-observation-carried-forward), or sparse periods get the
  same vote as dense ones.
- **Counter rate** (``q_counter_rate``): monotonic counters that reset
  on restart (byte counts, request totals) need reset-aware deltas —
  the PromQL ``increase``/``rate`` semantic — not ``max - min``.

Both are lag/lead windows PARTITIONED BY high-cardinality keys (user,
(type, day)) — hash shuffles with per-key sorts, no global sort at any
scale — followed by decimal-exact aggregation of the per-gap terms.
Ordering ties break on event_id, so results are partitioning-invariant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..engine.catalog import Catalog
from .registry import register


@register(
    "q_time_weighted_avg",
    oracle="""
WITH s AS (
  SELECT event_type,
         strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         CAST(value AS DECIMAL(18,4)) AS v,
         lead(epoch_us(ts)) OVER w - epoch_us(ts) AS dt_us
  FROM events
  WINDOW w AS (PARTITION BY event_type, date_trunc('day', ts)
               ORDER BY epoch_us(ts), event_id)
)
SELECT event_type, day,
       COUNT(*) AS n_events,
       CAST(SUM(dt_us) AS BIGINT) AS span_us,
       CAST(ROUND(CAST(SUM(v * dt_us) AS DOUBLE)
                  / NULLIF(SUM(dt_us), 0), 6) AS DOUBLE) AS twap
FROM s GROUP BY event_type, day
""",
    description="time-weighted average (LOCF) of the event gauge per "
                "(event_type, day): lead-window gap weighting, decimal-exact sums",
    tags=("events", "timeseries", "window"),
)
def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCF time-weighted average of an irregularly-sampled gauge.

    Each observation holds until the next one in its (event_type, day)
    series; its weight is that gap in microseconds (the last observation
    of a day carries no weight — its hold extends past the group edge).
    TWAP = Σ v·dt / Σ dt with v·dt accumulated as DECIMAL (gap weights
    are exact BIGINT microseconds), so the sum is order-independent and
    the single double division happens once, mirrored in the oracle.
    NULLIF guards the all-ties degenerate span (IEEE inf vs NULL would
    diverge across engines).

    Scale: one hash shuffle on (event_type, day) with per-group sorts —
    day-partitioned series parallelize over the full history — then a
    partial-aggregated rollup of the same key. No global sort, no
    driver-side state.
    """
    ev = Catalog(spark, sf_dir).events
    day = F.date_trunc("day", "ts")
    w = (Window.partitionBy("event_type", day)
         .orderBy(F.unix_micros(F.col("ts")), "event_id"))
    s = ev.select(
        "event_type",
        F.date_format(day, "yyyy-MM-dd").alias("day"),
        F.col("value").cast("decimal(18,4)").alias("v"),
        (F.lead(F.unix_micros(F.col("ts"))).over(w)
         - F.unix_micros(F.col("ts"))).alias("dt_us"),
    )
    span = F.sum("dt_us")
    return (s.groupBy("event_type", "day")
            .agg(F.count("*").alias("n_events"),
                 span.cast("bigint").alias("span_us"),
                 F.round(F.sum(F.col("v") * F.col("dt_us")).cast("double")
                         / F.nullif(span, F.lit(0)), 6)
                  .cast("double").alias("twap")))


@register(
    "q_counter_rate",
    oracle="""
WITH s AS (
  SELECT user_id,
         CAST(value AS DECIMAL(18,4)) AS v,
         lag(CAST(value AS DECIMAL(18,4))) OVER w AS v_prev,
         epoch_us(ts) AS t_us,
         lag(epoch_us(ts)) OVER w AS t_prev
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
), d AS (
  SELECT user_id, v, v_prev,
         CASE WHEN v_prev IS NULL THEN NULL
              WHEN v >= v_prev THEN v - v_prev
              ELSE v END AS delta,
         CASE WHEN v_prev IS NOT NULL AND v < v_prev THEN 1 ELSE 0 END AS reset,
         t_us - t_prev AS dt_us
  FROM s
)
SELECT user_id,
       COUNT(*) AS n_samples,
       CAST(SUM(reset) AS BIGINT) AS n_resets,
       CAST(ROUND(SUM(delta), 4) AS DOUBLE) AS increase,
       CAST(SUM(dt_us) AS BIGINT) AS span_us,
       CAST(ROUND(CAST(SUM(delta) AS DOUBLE)
                  / NULLIF(CAST(SUM(dt_us) AS DOUBLE) / 3600000000.0, 0), 6)
            AS DOUBLE) AS rate_per_hour
FROM d GROUP BY user_id
""",
    description="counter-reset-aware increase and hourly rate per user "
                "(PromQL increase/rate semantic) over the event value series",
    tags=("events", "timeseries", "window"),
)
def q_counter_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monotonic-counter deltas that survive restarts.

    A counter sample lower than its predecessor means the counter reset
    and restarted from zero, so that gap contributes the NEW value, not
    a negative delta — the PromQL ``increase`` rule. Per-user totals:
    number of resets, total increase (decimal-exact), observed span,
    and the hourly rate (one double division at the output edge,
    NULLIF-guarded for single-sample users whose span is NULL/0).

    Scale: identical shape to ``q_sessionize`` — one user-keyed hash
    shuffle with per-user sorts, then a user-keyed rollup. State per
    row is one lag pair; nothing global.
    """
    ev = Catalog(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy(F.unix_micros(F.col("ts")), "event_id")
    v = F.col("value").cast("decimal(18,4)")
    s = ev.select(
        "user_id", v.alias("v"),
        F.lag(v).over(w).alias("v_prev"),
        F.unix_micros(F.col("ts")).alias("t_us"),
        F.lag(F.unix_micros(F.col("ts"))).over(w).alias("t_prev"),
    )
    d = s.select(
        "user_id", "v", "v_prev",
        F.when(F.col("v_prev").isNull(), F.lit(None))
         .when(F.col("v") >= F.col("v_prev"), F.col("v") - F.col("v_prev"))
         .otherwise(F.col("v")).alias("delta"),
        F.when(F.col("v_prev").isNotNull() & (F.col("v") < F.col("v_prev")), 1)
         .otherwise(0).alias("reset"),
        (F.col("t_us") - F.col("t_prev")).alias("dt_us"),
    )
    return (d.groupBy("user_id")
            .agg(F.count("*").alias("n_samples"),
                 F.sum("reset").cast("bigint").alias("n_resets"),
                 F.round(F.sum("delta"), 4).cast("double").alias("increase"),
                 F.sum("dt_us").cast("bigint").alias("span_us"),
                 F.round(F.sum("delta").cast("double")
                         / F.nullif(F.sum("dt_us").cast("double") / 3600000000.0,
                                    F.lit(0)), 6)
                  .cast("double").alias("rate_per_hour")))


# ---------------------------------------------------------------------------
# OHLC bars: first/last-by-time plus extremes, per (series, hour).
# ---------------------------------------------------------------------------

@register(
    "q_ohlc_bars",
    oracle="""
WITH s AS (
  SELECT event_type,
         strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS bar,
         value,
         row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                            ORDER BY epoch_us(ts), event_id) AS rn_a,
         row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                            ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn_d
  FROM events
)
SELECT event_type, bar,
       MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
       COUNT(*) AS n_ticks
FROM s GROUP BY event_type, bar
""",
    description="hourly OHLC bars per event_type: open/close by event "
                "time (event_id tiebreak), high/low extremes",
    tags=("events", "timeseries", "window"),
)
def q_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candlestick rollup — the serving shape every time-series
    dashboard requests (rate/TWAP's sibling for price-like gauges).

    Open and close are FIRST/LAST BY EVENT TIME with the event_id
    tiebreak, not min/max — expressed as two row-number windows over
    the same (event_type, hour) partitioning (ONE hash shuffle; the
    second window reuses the first's exchange and sort order reversed),
    then a same-key rollup that Catalyst keeps exchange-free. No value
    is ever summed, so doubles pass through untouched — bar columns are
    engine-exact by construction.

    Scale: partitions are (series × hours) — unbounded history
    parallelizes; per-partition state is one sort, no global step.
    """
    ev = Catalog(spark, sf_dir).events
    hour = F.date_trunc("hour", "ts")
    us = F.unix_micros(F.col("ts"))
    w_a = Window.partitionBy("event_type", hour).orderBy(us.asc(), F.col("event_id").asc())
    w_d = Window.partitionBy("event_type", hour).orderBy(us.desc(), F.col("event_id").desc())
    s = ev.select(
        "event_type",
        F.date_format(hour, "yyyy-MM-dd HH:00").alias("bar"),
        "value",
        F.row_number().over(w_a).alias("rn_a"),
        F.row_number().over(w_d).alias("rn_d"),
    )
    return (s.groupBy("event_type", "bar")
            .agg(F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
                 F.max("value").alias("high"),
                 F.min("value").alias("low"),
                 F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
                 F.count("*").alias("n_ticks")))


# ---------------------------------------------------------------------------
# LTTB-style downsampling, parallel variant (fixed bucket-mean anchors).
# ---------------------------------------------------------------------------

LTTB_BUCKETS = 30


@register(
    "q_lttb_downsample",
    oracle=f"""
WITH pts AS (
  SELECT event_type, event_id, epoch_us(ts) AS x, value AS y FROM events
), ext AS (
  SELECT event_type, MIN(x) AS xmin, MAX(x) AS xmax FROM pts GROUP BY event_type
), b AS (
  SELECT p.event_type, p.event_id, p.x, p.y,
         LEAST(CAST(FLOOR((p.x - e.xmin) * {LTTB_BUCKETS}.0
                          / NULLIF(e.xmax - e.xmin, 0)) AS BIGINT),
               {LTTB_BUCKETS - 1}) AS bucket
  FROM pts p JOIN ext e USING (event_type)
), stats AS (
  SELECT event_type, bucket,
         CAST(SUM(x) AS DOUBLE) / COUNT(*) AS mx,
         CAST(SUM(CAST(y AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS my,
         COUNT(*) AS n_in_bucket
  FROM b GROUP BY event_type, bucket
), anchors AS (
  SELECT event_type, bucket, n_in_bucket,
         COALESCE(lag(mx) OVER w, mx) AS ax, COALESCE(lag(my) OVER w, my) AS ay,
         COALESCE(lead(mx) OVER w, mx) AS bx, COALESCE(lead(my) OVER w, my) AS by
  FROM stats WINDOW w AS (PARTITION BY event_type ORDER BY bucket)
), ranked AS (
  SELECT b.event_type, b.bucket, a.n_in_bucket, b.event_id, b.x, b.y,
         row_number() OVER (
           PARTITION BY b.event_type, b.bucket
           ORDER BY ABS((a.ax - a.bx) * (b.y - a.ay)
                        - (a.ax - b.x) * (a.by - a.ay)) DESC,
                    b.event_id) AS rn
  FROM b JOIN anchors a USING (event_type, bucket)
)
SELECT event_type, bucket, event_id, x AS x_us, y AS value, n_in_bucket
FROM ranked WHERE rn = 1
""",
    description=f"LTTB-style downsampling to {LTTB_BUCKETS} points per series: "
                "max-triangle-area point per time bucket, bucket-mean anchors",
    tags=("events", "timeseries", "downsample"),
)
def q_lttb_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-Triangle downsampling for dashboard serving, restated so
    every step parallelizes.

    Classic LTTB anchors each bucket's triangle on the PREVIOUSLY
    SELECTED point — a sequential chain no engine can parallelize. This
    variant anchors on the neighbor buckets' mean points instead (the
    same fixed anchor LTTB already uses for its right side), so bucket
    selections are independent: visually equivalent downsampling, fully
    parallel. Endpoint buckets anchor to their own mean on the missing
    side (the area degenerates to the single-anchor triangle).

    Determinism: bucket means derive from exact sums (BIGINT micros,
    DECIMAL values) through one double division; the area expression is
    the same IEEE tree in both engines; ties break on event_id.

    Scale: equal-TIME buckets (not LTTB's equal-count) keep bucketing
    map-side off a broadcast per-series min/max — equal-count buckets
    would need a per-series global row-number, a one-task sort per
    series. The bucket-stats table is (series × B) rows: its lag/lead
    window is over B rows per series, and the per-bucket argmax windows
    partition on (series, bucket) — parallelism grows with the corpus.
    """
    ev = Catalog(spark, sf_dir).events
    pts = ev.select("event_type", "event_id",
                    F.unix_micros(F.col("ts")).alias("x"),
                    F.col("value").alias("y"))
    ext = pts.groupBy("event_type").agg(F.min("x").alias("xmin"),
                                        F.max("x").alias("xmax"))
    b = (pts.join(F.broadcast(ext), "event_type")
         .select("event_type", "event_id", "x", "y",
                 F.least(
                     F.floor((F.col("x") - F.col("xmin")) * float(LTTB_BUCKETS)
                             / F.nullif(F.col("xmax") - F.col("xmin"), F.lit(0)))
                      .cast("bigint"),
                     F.lit(LTTB_BUCKETS - 1)).alias("bucket")))
    stats = (b.groupBy("event_type", "bucket")
             .agg((F.sum("x").cast("double") / F.count("*")).alias("mx"),
                  (F.sum(F.col("y").cast("decimal(18,4)")).cast("double")
                   / F.count("*")).alias("my"),
                  F.count("*").alias("n_in_bucket")))
    w = Window.partitionBy("event_type").orderBy("bucket")
    anchors = stats.select(
        "event_type", "bucket", "n_in_bucket",
        F.coalesce(F.lag("mx").over(w), F.col("mx")).alias("ax"),
        F.coalesce(F.lag("my").over(w), F.col("my")).alias("ay"),
        F.coalesce(F.lead("mx").over(w), F.col("mx")).alias("bx"),
        F.coalesce(F.lead("my").over(w), F.col("my")).alias("by"),
    )
    area = F.abs((F.col("ax") - F.col("bx")) * (F.col("y") - F.col("ay"))
                 - (F.col("ax") - F.col("x")) * (F.col("by") - F.col("ay")))
    rw = (Window.partitionBy("event_type", "bucket")
          .orderBy(area.desc(), F.col("event_id")))
    return (b.join(F.broadcast(anchors), ["event_type", "bucket"])
            .withColumn("rn", F.row_number().over(rw))
            .where(F.col("rn") == 1)
            .select("event_type", "bucket", "event_id",
                    F.col("x").alias("x_us"), F.col("y").alias("value"),
                    "n_in_bucket"))


# ---------------------------------------------------------------------------
# EWMA smoothing (exact dyadic arithmetic — the forecasting primitive).
# ---------------------------------------------------------------------------

EWMA_LAGS = 30  # window depth; the truncated tail is <= 2^-30 ~ 1e-9 of
                # the level, far below the 1e-6 presentation rounding.
                # 30 (not 40) keeps the scaled level inside int64 at the
                # 100 TB posture: the level is < 2*cnt_max*2^30, so it
                # overflows only past ~4.3e9 events per (type, day) —
                # vs ~4.2M at the old 2^40 scale, which a single hot day
                # at scale could plausibly exceed (both engines would
                # then error under ANSI).


@register(
    "q_ewma_daily",
    oracle=f"""
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
         COUNT(*) AS cnt
  FROM events GROUP BY 1, 2
), sm AS (
  SELECT a.event_type, a.d, a.cnt,
         CAST(SUM(b.cnt * CAST(power(2, {EWMA_LAGS} - (a.d - b.d)) AS BIGINT))
              AS BIGINT) AS ewma_x2p
  FROM daily a JOIN daily b
    ON b.event_type = a.event_type
   AND b.d BETWEEN a.d - {EWMA_LAGS} AND a.d
  GROUP BY a.event_type, a.d, a.cnt
)
SELECT event_type, strftime(d, '%Y-%m-%d') AS day, cnt, ewma_x2p,
       CAST(ROUND(ewma_x2p / power(2, {EWMA_LAGS + 1}), 6) AS DOUBLE) AS ewma
FROM sm
""",
    description=f"EWMA (alpha=1/2, {EWMA_LAGS}-day window) of daily event "
                "counts per type — exact dyadic integer arithmetic, both "
                "engines bit-equal",
    tags=("events", "timeseries", "forecast"),
)
def q_ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of the daily event count
    per type — the smoothing/forecasting primitive (monitoring
    baselines, anomaly thresholds, naive next-day forecasts). α = 1/2
    and integer inputs make the whole recurrence EXACT: the scaled
    level Σ cnt_{{t-i}}·2^({EWMA_LAGS}-i) is a plain BIGINT, so both
    engines agree bit-for-bit with no float-summation order hazard;
    dividing by 2^{EWMA_LAGS}+1 only at presentation yields the
    standard α=1/2 EWMA truncated at {EWMA_LAGS} lags (the dropped
    tail is ≤ 2^-{EWMA_LAGS} ≈ 1e-9 of the level — below the 1e-6
    rounding). Domain bound (explicit): the level < 2·cnt_max·2^{EWMA_LAGS},
    so int64 holds up to ~4.3e9 events per (event_type, day) — the
    scale at which both engines would raise under ANSI rather than
    silently wrap.

    Scale: the events→daily rollup is the ONE fact-sized shuffle
    (map-side partial counts); smoothing then runs on the
    calendar-bounded daily table — a self-join over a ≤{EWMA_LAGS + 1}-day
    band whose both sides are tiny at any corpus size (the
    ``q_hypertable_rollup`` discipline: aggregate once, serve
    analytics from the rollup). The band join broadcasts.
    """
    ev = Catalog(spark, sf_dir).events
    daily = (ev.groupBy("event_type",
                        F.date_trunc("day", "ts").cast("date").alias("d"))
             .agg(F.count("*").alias("cnt")))
    a, b = daily.alias("a"), daily.alias("b")
    diff = F.datediff(F.col("a.d"), F.col("b.d"))
    term = (F.col("b.cnt")
            * F.pow(F.lit(2.0), (F.lit(EWMA_LAGS) - diff).cast("double"))
            .cast("bigint"))
    sm = (a.join(F.broadcast(b),
                 (F.col("b.event_type") == F.col("a.event_type"))
                 & (diff >= 0) & (diff <= EWMA_LAGS))
          .groupBy(F.col("a.event_type").alias("event_type"),
                   F.col("a.d").alias("d"), F.col("a.cnt").alias("cnt"))
          .agg(F.sum(term).cast("bigint").alias("ewma_x2p")))
    return sm.select(
        "event_type", F.date_format("d", "yyyy-MM-dd").alias("day"), "cnt",
        "ewma_x2p",
        F.round(F.col("ewma_x2p") / F.pow(F.lit(2.0), EWMA_LAGS + 1), 6)
         .cast("double").alias("ewma"))
