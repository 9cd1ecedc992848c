"""Sketches and rollup reuse — the last of the named custom operators.

- ``q_sketch_kmv``: K-Minimum-Values distinct-count sketch. KMV keeps
  the k smallest hash values of a set; (k-1)/h_k (with h_k the k-th
  smallest, normalized to [0,1)) estimates the distinct count. Because
  the hash is the engine-portable md5 ``hex64`` and the k-th smallest of
  a fixed set is deterministic, the ESTIMATE itself is differentially
  checkable against DuckDB — unlike ``approx_count_distinct``, whose
  HLL internals are engine-private (``q_approx_distinct`` is instead
  checked through its self-validating bounded-error contract).
  At scale the k-smallest pass is a per-partition top-k merged on one
  tiny reducer: no global sort, state = k values per partition.

- ``q_hypertable_rollup``: continuous-aggregate pattern (hypertable
  rollup): a fine-grained hourly aggregate is the stored base; coarser
  windows are answered by RE-aggregating the hourly table, never the
  raw events. The oracle computes daily directly from raw events, so
  the hash match proves hourly→daily re-aggregation is lossless —
  the invariant that makes serving dashboards from rollups sound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..engine.catalog import Catalog
from ..engine.localdf import local_df
from ..functions.hashing import hex64, hex64_sql
from ..functions.text import token_ngrams_sql, tokens_sql
from .dedup import _shingled
from .registry import register

KMV_K = 256
_TWO60 = float(1 << 60)

_SHINGLES_SQL = f"list_distinct({token_ngrams_sql(tokens_sql('text'), 3)})"


@register(
    "q_sketch_kmv",
    oracle=f"""
WITH ex AS (
  SELECT DISTINCT unnest({_SHINGLES_SQL}) AS g FROM documents
), hs AS (
  SELECT DISTINCT {hex64_sql('g')} AS h FROM ex
), kth AS (
  SELECT MAX(h) AS hk FROM (SELECT h FROM hs ORDER BY h LIMIT {KMV_K})
), n AS (
  SELECT COUNT(*) AS true_distinct FROM hs
)
SELECT ROUND({KMV_K - 1}.0 * {_TWO60} / CAST(hk AS DOUBLE), 2) AS kmv_estimate,
       true_distinct
FROM kth CROSS JOIN n
""",
    description=f"KMV({KMV_K}) distinct-count sketch — estimate itself oracle-checked",
    tags=("sketch", "distinct", "custom"),
)
def q_sketch_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Hash BEFORE the distinct: hex64 is deterministic per shingle, so
    # distinct-on-hash equals hash-of-distinct — one exchange keyed on
    # 8-byte hashes instead of the r11 shape's TWO (a corpus-wide
    # exchange of raw shingle strings followed by a hash exchange).
    # Interleaved order-alternating paired reps at sf0.1: 1.16× in
    # this shape's favor, results hash-identical (BENCHNOTES r12).
    hs = (_shingled(spark, sf_dir)
          .select(hex64(F.col("g")).alias("h")).distinct())
    kth = (hs.orderBy("h").limit(KMV_K)          # TakeOrdered: per-partition
           .agg(F.max("h").alias("hk")))         # top-k, one tiny merge
    n = hs.agg(F.count("*").alias("true_distinct"))
    return (kth.crossJoin(n)
            .select(F.round(F.lit(float(KMV_K - 1)) * _TWO60
                            / F.col("hk").cast("double"), 2).alias("kmv_estimate"),
                    "true_distinct"))


@register(
    "q_hypertable_rollup",
    oracle="""
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       event_type,
       COUNT(*) AS n_events,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_value
FROM events
GROUP BY day, event_type
""",
    description="hypertable rollup: daily aggregates re-aggregated from the hourly base",
    tags=("rollup", "agg", "custom"),
)
def q_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    hourly = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(F.count("*").alias("n_events"),
             F.sum(F.col("value").cast("decimal(18,4)")).alias("sum_value"))
    )
    # Daily is served FROM the hourly rollup — counts sum, exact decimal
    # partials sum; the oracle aggregates the raw events directly, so a
    # hash match proves the re-aggregation is lossless.
    return (
        hourly.groupBy(F.date_format(F.date_trunc("day", "hour"), "yyyy-MM-dd").alias("day"),
                       "event_type")
        .agg(F.sum("n_events").alias("n_events"),
             F.round(F.sum("sum_value"), 2).cast("double").alias("sum_value"))
    )


@register(
    "q_sketch_kmv_merge",
    oracle=f"""
WITH ex AS (
  SELECT DISTINCT unnest({_SHINGLES_SQL}) AS g FROM documents
), hs AS (
  SELECT DISTINCT {hex64_sql('g')} AS h FROM ex
), kth AS (
  SELECT MAX(h) AS hk FROM (SELECT h FROM hs ORDER BY h LIMIT {KMV_K})
)
SELECT ROUND({KMV_K - 1}.0 * {_TWO60} / CAST(hk AS DOUBLE), 2) AS kmv_estimate,
       (SELECT COUNT(DISTINCT source) FROM documents) AS n_sources
FROM kth
""",
    description=f"KMV({KMV_K}) mergeability: per-source sketches merged == direct global sketch",
    tags=("sketch", "distinct", "merge", "custom"),
)
def q_sketch_kmv_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed-sketch mergeability, oracle-proved.

    Each document source keeps its own KMV sketch (k smallest distinct
    shingle hashes); the global sketch is the k smallest of the UNION of
    the per-source sketches. This is lossless: any of the k smallest
    global hashes lives in at least one source, where fewer than k
    hashes are smaller — so it is inside that source's sketch. The
    oracle computes the k-min DIRECTLY over all hashes; a hash match
    proves merged == direct, the invariant that lets 1000 executors keep
    k values each instead of shuffling a distinct set.
    """
    d = Catalog(spark, sf_dir).documents
    src = d.select("doc_id", "source")
    ex = (_shingled(spark, sf_dir)
          .join(F.broadcast(src), "doc_id")
          .select("source", hex64(F.col("g")).alias("h"))
          .distinct())
    # Per-source k-min via the salted two-phase (functions/skew.py):
    # a window partitioned by source alone would sort every distinct
    # hash through #sources tasks — the low-cardinality-window ceiling.
    from ..functions.skew import grouped_topk
    per_source = grouped_topk(ex, ["source"], [F.col("h")], KMV_K,
                              F.col("h")).select("source", "h")
    merged_kth = (per_source.select("h").distinct()
                  .orderBy("h").limit(KMV_K)
                  .agg(F.max("h").alias("hk")))
    n_sources = d.agg(F.countDistinct("source").alias("n_sources"))
    return (merged_kth.crossJoin(F.broadcast(n_sources))
            .select(F.round(F.lit(float(KMV_K - 1)) * _TWO60
                            / F.col("hk").cast("double"), 2).alias("kmv_estimate"),
                    "n_sources"))


# ---------------------------------------------------------------------------
# Approximate quantiles (the third sketch family: distinct → KMV,
# frequency → heavy hitters, rank → this).
# ---------------------------------------------------------------------------

APPROX_PCT_ERR = 0.01  # relative-rank accuracy target (1% of N)


_QUANT_PS = (0.5, 0.9, 0.99)
_QUANT_SLACK = 0.02  # bracket half-width in rank space (2× the 1% target)


@register(
    "q_approx_quantiles",
    oracle="SELECT COUNT(*) AS n_orders, TRUE AS p50_ok, TRUE AS p90_ok, "
           "TRUE AS p99_ok FROM orders",
    description="approx_percentile (p50/p90/p99 of order totals), "
                "hash-proved inside ±2% rank brackets",
    tags=("sketch", "quantiles", "agg"),
)
def q_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketch under a hashable rank-error contract.

    ``approx_percentile`` keeps a bounded summary per partition and
    merges summaries — one map-side-combined pass, state O(1/err), vs
    the exact percentile's full sort/shuffle of the column. At 100 TB
    the exact path is a terabyte-scale sort; the sketch is a scan.

    The sketch values are engine-private, so the hashable surface is the
    rank-error CONTRACT: each estimate must lie inside the exact-value
    bracket at rank p ± 2% (clamped to [0, 1] — p99's upper bound is the
    column max), computed entirely Spark-side so no cross-engine float
    comparison is involved; the oracle asserts the booleans TRUE. An
    estimate drifting outside its bracket hash-fails the row. The
    tighter 1% bound (accuracy = 1/err = 100) stays pinned in
    ``tests/test_sketches_quantiles.py``; the exact-percentile pass here
    is the verification harness, not the production operator.
    """
    o = Catalog(spark, sf_dir).orders
    acc = int(1 / APPROX_PCT_ERR)
    aps = ",".join(str(p) for p in _QUANT_PS)
    los = ",".join(str(max(p - _QUANT_SLACK, 0.0)) for p in _QUANT_PS)
    his = ",".join(str(min(p + _QUANT_SLACK, 1.0)) for p in _QUANT_PS)
    agg = o.agg(
        F.expr(f"approx_percentile(o_totalprice, array({aps}), {acc})").alias("ap"),
        F.expr(f"percentile(o_totalprice, array({los}))").alias("lo"),
        F.expr(f"percentile(o_totalprice, array({his}))").alias("hi"),
        F.count("*").alias("n_orders"),
    )
    ok = [
        # Empty input: the sketch (and the brackets) are NULL with
        # nothing to check — vacuously in-bound, as the oracle's literal
        # TRUE says. coalesce, not when: a NULL estimate over NON-empty
        # input must stay a failure, so the fallback is n_orders = 0.
        F.coalesce((F.col("ap")[i] >= F.col("lo")[i])
                   & (F.col("ap")[i] <= F.col("hi")[i]),
                   F.col("n_orders") == 0).alias(f"p{int(p * 100)}_ok")
        for i, p in enumerate(_QUANT_PS)
    ]
    return agg.select("n_orders", *ok)


@register(
    "q_approx_quantiles_grouped",
    oracle="SELECT event_type, COUNT(*) AS n_events, TRUE AS p50_ok, "
           "TRUE AS p90_ok, TRUE AS p99_ok FROM events GROUP BY event_type",
    description="per-group approx_percentile (p50/p90/p99 of event value "
                "by event_type), each group hash-proved inside ±2% rank brackets",
    tags=("sketch", "quantiles", "agg", "events"),
)
def q_approx_quantiles_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``q_approx_quantiles``' contract applied PER GROUP — the shape a
    monitoring pipeline actually runs (latency quantiles per endpoint,
    value quantiles per event type). One hash exchange on the group key
    carries bounded sketch summaries, not values: map-side partial
    sketches merge associatively, so the shuffle payload per group is
    O(1/err) regardless of group size — at 100 TB the exact per-group
    percentile would sort every group's full value set instead.

    Hashable surface as in the global variant: per-group booleans
    asserting each estimate lies inside the exact rank ± 2% bracket,
    computed Spark-side; the oracle pins group keys, counts and TRUEs.
    """
    ev = Catalog(spark, sf_dir).events
    acc = int(1 / APPROX_PCT_ERR)
    aps = ",".join(str(p) for p in _QUANT_PS)
    los = ",".join(str(max(p - _QUANT_SLACK, 0.0)) for p in _QUANT_PS)
    his = ",".join(str(min(p + _QUANT_SLACK, 1.0)) for p in _QUANT_PS)
    agg = ev.groupBy("event_type").agg(
        F.expr(f"approx_percentile(value, array({aps}), {acc})").alias("ap"),
        F.expr(f"percentile(value, array({los}))").alias("lo"),
        F.expr(f"percentile(value, array({his}))").alias("hi"),
        F.count("*").alias("n_events"),
    )
    ok = [
        F.coalesce((F.col("ap")[i] >= F.col("lo")[i])
                   & (F.col("ap")[i] <= F.col("hi")[i]),
                   F.col("n_events") == 0).alias(f"p{int(p * 100)}_ok")
        for i, p in enumerate(_QUANT_PS)
    ]
    return agg.select("event_type", "n_events", *ok)


# ---------------------------------------------------------------------------
# Count-min sketch: mergeable frequency estimates with a provable bound.
# ---------------------------------------------------------------------------

CMS_ROWS = 4            # depth d: independent hash rows
CMS_WIDTH = 256         # width w: overcount <= bound with pr 1-(1/3)^d
CMS_PROBES = ("the", "data", "spark", "table", "row", "merge")


def _cms_oracle() -> str:
    from ..functions.text import tokens_sql
    toks = tokens_sql("text")
    tok_h = [hex64_sql("'cms%d|' || tok" % r) for r in range(CMS_ROWS)]
    probe_h = [hex64_sql("'cms%d|' || token" % r) for r in range(CMS_ROWS)]
    rb = "\n  UNION ALL\n  ".join(
        f"SELECT {r} AS r, {tok_h[r]} % {CMS_WIDTH} AS b, cnt FROM tc"
        for r in range(CMS_ROWS))
    probes = ", ".join(f"('{t}')" for t in CMS_PROBES)
    prb = "\n  UNION ALL\n  ".join(
        f"SELECT token, {r} AS r, {probe_h[r]} % {CMS_WIDTH} AS b FROM probes"
        for r in range(CMS_ROWS))
    return f"""
WITH tok AS (
  SELECT g AS tok FROM documents, UNNEST({toks}) AS u(g)
), tc AS (
  SELECT tok, COUNT(*) AS cnt FROM tok GROUP BY tok
), rb AS (
  {rb}
), totals AS (
  SELECT r, b, CAST(SUM(cnt) AS BIGINT) AS total FROM rb GROUP BY r, b
), n AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_tokens FROM tok
), probes(token) AS (VALUES {probes}
), prb AS (
  {prb}
), est AS (
  SELECT p.token, MIN(COALESCE(t.total, 0)) AS cms_est
  FROM prb p LEFT JOIN totals t ON t.r = p.r AND t.b = p.b
  GROUP BY p.token
), tru AS (
  SELECT p.token, COALESCE(c.cnt, 0) AS true_cnt
  FROM probes p LEFT JOIN tc c ON c.tok = p.token
)
SELECT e.token, CAST(e.cms_est AS BIGINT) AS cms_est,
       CAST(t.true_cnt AS BIGINT) AS true_cnt,
       CAST(e.cms_est - t.true_cnt AS BIGINT) AS overcount,
       CAST(e.cms_est >= t.true_cnt AS INTEGER) AS ok_lower,
       CAST(e.cms_est - t.true_cnt
            <= 3 * (SELECT n_tokens FROM n) / {CMS_WIDTH} AS INTEGER) AS ok_bound
FROM est e JOIN tru t USING (token)
"""


def _cms_bucket(col, r):
    return hex64(F.concat(F.lit(f"cms{r}|"), col)) % CMS_WIDTH


def _cms_probe_report(spark: SparkSession, toks: DataFrame,
                      totals: DataFrame) -> DataFrame:
    """Shared probe-estimate tail for the CMS twins: estimates from the
    cell-totals table, TRUE counts from a probe-FILTERED token stream
    (the 6-token IN-filter pushes into the scan — no vocabulary-wide
    aggregate), and the corpus size read off the sketch itself (row 0's
    cells partition all token occurrences), so serving adds no extra
    corpus pass."""
    probes = local_df(spark, [(t,) for t in CMS_PROBES], "token string")
    prb = probes.select("token", F.explode(F.array(*[
        F.struct(F.lit(r).alias("r"), _cms_bucket(F.col("token"), r).alias("b"))
        for r in range(CMS_ROWS)])).alias("rb")).select("token", "rb.r", "rb.b")
    est = (prb.join(F.broadcast(totals), ["r", "b"], "left")
           .groupBy("token")
           .agg(F.min(F.coalesce("total", F.lit(0))).alias("cms_est")))
    tru = (probes.join(toks.where(F.col("tok").isin(*CMS_PROBES))
                       .groupBy("tok").agg(F.count("*").alias("cnt")),
                       probes.token == F.col("tok"), "left")
           .select("token", F.coalesce("cnt", F.lit(0)).alias("true_cnt")))
    n = (totals.where(F.col("r") == 0)
         .agg(F.coalesce(F.sum("total"), F.lit(0)).alias("n_tokens")))
    return (est.join(tru, "token").crossJoin(F.broadcast(n))
            .select("token",
                    F.col("cms_est").cast("bigint").alias("cms_est"),
                    F.col("true_cnt").cast("bigint").alias("true_cnt"),
                    (F.col("cms_est") - F.col("true_cnt")).cast("bigint")
                     .alias("overcount"),
                    (F.col("cms_est") >= F.col("true_cnt")).cast("int")
                     .alias("ok_lower"),
                    ((F.col("cms_est") - F.col("true_cnt"))
                     <= 3 * F.col("n_tokens") / CMS_WIDTH).cast("int")
                     .alias("ok_bound")))


@register(
    "q_sketch_cms",
    oracle=_cms_oracle(),
    description=f"count-min sketch ({CMS_ROWS}x{CMS_WIDTH}): point estimates "
                "for probe tokens with the one-sided error bound checked",
    tags=("sketch", "frequency", "custom"),
)
def q_sketch_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch — the MERGEABLE frequency summary (Misra-Gries
    in ``q_heavy_hitters`` is exact-after-recount but merge-hostile;
    CMS cells add, so shards/days/streams combine by cell-wise sum —
    why production pipelines keep CMS beside heavy hitters). The sketch
    is d×w bucket totals; a token estimate is the MIN over its d row
    buckets — never below the true count, overshooting by at most
    3·N/w here (checked as a column, not assumed).

    Exactness: the hash family is the engine's portable md5 path with
    literal row salts, so bucket assignment and every cell total are
    integers both engines compute identically — the sketch itself is
    hash-exact, not just its contract.

    Scale: the 4× bucket explode partial-aggregates to <= d·w cells per
    task BEFORE its one exchange (the whole shuffle payload is the
    1024-cell table), probes join the broadcast cell table, and the
    true-count side touches only probe tokens. State is O(d·w),
    corpus-size-free — the CMS property.
    """
    from ..functions.text import tokens
    d = Catalog(spark, sf_dir).documents
    toks = d.select(F.explode(tokens("text")).alias("tok"))
    pairs = toks.select(F.explode(F.array(*[
        F.struct(F.lit(r).alias("r"), _cms_bucket(F.col("tok"), r).alias("b"))
        for r in range(CMS_ROWS)])).alias("rb")).select("rb.r", "rb.b")
    totals = pairs.groupBy("r", "b").agg(F.count("*").alias("total"))
    return _cms_probe_report(spark, toks, totals)


@register(
    "q_sketch_cms_merge",
    oracle=_cms_oracle(),
    description="CMS mergeability proof: per-source sketches summed cell-wise "
                "equal the one-shot global sketch (same oracle)",
    tags=("sketch", "frequency", "merge", "custom"),
)
def q_sketch_cms_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The property that makes CMS the production frequency sketch: a
    sketch PER SOURCE (shard / day / stream partition), merged by
    cell-wise addition, is byte-identical to sketching the whole corpus
    at once — so frequency monitoring never rescans history. This query
    builds the per-source sketches explicitly, merges them, and serves
    the same probe estimates as ``q_sketch_cms``; the oracle is the
    one-shot oracle VERBATIM, so the driver hash IS the merge proof
    (the ``q_sketch_kmv_merge`` pattern).

    Scale: the per-source pass adds `source` to the cell key — state
    sources x d x w, still corpus-size-free — and the merge is a second
    tiny aggregation over cell partials.
    """
    from ..functions.text import tokens
    d = Catalog(spark, sf_dir).documents
    toks = d.select(F.explode(tokens("text")).alias("tok"))
    src_toks = d.select("source", F.explode(tokens("text")).alias("tok"))
    pairs = src_toks.select("source", F.explode(F.array(*[
        F.struct(F.lit(r).alias("r"), _cms_bucket(F.col("tok"), r).alias("b"))
        for r in range(CMS_ROWS)])).alias("rb")).select("source", "rb.r", "rb.b")
    per_source = pairs.groupBy("source", "r", "b").agg(
        F.count("*").alias("total"))
    merged = per_source.groupBy("r", "b").agg(F.sum("total").alias("total"))
    return _cms_probe_report(spark, toks, merged)




# ---------------------------------------------------------------------------
# Bloom filter: build over a key set, probe for membership + measured FPP.
# ---------------------------------------------------------------------------

BLOOM_M = 1 << 14        # bits
BLOOM_K = 4              # hash functions
# The "guaranteed absent" probe cohort is every custkey shifted by the
# OBSERVED max custkey (shifted keys land in (max, 2*max] — strictly
# outside the key domain at ANY scale factor). A fixed constant shift
# would silently stop being out-of-domain once custkeys outgrow it
# (c_custkey reaches 10M at roughly sf67), turning "false positives"
# into real members and breaking the claim, not the hash.


def _bloom_pos_sql(i: int, expr: str) -> str:
    inner = f"'bloom{i}|' || CAST({expr} AS VARCHAR)"
    return f"{hex64_sql(inner)} % {BLOOM_M}"


@register(
    "q_sketch_bloom",
    oracle=f"""
WITH keys AS (
  SELECT DISTINCT o_custkey AS k FROM orders
), bits AS (
  SELECT DISTINCT b FROM keys, UNNEST([{', '.join(_bloom_pos_sql(i, 'k') for i in range(BLOOM_K))}]) AS u(b)
), shifted AS (
  SELECT c_custkey + (SELECT MAX(c_custkey) FROM customer) AS k FROM customer
), probe_sh AS (
  SELECT s.k, COUNT(*) AS hits
  FROM shifted s, UNNEST([{', '.join(_bloom_pos_sql(i, 's.k') for i in range(BLOOM_K))}]) AS u(b)
  JOIN bits USING (b) GROUP BY s.k
)
SELECT CAST({BLOOM_M} AS BIGINT) AS m, CAST({BLOOM_K} AS BIGINT) AS k,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM keys) AS n_keys,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM bits) AS bits_set,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM shifted) AS n_shifted,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM probe_sh WHERE hits = {BLOOM_K}) AS fp_shifted
""",
    description=f"Bloom filter m={BLOOM_M} k={BLOOM_K} over order custkeys: "
                "build + two probe cohorts, measured false-positive counts "
                "oracle-checked bit-for-bit",
    tags=("sketch", "membership", "custom"),
)
def q_sketch_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership sketch — the set-membership sibling of
    KMV (distinct count) and CMS (frequency): the structure a 100 TB
    pipeline ships to cheaply pre-filter joins ("has this customer ever
    ordered?") before touching the fact table. Spark's own runtime
    bloom pushdown (pinned in ``tests/test_plans.py``) is opaque
    engine-internal state; THIS one is an md5-derived, engine-portable
    bloom whose every bit DuckDB reproduces, so the driver hash checks
    the sketch itself — build and probe.

    Semantics: k={BLOOM_K} bit positions per key via the shared
    ``hex64`` md5 family mod m={BLOOM_M}; the filter is the distinct
    set of set bits. The probe cohort is every customer key shifted by
    the OBSERVED max custkey (a 1-row broadcast, not a per-SF constant)
    — shifted keys land in (max, 2*max], strictly outside the domain at
    any scale factor, so the cohort is guaranteed absent and every positive
    is a FALSE positive and the reported count is the measured FPP
    numerator (12/1500 at sf0.01, consistent with the
    (1-e^(-kn/m))^k ≈ 0.9% expectation). Members are not probed
    separately: their positivity is definitional (every bit they'd
    test was set by their own insert — no false negatives by
    construction, asserted in ``tests/test_sketches_quantiles.py``).
    An in-domain absent cohort (customers without orders) would be the
    natural third column, but THIS corpus gives every customer at
    least one order — the cohort is structurally empty here, so it is
    omitted rather than shipped as a dead column.

    Scale: the key distinct is one shuffle keyed on the key (map-side
    partial); the bit table is <= m rows — corpus-size-FREE state that
    broadcasts to both probe joins; probes are map-side explodes (k
    rows per key) joined against the broadcast bits with one per-key
    count shuffle. Nothing anywhere holds state proportional to the
    corpus: this is the sketch contract, same as CMS/KMV above.
    """
    cat = Catalog(spark, sf_dir)
    # keys feeds the bit build AND the n_keys count, bits the probe
    # broadcast AND the bits_set count — left UN-persisted on purpose:
    # the repeated subtrees are byte-identical Exchanges, so Spark's
    # ReuseExchange already computes each once within this single plan,
    # and an explicit persist() measured SLOWER paired (1.59 vs 1.03 s
    # idle min at sf0.1, BENCHNOTES r11) because it splits the plan
    # into separate materialization jobs and defeats whole-plan reuse.
    keys = cat.orders.select(F.col("o_custkey").alias("k")).distinct()

    def positions(kcol):
        return F.array(*[
            (hex64(F.concat(F.lit(f"bloom{i}|"), kcol.cast("string")))
             % BLOOM_M).cast("bigint")
            for i in range(BLOOM_K)])

    bits = keys.select(F.explode(positions(F.col("k"))).alias("b")).distinct()

    def probe_hits(df):
        return (df.select("k", F.explode(positions(F.col("k"))).alias("b"))
                .join(F.broadcast(bits), "b")
                .groupBy("k").agg(F.count("*").alias("hits")))

    # One customer aggregate carries BOTH the domain max (the shift)
    # and the cohort size — n_shifted == COUNT(customer) by
    # construction, so the separate cohort-count scan was pure waste.
    cust = cat.customer.agg(
        F.max("c_custkey").alias("mx"),
        F.count("*").cast("bigint").alias("n_shifted"))
    shifted = (cat.customer.crossJoin(F.broadcast(cust))
               .select((F.col("c_custkey") + F.col("mx"))
                       .cast("bigint").alias("k")))

    def cnt(df, name):
        return df.agg(F.count("*").cast("bigint").alias(name))

    fp_sh = cnt(probe_hits(shifted).where(F.col("hits") == BLOOM_K), "fp_shifted")
    row = (cnt(keys, "n_keys")
           .crossJoin(F.broadcast(cnt(bits, "bits_set")))
           .crossJoin(F.broadcast(cust.select("n_shifted")))
           .crossJoin(F.broadcast(fp_sh)))
    return row.select(
        F.lit(BLOOM_M).cast("bigint").alias("m"),
        F.lit(BLOOM_K).cast("bigint").alias("k"),
        "n_keys", "bits_set", "n_shifted", "fp_shifted")
