"""Deterministic sampling / split operators for training-data pipelines.

Random sampling (``TABLESAMPLE``, ``df.sample``) is partitioning- and
seed-implementation-dependent, which makes results unreproducible across
engines and cluster layouts — unacceptable for train/eval splits whose
membership must be stable forever. These operators derive membership
from a content hash instead (md5 via ``functions.hashing`` — identical
in every engine): a row's split assignment depends only on its key,
never on layout, so re-running on a re-partitioned 100 TB corpus yields
byte-identical splits, and adding rows never reassigns existing ones —
the property that keeps eval sets uncontaminated across dataset
versions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..engine.catalog import Catalog
from ..functions.hashing import hex64, hex64_sql
from .registry import register

SAMPLE_PCT = 10        # deterministic ~10% sample
STRATUM_K = 20         # docs per language stratum
SPLIT_EVAL_PCT = 10    # train/eval split fraction


@register(
    "sample_deterministic",
    oracle=f"""
SELECT doc_id, lang, n_chars
FROM documents
WHERE {hex64_sql("CAST(doc_id AS VARCHAR)")} % 100 < {SAMPLE_PCT}
""",
    description=f"hash-based ~{SAMPLE_PCT}% sample — layout-independent, reproducible membership",
    tags=("sampling", "filter"),
)
def sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    return (d.where(hex64(F.col("doc_id").cast("string")) % 100 < SAMPLE_PCT)
            .select("doc_id", "lang", "n_chars"))


@register(
    "sample_stratified",
    oracle=f"""
SELECT lang, doc_id, rank
FROM (SELECT lang, doc_id,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY {hex64_sql("CAST(doc_id AS VARCHAR)")}, doc_id) AS BIGINT) AS rank
      FROM documents)
WHERE rank <= {STRATUM_K}
""",
    description=f"stratified sample: {STRATUM_K} docs per language in hash order",
    tags=("sampling", "window"),
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.skew import grouped_topk
    d = Catalog(spark, sf_dir).documents
    # skew-proof per-language k-min (grouped_topk): a naive
    # lang-partitioned full sort would rank the whole corpus on
    # #languages tasks; the partial WindowGroupLimit bounds it
    ranked = grouped_topk(
        d.select("lang", "doc_id"), ["lang"],
        [hex64(F.col("doc_id").cast("string")), F.col("doc_id")],
        STRATUM_K, F.col("doc_id"))
    return ranked.select("lang", "doc_id", F.col("rank").cast("bigint").alias("rank"))


@register(
    "split_train_eval",
    oracle=f"""
SELECT split, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM (SELECT CASE WHEN {hex64_sql("'split|' || CAST(doc_id AS VARCHAR)")} % 100 < {SPLIT_EVAL_PCT}
                  THEN 'eval' ELSE 'train' END AS split,
             n_chars
      FROM documents)
GROUP BY split
""",
    description=f"content-hash train/eval split ({SPLIT_EVAL_PCT}% eval), membership stable under appends",
    tags=("sampling", "agg"),
)
def split_train_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    bucket = hex64(F.concat(F.lit("split|"), F.col("doc_id").cast("string"))) % 100
    return (
        d.select(F.when(bucket < SPLIT_EVAL_PCT, "eval").otherwise("train").alias("split"),
                 "n_chars")
        .groupBy("split")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars"))
    )


WEIGHTED_K = 200       # weighted sample size
_W_U_MOD = 1_000_000   # uniform resolution for the exponential race


@register(
    "sample_weighted",
    oracle=f"""
WITH keyed AS (
  SELECT doc_id, n_chars,
         ROUND(ln((({hex64_sql("'wsample|' || CAST(doc_id AS VARCHAR)")} % {_W_U_MOD}) + 1)
                  / {_W_U_MOD + 1}.0) / n_chars, 10) AS race_key
  FROM documents
), ranked AS (
  SELECT doc_id, n_chars, race_key,
         ROW_NUMBER() OVER (ORDER BY race_key DESC, doc_id) AS rank
  FROM keyed
)
SELECT CAST(rank AS BIGINT) AS rank, doc_id, n_chars, race_key
FROM ranked WHERE rank <= {WEIGHTED_K}
""",
    description=f"weighted sample without replacement ({WEIGHTED_K} docs, weight=n_chars) via exponential race keys",
    tags=("sampling", "weighted", "topk"),
)
def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis A-Res):
    each row draws a deterministic uniform u from its content hash and
    races with key ln(u)/w — the k largest keys are a weighted sample
    without replacement, computed in ONE distributed top-k pass (no
    sequential draws, no rejection loop). Weight here is ``n_chars``
    (longer docs proportionally likelier), the usual "sample by token
    budget" curation step.

    Scale shape: map-side key computation + skew-proof grouped top-k
    (``functions/skew.py::grouped_topk``; on this runtime the constant
    group compiles to TakeOrderedAndProject — per-partition heaps, one
    k-row merge, zero exchanges, rank window over k survivors) — the
    same plan as ``q_sort_limit``, never a global sort. The uniform is a 6-digit
    integer from md5 (identical in both engines); ln() of an identical
    double then rounds at 1e-10, far above the ≤1-ulp libm divergence,
    so the race order is engine-independent.
    """
    from ..functions.skew import grouped_topk
    d = Catalog(spark, sf_dir).documents
    u = (hex64(F.concat(F.lit("wsample|"), F.col("doc_id").cast("string")))
         % _W_U_MOD + 1) / F.lit(float(_W_U_MOD + 1))
    keyed = d.select(
        "doc_id", "n_chars",
        F.round(F.log(u) / F.col("n_chars"), 10).alias("race_key"),
    ).withColumn("_g", F.lit(0))
    top = grouped_topk(keyed, ["_g"],
                       [F.desc("race_key"), F.asc("doc_id")],
                       WEIGHTED_K, F.col("doc_id"))
    return top.select(F.col("rank").cast("bigint").alias("rank"),
                      "doc_id", "n_chars", "race_key")


DOMAIN_CAP = 15        # max docs kept per source/domain


@register(
    "sample_domain_cap",
    oracle=f"""
WITH ranked AS (
  SELECT source, doc_id, n_chars,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY {hex64_sql("'domcap|' || CAST(doc_id AS VARCHAR)")}, doc_id) AS rn
  FROM documents
)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN rn <= {DOMAIN_CAP} THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN rn <= {DOMAIN_CAP} THEN n_chars ELSE 0 END) AS BIGINT)
         AS chars_kept
FROM ranked GROUP BY source
""",
    description=f"per-domain quota: keep <= {DOMAIN_CAP} docs per source in "
                "content-hash order, report kept/total per domain",
    tags=("sampling", "curation", "agg"),
)
def sample_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain quota enforcement — the curation step that stops a few
    crawler-heavy domains from dominating the training mixture: keep at
    most DOMAIN_CAP documents per source, chosen in content-hash order
    (deterministic, layout-independent, stable under appends — a doc
    already kept stays kept unless hash-earlier docs arrive), and report
    kept vs total per domain so the mixture shift is auditable.

    Scale: membership is the skew-proof per-group top-k
    (``functions/skew.py::grouped_topk``) — hot domains are exactly the
    skew case it handles, since a crawl's domain histogram is Zipfian:
    the partial WindowGroupLimit caps a hot domain at ≤ cap rows per
    map partition before the shuffle. The kept-side aggregate is domain-sized and broadcast back
    onto the domain totals; no row-level join, no global sort.
    """
    from ..functions.skew import grouped_topk
    d = Catalog(spark, sf_dir).documents
    h = hex64(F.concat(F.lit("domcap|"), F.col("doc_id").cast("string")))
    kept = grouped_topk(d.select("source", "doc_id", "n_chars"),
                        ["source"], [h.asc(), F.col("doc_id").asc()],
                        DOMAIN_CAP, F.col("doc_id"))
    kept_agg = (kept.groupBy("source")
                .agg(F.count("*").alias("n_kept"),
                     F.sum("n_chars").alias("chars_kept")))
    totals = d.groupBy("source").agg(F.count("*").alias("n_docs"))
    return (totals.join(F.broadcast(kept_agg), "source")
            .select("source", "n_docs", "n_kept",
                    F.col("chars_kept").cast("bigint").alias("chars_kept")))


# ---------------------------------------------------------------------------
# Temperature-rebalanced domain mixture (UNIMAX-style alpha sampling).
# ---------------------------------------------------------------------------

TEMP_WEIGHT_Q = 1000   # sqrt(count) quantized to integer thousandths
TEMP_BUDGET_DEN = 2    # keep budget = total_docs / 2


@register(
    "sample_temperature",
    oracle=f"""
WITH c AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang
), s AS (
  SELECT lang, n_docs,
         CAST(FLOOR(sqrt(n_docs) * {TEMP_WEIGHT_Q}) AS BIGINT) AS weight_x1000
  FROM c
), tot AS (
  SELECT CAST(SUM(weight_x1000) AS BIGINT) AS sw,
         CAST(SUM(n_docs) AS BIGINT) AS n FROM s
), t AS (
  SELECT lang, n_docs, weight_x1000,
         LEAST(n_docs, ((n // {TEMP_BUDGET_DEN}) * weight_x1000) // sw)
           AS n_target
  FROM s, tot
), ranked AS (
  SELECT lang, doc_id, n_chars,
         ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY {hex64_sql("'temp|' || CAST(doc_id AS VARCHAR)")}, doc_id) AS rn
  FROM documents
), kept AS (
  SELECT r.lang, CAST(COUNT(*) AS BIGINT) AS n_kept,
         CAST(SUM(r.n_chars) AS BIGINT) AS chars_kept
  FROM ranked r JOIN t USING (lang)
  WHERE r.rn <= t.n_target
  GROUP BY r.lang
)
SELECT t.lang, t.n_docs, t.weight_x1000, t.n_target,
       COALESCE(kept.n_kept, 0) AS n_kept,
       COALESCE(kept.chars_kept, 0) AS chars_kept
FROM t LEFT JOIN kept USING (lang)
""",
    description=f"temperature-rebalanced mixture (alpha=0.5): per-language "
                f"targets ∝ sqrt(count), 1/{TEMP_BUDGET_DEN} corpus budget, "
                f"content-hash membership",
    tags=("sampling", "curation", "agg"),
)
def sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-rebalanced language mixture — the multilingual
    curation step (UNIMAX / alpha-sampling family): keep a corpus-half
    budget allocated across languages ∝ count^alpha with alpha = 0.5,
    so the head language (en, ~44% of this corpus) shrinks toward the
    tail instead of dominating by raw mass. ``sample_domain_cap`` is
    the hard-cap variant of the same idea over sources; this one
    reallocates proportionally over the SKEWED dimension (sources are
    uniform in this corpus; languages are the Zipfian one).

    Determinism across engines, no floats in any comparison: the only
    irrational step, sqrt(count), is computed ONCE per domain on an
    exact-in-double integer (IEEE-754 sqrt is correctly rounded in
    both the JVM and DuckDB's libm) and immediately floor-quantized to
    integer thousandths; everything after — the weight sum, the
    target ``(budget * w) DIV sum_w``, the rank cutoff — is pure
    int64, order-free. (At petabyte doc counts the budget*weight
    product needs DECIMAL(38); bigint holds to ~9e18, fine at any
    gate scale and flagged here for the deployment.)

    Membership is content-hash order per lang (stable under layout
    and appends, the ``sample_*`` family invariant). Scale shape: two
    domain-sized aggregates, one 1-row scalar broadcast, and a
    row_number window partitioned by lang — one lang-keyed exchange of
    slim (lang, doc_id, n_chars) triples. A Zipfian-hot language
    concentrates its window partition, and AQE skew handling does NOT
    apply to window exchanges (joins only) — at a pathological head
    domain a deployment swaps the window for the two-phase exact rank
    ``corpus_shuffle`` pins (per-(lang, hash-salt) local row_number +
    broadcast per-salt offsets), trading one extra domain-sized
    exchange for bounded per-partition sorts; at this corpus's 5-way
    lang split the single window is the cheaper plan. The report is
    domain-sized; per-doc membership never leaves the executors."""
    d = Catalog(spark, sf_dir).documents
    c = d.groupBy("lang").agg(F.count("*").cast("bigint").alias("n_docs"))
    s = c.withColumn(
        "weight_x1000",
        F.floor(F.sqrt(F.col("n_docs")) * TEMP_WEIGHT_Q).cast("bigint"))
    tot = s.agg(F.sum("weight_x1000").cast("bigint").alias("sw"),
                F.sum("n_docs").cast("bigint").alias("n"))
    t = (s.crossJoin(F.broadcast(tot))
         .withColumn(
             "n_target",
             F.least(F.col("n_docs"),
                     F.expr(f"((n DIV {TEMP_BUDGET_DEN}) * weight_x1000) "
                            f"DIV sw")))
         .select("lang", "n_docs", "weight_x1000", "n_target"))

    from pyspark.sql import Window
    h = hex64(F.concat(F.lit("temp|"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("lang").orderBy(h.asc(), F.col("doc_id").asc())
    ranked = (d.select("lang", "doc_id", "n_chars")
              .withColumn("rn", F.row_number().over(w)))
    kept = (ranked.join(F.broadcast(t.select("lang", "n_target")), "lang")
            .where(F.col("rn") <= F.col("n_target"))
            .groupBy("lang")
            .agg(F.count("*").cast("bigint").alias("n_kept"),
                 F.sum("n_chars").cast("bigint").alias("chars_kept")))
    return (t.join(F.broadcast(kept), "lang", "left")
            .select("lang", "n_docs", "weight_x1000", "n_target",
                    F.coalesce("n_kept", F.lit(0)).cast("bigint")
                     .alias("n_kept"),
                    F.coalesce("chars_kept", F.lit(0)).cast("bigint")
                     .alias("chars_kept")))
