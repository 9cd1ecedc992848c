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
    # salted two-phase per-language k-min: a lang-partitioned window
    # would rank the whole corpus on #languages tasks
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
