"""Wire-format round-trip queries (the reference's identity pipelines).

The reference's two integration oracles are identity pipes — Avro bytes
in, same tweets out (``integration/KafkaStormSpec.scala:257-260``,
``KafkaSparkStreamingSpec.scala:243-247``). These queries reproduce that
as batch operators over the testdata: construct tweets deterministically
from documents, encode to the reference's exact Avro binary wire format,
decode back, and return the decoded rows. The DuckDB oracle is the
identity construction — any serde asymmetry breaks the hash match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..engine.catalog import Catalog
from ..sources.serde import (
    TWEET_SCHEMA, decode_tweet_avro, encode_tweet_avro, from_json_bytes,
    to_json_bytes,
)
from .registry import register

_TWEETS_ORACLE = """
SELECT 'user_' || (doc_id % 50) AS username,
       text,
       n_chars * 1000 AS timestamp
FROM documents
"""


def _tweets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic tweet fixture derived from documents (analog of the
    reference's 3-tweet fixture, KafkaSpec.scala:35-47, at table scale)."""
    d = Catalog(spark, sf_dir).documents
    return d.select(
        F.concat(F.lit("user_"), (F.col("doc_id") % 50)).alias("username"),
        F.col("text"),
        (F.col("n_chars") * 1000).alias("timestamp"),
    )


@register(
    "avro_roundtrip",
    oracle=_TWEETS_ORACLE,
    description="Avro-binary encode→decode identity pipe (reference §3.2/§3.3 oracle)",
    tags=("serde", "avro"),
)
def avro_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _tweets(spark, sf_dir)
    encoded = t.select(
        encode_tweet_avro("username", "text", "timestamp").alias("value"))
    decoded = encoded.select(decode_tweet_avro(F.col("value"), "PERMISSIVE").alias("pojo"))
    # reference T1 semantics: drop records that failed to decode
    return (decoded.where(F.col("pojo.username").isNotNull())
            .select("pojo.username", "pojo.text", "pojo.timestamp"))


@register(
    "json_roundtrip",
    oracle=_TWEETS_ORACLE,
    description="JSON encode→decode identity pipe (Catalyst-only serde path)",
    tags=("serde", "json"),
)
def json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _tweets(spark, sf_dir)
    return from_json_bytes(to_json_bytes(t, ["username", "text", "timestamp"]),
                           TWEET_SCHEMA)


@register(
    "json_deadletter",
    oracle="""
SELECT CASE WHEN doc_id % 10 = 0 THEN 'dead' ELSE 'ok' END AS channel,
       COUNT(*) AS n
FROM documents
GROUP BY channel
""",
    description="dead-letter channel: corrupt payloads routed, not dropped (SURVEY §7 risk 3)",
    tags=("serde", "json", "deadletter"),
)
def json_deadletter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Third error mode beyond the reference's drop (T1) and throw (T2):
    decode failures become rows on a dead-letter channel carrying the
    raw payload, so bad data is quarantined and auditable instead of
    silently vanishing — the posture a 100 TB ingest actually needs.
    Corruption is injected deterministically (every 10th doc's JSON is
    truncated) so the channel split has an exact oracle.
    """
    # Build payloads keyed by doc_id, truncating every 10th to invalid JSON.
    src = Catalog(spark, sf_dir).documents.select(
        "doc_id",
        F.to_json(F.struct(
            F.concat(F.lit("user_"), (F.col("doc_id") % 50)).alias("username"),
            F.col("text"),
            (F.col("n_chars") * 1000).alias("timestamp"),
        )).alias("payload"))
    corrupted = src.select(
        "doc_id",
        F.when(F.col("doc_id") % 10 == 0, F.substring("payload", 1, 5))
        .otherwise(F.col("payload")).alias("payload"))
    decoded = corrupted.select(
        "doc_id", "payload",
        F.from_json("payload", TWEET_SCHEMA).alias("pojo"))
    routed = decoded.select(
        F.when(F.col("pojo").isNull() | F.col("pojo.username").isNull(), "dead")
        .otherwise("ok").alias("channel"))
    return routed.groupBy("channel").agg(F.count("*").alias("n"))


# ---------------------------------------------------------------------------
# Columnar/text file-format round-trips: the engine reads and writes more
# than parquet. Each query writes the documents table out in the format
# under test, reads it back, and aggregates — the oracle aggregates the
# original table directly, so any serde asymmetry (type widening, quote/
# escape handling, null round-trip) breaks the hash match.
# ---------------------------------------------------------------------------

_FMT_ORACLE = """
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(('0x' || substring(md5(text), 1, 15))::BIGINT % 1000000007) AS BIGINT)
         AS text_checksum
FROM documents
GROUP BY lang
"""


def _format_roundtrip(spark: SparkSession, sf_dir: str, fmt: str) -> DataFrame:
    from ..engine.scratch import scratch_dir
    from ..functions.hashing import hex64
    d = Catalog(spark, sf_dir).documents.select(
        "doc_id", "text", "lang", "source", "n_chars")
    path = scratch_dir(f"fsbd_{fmt}_rt_")
    writer = d.write.mode("overwrite")
    reader = spark.read
    if fmt == "csv":
        # quote/escape must survive arbitrary text payloads.
        writer = writer.option("header", True).option("escape", '"')
        reader = reader.option("header", True).option("escape", '"')
    getattr(writer, fmt)(path)
    back = getattr(reader.schema(d.schema), fmt)(path)
    return (back.groupBy("lang")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_chars").alias("total_chars"),
                 F.sum(hex64(F.col("text")) % 1000000007).alias("text_checksum")))


@register(
    "q_csv_roundtrip",
    oracle=_FMT_ORACLE,
    description="CSV write→read identity (header, quoting/escaping) over documents",
    tags=("source", "format", "csv"),
)
def q_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _format_roundtrip(spark, sf_dir, "csv")


@register(
    "q_orc_roundtrip",
    oracle=_FMT_ORACLE,
    description="ORC write→read identity over documents",
    tags=("source", "format", "orc"),
)
def q_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _format_roundtrip(spark, sf_dir, "orc")


# ---------------------------------------------------------------------------
# Small-files compaction.
# ---------------------------------------------------------------------------

COMPACT_TARGET_BYTES = 64 * 1024 * 1024


def compact_parquet(spark: SparkSession, src_dir: str, dst_dir: str,
                    target_bytes: int = COMPACT_TARGET_BYTES) -> int:
    """Rewrite a many-small-files parquet directory into
    ``ceil(bytes/target)`` files. Streaming micro-batch sinks and
    per-executor writers leave thousands of tiny files per partition;
    at 100 TB that murders scan planning (one task per file) and HDFS/
    object-store metadata. Returns the output file count.

    ``coalesce`` (not ``repartition``): compaction must not pay a
    shuffle — it merges existing splits read-side, so the rewrite is
    scan + write only.
    """
    import os
    # Walk recursively: partitioned and streaming-sink layouts nest their
    # files in subdirectories, and sizing only the top level would read 0
    # bytes and silently collapse the dataset to coalesce(1).
    size = 0
    found = False
    for root, _dirs, files in os.walk(src_dir):
        for f in files:
            if f.endswith(".parquet"):
                size += os.path.getsize(os.path.join(root, f))
                found = True
    if not found:
        raise ValueError(f"compact_parquet: no .parquet files under {src_dir}")
    nfiles = max(1, -(-size // target_bytes))
    spark.read.parquet(src_dir).coalesce(nfiles).write.mode("overwrite").parquet(dst_dir)
    return nfiles


@register(
    "q_compact_roundtrip",
    oracle=_FMT_ORACLE,
    description="small-files compaction: shatter documents into 64 files, "
                "compact shuffle-free to target size, prove content identity",
    tags=("source", "format", "storage"),
)
def q_compact_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shatter the documents table into 64 small files, compact them with
    :func:`compact_parquet`, and aggregate the compacted copy — the
    lang-level count/chars/checksum must hash-match DuckDB reading the
    ORIGINAL table, proving the rewrite is content-exact. The file-count
    reduction itself is pinned in ``tests/test_sinks.py``."""
    from ..engine.scratch import scratch_dir
    from ..functions.hashing import hex64
    d = Catalog(spark, sf_dir).documents.select(
        "doc_id", "text", "lang", "source", "n_chars")
    shattered, compacted = scratch_dir("fsbd_shard_"), scratch_dir("fsbd_compact_")
    d.repartition(64).write.mode("overwrite").parquet(shattered)
    compact_parquet(spark, shattered, compacted)
    back = spark.read.parquet(compacted)
    return (back.groupBy("lang")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_chars").alias("total_chars"),
                 F.sum(hex64(F.col("text")) % 1000000007).alias("text_checksum")))
