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
