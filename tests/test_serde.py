"""Serde semantics — the reference's unit-spec layer re-expressed
(AvroSchemeSpec round-trip/throw, AvroDecoderBoltSpec drop-on-corrupt)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from full_stack_big_data_spark.sources.serde import (
    TWEET_SCHEMA, decode_tweet_avro, encode_tweet_avro, from_json_bytes,
    to_json_bytes, tweet_from_avro_bytes, tweet_to_avro_bytes,
)

# the reference's canonical 3-tweet fixture (KafkaSpec.scala:35-47,
# deterministic variant per FIXTURES.md A1)
FIXTURE = [
    ("ANY_USER_1", "ANY_TEXT_1", 1411993272),
    ("ANY_USER_2", "ANY_TEXT_2", 0),
    ("ANY_USER_3", "ANY_TEXT_3", 1234),
]
CORRUPT = bytes([1, 2, 3, 4])  # AvroDecoderBoltSpec.scala:78


def test_avro_bytes_roundtrip_local():
    for u, t, ts in FIXTURE:
        assert tweet_from_avro_bytes(tweet_to_avro_bytes(u, t, ts)) == (u, t, ts)


def test_avro_bytes_rejects_corrupt():
    with pytest.raises(ValueError):
        tweet_from_avro_bytes(CORRUPT)


def test_permissive_drops_corrupt_records(spark):
    """T1 (AvroDecoderBolt) semantics: bad payloads are dropped, good
    ones flow through."""
    good = [(tweet_to_avro_bytes(u, t, ts),) for u, t, ts in FIXTURE]
    df = spark.createDataFrame(good + [(CORRUPT,)], "value binary")
    out = (df.select(decode_tweet_avro(F.col("value"), "PERMISSIVE").alias("pojo"))
           .where(F.col("pojo.username").isNotNull())
           .select("pojo.*"))
    assert sorted(tuple(r) for r in out.collect()) == sorted(FIXTURE)


def test_failfast_raises_on_corrupt(spark):
    """T2 (AvroScheme) semantics: decoding failure aborts the query."""
    df = spark.createDataFrame([(CORRUPT,)], "value binary")
    with pytest.raises(Exception, match="Could not decode input bytes"):
        df.select(decode_tweet_avro(F.col("value"), "FAILFAST").alias("p")).collect()


def test_json_roundtrip_identity(spark):
    df = spark.createDataFrame(FIXTURE, TWEET_SCHEMA)
    out = from_json_bytes(to_json_bytes(df, ["username", "text", "timestamp"]),
                          TWEET_SCHEMA)
    assert sorted(tuple(r) for r in out.collect()) == sorted(FIXTURE)


def test_avro_spark_roundtrip_matches_fixture(spark):
    df = spark.createDataFrame(FIXTURE, TWEET_SCHEMA)
    enc = df.select(encode_tweet_avro("username", "text", "timestamp").alias("value"))
    dec = (enc.select(decode_tweet_avro(F.col("value")).alias("pojo"))
           .select("pojo.*"))
    assert sorted(tuple(r) for r in dec.collect()) == sorted(FIXTURE)
