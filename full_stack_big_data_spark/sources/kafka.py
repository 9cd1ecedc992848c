"""Kafka source/sink builders (reference S1-S6 → Structured Streaming).

Everything the reference hand-builds — producer pooling
(``PooledKafkaProducerAppFactory.scala``), per-partition receiver threads
(``KafkaSparkStreamingSpec.scala:178-185``), ZK offset bookkeeping
(``KafkaStormSpec.scala:139-158``) — collapses into the built-in Kafka
connector: one ``readStream`` covers all partitions, offsets live in the
checkpoint, producers are pooled per executor.

This container ships no Kafka broker or connector jar, so these builders
are exercised in tests only up to option assembly; with
``spark-sql-kafka-0-10`` on the classpath they run unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import DataStreamReader


def kafka_source_options(bootstrap: str, topic: str, *,
                         starting_offsets: str = "earliest",
                         max_offsets_per_trigger: int | None = 100_000) -> dict:
    """Source options. ``startingOffsets`` replaces the reference's
    ``auto.offset.reset=smallest|largest`` (consumer-defaults.properties:34-43);
    ``maxOffsetsPerTrigger`` replaces Storm's ``setMaxSpoutPending``
    backpressure (KafkaStormDemo.scala:48)."""
    opts = {
        "kafka.bootstrap.servers": bootstrap,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
    }
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    return opts


def kafka_reader(spark: SparkSession, bootstrap: str, topic: str,
                 **kw) -> DataStreamReader:
    reader = spark.readStream.format("kafka")
    for k, v in kafka_source_options(bootstrap, topic, **kw).items():
        reader = reader.option(k, v)
    return reader


def kafka_sink_options(bootstrap: str, topic: str, checkpoint: str) -> dict:
    return {
        "kafka.bootstrap.servers": bootstrap,
        "topic": topic,
        "checkpointLocation": checkpoint,
    }


def write_to_kafka(df: DataFrame, bootstrap: str, topic: str, checkpoint: str):
    """df must already be Kafka-shaped (binary key/value) — see
    ``serde.to_json_bytes`` / ``serde.encode_tweet_avro``. Returns the
    started StreamingQuery (at-least-once; exactly-once state via the
    checkpoint — strictly stronger than the reference's at-most-once
    ackers=0 demo config, KafkaStormDemo.scala:50)."""
    writer = df.writeStream.format("kafka")
    for k, v in kafka_sink_options(bootstrap, topic, checkpoint).items():
        writer = writer.option(k, v)
    return writer.start()
