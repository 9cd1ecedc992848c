"""Kafka source/sink builders (reference S1-S6 → Structured Streaming).

Everything the reference hand-builds — producer pooling
(``PooledKafkaProducerAppFactory.scala``), per-partition receiver threads
(``KafkaSparkStreamingSpec.scala:178-185``), ZK offset bookkeeping
(``KafkaStormSpec.scala:139-158``) — collapses into the built-in Kafka
connector: one ``readStream`` covers all partitions, offsets live in the
checkpoint, producers are pooled per executor.

This container ships no Kafka broker or connector jar, so the
broker-specific builders are exercised in tests up to option assembly;
with ``spark-sql-kafka-0-10`` on the classpath they run unchanged. The
LIFECYCLE, however — checkpointed source offsets, flow-controlled
incremental consumption, checkpointed sink, stop/restart resume — is
transport-independent StreamingQuery machinery, and the file-wire
analogs below exercise exactly that against a directory "topic"
(tests/test_kafka_wire.py): same Kafka-shaped binary ``value`` rows,
same checkpoint offset/commit log, ``maxFilesPerTrigger`` standing in
for ``maxOffsetsPerTrigger``. Swapping ``file_wire_reader`` /
``write_to_file_wire`` for ``kafka_reader`` / ``write_to_kafka`` is the
only change a real deployment makes.
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
    configured (un-started) ``DataStreamWriter`` — same lifecycle as
    :func:`write_to_file_wire`, so call sites chain
    ``.trigger(...).start()`` on either builder interchangeably.
    Delivery is at-least-once; exactly-once state via the checkpoint —
    strictly stronger than the reference's at-most-once ackers=0 demo
    config (KafkaStormDemo.scala:50)."""
    writer = df.writeStream.format("kafka")
    for k, v in kafka_sink_options(bootstrap, topic, checkpoint).items():
        writer = writer.option(k, v)
    return writer


# --- Broker-free wire analog (exercised Kafka lifecycle) ---------------------

_WIRE_SCHEMA = "value binary"


def file_wire_source_options(*, max_files_per_trigger: int | None = None) -> dict:
    """File-source options mirroring :func:`kafka_source_options`:
    ``maxFilesPerTrigger`` is the file source's flow-control knob, the
    analog of ``maxOffsetsPerTrigger`` (A11). Offsets (here: which files
    are consumed) live in the reader checkpoint either way."""
    opts = {}
    if max_files_per_trigger is not None:
        opts["maxFilesPerTrigger"] = str(max_files_per_trigger)
    return opts


def file_wire_reader(spark: SparkSession, topic_dir: str, *,
                     max_files_per_trigger: int | None = None) -> DataFrame:
    """ReadStream over a directory "topic" of Kafka-shaped parquet rows
    (binary ``value``), flow-controlled like a Kafka source."""
    reader = spark.readStream.schema(_WIRE_SCHEMA)
    for k, v in file_wire_source_options(
            max_files_per_trigger=max_files_per_trigger).items():
        reader = reader.option(k, v)
    return reader.parquet(topic_dir)


def write_to_file_wire(df: DataFrame, topic_dir: str, checkpoint: str):
    """WriteStream a Kafka-shaped frame (binary ``value``) into a
    directory "topic", exactly-once via the sink checkpoint — the
    stand-in for :func:`write_to_kafka` with identical lifecycle."""
    return (df.writeStream.format("parquet")
            .option("path", topic_dir)
            .option("checkpointLocation", checkpoint)
            .outputMode("append"))
