"""Real-transport Kafka lifecycle (r7 verdict item 7).

Everything else in the suite proves the Kafka lifecycle brokerless
(tests/test_kafka_wire.py: checkpointed offsets, flow control, resume —
over the file-wire analog). THIS module is the executable form of the
"two-line swap" claim in sources/kafka.py: the same ``kafka_reader`` /
``write_to_kafka`` builders against a real broker, end-to-end.

It skips cleanly in this container (no connector jar, no broker) and
runs unchanged the day the environment provides both:

1. the connector jar on the classpath —
   ``org.apache.spark:spark-sql-kafka-0-10_2.13:4.1.2``
   (+ its transitive ``kafka-clients``), e.g. via
   ``spark-submit --packages org.apache.spark:spark-sql-kafka-0-10_2.13:4.1.2``
   or a jar dropped into ``$SPARK_HOME/jars``;
2. a reachable broker, named by ``SPARK_GRAFT_KAFKA_BOOTSTRAP``
   (e.g. ``localhost:9092``).
"""

from __future__ import annotations

import glob
import os
import uuid

import pytest
from pyspark.sql import functions as F

from full_stack_big_data_spark.sources.kafka import (kafka_reader,
                                                     write_to_kafka)

KAFKA_JAR_COORDS = "org.apache.spark:spark-sql-kafka-0-10_2.13:4.1.2"
BOOTSTRAP = os.environ.get("SPARK_GRAFT_KAFKA_BOOTSTRAP", "")


def _kafka_jar_present() -> bool:
    """The connector jar on pyspark's classpath (either shipped in
    $SPARK_HOME/jars or resolved via spark.jars.packages)."""
    try:
        import pyspark

        jars_dir = os.path.join(os.path.dirname(pyspark.__file__), "jars")
        if glob.glob(os.path.join(jars_dir, "spark-sql-kafka-0-10*.jar")):
            return True
    except ImportError:
        pass
    return "spark-sql-kafka" in os.environ.get("PYSPARK_SUBMIT_ARGS", "")


pytestmark = pytest.mark.skipif(
    not (_kafka_jar_present() and BOOTSTRAP),
    reason=f"real-transport Kafka test needs the connector jar "
           f"({KAFKA_JAR_COORDS}) on the classpath and a broker in "
           f"$SPARK_GRAFT_KAFKA_BOOTSTRAP; the brokerless lifecycle "
           f"proof lives in tests/test_kafka_wire.py",
)


def test_kafka_roundtrip_end_to_end(spark, tmp_path):
    """Produce Kafka-shaped rows through the sink builder, drain them
    back through the source builder, assert value parity — the exact
    pair of calls a deployment swaps in for the file-wire analogs."""
    topic = f"fsbd-test-{uuid.uuid4().hex[:12]}"
    payload = [(f"msg-{i}",) for i in range(100)]
    out = (spark.createDataFrame(payload, "v string")
           .select(F.col("v").cast("binary").alias("value")))

    # Sink: the streaming writer needs a streaming source — feed it the
    # rows through a one-batch rate-limited memory round, or simply use
    # the batch writer (same connector, same wire format) to seed the
    # topic; the STREAMING sink path is covered by the drain below
    # re-publishing to a second topic.
    (out.write.format("kafka")
        .option("kafka.bootstrap.servers", BOOTSTRAP)
        .option("topic", topic).save())

    sink_topic = topic + "-echo"
    q = (write_to_kafka(
            kafka_reader(spark, BOOTSTRAP, topic).load().select("value"),
            BOOTSTRAP, sink_topic, str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    echoed = (spark.read.format("kafka")
              .option("kafka.bootstrap.servers", BOOTSTRAP)
              .option("subscribe", sink_topic)
              .option("startingOffsets", "earliest").load()
              .select(F.col("value").cast("string").alias("v")))
    got = sorted(r.v for r in echoed.collect())
    assert got == sorted(v for (v,) in payload)
