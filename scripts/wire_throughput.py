"""Wire-path throughput micro-bench (r5 verdict item 8).

The file-wire analog (sources/kafka.py) proves the checkpointed Kafka
LIFECYCLE brokerless; this measures its THROUGHPUT as a function of the
flow-control knob. ``maxFilesPerTrigger`` is the file source's
``maxOffsetsPerTrigger``: small values = many micro-batches (low
latency, high per-batch overhead), large values = few big batches
(throughput). The sweep locates the knee — the smallest trigger size
whose rows/sec is within ~20% of the unthrottled drain — which is the
number a deployment sets to balance latency against efficiency.

Method: a directory "topic" of F parquet files x R Kafka-shaped binary
JSON rows each; for each knob value, a FRESH checkpoint, the full
decode→count identity pipeline (the reference's T4 shape) drains with
trigger(availableNow) into a memory sink; rows/sec = total rows / drain
wall time. Results → BENCHNOTES.md.

Usage: python scripts/wire_throughput.py [n_files] [rows_per_file]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from pyspark.sql import functions as F

from full_stack_big_data_spark.engine.session import get_spark
from full_stack_big_data_spark.sources.kafka import file_wire_reader
from full_stack_big_data_spark.sources.serde import to_json_bytes


def build_topic(spark, topic: str, n_files: int, rows_per_file: int) -> None:
    """n_files single-file commits of Kafka-shaped (binary value) rows —
    each file is one 'producer batch' on the wire."""
    for i in range(n_files):
        df = (spark.range(i * rows_per_file, (i + 1) * rows_per_file)
              .select(F.col("id").alias("event_id"),
                      (F.col("id") % 997).alias("value"),
                      F.concat(F.lit("u"), (F.col("id") % 1000).cast("string"))
                      .alias("user")))
        (to_json_bytes(df, ["event_id", "value", "user"])
         .coalesce(1).write.mode("append").parquet(topic))


def drain_once(spark, topic: str, knob: int | None, sink: str) -> float:
    src = file_wire_reader(spark, topic, max_files_per_trigger=knob)
    decoded = src.select(F.decode("value", "utf-8").alias("js")).select(
        F.get_json_object("js", "$.event_id").cast("long").alias("event_id"))
    t0 = time.perf_counter()
    q = (decoded.writeStream.format("memory").queryName(sink)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    dt = time.perf_counter() - t0
    n = spark.table(sink).count()
    spark.catalog.dropTempView(sink) if sink in [
        t.name for t in spark.catalog.listTables()] else None
    return dt, n


def main() -> int:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    rows_per_file = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    spark = get_spark(app_name="fsbd-wire-throughput")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="fsbd_wire_bench_")
    topic = os.path.join(root, "topic")
    try:
        build_topic(spark, topic, n_files, rows_per_file)
        total = n_files * rows_per_file
        knobs = [1, 2, 4, 8, 16, 32, None]
        print(f"| maxFilesPerTrigger | batches | drain s | rows/sec |")
        print(f"|---|---|---|---|")
        best = None
        results = []
        for i, knob in enumerate(knobs):
            dt, n = drain_once(spark, topic, knob, f"wire_sink_{i}")
            assert n == total, (n, total)
            batches = -(-n_files // (knob or n_files))
            rps = total / dt
            results.append((knob, rps))
            best = max(best or 0, rps)
            print(f"| {knob or 'unthrottled'} | {batches} | {dt:.2f} "
                  f"| {rps:,.0f} |", flush=True)
        knee = next((k for k, rps in results if k and rps >= 0.8 * best),
                    None)
        print(f"\nknee: maxFilesPerTrigger={knee} reaches >=80% of peak "
              f"({best:,.0f} rows/sec)")
        return 0
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
