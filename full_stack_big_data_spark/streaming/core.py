"""Streaming runtime helpers.

The reference's topology lifecycle — build → submit → sleep → kill
(``storm/utils/StormRunner.scala:13-24``) — maps to Structured Streaming's
query lifecycle: ``writeStream.start()`` → ``awaitTermination`` → ``stop``.
``run_to_completion`` packages the Available-Now trigger (bounded replay of
everything currently in the source, exactly-once) so streaming operators
can participate in the batch-style correctness gate: same program, the
trigger is the only difference between "stream forever" and "drain once".
"""

from __future__ import annotations

import hashlib
import itertools
import os

from pyspark.sql import DataFrame, SparkSession

_seq = itertools.count()
_stage_root: str | None = None


def _staged_dir(path: str) -> str:
    """The file-streaming source requires a *directory*; testdata tables
    are single parquet files. Stage each file behind a symlink in a
    per-process temp dir (testdata itself stays untouched/read-only)."""
    global _stage_root
    if _stage_root is None:
        from ..engine.scratch import scratch_dir
        _stage_root = scratch_dir("fsbd_stream_src_")
    # Key by the full source path, not the basename: the same table name
    # exists at every scale factor, and a basename-keyed dir would silently
    # serve the first SF's data to every later one in the same process.
    tag = hashlib.md5(os.path.abspath(path).encode()).hexdigest()[:10]
    d = os.path.join(_stage_root,
                     f"{os.path.basename(path).replace('.', '_')}_{tag}")
    if not os.path.isdir(d):
        os.makedirs(d, exist_ok=True)
        os.symlink(os.path.abspath(path), os.path.join(d, os.path.basename(path)))
    return d


def stream_table(spark: SparkSession, path: str, template: DataFrame) -> DataFrame:
    """File-streaming source over a parquet table, schema pinned from the
    batch reader (streaming sources require explicit schemas)."""
    src = _staged_dir(path) if os.path.isfile(path) else path
    return spark.readStream.schema(template.schema).parquet(src)


def run_to_completion(sdf: DataFrame, *, output_mode: str,
                      name: str | None = None) -> DataFrame:
    """Drain a streaming DataFrame with trigger(availableNow) into a memory
    sink; returns the sink table as a batch DataFrame."""
    spark = sdf.sparkSession
    sink = name or f"stream_sink_{next(_seq)}_{id(sdf) & 0xFFFF}"
    q = (sdf.writeStream.format("memory").queryName(sink)
         .outputMode(output_mode).trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(sink)
