"""Driver-built bounded DataFrames as a SINGLE partition.

``spark.createDataFrame(rows, schema)`` over a local list parallelizes
the rows into ``defaultParallelism`` Python-RDD slices. Every action
then runs one Python-runner round trip PER SLICE — and a downstream
``coalesce(1)`` (the one-file artifact writes) folds all 32 slices into
ONE task that evaluates them SEQUENTIALLY: ~5 s measured for a 128-row
codebook write on local[32] at sf0.1, vs ~0.3 s single-slice (guide §4
— the JVM↔Python boundary is per-partition, not per-row; BENCHNOTES
r14). Driver-built frames here are all bounded artifacts (probe sets,
LUTs, codebooks, block-pair grids — KB-scale, broadcast or
single-file-written), so one slice is the right layout everywhere:
parallelism for these frames comes from what they join against, never
from the local list itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def local_df(spark: SparkSession, rows, schema: str) -> DataFrame:
    """``createDataFrame`` for a bounded driver-side row list, pinned to
    one partition (one Python-runner round trip per action, and already
    single-file for artifact writes — no ``coalesce(1)`` needed)."""
    return spark.createDataFrame(
        spark.sparkContext.parallelize(list(rows), 1), schema)
