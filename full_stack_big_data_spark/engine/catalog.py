"""Table catalog over the parquet star schema.

The reference's "catalog" is a pair of Kafka topic names and one Avro
schema (``testing/EmbeddedKafkaZooKeeperCluster.scala:124-128``,
``src/main/avro/twitter.avsc``). Here the catalog is a thin loader that
gives every operator the same normalized view of the testdata tables:

- ``events.ts`` arrives as parquet TIMESTAMP(NANOS); Spark reads it as a
  raw nanosecond long (``nanosAsLong``) and we convert with **integer**
  division (``ts div 1000``) so truncation matches DuckDB/Arrow exactly
  (float division would round half the microseconds up).
- everything else is passed through untouched, so Catalyst sees the bare
  parquet scan and can push filters/prune columns into it.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from .session import tune_session

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# Tables whose downstream operators are compute-heavy per row (shingle
# explode, md5 hashing, vector math). If the file layout gives the scan
# fewer splits than the session has cores (the testdata is one row group
# per table — one task per scan), decouple processing parallelism from
# input layout with a round-robin repartition: the reference does exactly
# this for the same reason (`KafkaSparkStreamingSpec.scala:186-191`). On a
# production multi-file dataset the split count already exceeds
# parallelism and the spread is skipped, so plans there keep the bare scan.
#
# Relational facts (lineitem/orders/events) are deliberately NOT here:
# their per-row work is plain codegen'd expressions, cheap enough that the
# scan stage is never the bottleneck, while the spread costs a full extra
# exchange per load — q18 loads lineitem twice and paid two fact-table
# exchanges before doing any work (16.7 s → the round-1 bench outlier).
SPREAD_TABLES = {"documents", "embeddings"}

# Below this size the exchange costs more than the parallelism returns
# (the whole table is a handful of Arrow batches); keeps the sf≤0.01
# correctness sweep free of pointless shuffles.
SPREAD_MIN_BYTES = 256 * 1024

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


class Catalog:
    """Loads testdata tables from one scale-factor directory."""

    def __init__(self, spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR):
        self.spark = tune_session(spark)
        self.sf_dir = sf_dir.rstrip("/")

    def path(self, name: str) -> str:
        return f"{self.sf_dir}/{name}.parquet"

    def load(self, name: str, spread: bool = True) -> DataFrame:
        """Load one table. ``spread=False`` skips the layout-adaptive
        repartition — for consumers that immediately collect the table
        driver-side (a broadcast build), where the exchange would be a
        pure cost."""
        if name not in TABLES:
            raise KeyError(f"unknown table {name!r}; have {TABLES}")
        df = self.spark.read.parquet(self.path(name))
        if name == "events" and dict(df.dtypes).get("ts") == "bigint":
            # nanos → micros, truncating (matches DuckDB/Arrow).
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        if spread and name in SPREAD_TABLES and self._size(name) >= SPREAD_MIN_BYTES:
            par = self.spark.sparkContext.defaultParallelism
            if self._est_splits(name) < max(2, par // 2):
                # Filters still reach the scan: Catalyst pushes predicates
                # through the repartition, so the exchange carries only
                # surviving rows.
                df = df.repartition(par)
        return df

    @staticmethod
    def _walk_parquet(p: str) -> tuple[int, int]:
        """(total bytes, file count) of every .parquet under ``p``,
        recursively — hive-partitioned and streaming-sink layouts nest
        their files, and a top-level-only listing reads them as 0 bytes
        (the compact_parquet bug class, r3 advice)."""
        size = nfiles = 0
        for root, _dirs, files in os.walk(p):
            for f in files:
                if f.endswith(".parquet"):
                    size += os.path.getsize(os.path.join(root, f))
                    nfiles += 1
        return size, nfiles

    def _size(self, name: str) -> int:
        p = self.path(name)
        if os.path.isdir(p):
            return self._walk_parquet(p)[0]
        return os.path.getsize(p) if os.path.exists(p) else 1 << 60

    def _est_splits(self, name: str) -> int:
        """Scan splits the file layout yields: Σ bytes / maxPartitionBytes
        (cheap filesystem arithmetic — no plan materialization)."""
        p = self.path(name)
        if os.path.isdir(p):
            size, nfiles = self._walk_parquet(p)
            nfiles = max(1, nfiles)
        elif os.path.exists(p):
            size, nfiles = os.path.getsize(p), 1
        else:  # non-local path — let Spark's own split logic stand
            return 1 << 30
        max_bytes = int(self.spark.conf.get(
            "spark.sql.files.maxPartitionBytes", "134217728").removesuffix("b"))
        return max(nfiles, size // max_bytes)

    def __getattr__(self, name: str) -> DataFrame:
        if name in TABLES:
            return self.load(name)
        raise AttributeError(name)

    def register_views(self) -> None:
        """Register every table as a temp view for spark.sql() callers."""
        for t in TABLES:
            self.load(t).createOrReplaceTempView(t)
