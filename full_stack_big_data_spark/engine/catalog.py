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

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


class Catalog:
    """Loads testdata tables from one scale-factor directory."""

    def __init__(self, spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR):
        self.spark = tune_session(spark)
        self.sf_dir = sf_dir.rstrip("/")

    def path(self, name: str) -> str:
        return f"{self.sf_dir}/{name}.parquet"

    def load(self, name: str) -> DataFrame:
        if name not in TABLES:
            raise KeyError(f"unknown table {name!r}; have {TABLES}")
        df = self.spark.read.parquet(self.path(name))
        if name == "events" and dict(df.dtypes).get("ts") == "bigint":
            # nanos → micros, truncating (matches DuckDB/Arrow).
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        return df

    def __getattr__(self, name: str) -> DataFrame:
        if name in TABLES:
            return self.load(name)
        raise AttributeError(name)

    def register_views(self) -> None:
        """Register every table as a temp view for spark.sql() callers."""
        for t in TABLES:
            self.load(t).createOrReplaceTempView(t)
