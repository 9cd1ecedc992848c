"""Point-fetch discipline for verify payloads (r10 verdict item 1).

The streaming ingest gates verify bucket-collision candidates with an
EXACT kernel (jaccard over shingle sets, cosine over raw vectors). The
r10 gates fetched the candidates' payloads by broadcast-joining the
candidate id list INTO AN UNPRUNED SCAN of the corpus table
(documents.parquet / embeddings.parquet) — CPU ∝ candidates, but I/O a
full corpus pass per micro-batch, which at a 100 TB corpus × thousands
of micro-batches is the gate's real cost. This module is the fix: the
verify payload is materialized ONCE as a point-lookup-friendly sibling
of the band/SRP index, and each micro-batch fetches exactly the
candidate rows through two scan-level prunes.

Layout (``write_payload``): the payload is partitioned by
``pk = key % PF_PK_MOD`` (directory-level pruning) and sorted by the
key within each file (row-group min/max stats stay tight, so the
pushed key predicate skips row groups inside a touched directory).
One file per pk directory at this scale; a 100 TB deployment raises
``PF_PK_MOD`` (and files per dir) so a directory stays a few hundred
MB — the pruning arithmetic is unchanged.

Fetch (``point_fetch``): candidate ids are pulled to the driver
(size-gated — candidates per batch are bounded by the gate families'
CAND_CEIL contracts, so this is a few thousand int64s; past the gate
the caller falls back to the broadcast join, now against the payload
table rather than the raw corpus) and pushed into the scan as LITERAL
predicates: ``pk IN (…)`` prunes directories (PartitionFilters) and
``key IN (…)`` reaches parquet as PushedFilters for row-group
skipping. Per-batch bytes read ∝ candidate directories touched, never
the corpus — pinned in tests/test_plans.py and measured in
scripts/gate_io_probe.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

PF_PK_MOD = 32        # payload directory-partition modulus
PF_MAX_IDS = 200_000  # size gate for the driver-side id fetch (~1.6 MB)


def write_payload(df: DataFrame, key: str, path: str,
                  pk_mod: int = PF_PK_MOD) -> None:
    """Write ``df`` as a point-lookup payload keyed by ``key``: pk
    directory partitions + key-sorted files (tight row-group stats).
    ``repartition(pk)`` lands each pk wholly in one task, so each
    directory holds one sorted file at this scale."""
    (df.withColumn("pk", F.pmod(F.col(key), F.lit(pk_mod)).cast("int"))
       .repartition("pk")
       .sortWithinPartitions(key)
       .write.mode("overwrite")
       # Small row groups ARE the point-lookup design: the row group is
       # parquet's stats-pruning granule, so with key-sorted files the
       # pushed In(key, …) reads ~1 MiB per candidate row instead of
       # the default 128 MiB (Spark pushes parquet-native In filters;
       # row groups whose [min,max] contains no candidate are skipped).
       .option("parquet.block.size", 1 << 20)
       .partitionBy("pk").parquet(path))


def fetch_ids(df: DataFrame, col: str,
              max_ids: int = PF_MAX_IDS) -> list[int] | None:
    """Size-gated driver fetch of a (small) id column — the established
    bounded-``toPandas`` discipline (similarity.py's broadcast-build
    gates). Returns None when the set exceeds ``max_ids``; the caller
    falls back to the distributed join path."""
    pdf = df.select(col).distinct().limit(max_ids + 1).toPandas()
    if len(pdf) > max_ids:
        return None
    return sorted(int(x) for x in pdf[col])


def point_fetch(spark: SparkSession, path: str, key: str,
                ids: list[int], pk_mod: int = PF_PK_MOD) -> DataFrame:
    """Read exactly the payload rows for ``ids``: literal ``pk IN``
    prunes directories, literal ``key IN`` pushes to parquet for
    row-group skipping. An empty id list still prunes — ``pk IN ()``
    is a constant-false partition filter, zero files read."""
    r = spark.read.parquet(path)
    if not ids:
        return r.where(F.lit(False)).drop("pk")
    pks = sorted({i % pk_mod for i in ids})
    return (r.where(F.col("pk").isin(pks) & F.col(key).isin(ids))
            .drop("pk"))


def fetch_payload(spark: SparkSession, path: str, key: str,
                  ids_df: DataFrame, pk_mod: int = PF_PK_MOD) -> DataFrame:
    """The gates' entry point: try the pushed-literal point fetch,
    fall back to a broadcast join against the payload table when the
    id set blows the driver gate (still never the raw corpus — the
    payload carries only (key, verify columns))."""
    ids = fetch_ids(ids_df, key)
    if ids is not None:
        return point_fetch(spark, path, key, ids, pk_mod=pk_mod)
    return (spark.read.parquet(path).drop("pk")
            .join(F.broadcast(ids_df.select(key).distinct()), key))
