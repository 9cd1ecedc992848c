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
# Ceiling for the pushed-literal ``key IN (…)`` path. Spark only pushes
# an In filter to parquet as PER-VALUE stats checks while the value
# count is ≤ spark.sql.parquet.pushdown.inFilterThreshold — past it the
# pushed filter degrades to a [min(ids), max(ids)] RANGE check, and
# row-group skipping inside a touched pk directory largely vanishes
# for spread-out ids (r11 ADVICE). point_fetch raises the session
# threshold to this ceiling so every literal fetch it issues gets the
# per-value rule; id sets past the ceiling take the broadcast-join
# fallback (still pk-directory-pruned) rather than a range-degraded
# literal push. The ceiling is STACK-bounded, not cost-bounded: Spark
# pushes In as a left-deep Or-of-Eq chain and parquet-mr's filter
# visitor recurses it — measured on this JVM: 1024 pushed values
# evaluate fine, 2048 StackOverflowError in the executor. 1000 keeps
# margin while covering every gate family's realistic per-batch
# candidate set; per-value stats evaluation at this width is footer
# arithmetic, microseconds against row-group I/O.
PF_IN_MAX = 1000


def write_payload(df: DataFrame, key: str, path: str,
                  pk_mod: int = PF_PK_MOD) -> None:
    """Write ``df`` as a point-lookup payload keyed by ``key``: pk
    directory partitions + key-sorted files (tight row-group stats).
    ``repartition(pk)`` lands each pk wholly in one task, so each
    directory holds one sorted file at this scale."""
    (df.withColumn("pk", F.pmod(F.col(key), F.lit(pk_mod)).cast("int"))
       .repartition("pk")
       # Sort by BOTH the partition column and the key: partitionBy
       # requires pk-ordered input, so a key-only sort makes the writer
       # insert its own Sort(pk) on top — key order within a pk file
       # then survives only while the writer's sort stays in memory
       # (stable radix), and silently breaks under spill merges at
       # scale, loosening the row-group min/max stats the point lookup
       # depends on (r11 ADVICE). (pk, key) satisfies the writer's
       # required ordering outright — no extra sort, guaranteed
       # key-sorted files.
       .sortWithinPartitions("pk", key)
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
    # Runtime conf, read at physical planning: guarantees the In filter
    # below is pushed to parquet as per-value stats checks, not the
    # range degradation the default threshold (10) would give any
    # realistic candidate set (r11 ADVICE). Monotone raise — never
    # lowered back — so concurrent fetches can't race it downward.
    cur = int(spark.conf.get(
        "spark.sql.parquet.pushdown.inFilterThreshold", "10"))
    if cur < PF_IN_MAX:
        spark.conf.set("spark.sql.parquet.pushdown.inFilterThreshold",
                       str(PF_IN_MAX))
    pks = sorted({i % pk_mod for i in ids})
    return (r.where(F.col("pk").isin(pks) & F.col(key).isin(ids))
            .drop("pk"))


def fetch_payload_prefetched(spark: SparkSession, path: str, key: str,
                             ids_df: DataFrame, ids: list[int] | None,
                             pk_mod: int = PF_PK_MOD) -> DataFrame:
    """:func:`fetch_payload`'s three regimes with the driver id collect
    ALREADY PERFORMED by the caller (``ids = fetch_ids(ids_df, key)``,
    possibly None past the size gate). Exists so the streaming gate
    bodies can run that collect on an overlap thread (guide §2.6)
    while the driver concurrently builds the next verify tier's
    expression trees — the id fetch is the per-batch driver-blocking
    action, and the expression construction is the driver-side work
    that used to serialize behind it. Kept separate from
    ``fetch_payload`` (same dispatch, deliberately duplicated ~6
    lines) so batch-path consumers of the classic entry point keep an
    unchanged function."""
    if ids is not None and len(ids) <= PF_IN_MAX:
        return point_fetch(spark, path, key, ids, pk_mod=pk_mod)
    r = spark.read.parquet(path)
    if ids is not None:
        pks = sorted({i % pk_mod for i in ids})
        r = r.where(F.col("pk").isin(pks))
    return (r.drop("pk")
            .join(F.broadcast(ids_df.select(key).distinct()), key))


def fetch_payload(spark: SparkSession, path: str, key: str,
                  ids_df: DataFrame, pk_mod: int = PF_PK_MOD) -> DataFrame:
    """The gates' entry point: three regimes by candidate-set size,
    never the raw corpus in any of them (the payload carries only
    (key, verify columns)).

    ≤ PF_IN_MAX ids → pushed-literal point fetch (directory prune +
    per-value row-group skipping). ≤ PF_MAX_IDS → broadcast join, but
    still with the literal ``pk IN`` directory prune (the pk set is at
    most pk_mod values regardless of id count, so the literal stays
    tiny while untouched directories are never opened). Past the
    driver gate → plain broadcast join over the payload."""
    ids = fetch_ids(ids_df, key)
    if ids is not None and len(ids) <= PF_IN_MAX:
        return point_fetch(spark, path, key, ids, pk_mod=pk_mod)
    r = spark.read.parquet(path)
    if ids is not None:
        pks = sorted({i % pk_mod for i in ids})
        r = r.where(F.col("pk").isin(pks))
    return (r.drop("pk")
            .join(F.broadcast(ids_df.select(key).distinct()), key))
