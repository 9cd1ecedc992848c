"""Streaming reservoir sampling — bounded-state uniform sampling over
an unbounded stream.

The batch sampling family (operators/sampling.py) draws deterministic
uniforms from content hashes so its samples are layout-independent and
oracle-exact. This module moves the same construction to the ingest
door: a training pipeline that wants "keep a k-doc uniform sample of
everything that ever streamed past" cannot buffer the stream — the
classic answer is reservoir sampling, whose state is EXACTLY k rows no
matter how much data flows (Vitter's Algorithm R; here the
Efraimidis–Spirakis race form, which distributes and merges).

Race form: each doc draws a deterministic integer race key from its
content hash; the reservoir is the k largest keys seen so far. That
makes reservoir maintenance a MERGE: topk(reservoir ∪ batch_topk) —
associative, commutative, idempotent (a max-k semilattice join), which
is what buys exactly-once without epoch-partitioned sinks:

- batch-chop-invariant: any micro-batch chopping of the feed folds to
  the same reservoir (pinned in tests), so the oracle is a one-shot
  SQL top-k over the whole table;
- replay-safe: a crash-replayed batch re-merges rows the reservoir
  already absorbed — a no-op by idempotence;
- crash-safe state: the reservoir is written as VERSIONED k-row
  snapshots (``reservoir_v{batch_id}`` derived from ``v{batch_id-1}``
  ∪ batch — the repo's foreachBatch versioned-state recipe), so a
  replayed epoch rewrites ITS OWN version from the same inputs and a
  torn write never corrupts the previous version. Superseded versions
  are reclaimable with engine.retention.vacuum_superseded once the
  stream is quiescent.

Scale: per-batch work is one map-side key projection over the batch,
a per-partition top-k (TakeOrderedAndProject — heaps, no sort), and a
k-row union with the previous snapshot; state and snapshot I/O are
O(k) regardless of stream length — the property that distinguishes a
reservoir from "sort everything seen so far".
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..engine.localdf import local_df
from ..engine.retention import _is_committed
from ..engine.session import tune_session
from ..functions.hashing import hex64, hex64_sql
from ..operators.registry import register
from .joins import _registered_cache

RESERVOIR_K = 64
_R_SALT = "reservoir|"


def _committed_versions(state_root: str,
                        below: int | None = None) -> list[int]:
    """Snapshot versions with a ``_SUCCESS`` commit record (the same
    commit discipline engine.retention enforces — r12 ADVICE): a crash
    mid-write of v=N leaves a torn directory that neither serving nor
    the replay's prev-version scan may read; the replay of N rewrites
    it from committed v<N inputs."""
    out = []
    for d in os.listdir(state_root):
        if not d.startswith("v="):
            continue
        v = int(d.split("=", 1)[1])
        if below is not None and v >= below:
            continue
        if _is_committed(os.path.join(state_root, d)):
            out.append(v)
    return sorted(out)

# Enrolled in the gate-cache registry so fresh-dirs probe reps re-drain
# the feed and re-fold the reservoir instead of timing a memoized read.
_RES_DIRS: dict[str, tuple[str, str, str]] = _registered_cache()


def _race_key_col() -> F.Column:
    """Deterministic integer race key from the doc's content hash —
    pure integer arithmetic (no floats to round), identical in DuckDB."""
    return hex64(F.concat(F.lit(_R_SALT), F.col("doc_id").cast("string")))


def _merge_reservoir(prev: DataFrame, batch: DataFrame,
                     k: int = RESERVOIR_K) -> DataFrame:
    """topk(distinct(prev ∪ batch)) by (race_key desc, doc_id) — the
    semilattice join. The ``dropDuplicates(["doc_id"])`` is what makes
    the join a SET join rather than a bag union: a doc_id present in
    both the previous snapshot and a later batch (source-level
    duplicate, or a replayed row the reservoir already absorbed) ties
    on its deterministic (race_key, doc_id) and would otherwise occupy
    two of the k slots — the idempotence the module header claims holds
    only with the dedup (r12 ADVICE, medium). Duplicate doc_ids carry
    identical content-hash race keys, so which copy survives is
    immaterial. Inputs are ≤ k and ≤ batch rows; the merge materializes
    at most k + batch rows, so a plain dedup+orderBy+limit is the right
    plan (both sides are tiny by contract — prev is the k-row snapshot
    and the batch side is pre-reduced to its own top-k map-side)."""
    return (prev.unionByName(batch)
            .dropDuplicates(["doc_id"])
            .orderBy(F.desc("race_key"), F.asc("doc_id"))
            .limit(k))


def _reservoir_body(state_root: str, k: int = RESERVOIR_K):
    """foreachBatch body: fold the micro-batch into the versioned
    reservoir. Reads snapshot v{b-1} (the newest version < b on disk —
    a replay of b must NOT read b's own torn output), writes v{b}."""
    def body(batch: DataFrame, batch_id: int) -> None:
        ss = batch.sparkSession
        keyed = (batch.select("doc_id", "n_chars")
                 .withColumn("race_key", _race_key_col())
                 .orderBy(F.desc("race_key"), F.asc("doc_id"))
                 .limit(k))
        versions = _committed_versions(state_root, below=batch_id)
        if versions:
            prev = ss.read.parquet(
                os.path.join(state_root, f"v={versions[-1]}"))
        else:
            prev = local_df(
                ss, [], "doc_id long, n_chars int, race_key bigint")
        out = os.path.join(state_root, f"v={batch_id}")
        (_merge_reservoir(prev, keyed, k)
         .coalesce(1).write.mode("overwrite").parquet(out))
    return body


def read_reservoir(spark: SparkSession, state_root: str) -> DataFrame:
    """The served sample: the newest COMMITTED snapshot, ranked (a
    torn v=N from a crash mid-write is invisible to serving until its
    replay rewrites and commits it)."""
    versions = _committed_versions(state_root)
    if not versions:
        # A root holding only torn (uncommitted) v= dirs — e.g. every
        # write so far crashed mid-commit — must fail with the story,
        # not the IndexError the r13 committed-only filter left behind.
        raise FileNotFoundError(
            f"no committed reservoir snapshot under {state_root}: "
            "either no drain has completed or every version is torn "
            "(missing _SUCCESS); re-run the drain to repair")
    cur = spark.read.parquet(os.path.join(state_root, f"v={versions[-1]}"))
    from pyspark.sql.window import Window
    w = Window.orderBy(F.desc("race_key"), F.asc("doc_id"))
    return cur.select(F.row_number().over(w).cast("bigint").alias("rank"),
                      "doc_id", "n_chars", "race_key")


def _reservoir_oracle() -> str:
    h = hex64_sql(f"'{_R_SALT}' || CAST(doc_id AS VARCHAR)")
    return f"""
WITH keyed AS (
  SELECT doc_id, n_chars, {h} AS race_key FROM documents
), ranked AS (
  SELECT doc_id, n_chars, race_key,
         ROW_NUMBER() OVER (ORDER BY race_key DESC, doc_id) AS rank
  FROM keyed
)
SELECT CAST(rank AS BIGINT) AS rank, doc_id, n_chars, race_key
FROM ranked WHERE rank <= {RESERVOIR_K}
"""


@register(
    "stream_reservoir_sample",
    oracle=_reservoir_oracle(),
    description=f"streaming reservoir sample: a {RESERVOIR_K}-doc "
                "uniform sample of everything that ever streamed past, "
                "maintained with O(k) state via deterministic "
                "Efraimidis–Spirakis race keys — per-batch top-k merge "
                "into a versioned k-row snapshot (idempotent semilattice "
                "join, crash-safe versioned state); served sample equals "
                "the batch top-k exactly",
    tags=("streaming", "sampling", "topk"),
)
def stream_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The batch sampling family's missing STREAMING member: uniform
    k-of-everything sampling with state that never grows. The feed is
    deliberately staged as FOUR files drained one per micro-batch
    (``maxFilesPerTrigger=1``) so the registered entry exercises real
    cross-batch reservoir maintenance, not a one-batch degenerate; the
    merge's semilattice algebra makes the result independent of the
    chop (and of file order — pinned in tests), which is why a one-shot
    SQL top-k replays it exactly.

    Cite: reference has no sampling surface; this is the §2.5-class
    capability a 100 TB ingest needs (sample a bounded eval/inspection
    set from an unbounded firehose without ever buffering it)."""
    from ..engine.scratch import scratch_dir

    tune_session(spark)
    dirs = _RES_DIRS.get(sf_dir)
    if dirs is None:
        feed_dir = scratch_dir("fsbd_reservoir_feed_")
        state_root = scratch_dir("fsbd_reservoir_state_")
        ckpt = scratch_dir("fsbd_reservoir_ckpt_")
        (spark.read.parquet(f"{sf_dir}/documents.parquet")
         .select("doc_id", "n_chars")
         .repartition(4).write.mode("overwrite").parquet(feed_dir))
        dirs = (feed_dir, state_root, ckpt)
        _RES_DIRS[sf_dir] = dirs
    feed_dir, state_root, ckpt = dirs

    template = spark.read.parquet(feed_dir)
    feed = (spark.readStream.schema(template.schema)
            .option("maxFilesPerTrigger", 1).parquet(feed_dir))
    q = (feed.writeStream.foreachBatch(_reservoir_body(state_root))
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return read_reservoir(spark, state_root)


_W_SALT = "wsample|"
_W_U_MOD = 1_000_000
WEIGHTED_RES_K = 64

_WRES_DIRS: dict[str, tuple[str, str, str]] = _registered_cache()


def _weighted_race_key_col() -> F.Column:
    """``sample_weighted``'s exponential race key, unchanged: a 6-digit
    deterministic uniform from the content hash, raced as
    round(ln(u)/w, 10) with w = n_chars — identical literals and
    rounding in both engines (the float-determinism argument lives on
    operators/sampling.py::sample_weighted)."""
    u = ((hex64(F.concat(F.lit(_W_SALT), F.col("doc_id").cast("string")))
          % _W_U_MOD + 1) / F.lit(float(_W_U_MOD + 1)))
    return F.round(F.log(u) / F.col("n_chars"), 10)


def _weighted_reservoir_body(state_root: str, k: int = WEIGHTED_RES_K):
    """foreachBatch body for the WEIGHTED reservoir — same versioned
    max-k semilattice fold as :func:`_reservoir_body`, different race
    key (A-Res: keep the k largest ln(u)/w). The merge algebra, and
    with it every exactly-once/chop-invariance argument, is key-
    agnostic — only the key column changes."""
    def body(batch: DataFrame, batch_id: int) -> None:
        ss = batch.sparkSession
        keyed = (batch.select("doc_id", "n_chars")
                 .withColumn("race_key", _weighted_race_key_col())
                 .orderBy(F.desc("race_key"), F.asc("doc_id"))
                 .limit(k))
        versions = _committed_versions(state_root, below=batch_id)
        if versions:
            prev = ss.read.parquet(
                os.path.join(state_root, f"v={versions[-1]}"))
        else:
            prev = local_df(
                ss, [], "doc_id long, n_chars int, race_key double")
        out = os.path.join(state_root, f"v={batch_id}")
        (_merge_reservoir(prev, keyed, k)
         .coalesce(1).write.mode("overwrite").parquet(out))
    return body


def _weighted_reservoir_oracle() -> str:
    h = hex64_sql(f"'{_W_SALT}' || CAST(doc_id AS VARCHAR)")
    return f"""
WITH keyed AS (
  SELECT doc_id, n_chars,
         ROUND(ln((({h} % {_W_U_MOD}) + 1) / {_W_U_MOD + 1}.0)
               / n_chars, 10) AS race_key
  FROM documents
), ranked AS (
  SELECT doc_id, n_chars, race_key,
         ROW_NUMBER() OVER (ORDER BY race_key DESC, doc_id) AS rank
  FROM keyed
)
SELECT CAST(rank AS BIGINT) AS rank, doc_id, n_chars, race_key
FROM ranked WHERE rank <= {WEIGHTED_RES_K}
"""


@register(
    "stream_reservoir_weighted",
    oracle=_weighted_reservoir_oracle(),
    description=f"weighted streaming reservoir (A-Res): a "
                f"{WEIGHTED_RES_K}-doc weight-proportional sample "
                "(weight = n_chars) of everything that ever streamed "
                "past, O(k) state — sample_weighted's exponential race "
                "moved to the ingest door through the same versioned "
                "max-k semilattice fold as stream_reservoir_sample",
    tags=("streaming", "sampling", "weighted", "topk"),
)
def stream_reservoir_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``sample_weighted`` (Efraimidis–Spirakis A-Res, weight =
    n_chars — the "sample by token budget" curation step) as a
    STREAMING operator: the race keys are deterministic, so the
    weighted reservoir is the same max-k semilattice fold as the
    uniform one — batch-chop-invariant, replay-idempotent, crash-safe
    versioned O(k) state — and the one-shot SQL top-k replays it
    exactly. Together with ``stream_reservoir_sample`` this closes the
    sampling family's streaming column for both uniform and weighted
    draws."""
    from ..engine.scratch import scratch_dir

    tune_session(spark)
    dirs = _WRES_DIRS.get(sf_dir)
    if dirs is None:
        feed_dir = scratch_dir("fsbd_wres_feed_")
        state_root = scratch_dir("fsbd_wres_state_")
        ckpt = scratch_dir("fsbd_wres_ckpt_")
        (spark.read.parquet(f"{sf_dir}/documents.parquet")
         .select("doc_id", "n_chars")
         .repartition(4).write.mode("overwrite").parquet(feed_dir))
        dirs = (feed_dir, state_root, ckpt)
        _WRES_DIRS[sf_dir] = dirs
    feed_dir, state_root, ckpt = dirs

    template = spark.read.parquet(feed_dir)
    feed = (spark.readStream.schema(template.schema)
            .option("maxFilesPerTrigger", 1).parquet(feed_dir))
    q = (feed.writeStream.foreachBatch(
             _weighted_reservoir_body(state_root))
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return read_reservoir(spark, state_root)
