"""Streaming joins and streaming dedup.

SURVEY.md §2.5: the reference has NO joins anywhere — the closest it
gets is the lambda README's declared batch-vs-speed diff
(``/root/reference/README.md:49-55``), implemented batch-side in
``operators/wordcount.py``. These operators expose the streaming join
family Structured Streaming actually supports, each shape chosen for
bounded state at 100 TB/day:

- stream-static broadcast enrichment: the dimension is broadcast to
  every task, zero streaming state;
- stream-stream event-time join: both sides watermarked and the join
  condition time-bounded, so the state store holds only the last
  watermark-window of rows per side;
- streaming dedup: ``dropDuplicates`` on the key columns keeps one
  state-store entry per key (with a watermark it would be
  ``dropDuplicatesWithinWatermark`` and bounded eviction).

All three drain via Available-Now into a memory sink, so each has a
plain-SQL DuckDB oracle (same rows a batch run would produce).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..engine.session import tune_session
from ..operators.registry import register
from ..operators.similarity import SRP_BITS_WIDE as _SRP_BITS_WIDE
from .core import run_to_completion, stream_table
from .windows import TS_FMT, with_event_time


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    path = f"{sf_dir}/events.parquet"
    template = spark.read.parquet(path)
    return with_event_time(stream_table(spark, path, template))


@register(
    "stream_static_enrich",
    oracle="""
SELECT c_mktsegment, COUNT(*) AS events
FROM events JOIN customer ON user_id = c_custkey
GROUP BY c_mktsegment
""",
    description="stream-static broadcast join: enrich events with customer dim, agg by segment",
    tags=("streaming", "join", "broadcast"),
)
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..engine.catalog import Catalog
    ev = _events_stream(spark, sf_dir)
    dim = Catalog(spark, sf_dir).customer.select("c_custkey", "c_mktsegment")
    joined = ev.join(F.broadcast(dim), ev.user_id == dim.c_custkey)
    agg = joined.groupBy("c_mktsegment").agg(F.count("*").alias("events"))
    return run_to_completion(agg, output_mode="complete")


@register(
    "stream_stream_join",
    oracle="""
SELECT v.user_id,
       strftime(v.ts, '%Y-%m-%d %H:%M:%S') AS view_ts,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts
FROM events v JOIN events p
  ON v.user_id = p.user_id
 AND v.event_type = 'view' AND p.event_type = 'purchase'
 AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
""",
    description="stream-stream event-time join: purchase within 1h of view, watermark-bounded state (45d replay horizon)",
    tags=("streaming", "join"),
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """State is bounded by the watermark horizon on BOTH sides plus the
    time-bounded join condition; a live deployment sets the horizon to
    its ingestion disorder (minutes-hours). The fixture REPLAYS 30 days
    of history, so the horizon here is 45 days — like
    ``stream_dedup_watermarked``, the replay-safe setting that keeps
    the emitted pair set chop-invariant (a 2-hour horizon was only
    correct while availableNow happened to drain the single fixture
    file in one micro-batch; a multi-file feed would silently late-drop
    rows the batch oracle contains — r11 review finding)."""
    ev = _events_stream(spark, sf_dir)
    views = (ev.where(F.col("event_type") == "view")
             .select(F.col("user_id").alias("v_user"), F.col("ts").alias("view_ts"))
             .withWatermark("view_ts", "45 days"))
    buys = (ev.where(F.col("event_type") == "purchase")
            .select(F.col("user_id").alias("p_user"), F.col("ts").alias("purchase_ts"))
            .withWatermark("purchase_ts", "45 days"))
    j = views.join(
        buys,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (F.col("purchase_ts") <= F.col("view_ts") + F.expr("INTERVAL 1 HOUR")),
    )
    out = j.select(
        F.col("v_user").alias("user_id"),
        F.date_format("view_ts", TS_FMT).alias("view_ts"),
        F.date_format("purchase_ts", TS_FMT).alias("purchase_ts"),
    )
    return run_to_completion(out, output_mode="append")


@register(
    "stream_dedup",
    oracle="""
SELECT DISTINCT user_id, event_type FROM events
""",
    description="streaming dedup: one state-store entry per (user, event_type) key",
    tags=("streaming", "dedup"),
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_stream(spark, sf_dir)
    # Project to the key first so the emitted row is the key itself —
    # "which row arrived first" is batch-timing-dependent, the key set
    # is not.
    deduped = ev.select("user_id", "event_type").dropDuplicates(
        ["user_id", "event_type"])
    return run_to_completion(deduped, output_mode="append")


@register(
    "stream_dedup_watermarked",
    oracle="""
SELECT DISTINCT user_id, event_type FROM events
""",
    description="bounded-state streaming dedup: dropDuplicatesWithinWatermark expires key state past the horizon",
    tags=("streaming", "dedup", "watermark"),
)
def stream_dedup_watermarked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``stream_dedup``'s production variant. Plain ``dropDuplicates``
    keeps every key it has ever seen — on an unbounded 100 TB stream the
    state store grows forever. ``dropDuplicatesWithinWatermark`` bounds
    it: a key's entry is evicted once the watermark passes its event
    time + delay, so state size ∝ keys per horizon, the only dedup a
    long-running deployment can actually operate (duplicates in real
    pipelines — producer retries, at-least-once sources — arrive within
    seconds, not months).

    The fixture's events span 30 days; the 45-day horizon therefore
    covers the whole replay, making the emitted key set EXACTLY the
    batch DISTINCT (the correctness statement) while exercising the
    bounded-state operator and its watermark plumbing for real. Emits
    the key projection only — "which duplicate arrived first" is
    batch-timing-dependent, the key set is not.
    """
    ev = _events_stream(spark, sf_dir)
    deduped = (ev.select("user_id", "event_type", "ts")
               .withWatermark("ts", "45 days")
               .dropDuplicatesWithinWatermark(["user_id", "event_type"])
               .select("user_id", "event_type"))
    return run_to_completion(deduped, output_mode="append")


# ---------------------------------------------------------------------------
# Streaming decontamination against a PERSISTED reference set (r8 verdict
# item 5): the production ingest shape "drop incoming docs that hit the
# eval set" — the batch family (operators/decontam.py) flags a static
# corpus; a pipeline ingesting continuously must make the same decision
# per micro-batch against the stored gram index.
# ---------------------------------------------------------------------------

_GATE_DIR_CACHES: list[dict] = []


def _registered_cache() -> dict:
    """A gate's memoized-dirs cache, auto-enrolled for
    :func:`reset_gate_dirs` — a new gate cannot be forgotten by the
    probe reset (r11 review finding: the reset used to hand-enumerate
    every cache, so an omission made fresh-dirs probing a silent
    zero-batch no-op for that gate)."""
    d: dict = {}
    _GATE_DIR_CACHES.append(d)
    return d


def _gate_dirs(cache: dict, sf_dir: str, tag: str) -> tuple[str, str]:
    """Memoized (sink dir, checkpoint dir) scratch pair for an ingest
    gate — the 6-line block every gate used to copy."""
    dirs = cache.get(sf_dir)
    if dirs is None:
        from ..engine.scratch import scratch_dir
        dirs = (scratch_dir(f"fsbd_{tag}_out_"),
                scratch_dir(f"fsbd_{tag}_ckpt_"))
        cache[sf_dir] = dirs
    return dirs


_EVAL_INDEX_DIRS: dict[str, str] = {}
_DECONTAM_DIRS = _registered_cache()


def _read_gate_output(spark: SparkSession, out_dir: str,
                      schema: str) -> DataFrame:
    """Read an ingest gate's epoch-partitioned sink with an EXPLICIT
    schema: a feed whose every batch is fully dropped writes no files,
    and a schema-less parquet read of the empty directory raises
    UNABLE_TO_INFER_SCHEMA — an all-dropped stream is an EMPTY result,
    not an error (surfaced by the sf1.0 curate probe, where the decade
    corpus's token suffixing zeroes English-stopword evidence
    corpus-wide). The batch_id partition column is layout, not
    contract: the explicit schema omits it, and the drop removes the
    discovered partition column when files exist (a no-op on the
    empty read, where nothing was discovered)."""
    return spark.read.schema(schema).parquet(out_dir).drop("batch_id")


def _eval_gram_index_dir(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the eval set's distinct n-grams as parquet ONCE per
    (process, corpus) — the persisted reference set a long-running
    ingest checks every batch against (benchmarks change rarely; the
    stream runs forever). Same memoized-artifact economics as the BPE
    merge table and the PQ codebooks."""
    path = _EVAL_INDEX_DIRS.get(sf_dir)
    if path is not None:
        return path
    from ..engine.catalog import Catalog
    from ..engine.scratch import scratch_dir
    from ..functions.text import token_ngrams, tokens
    from ..operators.decontam import DECONTAM_N, EVAL_MOD

    path = scratch_dir("fsbd_eval_gram_index_")
    d = Catalog(spark, sf_dir).documents.where(F.col("doc_id") % EVAL_MOD == 0)
    toks = d.select(tokens("text").alias("toks"))
    (toks.select(F.explode(F.array_distinct(
        token_ngrams(F.col("toks"), DECONTAM_N))).alias("g"))
     .distinct()
     .write.mode("overwrite").parquet(path))
    _EVAL_INDEX_DIRS[sf_dir] = path
    return path


def _decontam_admit(index_path: str, out_dir: str):
    """foreachBatch body: within each micro-batch (a plain batch
    DataFrame, so the full join surface applies) broadcast the stored
    gram index, left-semi it against the batch's exploded grams to find
    contaminated doc_ids, anti-join them away, write survivors to the
    output parquet. The index is read through the BATCH's session —
    foreachBatch hands a micro-batch clone, and mixing DataFrames
    across sessions is an error.

    The write is IDEMPOTENT per epoch (r9 ADVICE): foreachBatch is
    at-least-once — a crash after the sink write but before the
    checkpoint commit replays the micro-batch — so survivors land in a
    ``batch_id=<epoch>`` partition under DYNAMIC partition overwrite.
    A replayed epoch rewrites ITS OWN partition in place instead of
    appending a duplicate file set; epochs never overwrite each other.
    This is the documented recipe for exactly-once semantics over an
    at-least-once callback: deterministic batch content (a file feed
    replays byte-identical) + an idempotent epoch-keyed write."""
    def admit(batch: DataFrame, batch_id: int) -> None:
        idx = batch.sparkSession.read.parquet(index_path)
        # Batch-scoped persist: the tokenize + n-gram projection feeds
        # both the membership check and the survivor anti-join —
        # Catalyst does not CSE across join inputs, so without it every
        # doc would be tokenized and n-grammed twice per micro-batch
        # (r11 review finding; the sibling gates' r10 pattern).
        batch = batch.persist()
        try:
            g = batch.select("doc_id", F.explode("gs").alias("g"))
            hits = (g.join(F.broadcast(idx), "g", "left_semi")
                    .select("doc_id").distinct())
            (batch.join(hits, "doc_id", "left_anti")
             .select("doc_id", F.size("gs").cast("int").alias("n_grams"),
                     F.lit(batch_id).alias("batch_id"))
             .write.mode("overwrite")
             .option("partitionOverwriteMode", "dynamic")
             .partitionBy("batch_id").parquet(out_dir))
        finally:
            batch.unpersist()
    return admit


def _stream_decontam_oracle() -> str:
    from ..operators.decontam import _NG_SQL, EVAL_MOD
    return f"""
WITH g AS (
  SELECT doc_id, unnest({_NG_SQL}) AS g FROM documents
), ev AS (
  SELECT DISTINCT g FROM g WHERE doc_id % {EVAL_MOD} = 0
), hits AS (
  SELECT DISTINCT doc_id FROM g JOIN ev USING (g) WHERE doc_id % {EVAL_MOD} <> 0
)
SELECT doc_id, CAST(len({_NG_SQL}) AS INTEGER) AS n_grams
FROM documents
WHERE doc_id % {EVAL_MOD} <> 0
  AND doc_id NOT IN (SELECT doc_id FROM hits)
"""


@register(
    "stream_decontam",
    oracle=_stream_decontam_oracle(),
    description="streaming decontamination: per-micro-batch broadcast "
                "membership check against the persisted eval-gram index; "
                "admitted docs written exactly-once (checkpointed "
                "foreachBatch + idempotent per-batch_id dynamic "
                "partition overwrite)",
    tags=("streaming", "decontam", "broadcast"),
)
def stream_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-time decontamination — the streaming member of the
    decontam family (``decontam_overlap`` is the static-corpus audit):
    incoming documents are admitted only if NONE of their word n-grams
    appear in the persisted eval-set gram index; contaminated docs are
    dropped at the door, before they ever land in the training store.

    Shape: readStream over the document feed → map-side gram arrays →
    checkpointed ``foreachBatch`` where each micro-batch broadcast-joins
    the stored index (benchmark-sized — KBs against a TB/day feed) and
    writes survivors to the output table. Replay is idempotent at BOTH
    layers: the checkpoint records consumed source files, so a restart
    (or a second drain over an unchanged feed) adds zero batches and
    zero rows — and if a crash lands between the sink write and the
    checkpoint commit, the replayed epoch's dynamic partition
    overwrite rewrites its own ``batch_id`` partition instead of
    appending duplicates (both pinned in tests/test_streaming.py).

    Scale: per-batch cost is one broadcast membership join + a
    batch-local doc_id dedup — no streaming state store at all (the
    decision needs nothing remembered across batches), so state is ZERO
    regardless of stream length; the index refreshes by rewriting the
    parquet it reads. Oracle replays the same admit rule over the whole
    corpus in one batch, which equals the union of per-batch decisions
    exactly because admission is per-doc."""
    from ..functions.text import token_ngrams, tokens
    from ..operators.decontam import DECONTAM_N, EVAL_MOD

    tune_session(spark)
    index_path = _eval_gram_index_dir(spark, sf_dir)
    out_dir, ckpt = _gate_dirs(_DECONTAM_DIRS, sf_dir, "stream_decontam")

    path = f"{sf_dir}/documents.parquet"
    template = spark.read.parquet(path)
    docs = stream_table(spark, path, template)
    # Project tokens to an attribute before n-gramming (CollapseProject
    # discipline — a lambda body re-evaluates non-attribute inputs per
    # element; same shape as operators/decontam.py).
    gs = (docs.where(F.col("doc_id") % EVAL_MOD != 0)
          .select("doc_id", tokens("text").alias("toks"))
          .select("doc_id",
                  F.array_distinct(
                      token_ngrams(F.col("toks"), DECONTAM_N)).alias("gs")))
    q = (gs.writeStream.foreachBatch(_decontam_admit(index_path, out_dir))
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    # batch_id is a sink-layout column (the idempotency key), not part
    # of the query's result contract — project it away for the oracle.
    return _read_gate_output(spark, out_dir,
                             "doc_id long, n_grams int")


# ---------------------------------------------------------------------------
# Streaming image-dedup at ingest (r9 verdict item 1): the image twin of
# stream_decontam — drop an incoming image if it near-dups the corpus,
# decided per micro-batch against the persisted phash signature index.
# ---------------------------------------------------------------------------

_PHASH_ADMIT_DIRS = _registered_cache()


def _phash_gate(index_path: str, target_dir: str, sensor: str):
    """Shared foreachBatch chain for BOTH phash gates (admit + ingest —
    they differ only in sensor label and target dir, r11 review
    finding): hash the micro-batch's payloads (the two Arrow passes of
    ``phash_signature_frame``), bipartite banded-join the batch
    signatures against the stored corpus index, drop every new doc
    with a hamming ≤ ball hit, write survivors' signature rows to a
    ``batch_id=<epoch>`` partition under dynamic partition overwrite
    (the idempotent-replay recipe pinned on ``_decontam_admit``). The
    index is read through the BATCH's session; the signature frame is
    batch-scoped persisted (feeds the banded probe AND the final
    anti-join)."""
    def body(batch: DataFrame, batch_id: int) -> None:
        from ..operators.dedup import banded_hamming_join
        from ..operators.multimodal import (PHASH_BAND_BITS_SCALED,
                                            PHASH_BITS, PHASH_HAMMING_MAX,
                                            phash_signature_frame)

        idx = batch.sparkSession.read.parquet(index_path)
        sig = phash_signature_frame(batch).persist()
        try:
            hits = (banded_hamming_join(
                        idx, sig, bits=PHASH_BITS,
                        band_bits=PHASH_BAND_BITS_SCALED, sig_col="phash",
                        sensor=sensor, hamming_max=PHASH_HAMMING_MAX)
                    .select(F.col("new_doc").alias("doc_id")).distinct())
            (sig.join(hits, "doc_id", "left_anti")
             .withColumn("batch_id", F.lit(batch_id))
             .write.mode("overwrite")
             .option("partitionOverwriteMode", "dynamic")
             .partitionBy("batch_id").parquet(target_dir))
        finally:
            sig.unpersist()
    return body


def _phash_admit(index_path: str, out_dir: str):
    """Admit gate: survivors land in the gate's own sink (see
    :func:`_phash_gate` for the shared chain)."""
    from ..operators.multimodal import PHASH_BAND_BITS_SCALED
    return _phash_gate(index_path, out_dir,
                       f"phash_admit_band{PHASH_BAND_BITS_SCALED}")


def _phash_hits_cte() -> str:
    """Shared oracle chain for the phash gates: per-doc signatures plus
    the bipartite new×corpus verified ``hits`` — the admit and ingest
    oracles differ only in the final SELECT."""
    from ..operators.multimodal import (PHASH_HAMMING_MAX, PHASH_INCR_MOD,
                                        PHASH_INCR_REM, _phash_sig_cte)
    return _phash_sig_cte() + f""", hits AS (
  SELECT DISTINCT b.doc_id
  FROM ph a JOIN ph b
    ON a.doc_id % {PHASH_INCR_MOD} <> {PHASH_INCR_REM}
   AND b.doc_id % {PHASH_INCR_MOD} = {PHASH_INCR_REM}
  WHERE bit_count(xor(a.phash, b.phash)) <= {PHASH_HAMMING_MAX}
)"""


def _stream_phash_admit_oracle() -> str:
    from ..operators.multimodal import PHASH_INCR_MOD, PHASH_INCR_REM
    return _phash_hits_cte() + f"""
SELECT doc_id, phash FROM ph
WHERE doc_id % {PHASH_INCR_MOD} = {PHASH_INCR_REM}
  AND doc_id NOT IN (SELECT doc_id FROM hits)
"""


@register(
    "stream_phash_admit",
    oracle=_stream_phash_admit_oracle(),
    description="streaming image-dedup at ingest: per-micro-batch "
                "perceptual hashing + bipartite banded join against the "
                "persisted phash signature index; admitted images written "
                "exactly-once (checkpointed foreachBatch + idempotent "
                "per-batch_id dynamic partition overwrite), zero "
                "streaming state",
    tags=("streaming", "multimodal", "dedup", "phash"),
)
def stream_phash_admit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-time IMAGE dedup — the production shape "drop an incoming
    image if it near-dups the corpus", composed from the r9 family's
    ingredients (persisted signature index, bipartite banded join,
    checkpointed foreachBatch admission) into the streaming member the
    image family lacked; completes the ingest-curation story the
    reference's lambda architecture implies
    (/root/reference/README.md:49-55) the way ``stream_decontam`` does
    for text.

    Shape: readStream over the new dump's document feed → checkpointed
    ``foreachBatch`` where each micro-batch is rendered + hashed (two
    Arrow passes over the BATCH only) and banded-joined against the
    stored 8-byte/doc signature index; survivors land in an epoch-keyed
    partition (idempotent under replay — both the checkpoint layer and
    the crash-replay layer are pinned in tests/test_streaming.py).

    Scale: ZERO streaming state — admission is per-doc against the
    index, nothing is remembered across batches; per-batch cost is the
    dump's hashing plus a candidate join bounded by band-bucket
    occupancy (the sensor rides it); the index refreshes by rewriting
    the parquet it reads, exactly like the decontam gram index. The
    oracle replays the admit rule over the whole dump in one batch,
    which equals the union of per-batch decisions because admission is
    per-doc.

    Division of labor (deliberate, the lambda split): near-dup pairs
    WITHIN the incoming stream (new×new) are NOT decided here — a
    per-batch decision about them would depend on how the feed chops
    into micro-batches, which is exactly the nondeterminism a
    replayable gate must not have. The batch path owns them:
    ``multimodal_phash_clusters`` / ``_apply`` periodically compact the
    accumulated store, the same way every ingest-gate + batch-dedup
    deployment splits the work."""
    from ..operators.multimodal import (PHASH_INCR_MOD, PHASH_INCR_REM,
                                        _phash_index_dir)

    tune_session(spark)
    index_path = _phash_index_dir(spark, sf_dir)
    out_dir, ckpt = _gate_dirs(_PHASH_ADMIT_DIRS, sf_dir, "phash_admit")

    path = f"{sf_dir}/documents.parquet"
    template = spark.read.parquet(path)
    docs = stream_table(spark, path, template)
    feed = (docs.where((F.col("doc_id") % PHASH_INCR_MOD == PHASH_INCR_REM)
                       & (F.length("text") >= 1))
            .select("doc_id", "text"))
    q = (feed.writeStream.foreachBatch(_phash_admit(index_path, out_dir))
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return _read_gate_output(spark, out_dir, "doc_id long, phash long")


_PHASH_INGEST_DIRS = _registered_cache()


def _phash_ingest(base_index_path: str, epochs_dir: str):
    """SELF-GROWING index: the :func:`_phash_gate` decision (per-doc,
    against the BASE generation only — batch-chop-invariant), with
    survivors' signatures appended to the index's EPOCH generation dir.
    Exactly-once index growth over an at-least-once callback: a
    replayed epoch rewrites its own partition; the base generation
    lives in its own dir and is never touched (also why the epoch dir
    is separate — Spark rightly refuses to overwrite a path the same
    plan reads from)."""
    from ..operators.multimodal import PHASH_BAND_BITS_SCALED
    return _phash_gate(base_index_path, epochs_dir,
                       f"phash_ingest_band{PHASH_BAND_BITS_SCALED}")


def _stream_phash_ingest_oracle() -> str:
    from ..operators.multimodal import PHASH_INCR_MOD, PHASH_INCR_REM
    return _phash_hits_cte() + f"""
SELECT doc_id, phash FROM ph
WHERE doc_id % {PHASH_INCR_MOD} <> {PHASH_INCR_REM}
   OR doc_id NOT IN (SELECT doc_id FROM hits)
"""


@register(
    "stream_phash_ingest",
    oracle=_stream_phash_ingest_oracle(),
    description="self-growing image index: the streaming admit gate "
                "whose survivors' signatures are appended INTO the "
                "signature index as epoch-keyed partitions (exactly-once "
                "growth: base generation immutable, replayed epochs "
                "rewrite their own partition); returns the grown index",
    tags=("streaming", "multimodal", "dedup", "phash", "storage"),
)
def stream_phash_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CLOSED ingest loop — what ``stream_phash_admit`` (gate) and
    ``multimodal_phash_index_append`` (write side) compose into in
    production: every admitted image's 8-byte signature row lands in
    the index the NEXT dump will be checked against, with no separate
    maintenance job. The index is two generations on disk: the
    immutable corpus generation (the memoized ``_phash_index_dir``
    artifact — shared with the admit/persist entries, never written
    here) plus a batch_id-partitioned EPOCH dir where each
    micro-batch's survivors land under dynamic partition overwrite —
    so BOTH layers of replay are idempotent (checkpointed file feed +
    epoch-keyed rewrite) and a crash between sink write and checkpoint
    commit cannot duplicate index rows. The generation split is also a
    correctness requirement: Spark (rightly) refuses to overwrite a
    path the same plan reads from. Folding accumulated epochs back
    into one generation is ``phash_index_compact`` — the maintenance
    the append entry pins.

    Admission stays per-doc against the BASE generation (the
    ``stream_phash_admit`` rule, same division-of-labor note) — that is
    what makes the grown index's content independent of how the feed
    chops into micro-batches, and hence SQL-expressible: the oracle is
    simply corpus signatures ∪ admitted-dump signatures, recomputed
    from source bytes.

    Scale: per-batch cost identical to the admit gate plus one
    batch-sized partition write; the index grows 8 bytes per admitted
    image; zero streaming state."""
    from ..operators.multimodal import (PHASH_INCR_MOD, PHASH_INCR_REM,
                                        _phash_index_dir)

    tune_session(spark)
    base_dir = _phash_index_dir(spark, sf_dir)   # the corpus generation
    epochs_dir, ckpt = _gate_dirs(_PHASH_INGEST_DIRS, sf_dir, "phash_ingest")

    path = f"{sf_dir}/documents.parquet"
    template = spark.read.parquet(path)
    docs = stream_table(spark, path, template)
    feed = (docs.where((F.col("doc_id") % PHASH_INCR_MOD == PHASH_INCR_REM)
                       & (F.length("text") >= 1))
            .select("doc_id", "text"))
    q = (feed.writeStream.foreachBatch(_phash_ingest(base_dir, epochs_dir))
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    base = spark.read.parquet(base_dir).select("doc_id", "phash")
    grown = _read_gate_output(spark, epochs_dir,
                              "doc_id long, phash long")
    return base.unionByName(grown)


# ---------------------------------------------------------------------------
# Streaming embedding admission — the vector member of the ingest-gate
# family (text: stream_decontam; images: stream_phash_admit): drop an
# incoming embedding if it near-dups the corpus, per micro-batch
# against the persisted SRP bucket index.
# ---------------------------------------------------------------------------

_EMB_ADMIT_DIRS = _registered_cache()


def _verify_pool():
    """One-thread overlap pool for the verify tiers' driver id collects
    (guide §2.6: Spark happily runs jobs from several driver threads;
    the tiers' actions are only sequential because the driver code
    called them sequentially). The r15 body decomposition measured
    ~43% of the per-batch wall as DRIVER-side expression construction
    (minhash/HOF lambda trees, the pandas-UDF registration) serialized
    between the two id-collect actions — so each collect now runs on
    this pool while the main thread builds the next tier's expression
    trees. One worker is enough: there is never more than one collect
    in flight. ``FSBD_GATE_SERIAL=1`` restores the serial order (the
    committed A/B adjudication seam — scripts/adjudicate_gate_overlap.py
    toggles it inside one process)."""
    import os
    if os.environ.get("FSBD_GATE_SERIAL") == "1":
        return None
    from concurrent.futures import ThreadPoolExecutor
    return ThreadPoolExecutor(max_workers=1)


class _Done:
    """Pre-resolved future for the serial (pool=None) path."""

    def __init__(self, v):
        self._v = v

    def result(self):
        return self._v


def _submit(pool, fn, *args):
    """Submit to the overlap pool, or run inline when serial."""
    if pool is None:
        return _Done(fn(*args))
    return pool.submit(fn, *args)


def _cosine_verify_hits(spark: SparkSession, cand: DataFrame,
                        batch: DataFrame, payload_path: str,
                        quant_payload_path: str | None = None,
                        scope: list | None = None) -> DataFrame:
    """Exact-cosine verify for the embedding gate, two-tier since r13
    (r12 verdict item 2). Tier 1: point-fetch candidate corpus
    vectors' PACKED-INT16 quantizations (~0.5× the float bytes) and
    screen pairs on the provable cosine UPPER BOUND
    (``similarity.quantized_vec_cols``'s Cauchy–Schwarz argument:
    cos(x,v) ≤ (x·ũ + |x|r)/(|x|(|ũ|−r)) with r the quantization error
    radius) — keeping a superset of the exact-passing pairs, so the
    screen changes I/O, never the result, and every oracle stays
    as-is. Tier 2: point-fetch only the screen survivors' float
    vectors (≈ true near-dups) and decide on exact cosine. Both tiers
    are pk-pruned point fetches — NEVER a pass over embeddings.parquet
    (the r10 weak item). Module-level so tests/test_plans.py can pin
    the fetch plans outside the streaming run; the screened pair frame
    is batch-scoped persisted (it feeds the tier-2 id fetch AND the
    exact join), so two-tier callers must pass ``scope`` and unpersist
    it after the sink write consumes the result."""
    from ..engine.pointfetch import (fetch_ids, fetch_payload,
                                     fetch_payload_prefetched)
    from ..functions.vectors import cosine_sim
    from ..operators.similarity import NEARDUP_COS, quant_screen_keep

    q = batch.select("vec_id", F.col("embedding").alias("qv"))
    if quant_payload_path is not None:
        assert scope is not None, \
            "two-tier verify persists; caller must pass scope"
        pool = _verify_pool()
        try:
            ids_df = cand.select(F.col("old_id").alias("vec_id"))
            ids1 = _submit(pool, fetch_ids, ids_df, "vec_id")
            # §2.6 overlap: while the candidate-id collect materializes
            # the bucket join on the pool thread, the driver builds the
            # Cauchy-Schwarz screen's HOF expression trees
            # (quant_screen_keep — id-independent, name-resolved at
            # analysis; the Arrow-kernel variant was measured and
            # rejected, see quant_screen_keep_arrow).
            keep = quant_screen_keep(F.col("qv"), F.col("w32"),
                                     F.col("s"))
            qp = (fetch_payload_prefetched(spark, quant_payload_path,
                                           "vec_id", ids_df, ids1.result())
                  .select(F.col("vec_id").alias("old_id"), "w32", "s"))
            cand = (cand.join(qp, "old_id").join(q, "vec_id")
                    .where(keep)
                    .select("old_id", "vec_id").persist())
            scope.append(cand)
            ids2_df = cand.select(F.col("old_id").alias("vec_id"))
            ids2 = _submit(pool, fetch_ids, ids2_df, "vec_id")
            # Overlap again: the screen's materialization + collect runs
            # while the driver constructs (and registers) the exact
            # Arrow cosine UDF for tier 2.
            cos_pred = (cosine_sim(F.col("old_emb"), F.col("qv"))
                        >= NEARDUP_COS)
            corpus = (fetch_payload_prefetched(spark, payload_path,
                                               "vec_id", ids2_df,
                                               ids2.result())
                      .select(F.col("vec_id").alias("old_id"),
                              F.col("embedding").alias("old_emb")))
        finally:
            if pool is not None:
                pool.shutdown(wait=False)
    else:
        cos_pred = cosine_sim(F.col("old_emb"), F.col("qv")) >= NEARDUP_COS
        corpus = (fetch_payload(spark, payload_path, "vec_id",
                                cand.select(F.col("old_id")
                                            .alias("vec_id")))
                  .select(F.col("vec_id").alias("old_id"),
                          F.col("embedding").alias("old_emb")))
    return (cand.join(corpus, "old_id").join(q, "vec_id")
            .where(cos_pred)
            .select("vec_id").distinct())


def _embedding_gate(index_path: str, payload_path: str, target_dir: str,
                    sensor: str, survivors, tables: int | None = None,
                    bits: int | None = None,
                    quant_payload_path: str | None = None):
    """Shared foreachBatch chain for BOTH embedding gates (admit +
    ingest — r11 review finding): bucket the micro-batch's vectors (the
    SRP Arrow pass), equi-join the batch's (table_id, bucket) rows
    against the stored corpus index, verify candidates with the exact
    cosine kernel over POINT-FETCHED payload rows (engine.pointfetch —
    per-batch I/O ∝ candidates, never an embeddings.parquet pass), and
    write ``survivors(batch, nb, hits)`` to a ``batch_id=<epoch>``
    partition under dynamic partition overwrite (the family's
    idempotent-replay recipe). Candidates carry IDS ONLY through the
    bucket join; the bucket rows and candidate subtree are batch-scoped
    persisted (each feeds two consumers). ``tables``/``bits`` default
    to the registered fixture operating point; the sf1.0 probe
    overrides bits to the N/64 sizing rule against a matching index."""
    def body(batch: DataFrame, batch_id: int) -> None:
        from ..functions import observability
        from ..operators.similarity import (SRP_BITS, SRP_TABLES,
                                            srp_bucket_rows)

        ss = batch.sparkSession
        idx = (ss.read.parquet(index_path)
               .withColumnRenamed("vec_id", "old_id"))
        nb = (srp_bucket_rows(
                  batch,
                  tables=tables if tables is not None else SRP_TABLES,
                  bits=bits if bits is not None else SRP_BITS)
              .persist())
        try:
            cand = (nb.join(idx, ["table_id", "bucket"])
                    .select("vec_id", "old_id"))
            cand = (observability.observe_candidates(cand, sensor)
                    .distinct().persist())
            scope: list = []
            try:
                hits = _cosine_verify_hits(
                    ss, cand, batch, payload_path,
                    quant_payload_path=quant_payload_path, scope=scope)
                (survivors(batch, nb, hits)
                 .withColumn("batch_id", F.lit(batch_id))
                 .write.mode("overwrite")
                 .option("partitionOverwriteMode", "dynamic")
                 .partitionBy("batch_id").parquet(target_dir))
            finally:
                for df in scope:
                    df.unpersist()
                cand.unpersist()
        finally:
            nb.unpersist()
    return body


def _embedding_admit(index_path: str, payload_path: str, out_dir: str,
                     tables: int | None = None, bits: int | None = None,
                     quant_payload_path: str | None = None):
    """Admit gate: survivors are the batch's vec_ids without a verified
    hit (see :func:`_embedding_gate` for the shared chain)."""
    return _embedding_gate(
        index_path, payload_path, out_dir, "srp_admit",
        lambda batch, nb, hits: (batch.select("vec_id")
                                 .join(hits, "vec_id", "left_anti")),
        tables=tables, bits=bits, quant_payload_path=quant_payload_path)


def _emb_admit_cte(bits: int | None = None) -> str:
    """Shared oracle chain for the embedding gate: SRP buckets over
    ALL vectors (``b``), the bipartite new×corpus candidate join, and
    the exact-cosine-verified ``hits`` — reused by the admit and
    ingest oracles, which differ only in the final SELECT. ``bits``
    mirrors the gate's SRP geometry knob (fixture default vs the
    ``_scaled`` entries' N/64 operating point) — the prefix embeds the
    exact plane literals for that geometry."""
    from ..operators.similarity import (ANN_INCR_MOD, ANN_INCR_REM,
                                        NEARDUP_COS, SRP_BITS,
                                        _srp_bucket_prefix)
    return _srp_bucket_prefix(
        bits=bits if bits is not None else SRP_BITS) + f""", newb AS (
  SELECT vec_id, table_id, bucket FROM b
  WHERE vec_id % {ANN_INCR_MOD} = {ANN_INCR_REM}
), oldb AS (
  SELECT vec_id, table_id, bucket FROM b
  WHERE vec_id % {ANN_INCR_MOD} <> {ANN_INCR_REM}
), cand AS (
  SELECT DISTINCT n.vec_id, o.vec_id AS old_id
  FROM newb n JOIN oldb o USING (table_id, bucket)
), hits AS (
  SELECT DISTINCT c.vec_id
  FROM cand c
  JOIN embeddings a ON a.vec_id = c.old_id
  JOIN embeddings q ON q.vec_id = c.vec_id
  WHERE list_cosine_similarity(a.embedding::DOUBLE[], q.embedding::DOUBLE[])
        >= {NEARDUP_COS}
)"""


def _stream_embedding_admit_oracle(bits: int | None = None) -> str:
    from ..operators.similarity import ANN_INCR_MOD, ANN_INCR_REM
    return _emb_admit_cte(bits) + f"""
SELECT vec_id FROM embeddings
WHERE vec_id % {ANN_INCR_MOD} = {ANN_INCR_REM}
  AND vec_id NOT IN (SELECT vec_id FROM hits)
"""


def _run_embedding_admit(spark: SparkSession, sf_dir: str, cache: dict,
                         tag: str, bits: int | None = None) -> DataFrame:
    """Shared entry body for the admit gate at either SRP geometry:
    build/reuse the (geometry-keyed) corpus index + (geometry-free)
    payload, drain the new-vector feed through the checkpointed
    foreachBatch gate, read back the admitted epoch partitions."""
    from ..operators.similarity import (ANN_INCR_MOD, ANN_INCR_REM,
                                        srp_index_dir, srp_payload_dir,
                                        srp_quant_payload_dir)

    tune_session(spark)
    kw = {} if bits is None else {"bits": bits}
    index_path = srp_index_dir(spark, sf_dir, **kw)
    payload_path = srp_payload_dir(spark, sf_dir)
    quant_path = srp_quant_payload_dir(spark, sf_dir)
    out_dir, ckpt = _gate_dirs(cache, sf_dir, tag)

    path = f"{sf_dir}/embeddings.parquet"
    template = spark.read.parquet(path)
    vecs = stream_table(spark, path, template)
    feed = (vecs.where(F.col("vec_id") % ANN_INCR_MOD == ANN_INCR_REM)
            .select("vec_id", "embedding"))
    q = (feed.writeStream
         .foreachBatch(_embedding_admit(index_path, payload_path, out_dir,
                                        bits=bits,
                                        quant_payload_path=quant_path))
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return _read_gate_output(spark, out_dir, "vec_id long")


@register(
    "stream_embedding_admit",
    oracle=_stream_embedding_admit_oracle(),
    description="streaming embedding admission: per-micro-batch SRP "
                "bucketing + bipartite bucket join against the persisted "
                "SRP index, exact-cosine verify; admitted vectors written "
                "exactly-once (checkpointed foreachBatch + idempotent "
                "per-batch_id dynamic partition overwrite), zero "
                "streaming state",
    tags=("streaming", "similarity", "neardup", "lsh"),
)
def stream_embedding_admit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-time EMBEDDING dedup — the vector member of the
    ingest-gate family, completing it across all three column families
    (text n-grams: ``stream_decontam``; image payloads:
    ``stream_phash_admit``; embeddings: this). An incoming vector is
    admitted only if NO corpus vector verifies at cosine ≥ the near-dup
    threshold among its SRP bucket collisions — the stored index's own
    candidate generation, so the gate's recall equals the banded batch
    path's (``embedding_neardup_banded``), and the decision is
    bit-deterministic (integer SRP buckets + the exact cosine kernel),
    which is what makes the oracle replay it exactly.

    Shape: readStream over the embedding feed → checkpointed
    ``foreachBatch`` where each micro-batch is SRP-bucketed (one Arrow
    matmul), its band rows equi-join the table_id-partitioned stored
    index, verified hits anti-join the batch, survivors land in an
    epoch-keyed partition (idempotent under both replay layers, the
    family recipe). Per-doc admission against the immutable index →
    batch-chop-invariant; intra-stream near-dups belong to the batch
    cluster/apply path (the division-of-labor note on
    ``stream_phash_admit``).

    Scale: ZERO streaming state; per-batch cost is one Arrow pass over
    the batch plus a candidate join ∝ batch size × bucket occupancy
    (the ``srp_admit`` sensor rides it); corpus vectors are
    POINT-FETCHED from the payload artifact for candidate ids only —
    scan-level pk/vec_id prunes, never an embeddings.parquet pass
    (r10 verdict item 1; plan pinned in tests/test_plans.py).

    OPERATING POINT: this entry runs the 16×4 FIXTURE geometry — the
    sensor-contrast twin (the ``dedup_simhash`` precedent) whose
    candidate volume the ``srp_admit`` sensor prices. Its bucket space
    is fixed, so occupancy, and the quadratic-in-occupancy candidate
    join, grow with N — the documented sf1.0 pathology. The entry a
    deployment actually runs is ``stream_embedding_admit_scaled``
    (2^bits ≈ N/64), and the self-growing/compaction lifecycle
    composes THAT one (r11 verdict item 1)."""
    return _run_embedding_admit(spark, sf_dir, _EMB_ADMIT_DIRS,
                                "emb_admit")


_EMB_ADMIT_SCALED_DIRS = _registered_cache()


@register(
    "stream_embedding_admit_scaled",
    oracle=_stream_embedding_admit_oracle(bits=_SRP_BITS_WIDE),
    description="the embedding admit gate at the deployment SRP "
                "operating point (16 tables × 9 bits, the 2^bits ≈ "
                "N/64 rule): same chain, index and oracle rebuilt at "
                "the scaled geometry — the entry the ingest/compact "
                "lifecycle composes",
    tags=("streaming", "similarity", "neardup", "lsh"),
)
def stream_embedding_admit_scaled(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """``stream_embedding_admit`` at the N/64-sized SRP geometry
    (``SRP_BITS_WIDE`` = 9 — the 2^bits ≈ N/64 rule at the sf1.0
    corpus, the same graduation ``embedding_neardup_banded_scaled``
    registers for the batch path). The fixture-bits twin above is kept
    as an explicit sensor contrast; THIS is the gate whose per-batch
    candidate join stays ∝ true near-dups as the corpus grows, and the
    geometry the self-growing index and compaction entries ride
    (r11 verdict item 1: no registered lifecycle entry composes the
    fixed-bucket occupancy pathology). Recall trade at the wide point:
    per-table collision is p^9 (p = 1 − θ/π), so 16 tables keep ≈ 99%
    recall at cos ≥ 0.9 true duplicates while low-cosine collision
    noise collapses — the operating point a 100 TB dedup wants."""
    return _run_embedding_admit(spark, sf_dir, _EMB_ADMIT_SCALED_DIRS,
                                "emb_admit_sc", bits=_SRP_BITS_WIDE)


# ---------------------------------------------------------------------------
# Streaming text near-dup admission — the fourth ingest gate: where
# stream_decontam drops eval-set CONTAMINATION, this drops incoming
# docs that NEAR-DUP the training corpus itself (jaccard ≥ threshold),
# per micro-batch against the persisted MinHash band index.
# ---------------------------------------------------------------------------

_TEXT_ADMIT_DIRS = _registered_cache()


def _jaccard_verify_hits(spark: SparkSession, cand: DataFrame,
                         sh_new: DataFrame, payload_path: str | None,
                         hash_payload_path: str | None = None,
                         text_payload_path: str | None = None,
                         scope: list | None = None) -> DataFrame:
    """Exact-jaccard verify for the text gate, two-tier since r12 (r11
    verdict item 2). Tier 1: point-fetch candidate old docs' int32
    shingle HASHES and screen pairs on hash-jaccard at the same
    threshold — provably drop-free (dedup.hashed_shingle_cols' superset
    argument), so the screen changes I/O, never the result, and every
    oracle stays as-is. Tier 2: point-fetch the screen survivors' RAW
    TEXT (true near-dups — a sliver of the candidates) from the 1×
    text payload, re-derive their shingle sets with the index build's
    own kernel, and decide on exact jaccard, collision-proof. Neither
    tier ever passes over documents.parquet (the r10 weak item), and
    neither stores the 2.7×-corpus shingle-string payload the r11
    dossier flagged as the system's biggest at-rest object. Module-
    level so tests/test_plans.py can pin the fetch plans outside the
    streaming run; two-tier needs ``hash_payload_path`` AND
    ``text_payload_path`` — without them the one-tier exact path
    fetches pre-exploded shingle strings from ``payload_path``. The
    screened pair frame is batch-scoped persisted (it feeds the
    tier-2 id fetch AND the exact-jaccard join); it is appended to
    ``scope`` for the CALLER's finally-block to unpersist — the
    result is consumed lazily inside the caller's sink write, after
    this function returns."""
    from ..engine.pointfetch import (fetch_ids, fetch_payload,
                                     fetch_payload_prefetched)
    from ..functions.text import token_ngrams, tokens
    from ..operators.dedup import (JACCARD_THRESHOLD, SHINGLE_N,
                                   hashed_shingle_cols)

    two_tier = hash_payload_path is not None
    if two_tier:
        assert text_payload_path is not None
        # The two-tier path persists the screened pair frame below and
        # hands the unpersist obligation to the caller via ``scope`` —
        # with scope=None the frame would leak in the executor cache
        # for the life of the session (r12 ADVICE).
        assert scope is not None, \
            "two-tier verify persists; caller must pass scope"
        pool = _verify_pool()
        try:
            ids_df = cand.select(F.col("old_doc").alias("doc_id"))
            ids1 = _submit(pool, fetch_ids, ids_df, "doc_id")
            # §2.6 overlap: the candidate-id collect (which materializes
            # the signature chain + bucket join) runs on the pool thread
            # while the driver builds the hash-screen expression trees —
            # the id-independent part of tier 1's driver wall.
            nh = (hashed_shingle_cols(sh_new)
                  .select("doc_id", F.col("hs").alias("hn"),
                          F.col("n").alias("nn"),
                          F.col("collide").alias("coll_n")))
            ih = F.size(F.array_intersect("ho", "hn"))
            keep = (F.col("coll_o") | F.col("coll_n")
                    | (F.col("ih") / (F.col("no") + F.col("nn")
                                      - F.col("ih"))
                       >= JACCARD_THRESHOLD))
            hp = (fetch_payload_prefetched(spark, hash_payload_path,
                                           "doc_id", ids_df, ids1.result())
                  .select(F.col("doc_id").alias("old_doc"),
                          F.col("hs").alias("ho"), F.col("n").alias("no"),
                          F.col("collide").alias("coll_o")))
            cand = (cand.join(hp, "old_doc").join(nh, "doc_id")
                    .select("old_doc", "doc_id", ih.alias("ih"),
                            "no", "nn", "coll_o", "coll_n")
                    .where(keep)
                    .select("old_doc", "doc_id")
                    .persist())
            scope.append(cand)
            ids2_df = cand.select(F.col("old_doc").alias("doc_id"))
            ids2 = _submit(pool, fetch_ids, ids2_df, "doc_id")
            # Overlap again: the screen materializes + collects on the
            # pool thread while the driver constructs tier 2's
            # re-shingle expression chain (the exact kernel the index
            # build used — _shingle_sets' two-projection shape: tokenize
            # into a real column first so the regex split stays
            # once-per-row under the transform() lambda).
            tok_col = tokens("text").alias("toks")
            ng_col = F.array_distinct(
                token_ngrams(F.col("toks"), SHINGLE_N)).alias("so")
            sh_old = (fetch_payload_prefetched(spark, text_payload_path,
                                               "doc_id", ids2_df,
                                               ids2.result())
                      .select("doc_id", tok_col)
                      .select(F.col("doc_id").alias("old_doc"), ng_col))
        finally:
            if pool is not None:
                pool.shutdown(wait=False)
    else:
        sh_old = (fetch_payload(spark, payload_path, "doc_id",
                                cand.select(F.col("old_doc")
                                            .alias("doc_id")))
                  .select(F.col("doc_id").alias("old_doc"),
                          F.col("s").alias("so")))
    i = F.size(F.array_intersect("so", "s"))
    jac = F.col("i") / (F.col("no") + F.col("nn") - F.col("i"))
    return (cand.join(sh_old, "old_doc").join(sh_new, "doc_id")
            .select("doc_id", i.alias("i"),
                    F.size("so").alias("no"), F.size("s").alias("nn"))
            .where(jac >= JACCARD_THRESHOLD)
            .select("doc_id").distinct())


def _text_gate(index_path: str, payload_path: str | None,
               target_dir: str, sensor: str, survivors,
               hash_payload_path: str | None = None,
               text_payload_path: str | None = None):
    """Shared foreachBatch chain for BOTH text gates (admit + ingest —
    r11 review finding): shingle + MinHash-band the micro-batch
    (map-side, the shared ``_band_rows`` kernel), equi-join the batch's
    band rows against the stored corpus index, verify candidates with
    EXACT jaccard over POINT-FETCHED payload shingle sets
    (engine.pointfetch — per-batch I/O ∝ candidates' pk directories,
    never a corpus pass), and write ``survivors(sh_new, bands_new,
    hits)`` to a ``batch_id=<epoch>`` partition under dynamic partition
    overwrite (the family's idempotent-replay recipe). The shingle
    frame, band rows, and candidate subtree are each batch-scoped
    persisted — every one feeds two consumers (r10 ADVICE pattern)."""
    def body(batch: DataFrame, batch_id: int) -> None:
        from ..functions import observability
        from ..functions.text import token_ngrams, tokens
        from ..operators.dedup import SHINGLE_N, _band_rows

        ss = batch.sparkSession
        idx = ss.read.parquet(index_path)           # (doc_id, band, bucket)
        toks = (batch.select("doc_id", tokens("text").alias("toks"))
                .where(F.size("toks") >= SHINGLE_N))
        sh_new = toks.select(
            "doc_id",
            F.array_distinct(token_ngrams(F.col("toks"), SHINGLE_N))
             .alias("s")).persist()
        try:
            bands_new = _band_rows(sh_new).persist()
            try:
                cand = (idx.alias("a").join(
                            bands_new.alias("b"),
                            (F.col("a.band") == F.col("b.band"))
                            & (F.col("a.bucket") == F.col("b.bucket")))
                        .select(F.col("a.doc_id").alias("old_doc"),
                                F.col("b.doc_id").alias("doc_id")))
                cand = (observability.observe_candidates(cand, sensor)
                        .distinct().persist())
                scope: list = []
                try:
                    hits = _jaccard_verify_hits(ss, cand, sh_new,
                                                payload_path,
                                                hash_payload_path,
                                                text_payload_path,
                                                scope=scope)
                    (survivors(sh_new, bands_new, hits)
                     .withColumn("batch_id", F.lit(batch_id))
                     .write.mode("overwrite")
                     .option("partitionOverwriteMode", "dynamic")
                     .partitionBy("batch_id").parquet(target_dir))
                finally:
                    for df in scope:
                        df.unpersist()
                    cand.unpersist()
            finally:
                bands_new.unpersist()
        finally:
            sh_new.unpersist()
    return body


def _text_admit(index_path: str, payload_path: str | None, out_dir: str,
                hash_payload_path: str | None = None,
                text_payload_path: str | None = None):
    """Admit gate: survivors are the batch's docs without a verified
    hit, recorded as (doc_id, n_shingles) rows (see :func:`_text_gate`
    for the shared chain)."""
    return _text_gate(
        index_path, payload_path, out_dir, "text_admit_minhash",
        lambda sh_new, bands_new, hits: (
            sh_new.select("doc_id",
                          F.size("s").cast("int").alias("n_shingles"))
            .join(hits, "doc_id", "left_anti")),
        hash_payload_path=hash_payload_path,
        text_payload_path=text_payload_path)


def _text_inc_oracle() -> str:
    """The bipartite verified near-dup pair subquery (corpus × new
    dump) every text-gate oracle embeds — built once here instead of
    four times (r11 review finding)."""
    from ..operators.dedup import INCR_MOD, INCR_REM, _minhash_oracle
    return _minhash_oracle(
        cand_pred=(f"a.doc_id % {INCR_MOD} <> {INCR_REM} "
                   f"AND b.doc_id % {INCR_MOD} = {INCR_REM}"),
        head_cols="doc_a AS old_doc, doc_b AS new_doc")


def _stream_text_admit_oracle() -> str:
    from ..functions.text import tokens_sql
    from ..operators.dedup import (INCR_MOD, INCR_REM, SHINGLE_N,
                                   _SHINGLES_SQL)
    inc = _text_inc_oracle()
    return f"""
SELECT doc_id, CAST(len({_SHINGLES_SQL}) AS INTEGER) AS n_shingles
FROM documents
WHERE len({tokens_sql('text')}) >= {SHINGLE_N}
  AND doc_id % {INCR_MOD} = {INCR_REM}
  AND doc_id NOT IN (SELECT new_doc FROM ({inc}) inc)
"""


@register(
    "stream_text_admit",
    oracle=_stream_text_admit_oracle(),
    description="streaming text near-dup admission: per-micro-batch "
                "MinHash banding + bipartite bucket join against the "
                "persisted band index, exact-jaccard verify against "
                "point-fetched corpus docs; admitted docs written "
                "exactly-once (idempotent per-batch_id dynamic partition "
                "overwrite), zero streaming state",
    tags=("streaming", "dedup", "lsh"),
)
def stream_text_admit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-time TEXT near-dup admission — the fourth gate, closing
    the 2×2 the family implies: decontamination (eval-set membership)
    and near-dup dedup (corpus similarity) each in batch and streaming
    form. ``stream_decontam`` drops docs that would CONTAMINATE eval
    sets; THIS drops docs the corpus effectively already has
    (jaccard ≥ the dedup family's threshold) — the decision
    ``dedup_incremental`` makes per dump, moved to the ingest door
    against the stored band index (``dedup.minhash_index_dir``).

    Shape: readStream over the new dump's feed → checkpointed
    ``foreachBatch`` where the batch is shingled + banded map-side, its
    band rows equi-join the band-partitioned index, candidates verify
    with EXACT jaccard over shingle sets POINT-FETCHED from the stored
    payload artifact (scan-level pk/doc_id prunes — I/O ∝ candidates,
    never a documents.parquet pass; r10 verdict item 1, plan pinned in
    tests/test_plans.py), and survivors land in an epoch-keyed
    partition (idempotent under both replay layers, the family recipe).

    Scale: ZERO streaming state; per-batch cost is the batch's
    signature work plus a candidate join whose occupancy tracks true
    duplicates (unbounded md5 bucket space — the family adjudication);
    the ``text_admit_minhash`` sensor rides it. Admission is per-doc
    against the immutable index → batch-chop-invariant (intra-stream
    near-dups belong to the batch cluster/apply path, the
    division-of-labor note on ``stream_phash_admit``)."""
    from ..operators.dedup import (INCR_MOD, INCR_REM,
                                   doc_text_payload_dir,
                                   minhash_hash_payload_dir,
                                   minhash_index_dir)

    tune_session(spark)
    path = f"{sf_dir}/documents.parquet"
    index_path = minhash_index_dir(spark, sf_dir)
    hash_payload_path = minhash_hash_payload_dir(spark, sf_dir)
    text_payload_path = doc_text_payload_dir(spark, sf_dir)
    out_dir, ckpt = _gate_dirs(_TEXT_ADMIT_DIRS, sf_dir, "text_admit")

    template = spark.read.parquet(path)
    docs = stream_table(spark, path, template)
    feed = (docs.where(F.col("doc_id") % INCR_MOD == INCR_REM)
            .select("doc_id", "text"))
    q = (feed.writeStream.foreachBatch(
             _text_admit(index_path, None, out_dir,
                         hash_payload_path=hash_payload_path,
                         text_payload_path=text_payload_path))
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return _read_gate_output(spark, out_dir,
                             "doc_id long, n_shingles int")


# ---------------------------------------------------------------------------
# Self-growing TEXT and EMBEDDING indexes — the family twins of
# stream_phash_ingest: the admit gate whose survivors' band/SRP rows
# are appended INTO the index as epoch-keyed partitions, closing the
# ingest loop for all three column families.
# ---------------------------------------------------------------------------

_TEXT_INGEST_DIRS = _registered_cache()


def _text_ingest(base_index_path: str, payload_path: str | None,
                 epochs_dir: str,
                 hash_payload_path: str | None = None,
                 text_payload_path: str | None = None):
    """SELF-GROWING MinHash band index: the :func:`_text_gate` decision
    (per-doc, vs the BASE generation only — batch-chop-invariant), with
    survivors' BAND ROWS landing in the index's epoch generation as a
    ``batch_id=<epoch>`` partition — the ``_phash_ingest`` recipe on
    the text family."""
    return _text_gate(
        base_index_path, payload_path, epochs_dir, "text_ingest_minhash",
        lambda sh_new, bands_new, hits: (
            bands_new.join(hits, "doc_id", "left_anti")
            .select("doc_id", F.col("band").cast("int").alias("band"),
                    "bucket")),
        hash_payload_path=hash_payload_path,
        text_payload_path=text_payload_path)


def _stream_text_ingest_oracle() -> str:
    from ..operators.dedup import (INCR_MOD, INCR_REM,
                                   _minhash_bands_prefix)
    inc = _text_inc_oracle()
    return _minhash_bands_prefix() + f"""
SELECT doc_id, CAST(band AS INTEGER) AS band, bucket FROM bands
WHERE doc_id % {INCR_MOD} <> {INCR_REM}
   OR doc_id NOT IN (SELECT new_doc FROM ({inc}) inc)
"""


@register(
    "stream_text_ingest",
    oracle=_stream_text_ingest_oracle(),
    description="self-growing MinHash band index: the text admit gate "
                "whose survivors' band rows are appended INTO the index "
                "as epoch-keyed partitions (exactly-once growth: base "
                "generation immutable, replayed epochs rewrite their own "
                "partition); returns the grown index",
    tags=("streaming", "dedup", "lsh", "storage"),
)
def stream_text_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CLOSED text-ingest loop — what ``stream_text_admit`` (gate)
    composes into in production, mirroring ``stream_phash_ingest``
    exactly: every admitted document's band rows land in the index the
    NEXT dump will be checked against, with no separate maintenance
    job. Two generations on disk: the immutable corpus generation
    (``dedup.minhash_index_dir``, shared with the admit entry, never
    written here) plus a batch_id-partitioned epoch dir under dynamic
    partition overwrite — both replay layers idempotent, and the
    generation split keeps Spark from overwriting a path the same plan
    reads. Admission stays per-doc vs the BASE generation (the family's
    division-of-labor note), which is what makes the grown index's
    content batch-chop-invariant and hence SQL-expressible: corpus band
    rows ∪ admitted-dump band rows, recomputed from source bytes.

    The VERIFY payload stays base-generation (this dump's docs are
    admitted against the corpus, not each other); folding epochs back
    into one generation — band rows AND payload — is the periodic
    compaction job, the ``phash_index_compact`` pattern.

    Scale: per-batch cost identical to the admit gate plus one
    batch-sized partition write; the index grows ~8 band rows per
    admitted doc; zero streaming state."""
    from ..operators.dedup import (INCR_MOD, INCR_REM,
                                   doc_text_payload_dir,
                                   minhash_hash_payload_dir,
                                   minhash_index_dir)

    tune_session(spark)
    path = f"{sf_dir}/documents.parquet"
    base_dir = minhash_index_dir(spark, sf_dir)
    hash_payload_path = minhash_hash_payload_dir(spark, sf_dir)
    text_payload_path = doc_text_payload_dir(spark, sf_dir)
    epochs_dir, ckpt = _gate_dirs(_TEXT_INGEST_DIRS, sf_dir, "text_ingest")

    template = spark.read.parquet(path)
    docs = stream_table(spark, path, template)
    feed = (docs.where(F.col("doc_id") % INCR_MOD == INCR_REM)
            .select("doc_id", "text"))
    q = (feed.writeStream.foreachBatch(
             _text_ingest(base_dir, None, epochs_dir,
                          hash_payload_path=hash_payload_path,
                          text_payload_path=text_payload_path))
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    base = (spark.read.parquet(base_dir)
            .select("doc_id", F.col("band").cast("int").alias("band"),
                    "bucket"))
    grown = _read_gate_output(spark, epochs_dir,
                              "doc_id long, band int, bucket string")
    return base.unionByName(grown)


_EMB_INGEST_DIRS = _registered_cache()


def _embedding_ingest(index_path: str, payload_path: str, epochs_dir: str,
                      tables: int | None = None, bits: int | None = None,
                      quant_payload_path: str | None = None):
    """SELF-GROWING SRP index: the :func:`_embedding_gate` decision
    (per-vector, vs the BASE generation only), with survivors'
    (vec_id, table_id, bucket) rows appended as an epoch-keyed
    partition — the family recipe on the vector column."""
    return _embedding_gate(
        index_path, payload_path, epochs_dir, "srp_ingest",
        lambda batch, nb, hits: (
            nb.join(hits, "vec_id", "left_anti")
            .select("vec_id",
                    F.col("table_id").cast("int").alias("table_id"),
                    F.col("bucket").cast("int").alias("bucket"))),
        tables=tables, bits=bits, quant_payload_path=quant_payload_path)


def _stream_embedding_ingest_oracle(bits: int | None = None) -> str:
    from ..operators.similarity import ANN_INCR_MOD, ANN_INCR_REM
    return _emb_admit_cte(bits) + f"""
SELECT vec_id, CAST(table_id AS INTEGER) AS table_id,
       CAST(bucket AS INTEGER) AS bucket
FROM b
WHERE vec_id % {ANN_INCR_MOD} <> {ANN_INCR_REM}
   OR vec_id NOT IN (SELECT vec_id FROM hits)
"""


def _run_embedding_ingest(spark: SparkSession, sf_dir: str, cache: dict,
                          tag: str, bits: int | None = None) -> DataFrame:
    """Shared entry body for the self-growing SRP index at either
    geometry: drain the feed through the ingest gate (admit decision
    vs the geometry-keyed BASE index), return base ∪ grown epochs."""
    from ..operators.similarity import (ANN_INCR_MOD, ANN_INCR_REM,
                                        srp_index_dir, srp_payload_dir,
                                        srp_quant_payload_dir)

    tune_session(spark)
    kw = {} if bits is None else {"bits": bits}
    base_dir = srp_index_dir(spark, sf_dir, **kw)
    payload_path = srp_payload_dir(spark, sf_dir)
    quant_path = srp_quant_payload_dir(spark, sf_dir)
    epochs_dir, ckpt = _gate_dirs(cache, sf_dir, tag)

    path = f"{sf_dir}/embeddings.parquet"
    template = spark.read.parquet(path)
    vecs = stream_table(spark, path, template)
    feed = (vecs.where(F.col("vec_id") % ANN_INCR_MOD == ANN_INCR_REM)
            .select("vec_id", "embedding"))
    q = (feed.writeStream.foreachBatch(
             _embedding_ingest(base_dir, payload_path, epochs_dir,
                               bits=bits,
                               quant_payload_path=quant_path))
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    base = (spark.read.parquet(base_dir)
            .select("vec_id",
                    F.col("table_id").cast("int").alias("table_id"),
                    F.col("bucket").cast("int").alias("bucket")))
    grown = _read_gate_output(spark, epochs_dir,
                              "vec_id long, table_id int, bucket int")
    return base.unionByName(grown)


@register(
    "stream_embedding_ingest",
    oracle=_stream_embedding_ingest_oracle(),
    description="self-growing SRP index: the embedding admit gate whose "
                "survivors' (table_id, bucket) rows are appended INTO "
                "the index as epoch-keyed partitions (exactly-once "
                "growth, immutable base generation); returns the grown "
                "index",
    tags=("streaming", "similarity", "lsh", "storage"),
)
def stream_embedding_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CLOSED embedding-ingest loop — ``stream_embedding_admit``'s
    survivors' SRP rows land in the index the NEXT dump will be checked
    against, completing the self-growing-index story across all three
    column families (images: ``stream_phash_ingest``; text:
    ``stream_text_ingest``; vectors: this). Same two-generation layout,
    same idempotence at both replay layers, same per-doc-vs-base
    admission that makes the grown content batch-chop-invariant and the
    oracle a one-shot SQL replay (corpus SRP rows ∪ admitted-dump SRP
    rows from source bytes). The verify payload stays base-generation;
    folding epochs + payload into one generation is the periodic
    compaction job.

    Scale: per-batch cost identical to the admit gate plus one
    batch-sized partition write; the index grows SRP_TABLES rows per
    admitted vector; zero streaming state.

    OPERATING POINT: the 16×4 FIXTURE geometry — kept as the sensor
    contrast (see ``stream_embedding_admit``); the lifecycle a
    deployment runs, and the one ``embedding_index_compact`` folds, is
    ``stream_embedding_ingest_scaled`` (r11 verdict item 1)."""
    return _run_embedding_ingest(spark, sf_dir, _EMB_INGEST_DIRS,
                                 "emb_ingest")


_EMB_INGEST_SCALED_DIRS = _registered_cache()


@register(
    "stream_embedding_ingest_scaled",
    oracle=_stream_embedding_ingest_oracle(bits=_SRP_BITS_WIDE),
    description="the self-growing SRP index at the deployment operating "
                "point (16 tables × 9 bits): admit survivors' rows "
                "appended as epoch partitions onto the scaled-geometry "
                "base index — the drain embedding_index_compact folds",
    tags=("streaming", "similarity", "lsh", "storage"),
)
def stream_embedding_ingest_scaled(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """``stream_embedding_ingest`` at the N/64-sized SRP geometry —
    the registered lifecycle path (r11 verdict item 1: the compact
    entry must not fold a drain whose candidate join rides the
    fixed-bucket occupancy pathology). Same two-generation layout,
    same idempotence at both replay layers, same per-vector-vs-base
    admission; only the bucket space (and hence the per-batch
    candidate volume, which stays ∝ true near-dups as N grows) and
    the oracle's embedded plane literals change."""
    return _run_embedding_ingest(spark, sf_dir, _EMB_INGEST_SCALED_DIRS,
                                 "emb_ingest_sc", bits=_SRP_BITS_WIDE)


# Enrolled in the gate-cache registry (r11 ADVICE): the compact
# entries memoize the fold + payload rebuild, so without enrollment a
# scale-probe rep ≥ 2 timed only the gen2 groupBy/checksum read — the
# same memoized-rep vacuity reset_gate_dirs exists to prevent. With
# enrollment, each fresh-dirs rep re-runs the WHOLE lifecycle the
# entry composes (ingest drain + fold + payload rebuild), which is
# what its decade row should price.
_TEXT_COMPACT_DIRS: dict[str, tuple[str, str, str]] = _registered_cache()
_EMB_COMPACT_DIRS: dict[str, tuple[str, str]] = _registered_cache()

_CHECKSUM_P = 1_000_000_007


def text_index_compact_dirs(spark: SparkSession,
                            sf_dir: str) -> tuple[str, str, str]:
    """Fold the grown text index's generations (base + ingest epochs)
    into ONE band-partitioned generation with one file per band, and
    REBUILD the verify payload — both tiers (int32 hash screen + raw
    text, r11 verdict item 2) — to cover the admitted docs: the
    periodic maintenance job the ingest docstrings promise
    (``phash_index_compact``'s pattern, plus the payload half this
    family carries). Returns (gen2 index dir, gen2 hash-payload dir,
    gen2 text-payload dir); memoized per (process, corpus)."""
    dirs = _TEXT_COMPACT_DIRS.get(sf_dir)
    if dirs is not None:
        return dirs
    grown = stream_text_ingest(spark, sf_dir)   # memoized drain
    dirs = _fold_text_generations(spark, sf_dir, grown)
    _TEXT_COMPACT_DIRS[sf_dir] = dirs
    return dirs


def _fold_text_generations(spark: SparkSession, sf_dir: str,
                           grown: DataFrame) -> tuple[str, str, str]:
    """The text compact's fold kernel, shared with the registered
    vacuum lifecycle (streaming/vacuum.py): write ``grown`` (the
    base ∪ epochs band rows) as ONE band-partitioned generation and
    rebuild both verify-payload tiers over the grown membership.
    Returns (gen2 index, gen2 hash payload, gen2 text payload)."""
    from ..engine.catalog import Catalog
    from ..engine.pointfetch import write_payload
    from ..engine.scratch import scratch_dir
    from ..operators.dedup import _shingle_sets, hashed_shingle_cols

    gen2 = scratch_dir("fsbd_text_index_gen2_")
    (grown.repartition("band")
     .write.mode("overwrite").partitionBy("band").parquet(gen2))
    member = grown.select("doc_id").distinct().persist()
    try:
        pay2h = scratch_dir("fsbd_text_hash_payload_gen2_")
        write_payload(
            hashed_shingle_cols(_shingle_sets(spark, sf_dir)
                                .join(member, "doc_id", "left_semi")),
            "doc_id", pay2h)
        pay2t = scratch_dir("fsbd_text_payload_gen2_")
        write_payload(
            Catalog(spark, sf_dir).documents.select("doc_id", "text")
            .join(member, "doc_id", "left_semi"),
            "doc_id", pay2t)
    finally:
        member.unpersist()
    return gen2, pay2h, pay2t


def _text_index_compact_oracle() -> str:
    from ..functions.hashing import hex64_sql
    from ..operators.dedup import (INCR_MOD, INCR_REM,
                                   _minhash_bands_prefix)
    inc = _text_inc_oracle()
    h = hex64_sql("CAST(doc_id AS VARCHAR) || '|' || bucket")
    return _minhash_bands_prefix() + f""", grown AS (
  SELECT doc_id, band, bucket FROM bands
  WHERE doc_id % {INCR_MOD} <> {INCR_REM}
     OR doc_id NOT IN (SELECT new_doc FROM ({inc}) inc)
)
SELECT CAST(band AS INTEGER) AS band,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM({h} % {_CHECKSUM_P}) AS BIGINT) AS checksum
FROM grown GROUP BY band
"""


@register(
    "text_index_compact",
    oracle=_text_index_compact_oracle(),
    description="text index maintenance: fold the grown generations "
                "(base + ingest epochs) into one band-partitioned "
                "generation (one file per band) + rebuild the verify "
                "payload over the grown membership; per-band row counts "
                "+ order-independent content checksums oracle-prove the "
                "fold is content-preserving",
    tags=("storage", "dedup", "lsh"),
)
def text_index_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The maintenance half of the closed text-ingest loop: epochs
    accumulate one directory per micro-batch (correct but
    small-file-prone — the layout cost of idempotent growth), so a
    periodic job folds index AND payload back into one generation.
    The entry emits per-band (count, checksum) of the COMPACTED
    generation; the oracle recomputes the same from source bytes, so a
    fold that lost, duplicated, or corrupted any row hash-mismatches.
    File-count and payload-serve pins live in tests/test_streaming.py.
    RETENTION: the fold supersedes the base + epoch + payload
    directories it read; engine.retention.vacuum_superseded reclaims
    them (completeness-gated on gen2's _SUCCESS, delete-last,
    idempotent, quiescence the caller's contract — pinned in
    tests/test_streaming.py::test_retention_vacuum_superseded_generations).

    Scale: the fold is ONE index-sized exchange (repartition on the
    partition key) + one payload rebuild pass — both linear, both
    off the ingest hot path; afterwards the gate's per-batch index
    scan reads BANDS files instead of BANDS × epochs."""
    from ..functions.hashing import hex64

    gen2, _pay2h, _pay2t = text_index_compact_dirs(spark, sf_dir)
    c = spark.read.parquet(gen2)
    h = hex64(F.concat_ws("|", F.col("doc_id").cast("string"),
                          F.col("bucket")))
    return (c.groupBy(F.col("band").cast("int").alias("band"))
            .agg(F.count("*").cast("bigint").alias("n_rows"),
                 F.sum(h % _CHECKSUM_P).cast("bigint").alias("checksum")))


def embedding_index_compact_dirs(spark: SparkSession,
                                 sf_dir: str) -> tuple[str, str]:
    """The SRP twin of :func:`text_index_compact_dirs`: fold base +
    ingest epochs into one table_id-partitioned generation (one file
    per table) and rebuild the vector payload over the grown
    membership. The drain folded is the SCALED-geometry lifecycle
    (``stream_embedding_ingest_scaled``, 2^bits ≈ N/64) — a
    maintenance entry a user actually runs must not compose the
    fixture geometry's occupancy pathology (r11 verdict item 1)."""
    dirs = _EMB_COMPACT_DIRS.get(sf_dir)
    if dirs is not None:
        return dirs
    from ..engine.catalog import Catalog
    from ..engine.pointfetch import write_payload
    from ..engine.scratch import scratch_dir

    grown = stream_embedding_ingest_scaled(spark, sf_dir)  # memoized drain
    gen2 = scratch_dir("fsbd_emb_index_gen2_")
    (grown.repartition("table_id")
     .write.mode("overwrite").partitionBy("table_id").parquet(gen2))
    pay2 = scratch_dir("fsbd_emb_payload_gen2_")
    member = grown.select("vec_id").distinct()
    write_payload(
        Catalog(spark, sf_dir).embeddings.select("vec_id", "embedding")
        .join(member, "vec_id", "left_semi"),
        "vec_id", pay2)
    _EMB_COMPACT_DIRS[sf_dir] = (gen2, pay2)
    return gen2, pay2


def _embedding_index_compact_oracle() -> str:
    from ..functions.hashing import hex64_sql
    from ..operators.similarity import ANN_INCR_MOD, ANN_INCR_REM
    h = hex64_sql("CAST(vec_id AS VARCHAR) || '|' || CAST(bucket AS VARCHAR)")
    return _emb_admit_cte(_SRP_BITS_WIDE) + f""", grown AS (
  SELECT vec_id, table_id, bucket FROM b
  WHERE vec_id % {ANN_INCR_MOD} <> {ANN_INCR_REM}
     OR vec_id NOT IN (SELECT vec_id FROM hits)
)
SELECT CAST(table_id AS INTEGER) AS table_id,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM({h} % {_CHECKSUM_P}) AS BIGINT) AS checksum
FROM grown GROUP BY table_id
"""


@register(
    "embedding_index_compact",
    oracle=_embedding_index_compact_oracle(),
    description="SRP index maintenance at the deployment geometry: fold "
                "the scaled ingest's grown generations into one "
                "table_id-partitioned generation (one file per table) + "
                "rebuild the vector payload over the grown membership; "
                "per-table counts + content checksums oracle-prove the "
                "fold content-preserving",
    tags=("storage", "similarity", "lsh"),
)
def embedding_index_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The maintenance half of the closed embedding-ingest loop — see
    :func:`text_index_compact` for the shape and scale argument; here
    the fold exchange is keyed on table_id and the payload rebuild is
    one pass over the grown vector membership. RETENTION: same recipe
    as the text compact — engine.retention.vacuum_superseded reclaims
    the superseded base/epoch/payload dirs, completeness-gated on
    gen2's _SUCCESS. Folds the
    SCALED-geometry drain (r11 verdict item 1): the registered
    lifecycle — admit → grow → compact — runs end-to-end at the
    2^bits ≈ N/64 operating point whose decade probe is linear, with
    the fixture-bits entries kept only as sensor contrasts."""
    from ..functions.hashing import hex64

    gen2, _pay2 = embedding_index_compact_dirs(spark, sf_dir)
    c = spark.read.parquet(gen2)
    h = hex64(F.concat_ws("|", F.col("vec_id").cast("string"),
                          F.col("bucket").cast("string")))
    return (c.groupBy(F.col("table_id").cast("int").alias("table_id"))
            .agg(F.count("*").cast("bigint").alias("n_rows"),
                 F.sum(h % _CHECKSUM_P).cast("bigint").alias("checksum")))


# ---------------------------------------------------------------------------
# Composed streaming curation (r10 verdict item 5): the singleton ingest
# gates fused into ONE foreachBatch over one shared micro-batch scan —
# quality gate → decontamination → corpus near-dup admission — the
# streaming twin of pipeline_curate and the full lambda ingest story the
# reference's README declares (/root/reference/README.md:49-55).
# ---------------------------------------------------------------------------

_CURATE_DIRS = _registered_cache()

from ..operators.pipeline import CURATE_MIN_TOKENS  # noqa: E402 — the
# batch pipeline_curate's quality floor, imported (not re-declared) so
# the 'same rule' claim of the composed streaming gate cannot drift
# (r11 review finding).


def _curate_admit(eval_index_path: str, band_index_path: str,
                  payload_path: str | None, out_dir: str,
                  min_en_hits: int = 1,
                  hash_payload_path: str | None = None,
                  text_payload_path: str | None = None):
    """foreachBatch body: the three gates' decisions over ONE persisted
    projection of the micro-batch. Drops compose as a conjunction of
    per-doc keep predicates, so stage ORDER cannot change the result
    set (what makes the end-to-end oracle a plain intersection) — the
    execution order is the cost order: the map-only quality gate first
    shrinks the batch, the broadcast gram check runs on survivors, and
    only they pay MinHash banding + the point-fetch verify. One
    epoch-keyed idempotent write, the family recipe."""
    def admit(batch: DataFrame, batch_id: int) -> None:
        from ..functions import observability
        from ..functions.text import token_ngrams, tokens
        from ..operators.decontam import DECONTAM_N
        from ..operators.dedup import SHINGLE_N, _band_rows
        from ..operators.textanalysis import _stopword_hits_spark

        ss = batch.sparkSession
        scored = (batch.select(
                      "doc_id", "lang", tokens("text").alias("toks"),
                      _stopword_hits_spark("en").alias("en_hits"))
                  .withColumn("n_tokens", F.size("toks")))
        # Stage 1 — quality gate (map-only): pipeline_curate's rule.
        # min_en_hits stays a knob for alternative corpora; since r12
        # make_sf1.py preserves stopword surface forms, so the decade
        # probe runs the REGISTERED rule (r11 verdict item 7 closed).
        quality = (scored.where((F.col("n_tokens") >= CURATE_MIN_TOKENS)
                                & (F.col("en_hits") >= min_en_hits))
                   .select("doc_id", "lang", "n_tokens", "toks")
                   .persist())
        try:
            # Stage 2 — decontamination: broadcast membership against
            # the persisted eval-gram index (stream_decontam's rule).
            ev = ss.read.parquet(eval_index_path)
            g = quality.select(
                "doc_id",
                F.explode(F.array_distinct(
                    token_ngrams(F.col("toks"), DECONTAM_N))).alias("g"))
            contaminated = (g.join(F.broadcast(ev), "g", "left_semi")
                            .select("doc_id").distinct())
            clean = (quality.join(contaminated, "doc_id", "left_anti")
                     .select("doc_id", "lang", "n_tokens",
                             F.array_distinct(
                                 token_ngrams(F.col("toks"), SHINGLE_N))
                             .alias("s"))
                     .persist())
            try:
                # Stage 3 — near-dup admission: band join vs the stored
                # MinHash index + exact-jaccard point-fetch verify
                # (stream_text_admit's rule; quality's ≥ 20 tokens
                # implies shingles exist, so no extra eligibility cut).
                idx = ss.read.parquet(band_index_path)
                cand = (idx.alias("a").join(
                            _band_rows(clean).alias("b"),
                            (F.col("a.band") == F.col("b.band"))
                            & (F.col("a.bucket") == F.col("b.bucket")))
                        .select(F.col("a.doc_id").alias("old_doc"),
                                F.col("b.doc_id").alias("doc_id")))
                cand = (observability.observe_candidates(
                            cand, "curate_minhash")
                        .distinct().persist())
                scope: list = []
                try:
                    hits = _jaccard_verify_hits(ss, cand, clean,
                                                payload_path,
                                                hash_payload_path,
                                                text_payload_path,
                                                scope=scope)
                    (clean.select("doc_id", "lang",
                                  F.col("n_tokens").cast("int")
                                  .alias("n_tokens"))
                     .join(hits, "doc_id", "left_anti")
                     .withColumn("batch_id", F.lit(batch_id))
                     .write.mode("overwrite")
                     .option("partitionOverwriteMode", "dynamic")
                     .partitionBy("batch_id").parquet(out_dir))
                finally:
                    for df in scope:
                        df.unpersist()
                    cand.unpersist()
            finally:
                clean.unpersist()
        finally:
            quality.unpersist()
    return admit


def _stream_pipeline_curate_oracle() -> str:
    from ..functions.text import tokens_sql
    from ..operators.decontam import _NG_SQL, EVAL_MOD
    from ..operators.dedup import INCR_MOD, INCR_REM
    from ..operators.textanalysis import _stopword_hits_sql

    inc = _text_inc_oracle()
    return f"""
WITH eligible AS (
  SELECT doc_id, lang,
         CAST(len({tokens_sql('text')}) AS INTEGER) AS n_tokens,
         {_stopword_hits_sql('en')} AS en_hits
  FROM documents
  WHERE doc_id % {INCR_MOD} = {INCR_REM} AND doc_id % {EVAL_MOD} <> 0
), quality AS (
  SELECT doc_id, lang, n_tokens FROM eligible
  WHERE n_tokens >= {CURATE_MIN_TOKENS} AND en_hits > 0
), ev AS (
  SELECT DISTINCT unnest({_NG_SQL}) AS g FROM documents
  WHERE doc_id % {EVAL_MOD} = 0
), gnew AS (
  SELECT doc_id, unnest({_NG_SQL}) AS g FROM documents
  WHERE doc_id % {INCR_MOD} = {INCR_REM}
), contaminated AS (
  SELECT DISTINCT doc_id FROM gnew JOIN ev USING (g)
), neardup AS (
  SELECT DISTINCT new_doc AS doc_id FROM ({inc}) inc
)
SELECT q.doc_id, q.lang, q.n_tokens
FROM quality q
WHERE q.doc_id NOT IN (SELECT doc_id FROM contaminated)
  AND q.doc_id NOT IN (SELECT doc_id FROM neardup)
"""


@register(
    "stream_pipeline_curate",
    oracle=_stream_pipeline_curate_oracle(),
    description="composed streaming ingest curation: quality gate → "
                "eval-set decontamination → corpus near-dup admission, "
                "fused in ONE foreachBatch over one shared micro-batch "
                "scan against the persisted gram/band/payload artifacts; "
                "exactly-once epoch-keyed sink, zero streaming state, "
                "end-to-end oracle",
    tags=("streaming", "pipeline", "decontam", "dedup", "lsh"),
)
def stream_pipeline_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ingest door a training-data pipeline actually deploys —
    the r10 singleton gates (``stream_decontam``, ``stream_text_admit``)
    plus ``pipeline_curate``'s quality rule COMPOSED in one
    checkpointed foreachBatch, so each micro-batch is scanned once,
    tokenized once, and every stage's verdict lands in one epoch-keyed
    write (one sink, one replay-idempotence domain — not three gates
    triple-reading the feed). Inter-stage contracts are oracle-checked
    END TO END: stage-level oracles can't catch a composition bug
    (e.g. the near-dup stage reading pre-quality rows), the
    intersection oracle does, column-exactly.

    Per-doc admission against immutable persisted artifacts (eval-gram
    index, MinHash band index + shingle payload) keeps the composed
    decision batch-chop-invariant — which is precisely what makes the
    one-shot SQL replay equal the union of per-batch decisions.

    Scale: ZERO streaming state (nothing remembered across batches);
    per-batch cost = one batch scan + map-only quality/tokenize work +
    a broadcast gram semi-join (KB eval index vs TB/day feed) + MinHash
    banding over quality survivors + a candidate join bounded by true
    near-dup density (``curate_minhash`` sensor) + a point-fetch verify
    whose I/O ∝ candidates (engine.pointfetch, the r11 gate
    discipline). Stage order is pure cost optimization — drops are a
    conjunction, so the result set is order-free by construction."""
    from ..operators.dedup import (INCR_MOD, INCR_REM,
                                   doc_text_payload_dir,
                                   minhash_hash_payload_dir,
                                   minhash_index_dir)
    from ..operators.decontam import EVAL_MOD

    tune_session(spark)
    path = f"{sf_dir}/documents.parquet"
    eval_index = _eval_gram_index_dir(spark, sf_dir)
    band_index = minhash_index_dir(spark, sf_dir)
    hash_payload = minhash_hash_payload_dir(spark, sf_dir)
    text_payload = doc_text_payload_dir(spark, sf_dir)
    out_dir, ckpt = _gate_dirs(_CURATE_DIRS, sf_dir, "stream_curate")

    template = spark.read.parquet(path)
    docs = stream_table(spark, path, template)
    feed = (docs.where((F.col("doc_id") % INCR_MOD == INCR_REM)
                       & (F.col("doc_id") % EVAL_MOD != 0))
            .select("doc_id", "lang", "text"))
    q = (feed.writeStream.foreachBatch(
             _curate_admit(eval_index, band_index, None, out_dir,
                           hash_payload_path=hash_payload,
                           text_payload_path=text_payload))
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return _read_gate_output(spark, out_dir,
                             "doc_id long, lang string, n_tokens int")


def reset_gate_dirs() -> None:
    """Probe hook (scripts/scale_probe_sf1.py): forget the memoized
    output/checkpoint dirs of every ingest gate so the next invocation
    re-drains the full feed. A second availableNow run over memoized
    dirs adds ZERO batches — exactly right for idempotence (pinned in
    tests/test_streaming.py), but opaque to rep-timing and to the
    candidate sensors, which only fire inside a running micro-batch
    (r10 verdict item 2). The INDEX/payload artifacts stay memoized:
    they are the persisted corpus-side state a production gate reads
    every batch, paid once — the bpe_tokenize_serve probe precedent."""
    for d in _GATE_DIR_CACHES:
        d.clear()


APPROX_DISTINCT_RSD = 0.05


@register(
    "stream_approx_distinct",
    oracle="""
SELECT event_type, COUNT(DISTINCT user_id) AS exact_users, TRUE AS estimate_ok
FROM events GROUP BY event_type
""",
    description="streaming HLL distinct users per event_type, estimate hash-proved within 3×rsd (15%) of exact",
    tags=("streaming", "sketch", "approx"),
)
def stream_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-user counting on the stream via HyperLogLog++
    (``approx_count_distinct``): per-key sketch registers merge
    associatively across micro-batches, so state per group is O(2^p)
    REGARDLESS of how many users stream past — the only distinct count
    an unbounded stream can maintain (exact distinct state grows with
    the key universe; cf. ``stream_dedup_watermarked`` for the bounded
    exact alternative when a horizon exists).

    Correctness contract (sketch internals are engine-private, same
    discipline as ``q_approx_distinct``): the streamed estimate must
    land within 3× the configured 5% rsd (the standard ±3σ acceptance
    band, 15%) of the EXACT batch recompute over the same replayed
    input — both sides computed Spark-side, booleans
    asserted TRUE by the oracle alongside the exact counts.
    """
    from ..engine.catalog import Catalog

    ev = _events_stream(spark, sf_dir)
    agg = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", APPROX_DISTINCT_RSD).alias("est"))
    streamed = run_to_completion(agg, output_mode="complete")
    exact = (Catalog(spark, sf_dir).events
             .groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("exact_users")))
    ok = (F.abs(F.col("est") - F.col("exact_users"))
          <= F.lit(3 * APPROX_DISTINCT_RSD) * F.col("exact_users"))
    return (exact.join(streamed, "event_type")
            .select("event_type", "exact_users", ok.alias("estimate_ok")))
