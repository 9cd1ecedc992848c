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
    description="stream-stream event-time join: purchase within 1h of view, watermark-bounded state",
    tags=("streaming", "join"),
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_stream(spark, sf_dir)
    views = (ev.where(F.col("event_type") == "view")
             .select(F.col("user_id").alias("v_user"), F.col("ts").alias("view_ts"))
             .withWatermark("view_ts", "2 hours"))
    buys = (ev.where(F.col("event_type") == "purchase")
            .select(F.col("user_id").alias("p_user"), F.col("ts").alias("purchase_ts"))
            .withWatermark("purchase_ts", "2 hours"))
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


APPROX_DISTINCT_RSD = 0.05


@register(
    "stream_approx_distinct",
    oracle="""
SELECT event_type, COUNT(DISTINCT user_id) AS exact_users, TRUE AS estimate_ok
FROM events GROUP BY event_type
""",
    description="streaming HLL distinct users per event_type, estimate hash-proved within 5% of exact",
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
    land within the configured 5% rsd of the EXACT batch recompute over
    the same replayed input — both sides computed Spark-side, booleans
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
