"""State-store pins for the streaming layer (r5 verdict item 2).

PLANAUDIT.md's streaming section records the measured state rows/bytes
per query; these tests pin the two claims the audit numbers rest on:

1. watermark eviction is REAL — `dropDuplicatesWithinWatermark` removes
   key state once the watermark passes its horizon (the registry fixture
   spans 30 days under a 45-day horizon, so nothing evicts there; this
   pin constructs a stream where eviction MUST fire);
2. stateful registry queries hold state proportional to their documented
   bound (keys / vocabulary), never to the input row count.
"""

from __future__ import annotations

import datetime as dt
import os
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from conftest import SF_SMOKE
from full_stack_big_data_spark.streaming.audit import (ProgressCollector,
                                                       summarize)

D0 = dt.datetime(2000, 1, 1)


def _write_file(path: str, rows: list[tuple[int, dt.datetime]],
                mtime: float) -> None:
    tbl = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
    })
    pq.write_table(tbl, path)
    os.utime(path, (mtime, mtime))


@pytest.fixture()
def collector(spark):
    col = ProgressCollector()
    spark.streams.addListener(col)
    yield col
    spark.streams.removeListener(col)


def test_watermarked_dedup_evicts_state(spark, tmp_path, collector):
    """Three single-file micro-batches: keys 0-49 at day 0, keys 100-149
    at day 10 (advances the watermark past day 0 + 1-day horizon), then
    keys 0-49 again at day 10. The 1-day-watermark dedup MUST have
    evicted the day-0 key state by batch 3 (numRowsRemoved > 0) and the
    final store must NOT hold all 100 distinct keys ever seen — this is
    the bounded-state eviction the registry's 45-day-horizon fixture
    cannot exercise (its data never outlives the horizon)."""
    src = tmp_path / "src"
    src.mkdir()
    now = time.time()
    _write_file(str(src / "f1.parquet"), [(i, D0) for i in range(50)], now - 30)
    _write_file(str(src / "f2.parquet"),
                [(100 + i, D0 + dt.timedelta(days=10)) for i in range(50)],
                now - 20)
    _write_file(str(src / "f3.parquet"),
                [(i, D0 + dt.timedelta(days=10)) for i in range(50)],
                now - 10)

    sdf = (spark.readStream.schema("user_id long, ts timestamp")
           .option("maxFilesPerTrigger", 1).parquet(str(src))
           .withWatermark("ts", "1 day")
           .dropDuplicatesWithinWatermark(["user_id"]))
    q = (sdf.writeStream.format("memory").queryName("evict_pin")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    assert collector.drain(), "partial progress feed"
    s = summarize(collector.progress)

    assert s["n_batches"] >= 3, s
    (op,) = s["state_operators"]
    assert op["rows_removed"] > 0, f"no state eviction observed: {op}"
    assert op["final_state_rows"] < 100, \
        f"state still holds every key ever seen: {op}"


def test_registry_stateful_queries_hold_keyed_not_rowed_state(spark, collector):
    """The audit's boundedness argument, measured: the watermarked dedup
    holds exactly one state row per distinct (user, event_type) — never
    one per input row — and the streaming wordcount's aggregation state
    is the vocabulary size, not the token count."""
    from full_stack_big_data_spark.engine.catalog import Catalog
    from full_stack_big_data_spark.operators.registry import load_all

    reg = load_all()
    cat = Catalog(spark, SF_SMOKE)
    distinct_keys = cat.events.select("user_id", "event_type").distinct().count()
    n_events = cat.events.count()

    collector.reset()
    out = reg["stream_dedup_watermarked"].builder(spark, SF_SMOKE)
    assert out.count() == distinct_keys
    assert collector.drain(), "partial progress feed"
    s = summarize(collector.progress)
    (op,) = s["state_operators"]
    assert op["final_state_rows"] == distinct_keys, (op, distinct_keys)
    assert op["final_state_rows"] < n_events

    collector.reset()
    vocab = reg["stream_wordcount"].builder(spark, SF_SMOKE).count()
    assert collector.drain(), "partial progress feed"
    s = summarize(collector.progress)
    assert s["state_operators"], "wordcount must run a stateful aggregation"
    agg_rows = max(op["final_state_rows"] for op in s["state_operators"])
    assert agg_rows == vocab, (agg_rows, vocab)
