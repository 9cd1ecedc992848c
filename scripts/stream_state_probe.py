"""Streaming state at 10x keys (r6 verdict item 7).

The PLANAUDIT streaming section audits state rows/bytes/evictions at
sf0.001; the boundedness ARGUMENTS say state tracks keys-per-horizon /
distinct users / nothing — claims about how state grows with the KEY
universe, which a single scale can't test. This probe drains the three
stateful flagships against sf0.1 and the sf1.0 dataset (10x distinct
keys) and tabulates measured state against the measured key counts:

- ``stream_dedup_watermarked`` — state rows must equal distinct
  (user_id, event_type) pairs at each scale (not input rows);
- ``stream_stateful_user_stats`` — keyed state = distinct users;
- ``stream_cdc_upsert``          — zero state operators at any scale
  (foreachBatch compaction holds no store state).

Usage: python scripts/stream_state_probe.py  (writes a markdown table;
paste into PLANAUDIT's streaming section companion + BENCHNOTES).
"""

from __future__ import annotations

import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from full_stack_big_data_spark.engine.catalog import Catalog
from full_stack_big_data_spark.engine.session import (get_spark,
                                                      release_scoped_cache)
from full_stack_big_data_spark.operators.registry import load_all
from full_stack_big_data_spark.streaming.audit import (ProgressCollector,
                                                       summarize)

SCALES = [("sf0.1", "/root/testdata/sf0.1"),
          ("sf1.0", os.path.join(HERE, ".localdata", "sf1.0"))]
NAMES = ["stream_dedup_watermarked", "stream_stateful_user_stats",
         "stream_cdc_upsert"]


def eviction_probe(spark, col: ProgressCollector, label: str, sf: str,
                   n_files: int = 10, horizon: str = "2 days") -> tuple:
    """Measure watermark EVICTION at scale — the registered
    ``stream_dedup_watermarked`` uses a horizon covering the whole
    30-day replay (so its drain never evicts, by design); here the
    same operator runs with a short horizon over ts-ORDERED staged
    files (one 3-day chunk per file, one file per micro-batch), so the
    watermark sweeps the span and key state ages out mid-stream. The
    operating claim: peak/final state ∝ keys per horizon, far below
    the total key universe, with eviction doing the bounding."""
    from pyspark.sql import functions as F

    from full_stack_big_data_spark.engine.scratch import scratch_dir

    ev = Catalog(spark, sf).events
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    staged = scratch_dir("fsbd_evict_stage_")
    span = (hi - lo).total_seconds() or 1.0
    for i in range(n_files):  # sequential writes → mtime order == ts order
        frac_lo = F.lit(lo) + F.expr(f"INTERVAL {int(span * i / n_files)} SECONDS")
        frac_hi = F.lit(lo) + F.expr(f"INTERVAL {int(span * (i + 1) / n_files)} SECONDS")
        chunk = ev.where((F.col("ts") >= frac_lo)
                         & ((F.col("ts") < frac_hi) | F.lit(i == n_files - 1)))
        chunk.coalesce(1).write.mode("append").parquet(staged)

    col.reset()
    sdf = (spark.readStream.schema(ev.schema)
           .option("maxFilesPerTrigger", 1).parquet(staged)
           .select("user_id", "event_type", "ts")
           .withWatermark("ts", horizon)
           .dropDuplicatesWithinWatermark(["user_id", "event_type"])
           .select("user_id", "event_type"))
    from full_stack_big_data_spark.streaming.core import run_to_completion
    out_rows = run_to_completion(sdf, output_mode="append").count()
    if not col.drain(timeout=180):
        return (label, "PARTIAL FEED", 0, 0, 0, 0, 0, 0)
    s = summarize(col.progress)
    (op,) = s["state_operators"]
    pairs = ev.select("user_id", "event_type").distinct().count()
    return (label, s["n_batches"], s["input_rows"], out_rows, pairs,
            op["final_state_rows"], op["rows_removed"],
            op["peak_state_bytes"] // 1024)


def main() -> int:
    if not os.path.isdir(SCALES[1][1]):
        print("missing sf1.0: run scripts/make_sf1.py first")
        return 2
    if "--eviction" in sys.argv:
        spark = get_spark(app_name="fsbd-eviction-probe")
        spark.sparkContext.setLogLevel("ERROR")
        col = ProgressCollector()
        spark.streams.addListener(col)
        print("| scale | batches | input rows | out rows | distinct pairs | "
              "final state | evicted | peak KiB |")
        print("|---|---|---|---|---|---|---|---|")
        bad = []
        try:
            for label, sf in SCALES:
                r = eviction_probe(spark, col, label, sf)
                print("| " + " | ".join(str(x) for x in r) + " |", flush=True)
                if r[1] == "PARTIAL FEED" or r[6] == 0 or not r[5] < r[4]:
                    bad.append(label)
        finally:
            spark.streams.removeListener(col)
        print(f"\nEVICTION {'OK' if not bad else 'FAIL'}: "
              f"{bad or 'state bounded by horizon, eviction active at both scales'}")
        spark.stop()
        return 1 if bad else 0
    spark = get_spark(app_name="fsbd-stream-state-probe")
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()
    col = ProgressCollector()
    spark.streams.addListener(col)
    rows = []
    bad = []
    try:
        for label, sf in SCALES:
            ev = Catalog(spark, sf).events
            keys = {
                "pairs": ev.select("user_id", "event_type").distinct().count(),
                "users": ev.select("user_id").distinct().count(),
                "events": ev.count(),
            }
            for name in NAMES:
                col.reset()
                release_scoped_cache(spark)
                out_rows = reg[name].builder(spark, sf).count()
                if not col.drain(timeout=120):
                    bad.append(f"{name}@{label}: partial progress feed")
                    continue
                s = summarize(col.progress)
                ops = s["state_operators"]
                state = max((o["final_state_rows"] for o in ops), default=0)
                evicted = sum(o["rows_removed"] for o in ops)
                dropped = sum(o["dropped_by_watermark"] for o in ops)
                peak = max((o["peak_state_bytes"] for o in ops), default=0)
                rows.append((label, name, s["input_rows"], out_rows,
                             len(ops), state, evicted, dropped,
                             peak // 1024, keys))
    finally:
        spark.streams.removeListener(col)

    print("| scale | query | input rows | out rows | state ops | "
          "state rows | evicted | wm-dropped | peak KiB | bound check |")
    print("|---|---|---|---|---|---|---|---|---|---|")
    by = {}
    for label, name, inp, outr, nops, state, ev_, dr, peak, keys in rows:
        by[(name, label)] = state
        if name == "stream_dedup_watermarked":
            check = (f"= distinct pairs {keys['pairs']}"
                     if state == keys["pairs"] else
                     f"VIOLATION: {state} != pairs {keys['pairs']}")
            ok = state == keys["pairs"] and state < keys["events"]
        elif name == "stream_stateful_user_stats":
            check = (f"= distinct users {keys['users']}"
                     if state == keys["users"] else
                     f"VIOLATION: {state} != users {keys['users']}")
            ok = state == keys["users"] and state < keys["events"]
        else:
            check = "zero store state" if nops == 0 else \
                f"VIOLATION: {nops} state ops"
            ok = nops == 0
        if not ok:
            bad.append(f"{name}@{label}: {check}")
        print(f"| {label} | {name} | {inp} | {outr} | {nops} | {state} | "
              f"{ev_} | {dr} | {peak} | {check} |")

    for name in NAMES[:2]:
        s1, s10 = by.get((name, "sf0.1")), by.get((name, "sf1.0"))
        if s1 and s10:
            print(f"\n{name}: state rows {s1} -> {s10} "
                  f"({s10 / s1:.1f}x across the 10x-key decade)")
    print(f"\nSTREAM-STATE {'OK' if not bad else 'FAIL'}: {bad or 'all bounds hold'}")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
