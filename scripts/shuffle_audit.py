"""Measured shuffle-volume audit — the quantitative companion to
plan_audit.py's structural audit.

plan_audit.py proves plan SHAPE (exchange counts, join strategies,
SinglePartition adjudication); this script EXECUTES every batch query
at sf0.1 and walks the executed (post-AQE) physical plan's SQL metrics
to measure what actually moved:

- scanned   — Σ FileSourceScan "size of files read" (the real parquet
              bytes after partition pruning / column pruning),
- shuffled  — Σ ShuffleExchange shuffle bytes written (what crosses
              the wire on a real cluster; THE scale-limiting volume),
- broadcast — Σ BroadcastExchange dataSize (driver + per-executor
              memory cost of every broadcast side),
- spilled   — Σ spillSize over all operators (memory pressure; must
              be 0 at this scale or partition sizing is wrong),
- peak      — max single-operator peakMemory (the largest hash table /
              sort buffer any one task built).

Amplification = shuffled / scanned. Map-only families must measure 0
shuffled bytes; explode families (n-grams, shingles, postings) are
EXPECTED to amplify — the audit makes the factor a measured number
instead of prose, so a regression (e.g. a lost map-side combine) shows
up as a ratio jump, not a vibe.

Execution detail: each query runs via ``queryExecution.toRdd().count()``
on the JVM side — full plan, all columns (no count()-style pruning), no
row transfer to Python — and the metric walk unwraps
AdaptiveSparkPlanExec / QueryStageExec and skips ReusedExchange
subtrees so shared exchanges are counted once. Builders that run their
own side jobs (artifact writes, iterative training) are measured on
their RETURNED plan only — their internal jobs are separate executions.

Pin: total spill across the whole registry must be ZERO at sf0.1 on
the default session (exit 1 otherwise).

Usage: python scripts/shuffle_audit.py [top_n_rows] [name [name ...]]
(default: top 30, whole batch registry). Naming queries restricts the
sweep — the sf1.0 scaling run audits just the heavy families there.
Results → PLANAUDIT.md "Measured shuffle volume" section.
"""

from __future__ import annotations

import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from full_stack_big_data_spark.engine.session import (get_spark,
                                                      release_scoped_cache)
from full_stack_big_data_spark.operators.registry import load_all

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def walk_executed(node):
    """Yield every executed-plan node once, unwrapping AQE wrappers and
    skipping ReusedExchange subtrees (their metrics live on the original
    exchange — walking them would double-count)."""
    name = node.getClass().getSimpleName()
    if name == "AdaptiveSparkPlanExec":
        yield from walk_executed(node.executedPlan())
        return
    if name.startswith("ReusedExchange") or name.startswith("ReusedSubquery"):
        return
    yield node, name
    if name.endswith("QueryStageExec"):
        yield from walk_executed(node.plan())
        return
    it = node.children().iterator()
    while it.hasNext():
        yield from walk_executed(it.next())


def node_metrics(node) -> dict[str, int]:
    out: dict[str, int] = {}
    it = node.metrics().iterator()
    while it.hasNext():
        kv = it.next()
        out[kv._1()] = kv._2().value()
    return out


def measure(spark, builder, sf: str) -> dict[str, float]:
    df = builder(spark, sf)
    qe = df._jdf.queryExecution()
    t0 = time.perf_counter()
    rows = qe.toRdd().count()  # JVM-side full-plan execution, no Python transfer
    wall = time.perf_counter() - t0
    agg = {"scanned": 0, "shuffled": 0, "shuffle_rows": 0, "broadcast": 0,
           "spilled": 0, "peak": 0, "exchanges": 0, "rows": rows,
           "wall": wall}
    for node, name in walk_executed(qe.executedPlan()):
        m = node_metrics(node)
        if name in ("FileSourceScanExec", "BatchScanExec"):
            agg["scanned"] += m.get("filesSize", 0)
        elif name.startswith("InMemoryTableScan"):
            # operator-level persist: the parquet scan happened inside the
            # cached plan's build, invisible here — mark so amplification
            # prints n/a instead of dividing by a misleading 0
            agg["cache_fed"] = 1
        elif name.startswith("ShuffleExchange"):
            agg["exchanges"] += 1
            agg["shuffled"] += m.get("shuffleBytesWritten", m.get("dataSize", 0))
            agg["shuffle_rows"] += m.get("shuffleRecordsWritten", 0)
        elif name.startswith("BroadcastExchange"):
            agg["broadcast"] += m.get("dataSize", 0)
        agg["spilled"] += m.get("spillSize", 0)
        agg["peak"] = max(agg["peak"], m.get("peakMemory", 0))
    return agg


def mb(n: float) -> str:
    return f"{n / 1024 / 1024:.1f}"


def main() -> int:
    top_n = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    only = set(sys.argv[2:])
    spark = get_spark(app_name="fsbd-shuffle-audit")
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()
    unknown = only - set(reg)
    assert not unknown, f"unknown queries: {sorted(unknown)}"
    results: dict[str, dict[str, float]] = {}
    errors: list[str] = []
    for name, spec in sorted(reg.items()):
        if "streaming" in spec.tags or (only and name not in only):
            continue
        release_scoped_cache(spark)
        try:
            r = results[name] = measure(spark, spec.builder, SF)
            print(f"... {name}: scan {mb(r['scanned'])} MB, shuffle "
                  f"{mb(r['shuffled'])} MB, {r['wall']:.2f} s", flush=True)
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            errors.append(f"{name} ERR {type(e).__name__}: {e}")
            print(f"... {name}: ERR {type(e).__name__}", flush=True)

    ranked = sorted(results.items(), key=lambda kv: -kv[1]["shuffled"])
    print(f"\n## Measured shuffle volume (sf={SF}, {len(results)} batch "
          f"queries, top {top_n} by shuffled bytes)\n")
    print("| query | scan MB | shuffle MB | amplif | shuffle rows | "
          "bcast MB | peak MB | spill MB | s |")
    print("|---|---|---|---|---|---|---|---|---|")
    for name, r in ranked[:top_n]:
        amp = (f"{r['shuffled'] / r['scanned']:.2f}x" if r["scanned"]
               else "n/a (cache-fed)" if r.get("cache_fed") else "n/a")
        print(f"| {name} | {mb(r['scanned'])} | {mb(r['shuffled'])} | "
              f"{amp} | {int(r['shuffle_rows']):,} | "
              f"{mb(r['broadcast'])} | {mb(r['peak'])} | "
              f"{mb(r['spilled'])} | {r['wall']:.2f} |")

    tot_scan = sum(r["scanned"] for r in results.values())
    tot_shuf = sum(r["shuffled"] for r in results.values())
    tot_spill = sum(r["spilled"] for r in results.values())
    zero_shuffle = sum(1 for r in results.values() if r["shuffled"] == 0)
    print(f"\nTotals: scanned {mb(tot_scan)} MB, shuffled {mb(tot_shuf)} MB "
          f"(registry-wide amplification {tot_shuf / tot_scan:.2f}x), "
          f"{zero_shuffle}/{len(results)} queries shuffle ZERO bytes, "
          f"spill {tot_spill} bytes")
    for e in errors:
        print("ERROR:", e)
    ok = tot_spill == 0 and not errors
    print(f"\nPIN {'OK' if ok else 'FAIL'}: zero spill across the registry "
          f"at {SF} and zero errors")
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
