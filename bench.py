#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query executes fully through the noop sink (real scan → compute →
exchange work, no driver collect, no sink I/O) — the number is engine
time, not materialization time.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from full_stack_big_data_spark.engine.session import (get_spark,
                                                      release_scoped_cache)
from full_stack_big_data_spark.operators.registry import load_all

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q9_product_profit",
    "q18_large_volume",
    "q_window_running",
    "wordcount_batch",
    "text_quality",
    "dedup_minhash_lsh",
    "dedup_exact",
    "ann_brute_topk",
    "embedding_neardup",
    "multimodal_features",
    "json_roundtrip",
    # r6 refresh (r5 verdict item 6): the set above was frozen at r1
    # vintage and missed every post-r3 heavy family — these six track
    # the heaviest newer operators round-over-round.
    "ann_pq_adc_trained",   # inline train + re-encode + ADC serve
    "ann_pq_persist",       # same answer served from stored artifacts
    "q_sketch_bloom",       # build + broadcast-probe membership sketch
    "dedup_editdistance",   # Ed-Join prefix-filter candidate join
    "q_delete_propagation", # right-to-be-forgotten cascade
    "q_pagerank",           # iterative: fixed-point integer ranks
    # r7: the two new scale-relevant entries — the corpus-scaled IVF
    # operating point and the container-sniffing mixed-media decode
    "ann_ivf_scaled",
    "multimodal_decode_dispatch",
    # r8 (r7 verdict item 2): the registry's two heaviest plans were
    # only builder-probed, never driver-benched — regressions there
    # were invisible to BENCH_r{N}. dedup_simhash is the documented
    # fixture operating point (Θ(N²/16) candidate join by construction,
    # operators/dedup.py); its _scaled sibling is the deployment point.
    "dedup_simhash",
    "dedup_simhash_scaled",
    "ann_ivf_index_persist",
]


def main() -> None:
    reg = load_all()
    spark = get_spark(app_name="fsbd-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/codegen once with the cheapest query so per-query times
    # measure the plan, not first-run JIT.
    reg["q2_filter_project"].builder(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    # Warm the Arrow/pandas-UDF path too (executor-side Python workers and
    # Arrow serde spin up on first use — startup cost, not plan cost).
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long").write.format("noop").mode("overwrite").save()

    # Best-of-N per query: a single timing on a shared box folds scheduler
    # noise and page-cache state into the number (round 1 recorded 69 s
    # under contention for a 28 s-idle suite). The min over a few runs is
    # the standard estimator for "what the plan costs"; N via env.
    # reps default 2→3 after r4: the driver's single sweep landed mid-
    # contention and read 2-3× on two untouched plans; a third rep gives
    # the min one more chance to land in a quiet scheduler window at the
    # cost of ~30 s wall (r5 paired-idle evidence in BENCHNOTES.md).
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    times: dict[str, float] = {}
    for name in HEADLINE:
        best = float("inf")
        for _ in range(reps):
            # Each rep re-persists any operator-level caches; release
            # between reps so rep N's timing is the cold plan cost, not
            # a read of rep N-1's cache, and the sweep doesn't accumulate.
            release_scoped_cache(spark)
            t0 = time.perf_counter()
            df = reg[name].builder(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        times[name] = round(best, 3)

    total = round(sum(times.values()), 3)
    m = re.search(r"sf([0-9.]+)", SF_DIR)
    sf = float(m.group(1)) if m else None
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
    }))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
