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
    # r9: the multimodal perceptual-hash near-dup pair (fixture +
    # deployment banding points, mirroring the simhash pair above).
    "multimodal_phash_neardup",
    "multimodal_phash_neardup_scaled",
    # r10 (r9 verdict item 3): the image family's cluster path — the
    # heavier of clusters/apply at sf0.1 (2.63 s vs 2.21 s, probe
    # batch 6) — so the component-loop + banded-join composition is
    # driver-benched round-over-round, not just builder-probed.
    "multimodal_phash_clusters",
]


def _prev_round_queries() -> tuple[list[str], int | None]:
    """(query keys, round) of the newest committed BENCH_r{N}.json that
    is NOT this round's own artifact — the previous round's headline
    set. Summing THIS run's times over that set gives a like-for-like
    round-over-round subtotal in the artifact itself (r8 verdict
    item 3), so a grown headline list no longer makes totals
    incomparable.

    "Own artifact" is identified by ROUND NUMBER, not by set equality
    (r11 verdict item 6: the old skip-any-equal-set rule silently
    reached past r10 to r9 whenever the headline was stable between
    rounds — correct arithmetic, wrong label). The current round is
    VERDICT.md's round + 1 (the driver rewrites VERDICT.md before each
    build round); only a within-round re-run after the driver lands
    BENCH_r{current} ever hits the exclusion, and a stable headline
    now compares against LAST round, correctly labeled. When
    VERDICT.md is absent or unparseable (hand-saved artifact trees),
    the pre-r12 heuristic applies unchanged: skip equal-set artifacts,
    and when none differs fall back to the newest (subtotal == total
    IS the like-for-like number there). The source round rides in the
    emitted JSON as ``prev_round_source``."""
    import re as _re

    here = os.path.dirname(os.path.abspath(__file__))
    cur_round = None
    try:
        with open(os.path.join(here, "VERDICT.md")) as f:
            m = _re.search(r"Round\s+(\d+)", f.read(2048))
        if m:
            cur_round = int(m.group(1)) + 1
    except OSError:
        pass
    rounds = []
    for fname in os.listdir(here):
        m = _re.match(r"BENCH_r(\d+)\.json$", fname)
        if m:
            rounds.append((int(m.group(1)), fname))
    newest: tuple[list[str], int | None] = ([], None)
    for rnd, fname in sorted(rounds, reverse=True):
        try:
            with open(os.path.join(here, fname)) as f:
                rec = json.load(f)
            # The driver wraps bench's JSON line under "parsed"; accept
            # the raw line too so a hand-saved artifact works.
            prev = list(rec.get("parsed", rec).get("queries", {}))
        except (OSError, ValueError, AttributeError):
            continue
        if not prev or rnd == cur_round:
            continue
        if cur_round is not None:
            return prev, rnd          # newest non-own, label-faithful
        if newest[1] is None:
            newest = (prev, rnd)
        if set(prev) != set(HEADLINE):
            return prev, rnd
    return newest


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
    components: dict[str, dict[str, float]] = {}
    for name in HEADLINE:
        best = float("inf")
        comp_best: dict[str, float] = {}
        for _ in range(reps):
            # Each rep re-persists any operator-level caches; release
            # between reps so rep N's timing is the cold plan cost, not
            # a read of rep N-1's cache, and the sweep doesn't accumulate.
            release_scoped_cache(spark)
            if name == "ann_ivf_index_persist":
                # Timed in its two lifecycle halves (r8 verdict item 3):
                # the write-dominated index build would otherwise mask a
                # serve-path regression inside one number. The sum is
                # still recorded under the query name, so round-over-
                # round totals stay comparable.
                from full_stack_big_data_spark.operators.similarity import (
                    ivf_index_build, ivf_index_serve)

                t0 = time.perf_counter()
                path = ivf_index_build(spark, SF_DIR)
                build_s = time.perf_counter() - t0
                t0 = time.perf_counter()
                ivf_index_serve(spark, SF_DIR, path) \
                    .write.format("noop").mode("overwrite").save()
                serve_s = time.perf_counter() - t0
                if build_s + serve_s < best:
                    best = build_s + serve_s
                    comp_best = {"build_s": round(build_s, 3),
                                 "serve_s": round(serve_s, 3)}
                continue
            t0 = time.perf_counter()
            df = reg[name].builder(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        times[name] = round(best, 3)
        if comp_best:
            components[name] = comp_best

    total = round(sum(times.values()), 3)
    prev_all, prev_src = _prev_round_queries()
    prev_set = [n for n in prev_all if n in times]
    # Queries the previous round benched but this run didn't are
    # RECORDED, not silently dropped (r9 ADVICE): a query leaving
    # HEADLINE shrinks the like-for-like set, and the artifact should
    # say so instead of letting the subtotal quietly cover less.
    prev_missing = [n for n in prev_all if n not in times]
    m = re.search(r"sf([0-9.]+)", SF_DIR)
    sf = float(m.group(1)) if m else None
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": times,
        "components": components,
        "subtotal_prev_round": round(sum(times[n] for n in prev_set), 3)
        if prev_set else None,
        # Per-query table of the previous round's set under THIS run's
        # timings (r9 verdict item 8) — per-query attribution without
        # BENCHNOTES archaeology.
        "queries_prev_round": {n: times[n] for n in prev_set} or None,
        "prev_round_missing": prev_missing or None,
        # Which BENCH_r{N}.json the comparison set came from (r10
        # ADVICE) — null only when no artifact exists at all.
        "prev_round_source": prev_src,
        "sf": sf,
    }))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
