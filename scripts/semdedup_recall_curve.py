#!/usr/bin/env python
"""SemDeDup multiprobe recall/cost curve (r12 verdict item 5).

Multiprobe r=2 lifted within-cell pair recall 0.049→0.138 over the
exact all-pairs kernel at sf0.1; this probe extends the curve to
r=3/4 so the operating point is CHOSEN from a measured trade, not
assumed: per r, (candidates, verified pairs, recall vs exact,
candidate cost per recovered pair). At sf1.0 the exact denominator is
a deliberate non-goal (the all-pairs kernel is O(N²) — the thing
SemDeDup exists to avoid), so that table reports candidate/pair
growth only.

Usage: python scripts/semdedup_recall_curve.py [max_probes]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from full_stack_big_data_spark.engine.catalog import Catalog  # noqa: E402
from full_stack_big_data_spark.engine.session import get_spark  # noqa: E402
from full_stack_big_data_spark.functions import observability as obs  # noqa: E402
from full_stack_big_data_spark.operators.similarity import (  # noqa: E402
    IVF_CELLS_WIDE, SEMDEDUP_COS, embedding_neardup,
    semdedup_pairs_multiprobe)

MAX_PROBES = int(sys.argv[1]) if len(sys.argv) > 1 else 4
HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF01 = "/root/testdata/sf0.1"
SF10 = os.path.join(HERE, ".localdata", "sf1.0")


def curve(spark, sf: str, exact_pairs: int | None) -> list[dict]:
    e = Catalog(spark, sf).embeddings
    rows = []
    for r in range(1, MAX_PROBES + 1):
        obs.enable()
        t0 = time.time()
        pairs = semdedup_pairs_multiprobe(e, probes=r)
        n_pairs = pairs.count()
        wall = round(time.time() - t0, 2)
        cands = obs.candidate_counts().get(
            f"semdedup_mp{r}_cells{IVF_CELLS_WIDE}")
        obs.disable()
        rows.append({
            "sf": sf.rsplit("sf", 1)[-1], "probes": r,
            "candidates": cands, "pairs": n_pairs,
            "recall": round(n_pairs / exact_pairs, 4)
            if exact_pairs else None,
            "cand_per_pair": round(cands / max(n_pairs, 1), 1),
            "wall_s": wall,
        })
        print(json.dumps(rows[-1]), flush=True)
    return rows


def main() -> None:
    spark = get_spark(app_name="semdedup-recall-curve")
    spark.sparkContext.setLogLevel("ERROR")
    exact = (embedding_neardup(spark, SF01)
             .where(f"cosine >= {SEMDEDUP_COS}").count())
    print(json.dumps({"sf": "0.1", "exact_all_pairs": exact}), flush=True)
    curve(spark, SF01, exact)
    if os.path.isdir(SF10):
        curve(spark, SF10, None)
    spark.stop()


if __name__ == "__main__":
    main()
