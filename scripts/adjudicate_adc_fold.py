"""Paired adjudication: r13 posexplode→LUT-join→groupBy ADC vs r14
map-side ``_adc_fold`` over the broadcast-flattened per-query LUT
array, both serving the trained codebooks at sf0.1. Order-alternating
reps in ONE process (the r12 InferFiltersFromGenerate discipline —
host wall moves ~3x between processes, only paired timings signal).

python scripts/adjudicate_adc_fold.py [sf_dir] [reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from full_stack_big_data_spark.engine.session import tune_session
from full_stack_big_data_spark.operators.similarity import (
    PQ_CELLS, PQ_SUBSPACES, TOP_K, _ivfpq_corpus_index, _ivfpq_probe_luts,
    _ivfpq_serve, _pq_trained_codebooks, grouped_topk)

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

spark = SparkSession.builder.master("local[32]").getOrCreate()
tune_session(spark)
cb = _pq_trained_codebooks(spark, sf)
idx = _ivfpq_corpus_index(spark, sf, cb)
probes = _ivfpq_probe_luts(spark, sf, cb)


def fold_plan():
    return _ivfpq_serve(idx, probes)


def posexplode_plan():
    # the r13 shape: fan every candidate to S code rows, join the
    # (query, sub, pcell)->cost LUT rows, partial-sum through the
    # exchange — reconstructed from the LUT array so both plans score
    # the identical candidates with the identical costs.
    lut_rows = (probes.select("query_id", "lut").dropDuplicates(["query_id"])
                .select("query_id", F.posexplode("lut").alias("i", "cost"))
                .select("query_id",
                        (F.col("i") / PQ_CELLS).cast("int").alias("sub"),
                        (F.col("i") % PQ_CELLS).alias("pcell"), "cost"))
    cand = (idx.join(F.broadcast(probes.select("query_id", "cell")), "cell")
            .where(F.col("vec_id") != F.col("query_id"))
            .select("query_id", "vec_id",
                    F.posexplode("codes").alias("sub", "pcell")))
    adc = (cand.join(F.broadcast(lut_rows), ["query_id", "sub", "pcell"])
           .groupBy("query_id", "vec_id")
           .agg(F.sum("cost").cast("bigint").alias("adc_x")))
    return (grouped_topk(adc, ["query_id"],
                         [F.asc("adc_x"), F.asc("vec_id")],
                         TOP_K, F.col("vec_id"))
            .select("query_id", F.col("rank").cast("bigint").alias("rank"),
                    F.col("vec_id").alias("neighbor_id"), "adc_x"))


def run(plan):
    t0 = time.monotonic()
    n = plan().count()
    return time.monotonic() - t0, n


# equivalence gate first: same result set, or the timing is meaningless
a = {tuple(r) for r in fold_plan().collect()}
b = {tuple(r) for r in posexplode_plan().collect()}
assert a == b, f"plans diverge: {len(a ^ b)} rows differ"
print(f"equivalent: {len(a)} rows", flush=True)

pairs = []
for i in range(reps):
    if i % 2 == 0:
        tf, _ = run(fold_plan)
        tp, _ = run(posexplode_plan)
    else:
        tp, _ = run(posexplode_plan)
        tf, _ = run(fold_plan)
    pairs.append((tf, tp))
    print(f"rep {i}: fold={tf:.3f}s posexplode={tp:.3f}s", flush=True)

mf = min(p[0] for p in pairs)
mp = min(p[1] for p in pairs)
wins = sum(1 for tf, tp in pairs if tf < tp)
print(f"min fold={mf:.3f}s min posexplode={mp:.3f}s "
      f"ratio={mp / mf:.2f}x fold_wins={wins}/{reps}")
