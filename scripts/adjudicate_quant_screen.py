"""Paired order-alternating A/B for the r15 Arrow quantized-screen
kernel (quant_screen_keep) vs the Catalyst HOF bound chain it replaced
(quant_screen_keep_exprs), swapped via the similarity module's symbol so
both variants run in ONE process (the host's ~3x ambient band makes
cross-process timings meaningless). Fresh sink/checkpoint dirs per rep;
shared corpus artifacts stay memoized (bench.py's rep discipline).

python scripts/adjudicate_quant_screen.py [sf_dir] [reps]
"""
import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

import full_stack_big_data_spark.operators.similarity as sim
from full_stack_big_data_spark.engine.session import (release_scoped_cache,
                                                      tune_session)
from full_stack_big_data_spark.operators.registry import load_all
from full_stack_big_data_spark.streaming.joins import reset_gate_dirs

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
QUERIES = ["stream_embedding_ingest_scaled", "stream_embedding_admit_scaled"]

spark = SparkSession.builder.master(
    f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]").getOrCreate()
tune_session(spark)
spark.sparkContext.setLogLevel("ERROR")
reg = load_all()

ARROW = sim.quant_screen_keep_arrow
HOF = sim.quant_screen_keep


def run(name: str, variant) -> float:
    sim.quant_screen_keep = variant
    release_scoped_cache(spark)
    reset_gate_dirs()
    spark.sparkContext.setJobDescription(f"{name} [{variant.__name__}]")
    t0 = time.monotonic()
    reg[name].builder(spark, sf).write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def result_md5(name: str, variant) -> str:
    sim.quant_screen_keep = variant
    release_scoped_cache(spark)
    reset_gate_dirs()
    rows = sorted(map(str, reg[name].builder(spark, sf).collect()))
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


# result identity first (full result-set md5 at this sf)
for q in QUERIES:
    ha = result_md5(q, ARROW)
    hb = result_md5(q, HOF)
    print(f"{q}: md5 {'EQUAL' if ha == hb else 'DIFFER ' + ha + ' ' + hb}",
          flush=True)
    assert ha == hb, q

wins = {q: 0 for q in QUERIES}
times = {q: [] for q in QUERIES}
for rep in range(reps):
    for q in QUERIES:
        if rep % 2 == 0:
            a = run(q, HOF)
            b = run(q, ARROW)
        else:
            b = run(q, ARROW)
            a = run(q, HOF)
        times[q].append((a, b))
        if b < a:
            wins[q] += 1
        print(f"rep{rep} {q}: hof {a:.3f}s arrow {b:.3f}s "
              f"({'arrow' if b < a else 'hof'} wins)", flush=True)

sim.quant_screen_keep = ARROW
for q in QUERIES:
    sa = min(t[0] for t in times[q])
    sb = min(t[1] for t in times[q])
    print(f"{q}: arrow wins {wins[q]}/{reps}; minima hof {sa:.3f}s "
          f"arrow {sb:.3f}s ({sa / sb:.2f}x)", flush=True)
