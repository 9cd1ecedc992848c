"""Paired order-alternating A/B for the r15 gate-body overlap (guide
§2.6): the verify tiers' driver id collects run on a one-thread pool
while the driver builds the next tier's expression trees, vs the serial
order (FSBD_GATE_SERIAL=1 — same code path, overlap disabled). Both
variants run in ONE process with fresh sink/checkpoint dirs per rep
(the host's ~3x ambient band makes cross-process timings meaningless;
shared corpus-side artifacts stay memoized, the production steady
state, exactly like bench.py's reps).

python scripts/adjudicate_gate_overlap.py [sf_dir] [reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from full_stack_big_data_spark.engine.session import (release_scoped_cache,
                                                      tune_session)
from full_stack_big_data_spark.operators.registry import load_all
from full_stack_big_data_spark.streaming.joins import reset_gate_dirs

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
QUERIES = ["stream_text_admit", "stream_embedding_ingest_scaled"]

spark = SparkSession.builder.master(
    f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]").getOrCreate()
tune_session(spark)
spark.sparkContext.setLogLevel("ERROR")
reg = load_all()


def run(name: str, serial: bool) -> float:
    if serial:
        os.environ["FSBD_GATE_SERIAL"] = "1"
    else:
        os.environ.pop("FSBD_GATE_SERIAL", None)
    release_scoped_cache(spark)
    reset_gate_dirs()
    spark.sparkContext.setJobDescription(
        f"{name} [{'serial' if serial else 'overlap'}]")
    t0 = time.monotonic()
    reg[name].builder(spark, sf).write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


# warm pass (pays memoized artifact builds; untimed)
for q in QUERIES:
    run(q, serial=True)

wins: dict[str, int] = {q: 0 for q in QUERIES}
times: dict[str, list] = {q: [] for q in QUERIES}
for rep in range(reps):
    for q in QUERIES:
        if rep % 2 == 0:
            a = run(q, serial=True)
            b = run(q, serial=False)
        else:
            b = run(q, serial=False)
            a = run(q, serial=True)
        times[q].append((a, b))
        if b < a:
            wins[q] += 1
        print(f"rep{rep} {q}: serial {a:.3f}s overlap {b:.3f}s "
              f"({'overlap' if b < a else 'serial'} wins)", flush=True)

for q in QUERIES:
    sa = min(t[0] for t in times[q])
    sb = min(t[1] for t in times[q])
    print(f"{q}: overlap wins {wins[q]}/{reps}; minima serial {sa:.3f}s "
          f"overlap {sb:.3f}s ({sa / sb:.2f}x)", flush=True)
