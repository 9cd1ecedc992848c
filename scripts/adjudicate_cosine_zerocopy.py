"""Paired order-alternating A/B: the arrow_udf ZERO-COPY cosine
(vectors.cosine_sim_zerocopy — ListArray values-buffer reshape, guide
§4.2's re-slice trick) vs the r14 pandas-kernel cosine on the
corpus-scale pair scorers it is routed to. Swapped via the similarity
module's imported symbol so both variants run in ONE process (the
host's ~3x ambient band makes cross-process timings meaningless).

python scripts/adjudicate_cosine_zerocopy.py [sf_dir] [reps]
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
from full_stack_big_data_spark.functions.vectors import (cosine_sim,
                                                         cosine_sim_zerocopy)
from full_stack_big_data_spark.operators.registry import load_all

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
QUERIES = ["emb_knn_graph", "emb_knn_graph_scaled", "ann_incremental",
           "ann_index_persist"]


def _rename(fn, name):
    def g(*a, **kw):
        return fn(*a, **kw)
    g.__name__ = name
    return g


PANDAS = _rename(cosine_sim, "pandas_kernel")
ZEROCOPY = _rename(cosine_sim_zerocopy, "zerocopy_kernel")

spark = SparkSession.builder.master(
    f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]").getOrCreate()
tune_session(spark)
spark.sparkContext.setLogLevel("ERROR")
reg = load_all()


def run(name, variant):
    sim.cosine_sim_zerocopy = variant
    release_scoped_cache(spark)
    spark.sparkContext.setJobDescription(f"{name} [{variant.__name__}]")
    t0 = time.monotonic()
    reg[name].builder(spark, sf).write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def result_md5(name, variant):
    sim.cosine_sim_zerocopy = variant
    release_scoped_cache(spark)
    rows = sorted(map(str, reg[name].builder(spark, sf).collect()))
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


for q in QUERIES:
    ha = result_md5(q, ZEROCOPY)
    hb = result_md5(q, PANDAS)
    print(f"{q}: md5 {'EQUAL' if ha == hb else 'DIFFER ' + ha + ' ' + hb}",
          flush=True)
    assert ha == hb, q

wins = {q: 0 for q in QUERIES}
times = {q: [] for q in QUERIES}
for rep in range(reps):
    for q in QUERIES:
        if rep % 2 == 0:
            a = run(q, PANDAS)
            b = run(q, ZEROCOPY)
        else:
            b = run(q, ZEROCOPY)
            a = run(q, PANDAS)
        times[q].append((a, b))
        if b < a:
            wins[q] += 1
        print(f"rep{rep} {q}: pandas {a:.3f}s zerocopy {b:.3f}s "
              f"({'zerocopy' if b < a else 'pandas'} wins)", flush=True)

sim.cosine_sim_zerocopy = ZEROCOPY
for q in QUERIES:
    sa = min(t[0] for t in times[q])
    sb = min(t[1] for t in times[q])
    print(f"{q}: zerocopy wins {wins[q]}/{reps}; minima pandas {sa:.3f}s "
          f"zerocopy {sb:.3f}s ({sa / sb:.2f}x)", flush=True)
