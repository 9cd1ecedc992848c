"""Paired order-alternating A/B: Arrow-batched numpy cosine_sim vs the
Catalyst HOF form (cosine_sim_exprs), swapped via the similarity
module's imported symbol so both variants run in ONE process (the host's
~3x ambient band makes cross-process timings meaningless).

python scripts/adjudicate_cosine_arrow.py [sf_dir] [reps]
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
                                                         cosine_sim_exprs)
from full_stack_big_data_spark.operators.registry import load_all

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
QUERIES = ["emb_knn_graph", "emb_knn_graph_scaled", "ann_incremental",
           "ann_srp_lsh", "embedding_neardup"]

spark = SparkSession.builder.master(
    f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]").getOrCreate()
tune_session(spark)
spark.sparkContext.setLogLevel("ERROR")
reg = load_all()


def run(name, variant):
    sim.cosine_sim = variant
    release_scoped_cache(spark)
    spark.sparkContext.setJobDescription(f"{name} [{variant.__name__}]")
    t0 = time.monotonic()
    reg[name].builder(spark, sf).write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def result_md5(name, variant):
    sim.cosine_sim = variant
    release_scoped_cache(spark)
    rows = sorted(map(str, reg[name].builder(spark, sf).collect()))
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


# result identity first (full result-set md5 at this sf)
for q in QUERIES:
    ha = result_md5(q, cosine_sim)
    hb = result_md5(q, cosine_sim_exprs)
    print(f"{q}: md5 {'EQUAL' if ha == hb else 'DIFFER ' + ha + ' ' + hb}",
          flush=True)
    assert ha == hb, q

for q in QUERIES:
    run(q, cosine_sim)  # warm both code paths once
    run(q, cosine_sim_exprs)
    arrow, exprs = [], []
    for r in range(reps):
        if r % 2 == 0:
            arrow.append(run(q, cosine_sim))
            exprs.append(run(q, cosine_sim_exprs))
        else:
            exprs.append(run(q, cosine_sim_exprs))
            arrow.append(run(q, cosine_sim))
    wins = sum(a < b for a, b in zip(arrow, exprs))
    print(f"{q}: arrow min {min(arrow):.3f} exprs min {min(exprs):.3f} "
          f"(arrow wins {wins}/{reps}; pairs "
          f"{[f'{a:.2f}/{b:.2f}' for a, b in zip(arrow, exprs)]})", flush=True)

sim.cosine_sim = cosine_sim
