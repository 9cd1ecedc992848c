"""Paired order-alternating A/B for ann_brute_topk's cosine path (r14
verdict item 4: the driver read −10% after the Arrow cosine landed, the
builder's close read +20%, both inside an 11.76 band — adjudicate on an
idle box and ship the winner for THIS consumer). Three variants in ONE
process: the r14 Arrow pandas kernel (ships today), the Catalyst HOF
exprs form, and the r15 zero-copy arrow_udf kernel.

python scripts/adjudicate_brute_topk_cosine.py [sf_dir] [reps]
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
                                                         cosine_sim_exprs,
                                                         cosine_sim_zerocopy)
from full_stack_big_data_spark.operators.registry import load_all

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 6
Q = "ann_brute_topk"
VARIANTS = [("pandas", cosine_sim), ("hof", cosine_sim_exprs),
            ("zerocopy", cosine_sim_zerocopy)]

spark = SparkSession.builder.master(
    f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]").getOrCreate()
tune_session(spark)
spark.sparkContext.setLogLevel("ERROR")
reg = load_all()


def run(variant):
    sim.cosine_sim = variant
    release_scoped_cache(spark)
    t0 = time.monotonic()
    reg[Q].builder(spark, sf).write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def result_md5(variant):
    sim.cosine_sim = variant
    release_scoped_cache(spark)
    rows = sorted(map(str, reg[Q].builder(spark, sf).collect()))
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


hashes = {n: result_md5(v) for n, v in VARIANTS}
assert len(set(hashes.values())) == 1, f"results differ: {hashes}"
print("md5 EQUAL across variants", flush=True)

times = {n: [] for n, _ in VARIANTS}
for rep in range(reps):
    order = VARIANTS if rep % 2 == 0 else VARIANTS[::-1]
    for n, v in order:
        t = run(v)
        times[n].append(t)
    print(f"rep{rep}: " + " ".join(f"{n}={times[n][-1]:.3f}s"
                                   for n, _ in order), flush=True)

sim.cosine_sim = cosine_sim
for n, _ in VARIANTS:
    print(f"{n}: min {min(times[n]):.3f}s "
          f"mean {sum(times[n]) / len(times[n]):.3f}s", flush=True)
