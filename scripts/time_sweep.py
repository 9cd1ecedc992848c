"""Timing-only sweep of every registry entry (noop sink, tuned
session) — the coarse outlier detector that caught the r14
createDataFrame/coalesce(1) codebook-write pathology class.
Numbers are SINGLE-SHOT (cold per entry): use for triage ranking
only, re-measure warm before concluding anything (see
OPTIMIZATION_r14.md "registry-wide timing sweep").

python scripts/time_sweep.py [sf_dir]
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import SparkSession
from full_stack_big_data_spark.engine.session import tune_session, release_scoped_cache
from full_stack_big_data_spark.operators.registry import load_all

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
spark = SparkSession.builder.master("local[32]").getOrCreate()
tune_session(spark)
spark.sparkContext.setLogLevel("ERROR")
reg = load_all()
times = {}
for n, spec in reg.items():
    release_scoped_cache(spark)
    t0 = time.monotonic()
    try:
        spec.builder(spark, sf).write.format("noop").mode("overwrite").save()
        times[n] = time.monotonic() - t0
        print(f"{n} {times[n]:.3f}", flush=True)
    except Exception as e:
        print(f"{n} ERR {type(e).__name__}: {e}", flush=True)
print("== slowest ==", flush=True)
for n, s in sorted(times.items(), key=lambda kv: -kv[1])[:30]:
    print(f"{n:45s} {s:7.3f}", flush=True)
spark.stop()
