"""Decompose the two persisted-index builds (guide §1: measure first).

For ivf_index_build / ivfpq_index_build: time the build, count the
files + bytes the generation directory holds, then time the serve.
Run on an idle box; labels jobs for the UI."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from full_stack_big_data_spark.engine.catalog import Catalog
from full_stack_big_data_spark.engine.session import (get_spark,
                                                      release_scoped_cache)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = get_spark(app_name="fsbd-profile-builds")
spark.sparkContext.setLogLevel("ERROR")

from full_stack_big_data_spark.operators.similarity import (
    ivf_index_build, ivf_index_serve, ivfpq_index_build, ivfpq_index_serve)


def walk(p):
    n = b = 0
    for root, _d, files in os.walk(p):
        for f in files:
            fp = os.path.join(root, f)
            b += os.path.getsize(fp)
            if f.endswith(".parquet"):
                n += 1
    return n, b


for name, build, serve in (
        ("ivf", ivf_index_build, ivf_index_serve),
        ("ivfpq", ivfpq_index_build, ivfpq_index_serve)):
    for rep in range(3):
        release_scoped_cache(spark)
        spark.sparkContext.setJobDescription(f"{name} build rep{rep}")
        t0 = time.perf_counter()
        path = build(spark, SF_DIR)
        t1 = time.perf_counter()
        nfiles, nbytes = walk(path)
        spark.sparkContext.setJobDescription(f"{name} serve rep{rep}")
        t2 = time.perf_counter()
        serve(spark, SF_DIR, path).write.format("noop").mode("overwrite").save()
        t3 = time.perf_counter()
        print(f"{name} rep{rep}: build={t1-t0:.2f}s files={nfiles} "
              f"kb={nbytes//1024} serve={t3-t2:.2f}s", flush=True)
spark.stop()
