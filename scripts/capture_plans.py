"""Capture .explain("formatted") for headline queries into plans/<round>/
(round from $FSBD_PLANS_ROUND, default r15).

Usage: python scripts/capture_plans.py <suffix> [name ...]
Writes plans/r14/<query>_<suffix>.txt for each headline (or named) query.
Plans only — no job is executed (except the builders' own bounded
artifact work: training collects, index writes)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from full_stack_big_data_spark.engine.session import (get_spark,
                                                      release_scoped_cache)
from full_stack_big_data_spark.operators.registry import load_all

import bench

suffix = sys.argv[1]
names = sys.argv[2:] or bench.HEADLINE
out_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "plans",
    os.environ.get("FSBD_PLANS_ROUND", "r15"))
os.makedirs(out_dir, exist_ok=True)

spark = get_spark(app_name="fsbd-capture-plans")
spark.sparkContext.setLogLevel("ERROR")
reg = load_all()
for n in names:
    release_scoped_cache(spark)
    df = reg[n].builder(spark, bench.SF_DIR)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    with open(os.path.join(out_dir, f"{n}_{suffix}.txt"), "w") as f:
        f.write(plan)
    print(n, "->", f"{n}_{suffix}.txt", flush=True)
spark.stop()
