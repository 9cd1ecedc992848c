"""N× fact-table scale probe for the relational headline queries.

Method (BENCHNOTES 8× probe, extended): replicate the FACT tables
(lineitem, orders, events) N times with per-copy key offsets so joins
fan out linearly and per-key group sizes stay constant; dimension
tables are shared (broadcast sides must not grow — that is the star-
schema property being tested).

Usage: python scripts/scale_probe_facts.py [N] [query ...]
Defaults: N=32, queries = q1_pricing_summary q3_shipping_priority
q9_product_profit q18_large_volume.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from pyspark.sql import functions as F

from full_stack_big_data_spark.engine.session import get_spark
from full_stack_big_data_spark.operators.registry import load_all

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# fact table → key columns that must be offset per copy so copies never
# join across each other (order keys tie lineitem↔orders; event/user ids
# keep events self-contained per copy)
FACT_KEYS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "events": ["event_id", "user_id"],
}
DIMS = ("region", "nation", "customer", "supplier", "part",
        "documents", "embeddings")


def build_scaled(spark, n_copies: int, out_dir: str) -> None:
    offsets = {}
    for t, keys in FACT_KEYS.items():
        d = spark.read.parquet(f"{BASE}/{t}.parquet")
        for k in keys:
            if k not in offsets:
                offsets[k] = d.agg(F.max(k)).first()[0] + 1
    # The orderkey DOMAIN is shared by orders and lineitem: both columns
    # must shift by the same offset or copy c's lineitems join the wrong
    # copy's orders (orders' max is the domain max — an order can exist
    # without lineitems, never the reverse).
    offsets["l_orderkey"] = offsets["o_orderkey"] = max(
        offsets["l_orderkey"], offsets["o_orderkey"])
    # o_custkey offsets must match customer ids... customers are a DIM
    # (shared): point every copy's orders at the ORIGINAL customer ids so
    # the dim join still matches — only order/event keys shift.
    for t, keys in FACT_KEYS.items():
        d = spark.read.parquet(f"{BASE}/{t}.parquet")
        scaled = d.withColumn(
            "c", F.explode(F.sequence(F.lit(0), F.lit(n_copies - 1))))
        for k in keys:
            if k == "o_custkey":
                continue  # customer is shared; keep original ids
            scaled = scaled.withColumn(k, F.col(k) + F.col("c") * offsets[k])
        scaled.drop("c").repartition(32).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{t}.parquet"))
    for t in DIMS:
        src = f"{BASE}/{t}.parquet"
        dst = os.path.join(out_dir, f"{t}.parquet")
        if os.path.exists(src) and not os.path.exists(dst):
            os.symlink(src, dst)


def main() -> None:
    n_copies = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    names = sys.argv[2:] or ["q1_pricing_summary", "q3_shipping_priority",
                             "q9_product_profit", "q18_large_volume"]
    spark = get_spark(app_name="fact-scale-probe")
    reg = load_all()
    out_dir = tempfile.mkdtemp(prefix=f"fsbd_factscale{n_copies}x_")
    try:
        t0 = time.time()
        build_scaled(spark, n_copies, out_dir)
        print(f"built {n_copies}x facts in {time.time() - t0:.1f}s -> {out_dir}")
        for name in names:
            for label, sf in (("1x", BASE), (f"{n_copies}x", out_dir)):
                t0 = time.time()
                rows = reg[name].builder(spark, sf).count()
                print(f"{name} {label}: {time.time() - t0:.1f}s, {rows} rows",
                      flush=True)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
