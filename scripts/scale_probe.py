"""N× corpus scale probe for the banded dedup/decontam paths.

Method (BENCHNOTES 16× probe, extended): replicate sf0.1 documents N
times with per-copy token suffixing (`w → wcK`) so planted
near-duplicates do NOT multiply across copies — duplicate pairs grow
linearly (N× copies of each 1× pair), never quadratically, and the
probe measures ENGINE scaling on the candidate-generation and verify
joins, not duplicate explosion.

Usage: python scripts/scale_probe.py [N] [query ...]
Defaults: N=64, queries = dedup_minhash_lsh decontam_overlap.
Writes the scaled documents table to a temp dir and times each query's
full-result .count() at 1× and N×.
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


def build_scaled(spark, n_copies: int, out_dir: str) -> None:
    d = spark.read.parquet(f"{BASE}/documents.parquet")
    max_id = d.agg(F.max("doc_id")).first()[0] + 1
    scaled = (
        d.withColumn("c", F.explode(F.sequence(F.lit(0), F.lit(n_copies - 1))))
        .select(
            (F.col("doc_id") + F.col("c") * max_id).alias("doc_id"),
            # suffix every token with the copy id → shingles are
            # copy-disjoint, so near-dup pairs replicate, not multiply
            F.expr("regexp_replace(text, '(\\\\S+)', "
                   "concat('$1c', cast(c as string)))").alias("text"),
            "lang", "source", "n_chars",
        )
    )
    scaled.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet"))
    # decontam & friends read other tables from sf_dir; link them through
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "embeddings"):
        src = f"{BASE}/{t}.parquet"
        dst = os.path.join(out_dir, f"{t}.parquet")
        if os.path.exists(src) and not os.path.exists(dst):
            os.symlink(src, dst)


def main() -> None:
    n_copies = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    names = sys.argv[2:] or ["dedup_minhash_lsh", "decontam_overlap"]
    spark = get_spark(app_name="scale-probe")
    reg = load_all()
    out_dir = tempfile.mkdtemp(prefix=f"fsbd_scale{n_copies}x_")
    try:
        t0 = time.time()
        build_scaled(spark, n_copies, out_dir)
        print(f"built {n_copies}x corpus in {time.time() - t0:.1f}s -> {out_dir}")
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
