"""N× embedding-corpus scale probe for the vector-path operators.

Method (sibling of scale_probe.py's suffixed text corpus): replicate
the embeddings table N times with per-copy vec_id offsets and per-copy
DETERMINISTIC SIGN FLIPS of the vector dimensions. An element-wise ±1
mask is an isometry, so every within-copy cosine — including the
planted near-duplicates — is preserved EXACTLY, while two copies of the
same vector under different masks decorrelate (E[cos] = 0, sd ≈ 1/√64 ≈
0.125). Caveat measured at 64×: decorrelation is only statistical — at
the fixture's 0.40 threshold (≈3.2 sd) the ~8×10⁹ cross-copy pairs
have a real tail above threshold, so pair counts are corpus-true, not
1×-replicas; at a production dedup threshold (0.9 ≈ 7 sd) the
cross-copy tail is empty and the probe isolates engine scaling on
banding, bucket-join and verify.

Usage: python scripts/scale_probe_embeddings.py [N] [query ...]
Defaults: N=64, queries = emb_random_projection ann_ivf
banded_neardup_pairs (the parametric core at the BANDED_SCALE
parameterization — NOT the registered ``embedding_neardup_banded``,
whose pinned 16×4-bit oracle fixture OOMs at probe scale; passing that
name runs the registered variant as-is).
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
    e = spark.read.parquet(f"{BASE}/embeddings.parquet")
    max_id = e.agg(F.max("vec_id")).first()[0] + 1
    scaled = (
        e.withColumn("c", F.explode(F.sequence(F.lit(0), F.lit(n_copies - 1))))
        .select(
            (F.col("vec_id") + F.col("c") * max_id).alias("vec_id"),
            # per-(copy, dim) deterministic ±1 mask; copy 0 keeps the
            # original vectors so 1×-vs-N× results stay comparable
            F.expr(
                "transform(embedding, (x, i) -> CASE WHEN c = 0 THEN x "
                "ELSE x * CAST(1 - 2 * pmod(xxhash64(c * 64 + i), 2) AS FLOAT) "
                "END)").alias("embedding"),
            "label",
        )
    )
    scaled.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out_dir, "embeddings.parquet"))
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents"):
        src = f"{BASE}/{t}.parquet"
        dst = os.path.join(out_dir, f"{t}.parquet")
        if os.path.exists(src) and not os.path.exists(dst):
            os.symlink(src, dst)


# The scale parameterization for the banded path: 2^bits ≈ N/64 keeps
# per-bucket occupancy constant (the registered 16×4 default is sized for
# the 2 k fixture and OOMs at 128 k — that cliff is the probe's finding).
BANDED_SCALE = {"tables": 8, "bits": 12}


def main() -> None:
    n_copies = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    names = sys.argv[2:] or ["emb_random_projection", "ann_ivf",
                             "banded_neardup_pairs"]
    spark = get_spark(app_name="scale-probe-embeddings")
    reg = load_all()
    from full_stack_big_data_spark.operators.similarity import (
        banded_neardup_pairs, knn_graph_edges)
    out_dir = tempfile.mkdtemp(prefix=f"fsbd_escale{n_copies}x_")
    try:
        t0 = time.time()
        build_scaled(spark, n_copies, out_dir)
        print(f"built {n_copies}x embeddings in {time.time() - t0:.1f}s "
              f"-> {out_dir}", flush=True)
        for name in names:
            for label, sf in (("1x", BASE), (f"{n_copies}x", out_dir)):
                t0 = time.time()
                # parametric cores probed at the BANDED_SCALE rule (bits
                # grow with the corpus so bucket occupancy stays constant)
                cores = {"banded_neardup_pairs": banded_neardup_pairs,
                         "knn_graph_edges": knn_graph_edges}
                if name in cores:
                    src = spark.read.parquet(f"{sf}/embeddings.parquet")
                    df = cores[name](src, **BANDED_SCALE)
                    name_l = (f"{name}[{BANDED_SCALE['tables']}x"
                              f"{BANDED_SCALE['bits']}bit]")
                else:
                    df = reg[name].builder(spark, sf)
                    name_l = name
                rows = df.count()
                print(f"{name_l} {label}: {time.time() - t0:.1f}s, {rows} rows",
                      flush=True)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
