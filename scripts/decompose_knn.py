"""Stage decomposition of emb_knn_graph / ann_incremental at sf0.1 —
one warm process, noop-sink timings per sub-stage (guide §1.4)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from full_stack_big_data_spark.engine.catalog import Catalog
from full_stack_big_data_spark.engine.session import tune_session
from full_stack_big_data_spark.operators.registry import load_all
from full_stack_big_data_spark.operators.similarity import (
    ANN_INCR_MOD, ANN_INCR_REM, srp_buckets)
from full_stack_big_data_spark.functions.vectors import cosine_sim

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
spark = SparkSession.builder.master(
    f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]").getOrCreate()
tune_session(spark)
spark.sparkContext.setLogLevel("ERROR")
reg = load_all()


def t(label, df, reps=3):
    best = float("inf")
    for _ in range(reps):
        spark.sparkContext.setJobDescription(label)
        t0 = time.monotonic()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.monotonic() - t0)
    print(f"{label:40s} {best:7.3f} s", flush=True)
    return best


# warm the session / scan caches
t("warmup: full emb_knn_graph", reg["emb_knn_graph"].builder(spark, sf), reps=1)

src = Catalog(spark, sf).embeddings.select("vec_id", "embedding")
buckets = (srp_buckets(src).select(
    "vec_id", F.posexplode("buckets").alias("table_id", "bucket")))
t("stage a: buckets+posexplode", buckets)

cand = (buckets.select(F.col("vec_id").alias("src_id"), "table_id", "bucket")
        .join(buckets, ["table_id", "bucket"])
        .where(F.col("src_id") != F.col("vec_id"))
        .select("src_id", F.col("vec_id").alias("neighbor_id")))
t("stage b: collision join (no distinct)", cand)
candd = cand.distinct()
t("stage c: + distinct", candd)
print("candidate pairs:", candd.count(), flush=True)

ea = src.select(F.col("vec_id").alias("src_id"), F.col("embedding").alias("emb_a"))
eb = src.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("emb_b"))
joined = candd.join(ea, "src_id").join(eb, "neighbor_id")
t("stage d: + embedding joins (no cos)", joined)
scored = joined.select("src_id", "neighbor_id",
                       cosine_sim(F.col("emb_a"), F.col("emb_b")).alias("cos"))
t("stage e: + cosine_sim", scored)

t("full emb_knn_graph", reg["emb_knn_graph"].builder(spark, sf))
t("full emb_knn_graph_scaled", reg["emb_knn_graph_scaled"].builder(spark, sf))
t("full ann_incremental", reg["ann_incremental"].builder(spark, sf))
t("full ann_srp_lsh", reg["ann_srp_lsh"].builder(spark, sf))
