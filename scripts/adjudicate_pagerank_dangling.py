"""Paired adjudication: q_pagerank's per-iteration dangling-mass
aggregate derives `deg` from the raw events window each time (the
anti-join's subtree is NOT the cached edges_deg) vs deriving the
dangling node set once from the CACHED edges_deg and persisting it
pre-partitioned on u. Order-alternating reps in ONE process — only
paired timings signal on this host.

python scripts/adjudicate_pagerank_dangling.py [sf_dir] [reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, Window, functions as F

from full_stack_big_data_spark.engine.catalog import Catalog
from full_stack_big_data_spark.engine.session import tune_session
from full_stack_big_data_spark.operators.graph import (
    PR_D_DEN, PR_D_NUM, PR_ITERS, PR_SCALE)

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

spark = SparkSession.builder.master("local[32]").getOrCreate()
tune_session(spark)


def build(variant: str):
    ev = Catalog(spark, sf).events
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    edges = (
        ev.select(F.col("user_id").alias("src"),
                  F.lead("user_id").over(w).alias("dst"))
        .where(F.col("dst").isNotNull() & (F.col("dst") != F.col("src")))
        .distinct()
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    part = spark.sparkContext.defaultParallelism
    edges_deg = edges.join(deg, "src").repartition(part, "src").persist()
    nodes = (edges_deg.select(F.col("src").alias("u"))
             .union(edges_deg.select(F.col("dst").alias("u")))
             .distinct().repartition(part, "u").persist())
    nn = nodes.count()
    base = (PR_D_DEN - PR_D_NUM) * PR_SCALE // (PR_D_DEN * nn)
    r = nodes.withColumn("r", F.lit(PR_SCALE // nn).cast("bigint"))
    caches = [edges_deg, nodes]
    if variant == "old":
        dangling = nodes.join(deg, nodes.u == deg.src, "left_anti")
    else:
        dangling = (nodes.join(edges_deg.select("src").distinct(),
                               nodes.u == F.col("src"), "left_anti")
                    .repartition(part, "u").persist())
        caches.append(dangling)
    for _ in range(PR_ITERS):
        contrib = (
            edges_deg.join(r, edges_deg.src == r.u)
            .select(F.col("dst").alias("u"),
                    F.expr(f"({PR_D_NUM} * r) div ({PR_D_DEN} * deg)").alias("c"))
            .groupBy("u").agg(F.sum("c").cast("bigint").alias("inc"))
        )
        m = (dangling.join(r, "u")
             .agg(F.coalesce(F.sum("r"), F.lit(0)).cast("bigint").alias("m")))
        r = (
            nodes.join(contrib, "u", "left").crossJoin(F.broadcast(m))
            .select("u",
                    (F.lit(base) + F.coalesce(F.col("inc"), F.lit(0))
                     + F.expr(f"({PR_D_NUM} * m) div ({PR_D_DEN} * {nn})"))
                    .cast("bigint").alias("r"))
        ).persist()
        caches.append(r)
    out = r.select(F.col("u").alias("user_id"), F.col("r").alias("rank_fp"))
    return out, caches


def run(variant: str) -> float:
    spark.sparkContext.setJobDescription(f"pagerank dangling A/B: {variant}")
    t0 = time.monotonic()
    out, caches = build(variant)
    out.write.format("noop").mode("overwrite").save()
    dt = time.monotonic() - t0
    for c in caches:
        c.unpersist()
    return dt


# result-equality check first (hash both variants once)
def result_hash(variant: str):
    out, caches = build(variant)
    h = (out.orderBy("user_id")
         .select(F.md5(F.concat_ws(",", "user_id", "rank_fp")).alias("h"))
         .agg(F.md5(F.concat_ws("|", F.collect_list("h"))).alias("H"))
         ).collect()[0]["H"]
    for c in caches:
        c.unpersist()
    return h

h_old, h_new = result_hash("old"), result_hash("new")
print("result hash old:", h_old, flush=True)
print("result hash new:", h_new, flush=True)
assert h_old == h_new, "VARIANTS DIVERGE — do not ship"

for i in range(reps):
    order = ["old", "new"] if i % 2 == 0 else ["new", "old"]
    for v in order:
        print(f"rep {i} {v}: {run(v):.3f} s", flush=True)
spark.stop()
