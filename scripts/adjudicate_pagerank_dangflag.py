"""Paired adjudication for q_pagerank's per-iteration dangling-mass
funnel ("not yet optimized" item 6): today each iteration computes
m_k = (nodes ANTI-JOIN deg) JOIN r_k -> SUM, i.e. two joins feeding the
1-row scalar funnel. The dangling-ness of a node is a LOOP INVARIANT,
so the new variant computes it once as a boolean column in the
persisted `nodes` frame, carries it through every r_k, and each
iteration's mass becomes filter(dang) + SUM over the cached r_k — zero
joins, one fewer stage per iteration. The rank arithmetic is untouched
(exact BIGINT), so results are bit-identical.

python scripts/adjudicate_pagerank_dangflag.py [sf_dir] [reps]
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
    nodes_plain = (edges_deg.select(F.col("src").alias("u"))
                   .union(edges_deg.select(F.col("dst").alias("u")))
                   .distinct())
    if variant == "new":
        nodes = (nodes_plain
                 .join(deg.select(F.col("src").alias("u"),
                                  F.lit(True).alias("hasdeg")), "u", "left")
                 .withColumn("dang", F.col("hasdeg").isNull())
                 .drop("hasdeg")
                 .repartition(part, "u").persist())
    else:
        nodes = nodes_plain.repartition(part, "u").persist()
    nn = nodes.count()
    base = (PR_D_DEN - PR_D_NUM) * PR_SCALE // (PR_D_DEN * nn)
    rcols = ["u", "dang"] if variant == "new" else ["u"]
    r = nodes.withColumn("r", F.lit(PR_SCALE // nn).cast("bigint"))
    if variant == "old":
        dangling = nodes.join(deg, nodes.u == deg.src, "left_anti")
    frames = [edges_deg, nodes]
    for _ in range(PR_ITERS):
        contrib = (
            edges_deg.join(r, edges_deg.src == r.u)
            .select(F.col("dst").alias("u"),
                    F.expr(f"({PR_D_NUM} * r) div ({PR_D_DEN} * deg)").alias("c"))
            .groupBy("u").agg(F.sum("c").cast("bigint").alias("inc"))
        )
        if variant == "new":
            m = (r.where("dang")
                 .agg(F.coalesce(F.sum("r"), F.lit(0)).cast("bigint").alias("m")))
        else:
            m = (dangling.join(r, "u")
                 .agg(F.coalesce(F.sum("r"), F.lit(0)).cast("bigint").alias("m")))
        r = (
            nodes.join(contrib, "u", "left").crossJoin(F.broadcast(m))
            .select(*rcols,
                    (F.lit(base) + F.coalesce(F.col("inc"), F.lit(0))
                     + F.expr(f"({PR_D_NUM} * m) div ({PR_D_DEN} * {nn})"))
                    .cast("bigint").alias("r"))
        ).persist()
        frames.append(r)
    out = r.select(F.col("u").alias("user_id"), F.col("r").alias("rank_fp"))
    return out, frames


def result_hash(variant: str):
    out, frames = build(variant)
    h = (out.orderBy("user_id")
         .select(F.md5(F.concat_ws(",", "user_id", "rank_fp")).alias("h"))
         .agg(F.md5(F.concat_ws("|", F.collect_list("h"))).alias("H"))
         ).collect()[0]["H"]
    for fr in frames:
        fr.unpersist()
    return h


def run(variant: str) -> float:
    spark.sparkContext.setJobDescription(f"pagerank dangflag A/B: {variant}")
    t0 = time.monotonic()
    out, frames = build(variant)
    out.write.format("noop").mode("overwrite").save()
    dt = time.monotonic() - t0
    for fr in frames:
        fr.unpersist()
    return dt


h_old, h_new = result_hash("old"), result_hash("new")
print("result hash old:", h_old, flush=True)
print("result hash new:", h_new, flush=True)
assert h_old == h_new, "VARIANTS DIVERGE — do not ship"

for i in range(reps):
    order = ["old", "new"] if i % 2 == 0 else ["new", "old"]
    for v in order:
        print(f"rep {i} {v}: {run(v):.3f} s", flush=True)
spark.stop()
