"""Paired adjudication for dedup_editdistance's candidate tier: push the
|Δlen| <= d length predicate (today applied only at the verify join)
INTO the prefix-vs-grams candidate join, by carrying each title's
length as an int column in both gram tables. The predicate is already
necessary for ed(a,b) <= d, so the surviving pair set is identical —
the question is whether killing candidates before the distinct() +
verify joins beats the cost of one extra int in the shuffled gram rows.

python scripts/adjudicate_editdistance_lenfilter.py [sf_dir] [reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, Window, functions as F

from full_stack_big_data_spark.engine.catalog import Catalog
from full_stack_big_data_spark.engine.session import tune_session
from full_stack_big_data_spark.operators.dedup import (
    EDIT_MAXD, EDIT_MINLEN, EDIT_PREFIX, EDIT_Q, EDIT_TITLE)

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

spark = SparkSession.builder.master("local[32]").getOrCreate()
tune_session(spark)


def build(variant: str):
    d = Catalog(spark, sf).documents
    t = (d.select("doc_id", F.substring("text", 1, EDIT_TITLE).alias("title"))
         .where(F.length("title") >= EDIT_MINLEN))
    gcols = ["doc_id", "pos", "g"] + (["len"] if variant == "new" else [])
    grams = t.select(
        "doc_id", "title", F.length("title").alias("len"),
        F.explode(F.expr(
            f"transform(sequence(1, length(title) - {EDIT_Q - 1}), "
            f"i -> struct(i AS pos, substring(title, i, {EDIT_Q}) AS g))"))
        .alias("pg")
    ).select("doc_id", F.col("pg.pos").alias("pos"), F.col("pg.g").alias("g"),
             "len").select(*gcols)
    freq = grams.groupBy("g").agg(F.count("*").alias("freq"))
    ranked = (grams.join(F.broadcast(freq), "g")
              .withColumn("rn", F.row_number().over(
                  Window.partitionBy("doc_id")
                  .orderBy("freq", "g", "pos"))))
    prefix = ranked.where(F.col("rn") <= EDIT_PREFIX).select(*gcols)
    join_cond = (
        (F.col("p.g") == F.col("x.g"))
        & (F.col("p.doc_id") != F.col("x.doc_id"))
        & (F.abs(F.col("p.pos") - F.col("x.pos")) <= EDIT_MAXD))
    if variant == "new":
        join_cond = join_cond & (
            F.abs(F.col("p.len") - F.col("x.len")) <= EDIT_MAXD)
    cand = (
        prefix.alias("p").join(grams.select(*gcols).alias("x"), join_cond)
        .select(F.least("p.doc_id", "x.doc_id").alias("doc_a"),
                F.greatest("p.doc_id", "x.doc_id").alias("doc_b"))
        .distinct()
    )
    ta = t.select(F.col("doc_id").alias("doc_a"), F.col("title").alias("title_a"))
    tb = t.select(F.col("doc_id").alias("doc_b"), F.col("title").alias("title_b"))
    return (
        cand.join(ta, "doc_a").join(tb, "doc_b")
        .where(F.abs(F.length("title_a") - F.length("title_b")) <= EDIT_MAXD)
        .withColumn("distance",
                    F.levenshtein("title_a", "title_b", EDIT_MAXD).cast("int"))
        .where(F.col("distance") >= 0)
        .select("doc_a", "doc_b", "distance")
    )


def result_hash(variant: str):
    out = build(variant)
    return (out.orderBy("doc_a", "doc_b")
            .select(F.md5(F.concat_ws(",", "doc_a", "doc_b", "distance"))
                    .alias("h"))
            .agg(F.md5(F.concat_ws("|", F.collect_list("h"))).alias("H"))
            ).collect()[0]["H"]


def run(variant: str) -> float:
    spark.sparkContext.setJobDescription(f"editdistance lenfilter A/B: {variant}")
    t0 = time.monotonic()
    build(variant).write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


h_old, h_new = result_hash("old"), result_hash("new")
print("result hash old:", h_old, flush=True)
print("result hash new:", h_new, flush=True)
assert h_old == h_new, "VARIANTS DIVERGE — do not ship"

for i in range(reps):
    order = ["old", "new"] if i % 2 == 0 else ["new", "old"]
    for v in order:
        print(f"rep {i} {v}: {run(v):.3f} s", flush=True)
spark.stop()
