"""Paired adjudication for dedup_editdistance's prefix stage: per-doc
rarest-first ranking via broadcast-freq join + doc_id window (r13
shape: shuffles the full positional-gram table by doc_id) vs a
broadcast freq MAP + map-side array_sort/slice over each title's
bounded gram array (zero prefix-side exchange). The candidate join,
distinct and banded verify are identical; the prefix SET is identical
because array_sort on struct(freq, g, pos) is the same total order as
the window's orderBy(freq, g, pos) and (g, pos) is unique per doc.

python scripts/adjudicate_editdistance_prefix.py [sf_dir] [reps]
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
    grams = t.select(
        "doc_id", "title",
        F.explode(F.expr(
            f"transform(sequence(1, length(title) - {EDIT_Q - 1}), "
            f"i -> struct(i AS pos, substring(title, i, {EDIT_Q}) AS g))"))
        .alias("pg")
    ).select("doc_id", F.col("pg.pos").alias("pos"), F.col("pg.g").alias("g"))
    freq = grams.groupBy("g").agg(F.count("*").alias("freq"))
    if variant == "old":
        ranked = (grams.join(F.broadcast(freq), "g")
                  .withColumn("rn", F.row_number().over(
                      Window.partitionBy("doc_id")
                      .orderBy("freq", "g", "pos"))))
        prefix = (ranked.where(F.col("rn") <= EDIT_PREFIX)
                  .select("doc_id", "pos", "g"))
    else:
        fmap = freq.agg(F.map_from_entries(
            F.collect_list(F.struct("g", "freq"))).alias("fm"))
        prefix = (
            t.crossJoin(F.broadcast(fmap))
            .select("doc_id", F.explode(F.slice(F.array_sort(F.expr(
                f"transform(sequence(1, length(title) - {EDIT_Q - 1}), "
                f"i -> struct(fm[substring(title, i, {EDIT_Q})] AS freq, "
                f"substring(title, i, {EDIT_Q}) AS g, i AS pos))")),
                1, EDIT_PREFIX)).alias("pg"))
            .select("doc_id", F.col("pg.pos").alias("pos"),
                    F.col("pg.g").alias("g")))
    cand = (
        prefix.alias("p").join(
            grams.select("doc_id", "pos", "g").alias("x"),
            (F.col("p.g") == F.col("x.g"))
            & (F.col("p.doc_id") != F.col("x.doc_id"))
            & (F.abs(F.col("p.pos") - F.col("x.pos")) <= EDIT_MAXD))
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
    spark.sparkContext.setJobDescription(f"editdistance prefix A/B: {variant}")
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
