"""Paired adjudication: the InferFiltersFromGenerate penalty on the
KMV shingle-explode family (the r14 time-sweep lead the round closed
on). Three variants of ``_shingled``'s consumers, order-alternating
reps in ONE process (r12 discipline — host wall moves ~3x between
processes, only paired timings signal):

  base    registered plans as-is: explode("s") where s is a computed
          attribute -> the rule infers size(s)>0 && isnotnull(s), and
          predicate pushdown re-inlines the tokenize+ngram chain into
          a per-row Filter below the Project (3 evals/row total).
  excl    same plans with spark.sql.optimizer.excludedRules set to
          InferFiltersFromGenerate around the action (global dodge).
  inline  _shingled moves the shingle expression INTO the generator:
          explode(array_distinct(token_ngrams(toks, n))). Spark 4's
          rule only infers filters when the generator input is a bare
          Attribute/Cast(Attribute), so a non-attribute input is
          skipped entirely — local dodge, no conf, no global risk.

python scripts/adjudicate_generate_filter.py [sf_dir] [reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from full_stack_big_data_spark.engine.catalog import Catalog
from full_stack_big_data_spark.engine.session import tune_session
from full_stack_big_data_spark.functions.text import token_ngrams, tokens
from full_stack_big_data_spark.operators import dedup, sketches
from full_stack_big_data_spark.operators.dedup import SHINGLE_N

RULE = "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

spark = SparkSession.builder.master("local[32]").getOrCreate()
tune_session(spark)
spark.sparkContext.setLogLevel("ERROR")


def _shingled_inline(spark, sf_dir):
    d = Catalog(spark, sf_dir).documents
    toks = (d.select("doc_id", tokens("text").alias("toks"))
            .where(F.size("toks") >= SHINGLE_N))
    return toks.select(
        "doc_id",
        F.explode(F.array_distinct(token_ngrams(F.col("toks"),
                                                SHINGLE_N))).alias("g"))


QUERIES = {
    "q_sketch_kmv": sketches.q_sketch_kmv,
    "q_sketch_kmv_merge": sketches.q_sketch_kmv_merge,
}


def run(fn, excluded=False, inline=False):
    old = getattr(sketches, "_shingled")
    if inline:
        sketches._shingled = _shingled_inline
    try:
        if excluded:
            spark.conf.set("spark.sql.optimizer.excludedRules", RULE)
        df = fn(spark, sf)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0
    finally:
        spark.conf.unset("spark.sql.optimizer.excludedRules")
        sketches._shingled = old


# warm
sketches.q_sketch_kmv(spark, sf).write.format("noop").mode("overwrite").save()

results = {q: {"base": [], "excl": [], "inline": []} for q in QUERIES}
for r in range(reps):
    for qname, fn in QUERIES.items():
        for variant in ("base", "excl", "inline"):
            t = run(fn, excluded=(variant == "excl"),
                    inline=(variant == "inline"))
            results[qname][variant].append(t)
            print(f"rep{r} {qname:22s} {variant:7s} {t:7.3f}", flush=True)

print("\n== minima ==")
for qname, row in results.items():
    mins = {v: min(ts) for v, ts in row.items()}
    print(f"{qname:22s} base {mins['base']:6.3f}  excl {mins['excl']:6.3f} "
          f"({mins['base']/mins['excl']:4.2f}x)  inline {mins['inline']:6.3f} "
          f"({mins['base']/mins['inline']:4.2f}x)")

# result equality: inline variant must produce identical rows
print("\n== equality (inline vs base) ==")
for qname, fn in QUERIES.items():
    base_rows = sorted(map(tuple, fn(spark, sf).collect()))
    old = sketches._shingled
    sketches._shingled = _shingled_inline
    try:
        inl_rows = sorted(map(tuple, fn(spark, sf).collect()))
    finally:
        sketches._shingled = old
    print(f"{qname}: {'IDENTICAL' if base_rows == inl_rows else 'MISMATCH'}"
          f" ({len(base_rows)} rows)")

spark.stop()
