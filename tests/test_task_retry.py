"""Task-retry determinism (r6 verdict item 6).

Chaos parity varies partition COUNT; nothing re-executed a task
MID-STAGE until now. On a real cluster tasks fail and replay routinely
(`spark.task.maxFailures` defaults to 4), so every operator whose salt
derives from `monotonically_increasing_id` (functions/skew.py —
partitioning-dependent BY DESIGN, safe only for commutative merges) and
every content-hash sampling membership must give hash-identical results
when a first attempt dies and the scheduler replays it.

The default `local[N]` master runs with maxFailures=1 (any task failure
fails the job), and a live SparkContext's master can't change — so this
test runs its scenario in a SUBPROCESS on `local[4, 2]`, injecting an
attempt-0 failure into one input partition via a mapInPandas shim and
asserting the salted-agg and weighted-sample results match the
no-injection run bit for bit.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json
import sys

from pyspark.sql import SparkSession, functions as F

sys.path.insert(0, "@@HERE@@")
from full_stack_big_data_spark.engine.session import tune_session
from full_stack_big_data_spark.functions.hashing import hex64
from full_stack_big_data_spark.functions.skew import grouped_topk, salted_agg

spark = (SparkSession.builder.master("local[4, 2]")   # maxFailures = 2
         .appName("task-retry-determinism")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
tune_session(spark)
spark.sparkContext.setLogLevel("ERROR")

docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .repartition(4, "doc_id"))


def flaky(df):
    '''Kill attempt 0 of one task in the stage that computes the salts,
    so the replayed attempt re-derives monotonically_increasing_id from
    scratch. mapInPandas keeps the schema; yields rows untouched.'''
    from pyspark import TaskContext

    def shim(batches):
        tc = TaskContext.get()
        if tc.partitionId() == 0 and tc.attemptNumber() == 0:
            raise RuntimeError("injected attempt-0 failure")
        yield from batches

    return df.mapInPandas(shim, df.schema)


def canon(df):
    rows = df.collect()
    cols = sorted(df.columns)
    return sorted("|".join(repr(r[c]) for c in cols) for r in rows)


def weighted_sample(src, k):
    '''sample_weighted's A-Res core (operators/sampling.py) over an
    arbitrary source: content-hash uniform, exponential race key,
    grouped_topk — the exact code path the registry entry runs.'''
    u = (hex64(F.concat(F.lit("wsample|"), F.col("doc_id").cast("string")))
         % 1_000_000 + 1) / F.lit(1_000_001.0)
    keyed = src.select(
        "doc_id", "n_chars",
        F.round(F.log(u) / F.col("n_chars"), 10).alias("race_key"),
    ).withColumn("_g", F.lit(0))
    return grouped_topk(keyed, ["_g"],
                        [F.desc("race_key"), F.asc("doc_id")],
                        k, F.col("doc_id"))


results = {}
for label, src in (("clean", docs), ("flaky", flaky(docs))):
    agg = salted_agg(src.select("lang", "doc_id"), ["lang"],
                     {"n": ("count", "*"), "max_id": ("max", "doc_id")},
                     salt=8)
    samp = weighted_sample(src, k=40)
    results[label] = {"agg": canon(agg), "samp": canon(samp)}

ok = results["clean"] == results["flaky"]
n_agg = len(results["clean"]["agg"])
n_samp = len(results["clean"]["samp"])
print(json.dumps({"ok": ok, "agg_rows": n_agg, "samp_rows": n_samp}))
spark.stop()
"""


def test_retry_replays_are_result_identical():
    p = subprocess.run(
        [sys.executable, "-c", CHILD.replace("@@HERE@@", HERE)],
        capture_output=True, text=True, timeout=600, cwd=HERE)
    line = next((ln for ln in reversed(p.stdout.splitlines())
                 if ln.startswith("{")), None)
    assert line, f"child produced no verdict\n{p.stderr[-3000:]}"
    verdict = json.loads(line)
    # the injection must actually FIRE (executor logs the raise) — a
    # test that never killed a task proves nothing
    assert "injected attempt-0 failure" in p.stderr, \
        "no task failure was injected — the flaky stage never ran attempt 0"
    assert verdict["agg_rows"] > 0 and verdict["samp_rows"] == 40
    assert verdict["ok"], f"retry changed results: {verdict}"
