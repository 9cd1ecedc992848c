"""Zipfian hot-key WALL-TIME bench (r5 verdict item 7).

Chaos parity proves correctness under skew; this measures TIME. The
fixture is the classic production pathology: a fact table where half of
all rows carry ONE hot key (the logged-out user / null-bucket / bot
account), shuffle-joined to a distinct-key dimension. Four plans over
identical on-disk inputs:

- plain join, AQE OFF — the naive baseline that eats the hot partition
  on one task (the pathology this bench exists to show);
- plain join, AQE at DEFAULT constants — an honesty row: the default
  ``skewedPartitionThresholdInBytes`` is 256 MiB, sized for production
  shuffles; a local fixture's hot partition (~100-200 MiB) sits UNDER
  it, so OptimizeSkewedJoin correctly declines to fire and this row
  tracks plain-noAQE. The constants are scale-dependent; the mechanism
  is what the pin tests;
- plain join, AQE SCALED — threshold/advisory scaled down so the
  (hot-partition bytes / threshold) ratio matches a production shuffle
  (GiB-hot-partition vs 256 MiB default ≈ our ~150 MiB vs 16 MiB):
  OptimizeSkewedJoin splits the hot partition at runtime. This is the
  row that represents the engine's behavior at 100 TB;
- salted_join — the manual mitigation (big side salted, small side
  replicated), the portable fallback when a runtime can't re-plan.

Pin: the scaled-AQE plan must land within ~1.5x of the salted plan
(the r5 verdict's bar) — i.e. once the skew split FIRES (as it does at
production partition sizes), no hand salting is needed for
single-hot-key joins. Results → BENCHNOTES.md.

A second section covers the skew shapes AQE does NOT re-plan — window
rank and aggregation — on the same fixture: the plain rank-limit
window (map-side partial WindowGroupLimit on Spark >= 3.5) vs the
manual two-phase salt, and plain SUM vs salted_agg. The measured
outcome (native beats manual on both; BENCHNOTES round 6) is what
drove grouped_topk's native-path dispatch.

Usage: python scripts/skew_bench.py [n_rows] [hot_fraction]
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
from full_stack_big_data_spark.functions.skew import salted_join

N_USERS = 50_000
HOT_KEY = 7


def build_fixture(spark, out_dir: str, n_rows: int, hot_frac: float) -> None:
    """Deterministic zipf-ish fact: hot_frac of rows on HOT_KEY, the
    rest spread uniformly (xxhash of row id) over N_USERS keys. ``rid``
    (the unique row id) rides along as the deterministic total-order
    tiebreak and salt source the window-skew section needs."""
    cut = int(n_rows * hot_frac)
    fact = (spark.range(n_rows).repartition(32)
            .select(F.when(F.col("id") < cut, F.lit(HOT_KEY))
                    .otherwise(F.pmod(F.xxhash64("id"), F.lit(N_USERS)))
                    .cast("long").alias("user_id"),
                    (F.col("id") % 97).cast("long").alias("v"),
                    F.col("id").alias("rid")))
    fact.write.mode("overwrite").parquet(os.path.join(out_dir, "fact.parquet"))
    dim = (spark.range(N_USERS)
           .select(F.col("id").alias("user_id"),
                   F.pmod(F.xxhash64("id"), F.lit(1000)).alias("w")))
    dim.write.mode("overwrite").parquet(os.path.join(out_dir, "dim.parquet"))


def run_once(spark, out_dir: str, mode: str) -> float:
    fact = spark.read.parquet(os.path.join(out_dir, "fact.parquet"))
    dim = spark.read.parquet(os.path.join(out_dir, "dim.parquet"))
    t0 = time.perf_counter()
    if mode == "salted":
        j = salted_join(fact, dim, ["user_id"], salt=32)
    else:
        j = fact.join(dim, ["user_id"])
    # global agg after the join: the shuffle-join IS the measured stage
    (j.select((F.col("v") * F.col("w")).alias("x")).agg(F.sum("x"))
     .write.format("noop").mode("overwrite").save())
    return time.perf_counter() - t0


def run_topk(spark, out_dir: str, mode: str) -> tuple[float, int]:
    """Per-user top-5 by (v DESC, rid) — window skew, the shape AQE
    does not re-plan. ``window`` is the plain rank-limit window, which
    Spark >= 3.5 compiles to a map-side partial WindowGroupLimit (the
    hot key ships <= 5 rows per map partition into the shuffle) — this
    measured finding is why ``grouped_topk`` now emits the plain window
    natively. ``twophase`` is the manual salt-bucket fallback
    (``grouped_topk_twophase``), exact by the pigeonhole in its
    docstring but one exchange dearer. Returns (seconds, checksum) — the
    checksum (sum of surviving rid+rank) must match across modes since
    the order (v DESC, rid) is total."""
    from pyspark.sql import Window

    from full_stack_big_data_spark.functions.skew import grouped_topk_twophase

    fact = spark.read.parquet(os.path.join(out_dir, "fact.parquet"))
    order = [F.desc("v"), F.asc("rid")]
    t0 = time.perf_counter()
    if mode == "twophase":
        topk = grouped_topk_twophase(fact, ["user_id"], order, 5, F.col("rid"))
    else:
        w = Window.partitionBy("user_id").orderBy(*order)
        topk = (fact.withColumn("rank", F.row_number().over(w))
                .where(F.col("rank") <= 5))
    chk = topk.agg(F.sum(F.col("rid") + F.col("rank")).alias("c")).collect()[0]["c"]
    return time.perf_counter() - t0, int(chk)


def run_sum(spark, out_dir: str, mode: str) -> float:
    """The honesty row: a plain algebraic SUM per user is NOT hurt by a
    hot key — Spark's map-side partial aggregation compresses each
    map task's hot-key rows to one partial before the shuffle, so the
    reducer sees ≤ n_map_partitions rows per key. salted_agg should
    measure ≈ the plain path here (its value is for merges whose
    partial state doesn't compress: collect-style, exact distinct)."""
    from full_stack_big_data_spark.functions.skew import salted_agg

    fact = spark.read.parquet(os.path.join(out_dir, "fact.parquet"))
    t0 = time.perf_counter()
    if mode == "salted":
        agg = salted_agg(fact, ["user_id"], {"s": ("sum", "v")})
    else:
        agg = fact.groupBy("user_id").agg(F.sum("v").alias("s"))
    agg.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def min_with_chk(fn, spark, out_dir, mode, reps):
    best, chk = float("inf"), None
    for _ in range(reps):
        t, c = fn(spark, out_dir, mode)
        assert chk is None or chk == c, "nondeterministic result"
        best, chk = min(best, t), c
    return best, chk


def main() -> int:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    hot_frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    spark = get_spark(app_name="fsbd-skew-bench")
    spark.sparkContext.setLogLevel("ERROR")
    # Force the pathology to be possible: the dim is small enough to
    # broadcast, which would dodge the shuffle entirely (and IS the
    # engine's first-choice fix); disable it so the bench measures the
    # shuffle-join skew paths a genuinely large dim would face.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    out_dir = tempfile.mkdtemp(prefix="fsbd_skew_bench_")
    try:
        build_fixture(spark, out_dir, n_rows, hot_frac)
        # scaled constants: keep hot-partition-bytes / threshold at the
        # production ratio so the split fires as it would on a GiB-hot
        # shuffle (see module docstring)
        scaled = {
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
                "16m",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        }
        times = {}
        for mode, aqe, confs in (
                ("plain-noAQE", "false", {}),
                ("plain-AQE-default", "true", {}),
                ("plain-AQE-scaled", "true", scaled),
                ("salted", "true", {})):
            spark.conf.set("spark.sql.adaptive.enabled", aqe)
            for k, v in confs.items():
                spark.conf.set(k, v)
            times[mode] = min(run_once(spark, out_dir, mode)
                              for _ in range(reps))
            for k in confs:
                spark.conf.unset(k)
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        ratio = times["plain-AQE-scaled"] / times["salted"]
        print(f"| rows | hot frac | plain no-AQE s | AQE default s "
              f"| AQE scaled s | salted s | AQEscaled/salted |")
        print(f"|---|---|---|---|---|---|---|")
        print(f"| {n_rows} | {hot_frac} | {times['plain-noAQE']:.2f} "
              f"| {times['plain-AQE-default']:.2f} "
              f"| {times['plain-AQE-scaled']:.2f} | {times['salted']:.2f} "
              f"| {ratio:.2f}x |")
        ok = ratio <= 1.5
        print(f"\nPIN {'OK' if ok else 'FAIL'}: scaled-AQE skew-split within "
              f"1.5x of manual salting ({ratio:.2f}x)")

        # window/agg skew: the shapes AQE does NOT re-plan
        tw, cw = min_with_chk(run_topk, spark, out_dir, "window", reps)
        tt, ct = min_with_chk(run_topk, spark, out_dir, "twophase", reps)
        assert cw == ct, f"top-k checksum mismatch: {cw} != {ct}"
        sp = min(run_sum(spark, out_dir, "plain") for _ in range(reps))
        ss = min(run_sum(spark, out_dir, "salted") for _ in range(reps))
        print(f"\n| shape | native s | manual-salted s | native/manual | note |")
        print(f"|---|---|---|---|---|")
        print(f"| per-user top-5 window | {tw:.2f} | {tt:.2f} "
              f"| {tw / tt:.2f}x | native = WindowGroupLimit partial; "
              f"manual = grouped_topk_twophase; checksum-equal |")
        print(f"| per-user SUM | {sp:.2f} | {ss:.2f} | {sp / ss:.2f}x "
              f"| map-side combine already defuses algebraic-agg skew |")
        ok2 = tw <= tt
        print(f"\nPIN {'OK' if ok2 else 'FAIL'}: native rank-limit window at "
              f"or under the manual two-phase on the hot-key fixture (the "
              f"grouped_topk dispatch decision)")
        return 0 if (ok and ok2) else 1
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
