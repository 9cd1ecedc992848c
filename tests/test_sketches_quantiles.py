"""Accuracy contracts for the approximate sketches.

The registry queries (`q_approx_quantiles`, `q_approx_distinct`) now emit
self-validating booleans hashed by the driver oracle; these tests keep
the TIGHTER bounds pinned (±1% rank error for the KLL quantiles, 5σ of
the 1% rsd for HLL++) by recomputing the raw sketches directly, and pin
the contract queries' own surfaces (booleans true, exact columns exact).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from full_stack_big_data_spark.engine.catalog import Catalog
from full_stack_big_data_spark.operators.registry import load_all
from conftest import SF_SMOKE


def test_approx_quantiles_within_rank_error(spark):
    """±1% RANK error of the true order statistic — the guarantee
    approx_percentile's accuracy=100 parameter buys."""
    o = Catalog(spark, SF_SMOKE).orders
    got = o.agg(
        F.expr("approx_percentile(o_totalprice, array(0.5, 0.9, 0.99), 100)")
        .alias("ap")).first().ap
    vals = sorted(r[0] for r in o.select("o_totalprice").collect())
    n = len(vals)
    for pct, est in zip((0.5, 0.9, 0.99), got):
        lo = vals[max(0, int((pct - 0.01) * n) - 1)]
        hi = vals[min(n - 1, int((pct + 0.01) * n) + 1)]
        assert lo <= est <= hi, (pct, est, lo, hi)


def test_approx_quantiles_contract_row(spark):
    """The driver-hashed contract: one row, all brackets satisfied, count
    exact."""
    row = load_all()["q_approx_quantiles"].builder(spark, SF_SMOKE).first()
    n = Catalog(spark, SF_SMOKE).orders.count()
    assert row.n_orders == n
    assert row.p50_ok and row.p90_ok and row.p99_ok


def test_approx_distinct_within_hll_error(spark):
    """Each per-type HLL++ estimate within 5× the requested 1% relative
    standard deviation of the exact distinct count (~5σ; deterministic
    for fixed input since Spark's HLL hashing is seedless)."""
    e = Catalog(spark, SF_SMOKE).events
    rows = (e.groupBy("event_type")
            .agg(F.approx_count_distinct("user_id", 0.01).alias("approx"),
                 F.countDistinct("user_id").alias("exact"))
            .collect())
    assert rows
    for r in rows:
        assert abs(r.approx - r.exact) <= max(2, 0.05 * r.exact), r


def test_approx_distinct_contract_rows(spark):
    """The driver-hashed contract: per-type exact counts match a direct
    recompute and every bound boolean is true."""
    got = {r.event_type: r for r in
           load_all()["q_approx_distinct"].builder(spark, SF_SMOKE).collect()}
    exact = {r.event_type: r.n for r in
             Catalog(spark, SF_SMOKE).events.groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("n")).collect()}
    assert set(got) == set(exact)
    for t, n in exact.items():
        assert got[t].exact_users == n
        assert got[t].estimate_within_bound, (t, got[t])


def test_bloom_has_no_false_negatives(spark):
    """The definitional bloom invariant the registry row cites: every
    inserted key probes positive (all k of its bits were set by its own
    insert). Replays the registered build + probe machinery against the
    member cohort itself."""
    from pyspark.sql import functions as F
    from full_stack_big_data_spark.engine.catalog import Catalog
    from full_stack_big_data_spark.functions.hashing import hex64
    from full_stack_big_data_spark.operators.sketches import BLOOM_K, BLOOM_M

    cat = Catalog(spark, SF_SMOKE)
    keys = cat.orders.select(F.col("o_custkey").alias("k")).distinct()

    def positions(kcol):
        return F.array(*[
            (hex64(F.concat(F.lit(f"bloom{i}|"), kcol.cast("string")))
             % BLOOM_M).cast("bigint")
            for i in range(BLOOM_K)])

    bits = keys.select(F.explode(positions(F.col("k"))).alias("b")).distinct()
    hits = (keys.select("k", F.explode(positions(F.col("k"))).alias("b"))
            .join(F.broadcast(bits), "b")
            .groupBy("k").agg(F.count("*").alias("hits")))
    n_keys = keys.count()
    n_positive = hits.where(F.col("hits") == BLOOM_K).count()
    assert n_positive == n_keys, (n_positive, n_keys)
