"""Accuracy contract for the approximate-quantile sketch: each reported
percentile must sit within ±1% RANK error of the true order statistic
(the guarantee approx_percentile's accuracy parameter buys), checked
against the exactly-sorted column."""

from __future__ import annotations

from full_stack_big_data_spark.engine.catalog import Catalog
from full_stack_big_data_spark.operators.registry import load_all
from conftest import SF_SMOKE


def test_approx_quantiles_within_rank_error(spark):
    reg = load_all()
    row = reg["q_approx_quantiles"].builder(spark, SF_SMOKE).first()
    vals = sorted(r[0] for r in
                  Catalog(spark, SF_SMOKE).orders.select("o_totalprice").collect())
    n = len(vals)
    assert row.n_orders == n
    for pct, got in ((0.5, row.p50), (0.9, row.p90), (0.99, row.p99)):
        # rank window: positions within ±1% of N around the target rank
        lo = vals[max(0, int((pct - 0.01) * n) - 1)]
        hi = vals[min(n - 1, int((pct + 0.01) * n) + 1)]
        assert lo <= got <= hi, (pct, got, lo, hi)


def test_approx_distinct_within_hll_error(spark):
    """q_approx_distinct is rows-only at the driver (HLL++ internals are
    engine-private), so pin its accuracy contract here: each per-type
    estimate within 5x the requested 1% relative standard deviation of
    the exact distinct count (a ~5-sigma bound; deterministic for fixed
    input since Spark's HLL hashing is seedless)."""
    from pyspark.sql import functions as F
    reg = load_all()
    approx = {r.event_type: r.approx_users
              for r in reg["q_approx_distinct"].builder(spark, SF_SMOKE).collect()}
    exact = {r.event_type: r.n
             for r in Catalog(spark, SF_SMOKE).events
             .groupBy("event_type").agg(F.countDistinct("user_id").alias("n"))
             .collect()}
    assert set(approx) == set(exact)
    for t, n in exact.items():
        assert abs(approx[t] - n) <= max(2, 0.05 * n), (t, approx[t], n)
