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
