"""Differential correctness: every registered query vs its DuckDB oracle.

This replays the driver's t2 gate locally (sf0.001 for speed; the driver
runs sf0.01). A query passing here and failing at the driver means a
scale-dependent bug — which is exactly what this harness exists to rule
out early.
"""

from __future__ import annotations

import pytest

from full_stack_big_data_spark.operators.registry import load_all
from full_stack_big_data_spark.oracle import compare, duckdb_connect
from conftest import SF_SMOKE

REG = load_all()


@pytest.fixture(scope="module")
def con():
    return duckdb_connect(SF_SMOKE)


@pytest.mark.parametrize("name", sorted(REG))
def test_query_matches_oracle(spark, con, name):
    spec = REG[name]
    df = spec.builder(spark, SF_SMOKE)
    if spec.oracle is None:
        assert df.count() >= 0  # rows-only contract (driver does the same)
        return
    res = compare(name, df, spec.oracle, con)
    assert res.ok, f"{name}: {res.detail}"


def test_every_query_has_nonzero_rows(spark):
    """Guard against vacuous oracles: a query matching an empty result
    proves nothing about operator semantics."""
    empty = [n for n, spec in REG.items()
             if spec.builder(spark, SF_SMOKE).limit(1).count() == 0]
    assert not empty, f"queries with empty results at sf0.001: {empty}"
