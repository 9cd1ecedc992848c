"""Sampled chaos parity in CI (r8 verdict item 7).

scripts/chaos_parity.py re-proves the whole registry hash-exact at an
adversarial ``shuffle.partitions=3`` (maximum per-partition skew,
different partial-agg merge orders) but only when run by hand. This
folds a ~10-entry sample into every pytest run so a partitioning-
invariance regression surfaces between rounds, not at the next manual
sweep. The sample rotates by round (seeded from the latest
CORRECTNESS_r{N} on disk — deterministic within a round, different
across rounds, overridable via $SPARK_GRAFT_CHAOS_SEED), so successive
rounds walk different slices of the registry.

Select just these with ``pytest -m chaos``; they also run in the
default suite (the driver's pytest IS the between-rounds gate).
"""

from __future__ import annotations

import os
import random
import re

import pytest

from full_stack_big_data_spark.operators.registry import load_all
from full_stack_big_data_spark.oracle import compare, duckdb_connect
from conftest import SF_SMOKE

pytestmark = pytest.mark.chaos

SAMPLE_SIZE = 10
CHAOS_PARTITIONS = 3


def _seed() -> int:
    env = os.environ.get("SPARK_GRAFT_CHAOS_SEED")
    if env is not None:
        return int(env)
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rounds = [int(m.group(1)) for f in os.listdir(here)
              if (m := re.match(r"CORRECTNESS_r(\d+)\.json$", f))]
    return max(rounds, default=0) + 1   # the round being built now


REG = load_all()
_ORACLE_BACKED = sorted(n for n, s in REG.items() if s.oracle is not None)
SAMPLE = sorted(random.Random(_seed()).sample(
    _ORACLE_BACKED, min(SAMPLE_SIZE, len(_ORACLE_BACKED))))


@pytest.fixture(scope="module")
def chaos_con():
    return duckdb_connect(SF_SMOKE)


@pytest.mark.parametrize("name", SAMPLE)
def test_sampled_query_is_partition_invariant(spark, chaos_con, name):
    spec = REG[name]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(CHAOS_PARTITIONS))
    try:
        res = compare(name, spec.builder(spark, SF_SMOKE), spec.oracle,
                      chaos_con)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert res.ok, f"{name} under {CHAOS_PARTITIONS} partitions: {res.detail}"
