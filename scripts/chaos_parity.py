"""Chaos parity: the WHOLE oracle-backed registry under an adversarial
shuffle-partition count.

tests/test_partitioning_invariance.py pins 43 representative queries;
this script is the wide net — every oracle-backed query must stay
hash-exact against DuckDB when shuffles land in pathologically few
partitions (default 3: maximum per-partition skew, different partial-
agg/merge orders, different file counts from every write). Too slow for
the default suite (~10 min); run before a release or after touching
accumulation/ordering semantics.

Usage: python scripts/chaos_parity.py [n_partitions]
Round-5 result: FAILS none / 191 at n=3 (BENCHNOTES.md).
"""

from __future__ import annotations

import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from full_stack_big_data_spark.engine.session import (get_spark,
                                                      release_scoped_cache)
from full_stack_big_data_spark.operators.registry import load_all
from full_stack_big_data_spark.oracle import compare, duckdb_connect

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark(app_name="fsbd-chaos", cpus=8, shuffle_partitions=n)
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    con = duckdb_connect(SF)
    fails = []
    total = 0
    for name, spec in sorted(load_all().items()):
        if spec.oracle is None:
            continue
        total += 1
        release_scoped_cache(spark)  # query boundary: drop prior persists
        try:
            if not compare(name, spec.builder(spark, SF), spec.oracle, con).ok:
                fails.append(name)
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            fails.append(f"{name} ERR {type(e).__name__}")
    print(f"CHAOS({n} partitions) FAILS: {fails or 'none'} / {total} queries")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
