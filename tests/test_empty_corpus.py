"""Empty-input robustness gauntlet — differential.

A 100 TB pipeline routinely sees empty slices: a filter that matches
nothing, a partition with no files, a day with no events. The classic
failure modes are ``sequence(1, 0)`` descending, division by a zero
count, and stacking an empty array. This gauntlet writes a zero-row
copy of every table and runs the whole batch registry against it,
requiring:

- no query crashes, and
- every oracle-backed query still AGREES with DuckDB on the empty
  input (global aggregates legitimately return one row — COUNT 0 /
  NULL sums — and both engines must say the same thing).

Excluded: streaming-tagged queries (their drain harness is the real
cost, and streaming correctness has its own gauntlet) and hive-
partitioned-storage queries (a zero-row partitioned write yields a
directory with no partitions — unreadable by design, a different error
class from an empty table). Flat-file roundtrip queries run and pass:
Spark writes schema-bearing footers even for zero rows.
"""

from __future__ import annotations

import duckdb
import pytest

from full_stack_big_data_spark.operators.registry import load_all
from full_stack_big_data_spark.oracle import compare

SF = "/root/testdata/sf0.001"
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")
# "streaming": the drain harness is the cost and streaming has its own
# gauntlet. "storage": hive-PARTITIONED writes of zero rows produce a
# directory with no partition dirs at all, which is unreadable by design
# (unlike plain parquet, whose schema-bearing footers round-trip empty —
# the csv/orc/serde roundtrip queries run here and pass).
SKIP_TAGS = {"streaming", "storage"}


@pytest.fixture(scope="module")
def empty_sf(tmp_path_factory):
    # Single files with the source files' EXACT parquet schema (pyarrow,
    # not Spark: Spark writes a directory, which DuckDB's single-path
    # reader rejects; and a round-trip through either engine could
    # rewrite physical types like the nanos timestamps).
    import pyarrow.parquet as pq

    out = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        schema = pq.read_schema(f"{SF}/{t}.parquet")
        pq.write_table(schema.empty_table(), str(out / f"{t}.parquet"))
    return str(out)


@pytest.fixture(scope="module")
def empty_con(empty_sf):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{empty_sf}/{t}.parquet'")
    return con


_BATCH = [n for n, s in load_all().items() if not (SKIP_TAGS & set(s.tags))]

# Known engine divergence on the DEGENERATE input only: over zero rows,
# SQL-standard ROLLUP/CUBE/GROUPING SETS still emit the () grand-total
# row (DuckDB does), while Spark emits nothing. Harmless on any
# non-empty table; pinned here as expected-fail so a behavior change in
# either engine surfaces immediately.
_EMPTY_DIVERGENT = {"q_rollup", "q_cube", "q_grouping_sets"}


@pytest.mark.parametrize("name", [
    pytest.param(n, marks=pytest.mark.xfail(
        reason="Spark omits the () grouping-set row on empty input",
        strict=True)) if n in _EMPTY_DIVERGENT else n
    for n in _BATCH
])
def test_query_survives_empty_corpus(spark, empty_sf, empty_con, name):
    spec = load_all()[name]
    df = spec.builder(spark, empty_sf)  # must not raise
    if spec.oracle is not None:
        assert compare(name, df, spec.oracle, empty_con).ok
    else:
        df.collect()
