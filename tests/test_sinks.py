"""Partitioned-layout sink: the interval query must prune partitions."""

from __future__ import annotations

from pyspark.sql import functions as F

from full_stack_big_data_spark.engine.catalog import Catalog
from full_stack_big_data_spark.plans.checks import plan_string
from full_stack_big_data_spark.sources.sinks import (
    read_partitioned, write_partitioned_by_day,
)
from conftest import SF_SMOKE


def test_interval_query_prunes_partitions(spark, tmp_path):
    ev = Catalog(spark, SF_SMOKE).events
    out = str(tmp_path / "events_by_day")
    write_partitioned_by_day(ev, out)

    back = read_partitioned(spark, out)
    one_day = back.where(F.col("event_date") == "2024-01-02")
    plan = plan_string(one_day)
    assert "PartitionFilters" in plan

    # Round-trip integrity: per-day counts match the unpartitioned table.
    src_counts = {r[0]: r[1] for r in ev.groupBy(
        F.date_format("ts", "yyyy-MM-dd")).count().collect()}
    back_counts = {str(r[0]): r[1] for r in back.groupBy("event_date").count().collect()}
    assert src_counts == back_counts

    # Pruned scan reads strictly fewer files than the full layout when
    # filtering to one existing day.
    some_day = sorted(src_counts)[1]
    n_one = read_partitioned(spark, out).where(
        F.col("event_date") == some_day).count()
    assert n_one == src_counts[some_day]
