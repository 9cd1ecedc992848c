"""Salted aggregation / join must be result-identical to the plain plans."""

from __future__ import annotations

from pyspark.sql import functions as F

from full_stack_big_data_spark.engine.catalog import Catalog
from full_stack_big_data_spark.functions.skew import salted_agg, salted_join
from full_stack_big_data_spark.functions.text import tokens
from conftest import SF_SMOKE


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_agg_equals_plain_groupby(spark):
    toks = (Catalog(spark, SF_SMOKE).documents
            .select(F.explode(tokens("text")).alias("word")))
    plain = toks.groupBy("word").agg(F.count("*").alias("cnt"))
    salted = salted_agg(toks, ["word"], {"cnt": ("count", "*")}, salt=16)
    assert _rows(plain) == _rows(salted)


def test_salted_agg_sum_min_max(spark):
    ev = Catalog(spark, SF_SMOKE).events.select("event_type", "user_id")
    plain = ev.groupBy("event_type").agg(
        F.sum("user_id").alias("s"), F.min("user_id").alias("mn"),
        F.max("user_id").alias("mx"))
    salted = salted_agg(ev, ["event_type"],
                        {"s": ("sum", "user_id"), "mn": ("min", "user_id"),
                         "mx": ("max", "user_id")}, salt=8)
    assert _rows(plain) == _rows(salted)


def test_salted_join_rejects_outer(spark):
    """Replicating the small side x salt emits unmatched small-side rows
    salt times under right/full outer — must be refused, not silently
    wrong."""
    import pytest
    cat = Catalog(spark, SF_SMOKE)
    li = cat.lineitem.select("l_orderkey")
    o = cat.orders.select(F.col("o_orderkey").alias("l_orderkey"))
    for how in ("right", "full", "outer"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(li, o, ["l_orderkey"], how=how)


def test_salted_join_equals_plain_join(spark):
    cat = Catalog(spark, SF_SMOKE)
    li = cat.lineitem.select("l_orderkey", "l_quantity")
    o = cat.orders.select(F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority")
    plain = li.join(o, ["l_orderkey"]).select("l_orderkey", "l_quantity", "o_orderpriority")
    salted = salted_join(li, o, ["l_orderkey"], salt=8).select(
        "l_orderkey", "l_quantity", "o_orderpriority")
    assert _rows(plain) == _rows(salted)
