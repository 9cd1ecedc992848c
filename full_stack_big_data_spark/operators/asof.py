"""As-of join — the canonical "operator Spark lacks" built from
DataFrame primitives.

An as-of join attaches to each left row the latest right row whose
timestamp is at or before the left row's timestamp, per key. The naive
plan (equi-join on key + ``r_ts <= l_ts``, then max-per-left-row) fans
out to every earlier right row before reducing — quadratic per hot key.
The scalable composition here is the classic union-sort formulation:

1. tag both sides and union them into one stream of (key, ts, side,
   payload) rows — no join at all;
2. one hash shuffle by key, sort by (ts, side) within key (right rows
   sort before left rows at equal ts, so "at or before" includes ties);
3. a running ``last_value(right payload) IGNORE NULLS`` window carries
   the most recent right row forward onto each left row.

Cost: one shuffle of |L|+|R| rows and a per-key sort — the same shape
as any windowed aggregation, with zero fan-out. This is how you as-of
join a 100 TB trade/event stream against quotes. DuckDB implements
ASOF JOIN natively, which makes the differential oracle one line.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window, functions as F

from ..engine.catalog import Catalog
from .registry import register


def asof_join(left: DataFrame, right: DataFrame, key: str,
              left_ts: str, right_ts: str,
              payload: list[str]) -> DataFrame:
    """Inner as-of join: latest right row with ``right_ts <= left_ts``
    per ``key``. Left rows with no prior right row are dropped (inner
    semantics, matching DuckDB's ASOF JOIN)."""
    lt = left.select(
        F.col(key).alias("_k"), F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_r_{c}") for c in payload],
        "*",
    )
    rt = right.select(
        F.col(key).alias("_k"), F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in payload],
        *[F.lit(None).cast(t).alias(c) for c, t in left.dtypes],
    )
    merged = lt.unionByName(rt)
    w = (Window.partitionBy("_k").orderBy("_ts", "_side")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = merged.select(
        "*",
        *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_asof_{c}")
          for c in payload],
    )
    return (carried.where((F.col("_side") == 1) & F.col(f"_asof_{payload[0]}").isNotNull())
            .select(*left.columns,
                    *[F.col(f"_asof_{c}").alias(c) for c in payload]))


@register(
    "q_asof_join",
    oracle="""
WITH o AS (  -- deterministic: one order per (customer, date), keep max key
  SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
  FROM orders GROUP BY o_custkey, o_orderdate
)
SELECT event_id, user_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS event_ts,
       o_orderkey AS last_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS last_orderdate
FROM events ASOF JOIN o
  ON user_id = o.o_custkey AND o.o_orderdate <= events.ts
""",
    description="as-of join: each event enriched with the user's most recent prior order (union+window, no fan-out)",
    tags=("join", "asof", "custom"),
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    # Deterministic right side: one order per (customer, date).
    o = (cat.orders.groupBy("o_custkey", "o_orderdate")
         .agg(F.max("o_orderkey").alias("o_orderkey")))
    # asof_join takes one shared key column name; build it explicitly.
    l = cat.events.select(F.col("user_id").cast("bigint").alias("k"),
                          "event_id", "user_id", "ts")
    r = o.select(F.col("o_custkey").cast("bigint").alias("k"),
                 "o_orderdate", "o_orderkey")
    out = asof_join(l, r, key="k", left_ts="ts", right_ts="o_orderdate",
                    payload=["o_orderkey", "o_orderdate"])
    return out.select(
        "event_id", "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("event_ts"),
        F.col("o_orderkey").alias("last_orderkey"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("last_orderdate"),
    )
