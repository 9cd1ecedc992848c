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


# ---------------------------------------------------------------------------
# Range join: bucketed interval equi-join + residual filter.
# ---------------------------------------------------------------------------

RANGE_DAYS = 30
_EPOCH = "1992-01-01"


def _bucket(col):
    """30-day bucket index of a date column (portable integer math)."""
    return F.floor(F.datediff(col, F.lit(_EPOCH).cast("date")) / RANGE_DAYS)


@register(
    "q_range_join",
    oracle=f"""
SELECT a.o_orderkey, COUNT(*) AS n_nearby
FROM orders a JOIN orders b
  ON a.o_custkey = b.o_custkey AND a.o_orderkey <> b.o_orderkey
 AND b.o_orderdate >= a.o_orderdate - INTERVAL {RANGE_DAYS} DAYS
 AND b.o_orderdate <= a.o_orderdate + INTERVAL {RANGE_DAYS} DAYS
GROUP BY a.o_orderkey
""",
    description=f"range join: same-customer orders within ±{RANGE_DAYS} days, bucketed equi-join",
    tags=("join", "range", "custom"),
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join done the scalable way: a raw inequality join is a
    per-key cross product filtered late (quadratic on active customers).
    Bucketing the time axis at the interval width turns it into an
    equi-join on (key, bucket) — the probe side expands to its 3
    adjacent buckets (any ±30-day neighbor must land there), and the
    exact interval predicate runs as a residual filter on the tiny
    per-bucket candidate set. Shuffle is by (key, bucket): bounded
    fan-out, hash-partitionable, AQE-skew-splittable.
    """
    cat = Catalog(spark, sf_dir)
    o = cat.orders.select("o_custkey", "o_orderkey", "o_orderdate")
    probe = o.select(
        F.col("o_custkey").alias("a_cust"), F.col("o_orderkey").alias("a_key"),
        F.col("o_orderdate").alias("a_date"),
        F.explode(F.array(_bucket(F.col("o_orderdate")) - 1,
                          _bucket(F.col("o_orderdate")),
                          _bucket(F.col("o_orderdate")) + 1)).alias("bucket"),
    )
    build = o.select(
        F.col("o_custkey").alias("b_cust"), F.col("o_orderkey").alias("b_key"),
        F.col("o_orderdate").alias("b_date"),
        _bucket(F.col("o_orderdate")).alias("bucket"),
    )
    lo = F.col("a_date") - F.expr(f"INTERVAL {RANGE_DAYS} DAYS")
    hi = F.col("a_date") + F.expr(f"INTERVAL {RANGE_DAYS} DAYS")
    return (
        probe.join(build, ["bucket"])
        .where((F.col("a_cust") == F.col("b_cust"))
               & (F.col("a_key") != F.col("b_key"))
               & (F.col("b_date") >= lo) & (F.col("b_date") <= hi))
        .groupBy(F.col("a_key").alias("o_orderkey"))
        .agg(F.count("*").alias("n_nearby"))
    )
