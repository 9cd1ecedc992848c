"""Relational operator corpus (SURVEY.md §2 / Phase 2).

The reference exposes no SQL surface — its query layer is the *declared*
lambda-architecture README (``/root/reference/README.md:27-69``) and the
Storm grouping/aggregation wiring (``integration/StormSpec.scala:53-62``).
This module is the real relational engine those specs imply: filters,
projections, the full join family, hash aggregation (incl. distinct,
rollup, cube), window functions, sorts/top-k, set operations, scalar
function gallery, JSON extraction and the time-interval query (Q4).

Everything is stock DataFrame API — Catalyst owns pushdown, pruning, join
selection and AQE; tests in tests/test_plans.py pin the physical shapes we
rely on at 100 TB (broadcast for dims, PushedFilters on scans).

Numeric determinism: money aggregates accumulate in DECIMAL(18,4) (exact,
order-independent under any partitioning) and only round/cast to double at
the output edge, so a 32-way local shuffle, a 1000-executor cluster, and
single-threaded DuckDB all produce bit-identical results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..engine.catalog import Catalog
from .registry import register

DEC = "decimal(18,4)"


def _dec(col):  # exact accumulator cast
    return (F.col(col) if isinstance(col, str) else col).cast(DEC)


def _money(col, scale=2):  # output edge: round exact decimal, cast double
    return F.round(col, scale).cast("double")


# ---------------------------------------------------------------------------
# Q1-style pricing summary: scan → filter → hash agg (partial+final).
# ---------------------------------------------------------------------------

@register(
    "q1_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_base_price,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS sum_disc_price,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4))) * (1 + CAST(l_tax AS DECIMAL(18,4)))), 2) AS DOUBLE) AS sum_charge,
       ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 6) AS avg_price,
       ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 6) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-12-01'
GROUP BY l_returnflag, l_linestatus
""",
    description="TPC-H Q1-style pricing summary over lineitem",
    tags=("agg", "scan", "bench"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    disc_price = _dec("l_extendedprice") * (1 - _dec("l_discount"))
    charge = disc_price * (1 + _dec("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _money(F.sum(_dec("l_quantity"))).alias("sum_qty"),
            _money(F.sum(_dec("l_extendedprice"))).alias("sum_base_price"),
            _money(F.sum(disc_price)).alias("sum_disc_price"),
            _money(F.sum(charge)).alias("sum_charge"),
            F.round(F.sum(_dec("l_quantity")).cast("double") / F.count("*"), 6).alias("avg_qty"),
            F.round(F.sum(_dec("l_extendedprice")).cast("double") / F.count("*"), 6).alias("avg_price"),
            F.round(F.sum(_dec("l_discount")).cast("double") / F.count("*"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Filter + projection — exercises predicate pushdown and column pruning.
# ---------------------------------------------------------------------------

@register(
    "q2_filter_project",
    oracle="""
SELECT o_orderkey, o_custkey,
       CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,4)) * 2, 2) AS DOUBLE) AS doubled_price
FROM orders
WHERE o_orderstatus = 'F' AND o_totalprice > 200000.0
""",
    description="selective filter + narrow projection (pushdown/pruning)",
    tags=("scan", "filter"),
)
def q2_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    return (
        o.where((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 200000.0))
        .select(
            "o_orderkey", "o_custkey",
            _money(_dec("o_totalprice") * 2).alias("doubled_price"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q3-style shipping priority: 3-way join + agg + top-k.
# ---------------------------------------------------------------------------

@register(
    "q3_shipping_priority",
    oracle="""
SELECT l_orderkey,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS revenue,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
    description="TPC-H Q3-style: join customer/orders/lineitem, top-10 revenue",
    tags=("join", "agg", "topk", "bench"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    cutoff = F.lit("1998-03-15").cast("timestamp")
    revenue = F.sum(_dec("l_extendedprice") * (1 - _dec("l_discount")))
    return (
        cat.customer.where(F.col("c_mktsegment") == "BUILDING")
        .join(cat.orders.where(F.col("o_orderdate") < cutoff),
              F.col("c_custkey") == F.col("o_custkey"))
        .join(cat.lineitem.where(F.col("l_shipdate") > cutoff),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_money(revenue).alias("revenue"))
        .select(
            "l_orderkey", "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# TPC-H Q5-style: 5-way star join, small dims broadcast.
# ---------------------------------------------------------------------------

@register(
    "q5_local_supplier_volume",
    oracle="""
SELECT n_name,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS revenue
FROM customer JOIN orders   ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
              JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
              JOIN nation   ON s_nationkey = n_nationkey
              JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n_name
""",
    description="TPC-H Q5-style star join; nation/region broadcast",
    tags=("join", "broadcast", "agg", "bench"),
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    o = cat.orders.where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")))
    return (
        cat.customer
        .join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(cat.lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cat.supplier),
              (F.col("l_suppkey") == F.col("s_suppkey"))
              & (F.col("c_nationkey") == F.col("s_nationkey")))
        .join(F.broadcast(cat.nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(cat.region.where(F.col("r_name") == "ASIA")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(_money(F.sum(_dec("l_extendedprice") * (1 - _dec("l_discount")))).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Join family: outer / semi / anti.
# ---------------------------------------------------------------------------

@register(
    "q_join_left_outer",
    oracle="""
SELECT c_custkey, c_name,
       COUNT(o_orderkey) AS order_count,
       CAST(ROUND(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 0), 2) AS DOUBLE) AS total_spend
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name
""",
    description="left outer join preserving customers with zero orders",
    tags=("join",),
)
def q_join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    return (
        cat.customer.join(cat.orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("order_count"),
            _money(F.coalesce(F.sum(_dec("o_totalprice")), F.lit(0).cast(DEC))).alias("total_spend"),
        )
    )


@register(
    "q_join_semi",
    oracle="""
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
""",
    description="left-semi join: customers with at least one open order",
    tags=("join",),
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    open_orders = cat.orders.where(F.col("o_orderstatus") == "O")
    return (
        cat.customer.join(open_orders, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    )


@register(
    "q_join_anti",
    oracle="""
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 250000.0)
""",
    description="left-anti join: customers with no high-value order",
    tags=("join",),
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    big = cat.orders.where(F.col("o_totalprice") > 250000.0)
    return (
        cat.customer.join(big, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    )


@register(
    "q_join_full_outer",
    oracle="""
WITH od AS (
  SELECT strftime(o_orderdate, '%Y-%m-%d') AS d, COUNT(*) AS n_orders
  FROM orders GROUP BY 1
), ld AS (
  SELECT strftime(l_shipdate, '%Y-%m-%d') AS d, COUNT(*) AS n_shipped
  FROM lineitem GROUP BY 1
)
SELECT COALESCE(od.d, ld.d) AS d,
       COALESCE(od.n_orders, 0) AS n_orders,
       COALESCE(ld.n_shipped, 0) AS n_shipped
FROM od FULL OUTER JOIN ld ON od.d = ld.d
""",
    description="full outer join: daily order starts vs daily shipments, "
                "each side's unmatched days preserved",
    tags=("join",),
)
def q_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Completes the outer-join family (left/semi/anti are above): the
    shipment calendar extends past the order calendar and vice versa, so
    both null sides are genuinely exercised. Both inputs are pre-
    aggregated to day grain BEFORE the full join — at scale the join is
    calendar-sized, not fact-sized (two map-side-combinable shuffles
    plus a tiny join), the shape a naive fact-to-fact full join misses.
    """
    cat = Catalog(spark, sf_dir)
    od = (cat.orders
          .groupBy(F.date_format("o_orderdate", "yyyy-MM-dd").alias("d"))
          .agg(F.count("*").alias("n_orders")))
    ld = (cat.lineitem
          .groupBy(F.date_format("l_shipdate", "yyyy-MM-dd").alias("d"))
          .agg(F.count("*").alias("n_shipped")))
    return (od.join(ld, od["d"] == ld["d"], "full")
            .select(F.coalesce(od["d"], ld["d"]).alias("d"),
                    F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
                    F.coalesce("n_shipped", F.lit(0)).alias("n_shipped")))


# ---------------------------------------------------------------------------
# Aggregation variants: distinct, rollup, cube.
# ---------------------------------------------------------------------------

@register(
    "q_agg_distinct",
    oracle="""
SELECT n_name,
       COUNT(DISTINCT c_mktsegment) AS segments,
       COUNT(*) AS customers,
       CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_acctbal
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
""",
    description="distinct aggregate alongside plain aggregates",
    tags=("agg",),
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    return (
        cat.customer.join(F.broadcast(cat.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.countDistinct("c_mktsegment").alias("segments"),
            F.count("*").alias("customers"),
            _money(F.sum(_dec("c_acctbal"))).alias("total_acctbal"),
        )
    )


@register(
    "q_rollup",
    oracle="""
SELECT n_name, c_mktsegment,
       COUNT(*) AS customers,
       CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_acctbal
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY ROLLUP (n_name, c_mktsegment)
""",
    description="hierarchical rollup totals (nation → segment → grand)",
    tags=("agg", "rollup"),
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    return (
        cat.customer.join(F.broadcast(cat.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .rollup("n_name", "c_mktsegment")
        .agg(
            F.count("*").alias("customers"),
            _money(F.sum(_dec("c_acctbal"))).alias("total_acctbal"),
        )
    )


@register(
    "q_cube",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS orders,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
    description="cube over order status × priority",
    tags=("agg", "cube"),
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("orders"),
            _money(F.sum(_dec("o_totalprice"))).alias("total_price"),
        )
    )


# ---------------------------------------------------------------------------
# Window functions.
# ---------------------------------------------------------------------------

@register(
    "q_window_running",
    oracle="""
SELECT o_custkey, o_orderkey,
       ROW_NUMBER() OVER w AS rn,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER w, 2) AS DOUBLE) AS running_spend
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
    description="running total + row_number per customer",
    tags=("window",),
)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    w = (Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return o.select(
        "o_custkey", "o_orderkey",
        F.row_number().over(w).alias("rn"),
        _money(F.sum(_dec("o_totalprice")).over(w)).alias("running_spend"),
    )


@register(
    "q_topk_per_group",
    oracle="""
SELECT n_name, o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
FROM (
  SELECT n_name, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY n_name
                            ORDER BY o_totalprice DESC, o_orderkey) AS rk
  FROM orders JOIN customer ON o_custkey = c_custkey
              JOIN nation   ON c_nationkey = n_nationkey
) WHERE rk <= 3
""",
    description="top-3 orders by price within each nation (window top-k)",
    tags=("window", "topk"),
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.skew import grouped_topk
    cat = Catalog(spark, sf_dir)
    j = (cat.orders
         .join(cat.customer, F.col("o_custkey") == F.col("c_custkey"))
         .join(F.broadcast(cat.nation), F.col("c_nationkey") == F.col("n_nationkey")))
    # skew-proof grouped top-k (functions/skew.py::grouped_topk): 25
    # nations must not sort the whole order table on 25 tasks — the
    # native rank-limit window's partial WindowGroupLimit keeps it to
    # ≤3 rows per nation per map partition
    return (
        grouped_topk(j, ["n_name"],
                     [F.desc("o_totalprice"), F.asc("o_orderkey")],
                     3, F.col("o_orderkey"), rank_col="rk")
        .select("n_name", "o_orderkey", F.col("o_totalprice").cast("double").alias("o_totalprice"))
    )


@register(
    "q_sort_limit",
    oracle="""
SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
""",
    description="global top-20 by price (TakeOrderedAndProject, no full sort)",
    tags=("sort", "topk"),
)
def q_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
        .select(
            "o_orderkey",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
    )


# ---------------------------------------------------------------------------
# Set operations (union is the reference's A8, ssc.union — the rest are new).
# ---------------------------------------------------------------------------

@register(
    "q_union",
    oracle="""
SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
UNION
SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0
""",
    description="UNION DISTINCT of two customer selections",
    tags=("setop",),
)
def q_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir).customer
    a = c.where(F.col("c_mktsegment") == "AUTOMOBILE").select("c_custkey")
    b = c.where(F.col("c_acctbal") > 5000.0).select("c_custkey")
    return a.union(b).distinct()


@register(
    "q_intersect",
    oracle="""
SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
INTERSECT
SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0
""",
    description="INTERSECT of two customer selections",
    tags=("setop",),
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir).customer
    a = c.where(F.col("c_mktsegment") == "AUTOMOBILE").select("c_custkey")
    b = c.where(F.col("c_acctbal") > 5000.0).select("c_custkey")
    return a.intersect(b)


@register(
    "q_except",
    oracle="""
SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
EXCEPT
SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0
""",
    description="EXCEPT of two customer selections",
    tags=("setop",),
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir).customer
    a = c.where(F.col("c_mktsegment") == "AUTOMOBILE").select("c_custkey")
    b = c.where(F.col("c_acctbal") > 5000.0).select("c_custkey")
    return a.subtract(b)  # EXCEPT DISTINCT semantics


# ---------------------------------------------------------------------------
# Scalar function gallery: string/date/math/conditional.
# ---------------------------------------------------------------------------

@register(
    "q_scalar_gallery",
    oracle="""
SELECT p_partkey,
       upper(p_brand) AS brand_upper,
       substring(p_name, 1, 8) AS name_prefix,
       length(p_name) AS name_len,
       concat(p_brand, ':', p_type) AS brand_type,
       p_size % 7 AS size_mod,
       abs(p_size - 25) AS size_dist,
       CASE WHEN p_retailprice > 1500 THEN 'premium'
            WHEN p_retailprice > 900  THEN 'standard'
            ELSE 'budget' END AS price_tier,
       CAST(ROUND(CAST(p_retailprice AS DECIMAL(18,4)) * CAST(1.1 AS DECIMAL(8,4)), 2) AS DOUBLE) AS price_bumped
FROM part
WHERE p_name LIKE '%widget%' AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35, 40, 45, 50)
""",
    description="string/math/conditional scalar function gallery with LIKE + IN",
    tags=("scalar",),
)
def q_scalar_gallery(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = Catalog(spark, sf_dir).part
    return (
        p.where(F.col("p_name").like("%widget%")
                & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35, 40, 45, 50))
        .select(
            "p_partkey",
            F.upper("p_brand").alias("brand_upper"),
            F.substring("p_name", 1, 8).alias("name_prefix"),
            F.length("p_name").alias("name_len"),
            F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
            (F.col("p_size") % 7).alias("size_mod"),
            F.abs(F.col("p_size") - 25).alias("size_dist"),
            F.when(F.col("p_retailprice") > 1500, "premium")
             .when(F.col("p_retailprice") > 900, "standard")
             .otherwise("budget").alias("price_tier"),
            _money(_dec("p_retailprice") * F.lit(1.1).cast("decimal(8,4)")).alias("price_bumped"),
        )
    )


@register(
    "q_date_functions",
    oracle="""
SELECT year(o_orderdate) AS order_year,
       month(o_orderdate) AS order_month,
       COUNT(*) AS orders,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS monthly_total
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
GROUP BY year(o_orderdate), month(o_orderdate)
""",
    description="calendar extraction + monthly aggregate",
    tags=("scalar", "date", "agg"),
)
def q_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    return (
        o.where(F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        .groupBy(
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
        )
        .agg(
            F.count("*").alias("orders"),
            _money(F.sum(_dec("o_totalprice"))).alias("monthly_total"),
        )
    )


# ---------------------------------------------------------------------------
# JSON extraction over the events stream table.
# ---------------------------------------------------------------------------

@register(
    "q_json_extract",
    oracle="""
SELECT event_type,
       COUNT(*) AS events,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
FROM events
WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
GROUP BY event_type
""",
    description="JSON property extraction + filter + aggregate",
    tags=("json", "scalar"),
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        e.where(k >= 50)
        .groupBy("event_type")
        .agg(F.count("*").alias("events"), F.sum(k).alias("sum_k"))
    )


# ---------------------------------------------------------------------------
# Q4 (reference README): time-interval query over the events table.
# Reference: /root/reference/README.md:31,45-55 — "get counts for interval".
# ---------------------------------------------------------------------------

@register(
    "q_interval_query",
    oracle="""
SELECT event_type,
       COUNT(*) AS events,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS total_value
FROM events
WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts < TIMESTAMP '2024-01-20 00:00:00'
GROUP BY event_type
""",
    description="time-interval count query (reference README.md:45-55, Q4)",
    tags=("events", "interval", "agg"),
)
def q_interval_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).events
    return (
        e.where((F.col("ts") >= F.lit("2024-01-10 00:00:00").cast("timestamp"))
                & (F.col("ts") < F.lit("2024-01-20 00:00:00").cast("timestamp")))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("events"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 4).cast("double").alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# Approximate distinct — sketch-based, proven via a self-validating
# error-bound contract (the HLL++ estimate itself is engine-private, so
# the hashable surface is "estimate within bound of the exact count",
# computed Spark-side, plus the exact count the oracle recomputes).
# ---------------------------------------------------------------------------

APPROX_DISTINCT_RSD = 0.01   # HLL++ relative standard deviation
APPROX_DISTINCT_BOUND = 0.05  # contract: |est - exact|/exact ≤ 5% (5σ)


@register(
    "q_approx_distinct",
    oracle="""
SELECT event_type,
       COUNT(DISTINCT user_id) AS exact_users,
       TRUE AS estimate_within_bound
FROM events
GROUP BY event_type
""",
    description="approx_count_distinct (HyperLogLog++) per event_type, "
                "hash-proved within 5% of the exact count",
    tags=("agg", "approx", "events"),
)
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct estimate under a hashable error contract.

    The sketch internals are engine-private, so the estimate can't be
    differentially checked — but the CONTRACT can: Spark computes both
    the estimate and the exact count in one grouped pass and emits
    ``|est-exact|/exact ≤ 5%`` as a boolean; the oracle recomputes the
    exact count and asserts TRUE. An out-of-bound sketch flips the
    boolean and hash-fails the row. (Observed error at sf0.01: 0.67%,
    rsd=0.01 → 5σ margin.) At 100 TB only the estimate pass survives —
    the exact count here is the verification harness, not the operator.
    """
    e = Catalog(spark, sf_dir).events
    est = F.approx_count_distinct("user_id", APPROX_DISTINCT_RSD)
    exact = F.countDistinct("user_id")
    return (
        e.groupBy("event_type")
        .agg(est.alias("approx_users"), exact.alias("exact_users"))
        .select(
            "event_type",
            "exact_users",
            (F.abs(F.col("approx_users") - F.col("exact_users"))
             <= F.col("exact_users") * APPROX_DISTINCT_BOUND
             ).alias("estimate_within_bound"),
        )
    )
