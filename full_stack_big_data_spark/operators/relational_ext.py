"""Extended relational corpus: TPC-H-adapted join/subquery/analytic shapes.

The reference's declared query surface is a queryable count store
(``/root/reference/README.md:45-69``); its only relational machinery is
Storm grouping wiring (``integration/StormSpec.scala:53-62``).  This
module widens the engine's §2 coverage with the canonical warehouse query
shapes a real deployment of that store would need — correlated EXISTS /
NOT EXISTS (decorrelated to semi/anti joins), scalar-subquery joins,
conditional aggregation, market-share ratios, grouping sets, pivot, and
lag/lead/ntile window analytics — each adapted to the driver's star
schema (FIXTURES.md §B; it has no partsupp/shipmode columns).

Scale posture: every query here is a declarative DataFrame program —
Catalyst decorrelates the subqueries into joins, pushes the filters into
the parquet scans, and picks broadcast-hash for every dimension side we
mark (nation/region/part/supplier are tiny relative to the fact tables
at any SF).  Aggregates accumulate in DECIMAL(18,4) so results are
bit-identical under any partitioning (32 local threads or 1000
executors).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..engine.catalog import Catalog
from .registry import register
from .relational import _dec, _money

TS = lambda s: F.lit(s).cast("timestamp")  # noqa: E731


# ---------------------------------------------------------------------------
# TPC-H Q4: correlated EXISTS → left-semi join + agg.
# ---------------------------------------------------------------------------

@register(
    "q4_order_priority",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
""",
    description="TPC-H Q4-adapted: EXISTS decorrelated to semi join, priority counts",
    tags=("join", "semi", "subquery", "agg"),
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    o = cat.orders.where(
        (F.col("o_orderdate") >= TS("1996-07-01"))
        & (F.col("o_orderdate") < TS("1996-10-01")))
    li = cat.lineitem.select("l_orderkey", "l_shipdate")
    return (
        o.join(li, (F.col("l_orderkey") == F.col("o_orderkey"))
               & (F.col("l_shipdate") > F.col("o_orderdate")), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q6: pure scan+filter+scalar agg — the pushdown showcase.
# ---------------------------------------------------------------------------

@register(
    "q6_forecast_revenue",
    oracle="""
SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
""",
    description="TPC-H Q6: all predicates pushed to the parquet scan, one-row agg",
    tags=("scan", "filter", "agg", "bench"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    return (
        li.where(
            (F.col("l_shipdate") >= TS("1996-01-01"))
            & (F.col("l_shipdate") < TS("1997-01-01"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24))
        .agg(_money(F.sum(_dec("l_extendedprice") * _dec("l_discount"))).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q7-adapted: inter-region trade volume by year (two nation/region
# dimension arms on one fact scan — both broadcast).
# ---------------------------------------------------------------------------

@register(
    "q7_volume_shipping",
    oracle="""
SELECT r1.r_name AS supp_region, r2.r_name AS cust_region,
       CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS revenue
FROM lineitem JOIN orders   ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey  = c_custkey
              JOIN supplier ON l_suppkey  = s_suppkey
              JOIN nation n1 ON s_nationkey  = n1.n_nationkey
              JOIN region r1 ON n1.n_regionkey = r1.r_regionkey
              JOIN nation n2 ON c_nationkey  = n2.n_nationkey
              JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
WHERE (r1.r_name = 'ASIA' AND r2.r_name = 'EUROPE')
   OR (r1.r_name = 'EUROPE' AND r2.r_name = 'ASIA')
GROUP BY supp_region, cust_region, l_year
""",
    description="TPC-H Q7-adapted: cross-region trade volume per ship year",
    tags=("join", "broadcast", "agg"),
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    n1 = cat.nation.select(F.col("n_nationkey").alias("sn_key"),
                           F.col("n_regionkey").alias("sr_key"))
    r1 = cat.region.select(F.col("r_regionkey").alias("sr_key2"),
                           F.col("r_name").alias("supp_region"))
    n2 = cat.nation.select(F.col("n_nationkey").alias("cn_key"),
                           F.col("n_regionkey").alias("cr_key"))
    r2 = cat.region.select(F.col("r_regionkey").alias("cr_key2"),
                           F.col("r_name").alias("cust_region"))
    pair = ((F.col("supp_region") == "ASIA") & (F.col("cust_region") == "EUROPE")) | \
           ((F.col("supp_region") == "EUROPE") & (F.col("cust_region") == "ASIA"))
    return (
        cat.lineitem
        .join(cat.orders.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cat.customer.select("c_custkey", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cat.supplier.select("s_suppkey", "s_nationkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(r1), F.col("sr_key") == F.col("sr_key2"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(r2), F.col("cr_key") == F.col("cr_key2"))
        .where(pair)
        .withColumn("l_year", F.year("l_shipdate").cast("bigint"))
        .groupBy("supp_region", "cust_region", "l_year")
        .agg(_money(F.sum(_dec("l_extendedprice") * (1 - _dec("l_discount")))).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q8-adapted: market share of one nation's suppliers in a region.
# ---------------------------------------------------------------------------

@register(
    "q8_market_share",
    oracle="""
SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
       ROUND(CAST(SUM(CASE WHEN n1.n_name = 'NATION_3'
                 THEN CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))
                 ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE), 6) AS mkt_share
FROM lineitem JOIN orders   ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey  = c_custkey
              JOIN supplier ON l_suppkey  = s_suppkey
              JOIN nation n1 ON s_nationkey  = n1.n_nationkey
              JOIN nation n2 ON c_nationkey  = n2.n_nationkey
              JOIN region    ON n2.n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY o_year
""",
    description="TPC-H Q8-adapted: NATION_3 supplier share of ASIA-customer revenue per year",
    tags=("join", "agg", "case"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    n1 = cat.nation.select(F.col("n_nationkey").alias("sn_key"),
                           F.col("n_name").alias("supp_nation"))
    n2 = cat.nation.select(F.col("n_nationkey").alias("cn_key"),
                           F.col("n_regionkey").alias("cr_key"))
    vol = _dec("l_extendedprice") * (1 - _dec("l_discount"))
    nat_vol = F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(F.lit(0).cast("decimal(18,4)"))
    return (
        cat.lineitem
        .join(cat.orders.select("o_orderkey", "o_custkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cat.customer.select("c_custkey", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cat.supplier.select("s_suppkey", "s_nationkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(cat.region.where(F.col("r_name") == "ASIA")),
              F.col("cr_key") == F.col("r_regionkey"))
        .withColumn("o_year", F.year("o_orderdate").cast("bigint"))
        .groupBy("o_year")
        .agg(F.round(F.sum(nat_vol).cast("double") / F.sum(vol).cast("double"), 6)
             .alias("mkt_share"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q9-adapted: profit by supplier nation and order year for one
# part type (no partsupp table in the fixture schema → profit = net rev).
# ---------------------------------------------------------------------------

@register(
    "q9_product_profit",
    oracle="""
SELECT n_name AS nation,
       CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS sum_profit
FROM lineitem JOIN part     ON l_partkey = p_partkey
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN orders   ON l_orderkey = o_orderkey
              JOIN nation   ON s_nationkey = n_nationkey
WHERE p_type = 'PROMO'
GROUP BY n_name, o_year
""",
    description="TPC-H Q9-adapted: PROMO-part profit by supplier nation and year",
    tags=("join", "broadcast", "agg", "bench"),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    return (
        cat.lineitem
        .join(F.broadcast(cat.part.where(F.col("p_type") == "PROMO")
                          .select("p_partkey")),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(cat.supplier.select("s_suppkey", "s_nationkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(cat.orders.select("o_orderkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cat.nation.select("n_nationkey", "n_name")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select(F.col("n_name").alias("nation"),
                F.year("o_orderdate").cast("bigint").alias("o_year"),
                (_dec("l_extendedprice") * (1 - _dec("l_discount"))).alias("vol"))
        .groupBy("nation", "o_year")
        .agg(_money(F.sum("vol")).alias("sum_profit"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q10: top-20 customers by returned-item revenue.
# ---------------------------------------------------------------------------

@register(
    "q10_returned_items",
    oracle="""
SELECT c_custkey, c_name,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS revenue,
       c_acctbal, n_name
FROM customer JOIN orders   ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
              JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
    description="TPC-H Q10: top-20 customers by returned-item revenue",
    tags=("join", "agg", "topk"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    o = cat.orders.where(
        (F.col("o_orderdate") >= TS("1996-01-01"))
        & (F.col("o_orderdate") < TS("1996-04-01")))
    return (
        cat.customer
        .join(o.select("o_orderkey", "o_custkey"),
              F.col("c_custkey") == F.col("o_custkey"))
        .join(cat.lineitem.where(F.col("l_returnflag") == "R")
              .select("l_orderkey", "l_extendedprice", "l_discount"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cat.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_money(F.sum(_dec("l_extendedprice") * (1 - _dec("l_discount")))).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# TPC-H Q12-adapted (fixture has no l_shipmode): order-priority class
# counts per lineitem status via conditional aggregation.
# ---------------------------------------------------------------------------

@register(
    "q12_priority_lines",
    oracle="""
SELECT l_linestatus,
       COUNT(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 END) AS high_line_count,
       COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 END) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l_linestatus
""",
    description="TPC-H Q12-adapted: high/low-priority line counts per status",
    tags=("join", "agg", "case"),
)
def q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        cat.lineitem.where(
            (F.col("l_shipdate") >= TS("1997-01-01"))
            & (F.col("l_shipdate") < TS("1998-01-01")))
        .select("l_orderkey", "l_linestatus")
        .join(cat.orders.select("o_orderkey", "o_orderpriority"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(F.count(F.when(hi, 1)).alias("high_line_count"),
             F.count(F.when(~hi, 1)).alias("low_line_count"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q14: promo revenue share in one month.
# ---------------------------------------------------------------------------

@register(
    "q14_promo_effect",
    oracle="""
SELECT ROUND(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))
                 ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
           / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE), 6) AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01' AND l_shipdate < TIMESTAMP '1997-10-01'
""",
    description="TPC-H Q14: promo-part revenue percentage for one month",
    tags=("join", "broadcast", "agg", "case"),
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    vol = _dec("l_extendedprice") * (1 - _dec("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0).cast("decimal(18,4)"))
    return (
        cat.lineitem.where(
            (F.col("l_shipdate") >= TS("1997-09-01"))
            & (F.col("l_shipdate") < TS("1997-10-01")))
        .join(F.broadcast(cat.part.select("p_partkey", "p_type")),
              F.col("l_partkey") == F.col("p_partkey"))
        .agg(F.round(F.lit(100.0) * F.sum(promo).cast("double")
                     / F.sum(vol).cast("double"), 6).alias("promo_revenue"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q15: supplier(s) with the maximum quarterly revenue — scalar
# subquery on an aggregate, kept exact by comparing the un-rounded
# DECIMAL accumulator (rounding only at the output edge).
# ---------------------------------------------------------------------------

@register(
    "q15_top_supplier",
    oracle="""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS total
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, CAST(ROUND(total, 2) AS DOUBLE) AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total = (SELECT MAX(total) FROM revenue)
""",
    description="TPC-H Q15: top supplier by quarterly revenue (scalar agg subquery)",
    tags=("join", "subquery", "agg"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    rev = (
        cat.lineitem.where(
            (F.col("l_shipdate") >= TS("1996-01-01"))
            & (F.col("l_shipdate") < TS("1996-04-01")))
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_dec("l_extendedprice") * (1 - _dec("l_discount"))).alias("total"))
    )
    top = rev.agg(F.max("total").alias("max_total"))
    return (
        cat.supplier.select("s_suppkey", "s_name")
        .join(rev, F.col("s_suppkey") == F.col("supplier_no"))
        .join(F.broadcast(top), F.col("total") == F.col("max_total"))
        .select("s_suppkey", "s_name", _money(F.col("total")).alias("total_revenue"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q17: correlated scalar subquery (per-part average quantity).
# ---------------------------------------------------------------------------

@register(
    "q17_small_qty_revenue",
    oracle="""
SELECT CAST(ROUND(CAST(SUM(CAST(l1.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0, 2) AS DOUBLE) AS avg_yearly
FROM lineitem l1 JOIN part ON l1.l_partkey = p_partkey
WHERE p_brand = 'Brand#13'
  AND l1.l_quantity < 0.5 * (SELECT SUM(l2.l_quantity) / COUNT(l2.l_quantity)
                             FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)
""",
    description="TPC-H Q17: small-quantity revenue vs per-part average (correlated scalar)",
    tags=("join", "subquery", "agg"),
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    li = cat.lineitem
    # Decorrelated form: per-part average joined back to the fact scan —
    # exactly what Catalyst/DuckDB produce from the correlated original.
    per_part = (li.groupBy(F.col("l_partkey").alias("ap_key"))
                .agg((F.sum("l_quantity") / F.count("l_quantity")).alias("avg_qty")))
    return (
        li.select("l_partkey", "l_quantity", "l_extendedprice")
        .join(F.broadcast(cat.part.where(F.col("p_brand") == "Brand#13")
                          .select("p_partkey")),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(per_part, F.col("l_partkey") == F.col("ap_key"))
        .where(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(F.round(F.sum(_dec("l_extendedprice")).cast("double") / 7.0, 2)
             .cast("double").alias("avg_yearly"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q18: large-volume orders (group-HAVING subquery on the fact).
# ---------------------------------------------------------------------------

@register(
    "q18_large_volume",
    oracle="""
SELECT c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       o_totalprice,
       SUM(l_quantity) AS sum_qty
FROM customer JOIN orders   ON c_custkey = o_custkey
              JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                     GROUP BY l_orderkey HAVING SUM(l_quantity) > 300)
GROUP BY c_name, c_custkey, o_orderkey, orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
""",
    description="TPC-H Q18: orders with total quantity over 300",
    tags=("join", "subquery", "agg", "topk"),
)
def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    li = cat.lineitem
    big = (li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("_q"))
           .where(F.col("_q") > 300).select("l_orderkey"))
    return (
        cat.orders
        .join(big.withColumnRenamed("l_orderkey", "bk"),
              F.col("o_orderkey") == F.col("bk"), "left_semi")
        .join(cat.customer.select("c_custkey", "c_name"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(li.select("l_orderkey", "l_quantity"),
              F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey",
                 F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
                 "o_totalprice")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# TPC-H Q19: OR-of-ANDs join predicate (brand × size × quantity bands).
# ---------------------------------------------------------------------------

@register(
    "q19_brand_discount",
    oracle="""
SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 20 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 20 AND 30)
""",
    description="TPC-H Q19: disjunctive brand/size/quantity revenue",
    tags=("join", "broadcast", "filter", "agg"),
)
def q19_brand_discount(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    band = lambda b, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == b) & F.col("p_size").between(1, smax)
        & F.col("l_quantity").between(qlo, qhi))
    return (
        cat.lineitem.select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
        .join(F.broadcast(cat.part
                          .where(F.col("p_brand").isin("Brand#11", "Brand#12", "Brand#13"))
                          .select("p_partkey", "p_brand", "p_size")),
              F.col("l_partkey") == F.col("p_partkey"))
        .where(band("Brand#11", 15, 1, 11)
               | band("Brand#12", 20, 10, 20)
               | band("Brand#13", 25, 20, 30))
        .agg(_money(F.sum(_dec("l_extendedprice") * (1 - _dec("l_discount")))).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q22-adapted: positive-balance customers with no recent orders
# (NOT EXISTS → anti join), per-nation account stats.
# ---------------------------------------------------------------------------

@register(
    "q22_dormant_customers",
    oracle="""
SELECT n_name,
       COUNT(*) AS numcust,
       CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE) AS totacctbal
FROM customer JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > 0
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY n_name
""",
    description="TPC-H Q22-adapted: dormant positive-balance customers per nation",
    tags=("join", "anti", "subquery", "agg"),
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    recent = (cat.orders.where(F.col("o_orderdate") >= TS("2000-01-01"))
              .select("o_custkey"))
    return (
        cat.customer.where(F.col("c_acctbal") > 0)
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .join(F.broadcast(cat.nation.select("n_nationkey", "n_name")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count("*").alias("numcust"),
             _money(F.sum(_dec("c_acctbal"))).alias("totacctbal"))
    )


# ---------------------------------------------------------------------------
# GROUPING SETS with grouping_id — finer than rollup/cube.
# ---------------------------------------------------------------------------

@register(
    "q_grouping_sets",
    oracle="""
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS cnt,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
""",
    description="GROUPING SETS aggregation (finer control than rollup/cube)",
    tags=("agg", "groupingsets"),
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    li.createOrReplaceTempView("_gs_lineitem")
    return spark.sql("""
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS cnt,
               CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty
        FROM _gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """)


# ---------------------------------------------------------------------------
# Window analytics: lag / lead / row_number / ntile over a per-customer
# order timeline.
# ---------------------------------------------------------------------------

@register(
    "q_window_lag_lead",
    oracle="""
SELECT o_custkey, o_orderkey,
       o_totalprice,
       LAG(o_totalprice)  OVER w AS prev_price,
       LEAD(o_totalprice) OVER w AS next_price,
       CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
       CAST(NTILE(4) OVER w AS BIGINT) AS quartile
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
    description="lag/lead/row_number/ntile over per-customer order timeline",
    tags=("window",),
)
def q_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey", "o_orderkey", "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
    )


# ---------------------------------------------------------------------------
# Window analytics: moving aggregate with an explicit ROWS frame.
# ---------------------------------------------------------------------------

@register(
    "q_window_moving_avg",
    oracle="""
SELECT o_custkey, o_orderkey,
       ROUND(CAST(s AS DOUBLE) / c, 4) AS moving_avg
FROM (SELECT o_custkey, o_orderkey,
             SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER w AS s,
             COUNT(*) OVER w AS c
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW))
""",
    description="3-row moving average of order totals per customer (ROWS frame)",
    tags=("window",),
)
def q_window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    w = (Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
         .rowsBetween(-2, Window.currentRow))
    return o.select(
        "o_custkey", "o_orderkey",
        F.round(F.sum(_dec("o_totalprice")).over(w).cast("double")
                / F.count("*").over(w), 4).alias("moving_avg"),
    )


# ---------------------------------------------------------------------------
# Pivot: order counts status × priority (explicit value list so the plan
# is a single pass, no distinct-values pre-query).
# ---------------------------------------------------------------------------

@register(
    "q_pivot_status_priority",
    oracle="""
SELECT o_orderstatus,
       COUNT(CASE WHEN o_orderpriority = '1-URGENT'        THEN 1 END) AS urgent,
       COUNT(CASE WHEN o_orderpriority = '2-HIGH'          THEN 1 END) AS high,
       COUNT(CASE WHEN o_orderpriority = '3-MEDIUM'        THEN 1 END) AS medium,
       COUNT(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END) AS notspec,
       COUNT(CASE WHEN o_orderpriority = '5-LOW'           THEN 1 END) AS low
FROM orders
GROUP BY o_orderstatus
""",
    description="pivot: order counts by status × priority",
    tags=("agg", "pivot"),
)
def q_pivot_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).orders
    piv = (o.groupBy("o_orderstatus")
           .pivot("o_orderpriority",
                  ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"])
           .count())
    return piv.select(
        "o_orderstatus",
        F.coalesce(F.col("`1-URGENT`"), F.lit(0)).alias("urgent"),
        F.coalesce(F.col("`2-HIGH`"), F.lit(0)).alias("high"),
        F.coalesce(F.col("`3-MEDIUM`"), F.lit(0)).alias("medium"),
        F.coalesce(F.col("`4-NOT SPECIFIED`"), F.lit(0)).alias("notspec"),
        F.coalesce(F.col("`5-LOW`"), F.lit(0)).alias("low"),
    )


# ---------------------------------------------------------------------------
# TPC-H Q13: customer order-count distribution (outer join + two-level agg).
# ---------------------------------------------------------------------------

@register(
    "q13_order_count_dist",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderstatus = 'F'
      GROUP BY c_custkey)
GROUP BY c_count
""",
    description="TPC-H Q13: distribution of per-customer order counts (outer join keeps zeros)",
    tags=("join", "outer", "agg"),
)
def q13_order_count_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    o = cat.orders.where(F.col("o_orderstatus") == "F").select("o_orderkey", "o_custkey")
    per_cust = (
        cat.customer.select("c_custkey")
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


# ---------------------------------------------------------------------------
# TPC-H Q16-adapted: distinct suppliers per part group, excluding a
# supplier subset (NOT IN → anti join). The fixture has no partsupp, so
# the part↔supplier link is the lineitem fact.
# ---------------------------------------------------------------------------

@register(
    "q16_parts_suppliers",
    oracle="""
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_size IN (1, 5, 9, 13)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
""",
    description="TPC-H Q16-adapted: distinct supplier count per part group, NOT IN exclusion",
    tags=("join", "anti", "distinct", "agg"),
)
def q16_parts_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    bad = cat.supplier.where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        cat.lineitem.select("l_partkey", "l_suppkey")
        .join(F.broadcast(cat.part.where(F.col("p_size").isin(1, 5, 9, 13))
                          .select("p_partkey", "p_brand", "p_type", "p_size")),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(bad, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Exact percentiles (continuous interpolation) per segment.
# ---------------------------------------------------------------------------

@register(
    "q_percentiles",
    oracle="""
SELECT c_mktsegment,
       ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
       ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90
FROM customer JOIN orders ON c_custkey = o_custkey
GROUP BY c_mktsegment
""",
    description="exact continuous percentiles (median/p90 order value per segment)",
    tags=("agg", "percentile"),
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    return (
        cat.orders.select("o_custkey", "o_totalprice")
        .join(cat.customer.select("c_custkey", "c_mktsegment"),
              F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("p50"),
             F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q20-adapted: IN-subquery with aggregate HAVING over a relative
# (scale-free) threshold — suppliers shipping more SMALL-part quantity
# than the per-supplier average.
# ---------------------------------------------------------------------------

@register(
    "q20_heavy_suppliers",
    oracle="""
WITH per_supp AS (
  SELECT l_suppkey, SUM(l_quantity) AS qty
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_type = 'SMALL'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (SELECT l_suppkey FROM per_supp
                    WHERE qty > (SELECT SUM(qty) / COUNT(*) FROM per_supp))
""",
    description="TPC-H Q20-adapted: suppliers above average SMALL-part volume (IN + HAVING-style)",
    tags=("join", "semi", "subquery", "agg"),
)
def q20_heavy_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    per_supp = (
        cat.lineitem.select("l_partkey", "l_suppkey", "l_quantity")
        .join(F.broadcast(cat.part.where(F.col("p_type") == "SMALL")
                          .select("p_partkey")),
              F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    avg = per_supp.agg((F.sum("qty") / F.count("*")).alias("avg_qty"))
    heavy = (per_supp.join(F.broadcast(avg))
             .where(F.col("qty") > F.col("avg_qty"))
             .select("l_suppkey"))
    return (
        cat.supplier.select("s_suppkey", "s_name")
        .join(heavy, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
    )


# ---------------------------------------------------------------------------
# TPC-H Q21-adapted: double correlation — late suppliers on multi-supplier
# orders where no OTHER supplier was late (EXISTS + NOT EXISTS).
# ---------------------------------------------------------------------------

@register(
    "q21_waiting_suppliers",
    oracle="""
SELECT s_name, COUNT(*) AS numwait
FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
              JOIN orders ON o_orderkey = l1.l_orderkey
WHERE l1.l_shipdate > o_orderdate + INTERVAL 60 DAYS
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAYS)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
""",
    description="TPC-H Q21-adapted: sole-late supplier on multi-supplier orders",
    tags=("join", "subquery", "exists", "agg", "topk"),
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decorrelated form of the EXISTS/NOT-EXISTS pair: per order,
    count distinct suppliers and distinct LATE suppliers; a late
    lineitem qualifies iff its order has ≥2 suppliers and exactly one
    late supplier (necessarily l1's own). One extra aggregation replaces
    two correlated subqueries — the same rewrite Catalyst/DuckDB apply,
    made explicit so the fact table is scanned twice, not three times.
    """
    cat = Catalog(spark, sf_dir)
    li = (cat.lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
          .join(cat.orders.select("o_orderkey", "o_orderdate"),
                F.col("l_orderkey") == F.col("o_orderkey"))
          .withColumn("late",
                      F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")))
    per_order = li.groupBy(F.col("l_orderkey").alias("po_key")).agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(F.when(F.col("late"), F.col("l_suppkey"))).alias("n_late"),
    )
    return (
        li.where(F.col("late"))
        .join(per_order, F.col("l_orderkey") == F.col("po_key"))
        .where((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
        .join(F.broadcast(cat.supplier.select("s_suppkey", "s_name")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Value histogram: integer bucketing of a measure column.
# ---------------------------------------------------------------------------

@register(
    "q_value_histogram",
    oracle="""
SELECT CAST(FLOOR(value / 10) AS BIGINT) AS bucket, COUNT(*) AS n
FROM events
GROUP BY bucket
""",
    description="integer-bucket histogram of the events value column",
    tags=("agg", "histogram"),
)
def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    return (ev.groupBy(F.floor(F.col("value") / 10).cast("bigint").alias("bucket"))
            .agg(F.count("*").alias("n")))


# ---------------------------------------------------------------------------
# Statistical moments, portably.
# ---------------------------------------------------------------------------

@register(
    "q_stats_moments",
    oracle="""
WITH s AS (
  SELECT event_type,
         COUNT(*) AS n,
         SUM(CAST(value AS DECIMAL(18,4))) AS sx,
         SUM(CAST(value AS DECIMAL(18,4)) * CAST(value AS DECIMAL(18,4))) AS sxx,
         SUM(CAST(user_id AS DECIMAL(18,0))) AS sy,
         SUM(CAST(user_id AS DECIMAL(18,0)) * CAST(user_id AS DECIMAL(18,0))) AS syy,
         SUM(CAST(value AS DECIMAL(18,4)) * CAST(user_id AS DECIMAL(18,0))) AS sxy
  FROM events GROUP BY event_type
)
SELECT event_type, n,
       CAST(ROUND(CAST(sx AS DOUBLE) / n, 6) AS DOUBLE) AS mean_value,
       CAST(ROUND(GREATEST(CAST(sxx AS DOUBLE) / n
                  - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n), 0), 6) AS DOUBLE)
         AS var_value,
       CAST(ROUND(CASE WHEN (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
                        AND (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
                       THEN (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                            / SQRT((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                                   * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
                  END, 6) AS DOUBLE) AS corr_value_user
FROM s
""",
    description="mean/variance/correlation from decimal-exact sums (partitioning-invariant moments)",
    tags=("events", "statistics", "agg"),
)
def q_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical moments WITHOUT the native stddev/corr aggregates.

    Spark's ``stddev``/``corr`` accumulate in floating point, so their
    low-order digits depend on partition merge order — fine for one run,
    unacceptable for a differential oracle or a reproducible 1000-executor
    pipeline. Here every sufficient statistic (Σx, Σx², Σy, Σy², Σxy) is
    an exact DECIMAL partial aggregate (order-independent), and the
    moments are derived from those sums in one deterministic double
    expression per group. Same single-shuffle plan shape as any groupBy;
    exactness costs nothing.
    """
    ev = Catalog(spark, sf_dir).events
    # Scales sized to the data (value: 2 decimal places; user_id:
    # integral): a scale-6 cast overflows DuckDB's decimal MULTIPLY at
    # sf0.1 (scaled user_id² > int64) — caught by the sf0.1 sweep.
    x = F.col("value").cast("decimal(18,4)")
    y = F.col("user_id").cast("decimal(18,0)")
    s = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sx"), F.sum(x * x).alias("sxx"),
        F.sum(y).alias("sy"), F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    n = F.col("n")
    sx, sxx = F.col("sx").cast("double"), F.col("sxx").cast("double")
    sy, syy = F.col("sy").cast("double"), F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    # Degenerate-group guards (mirrored in the oracle): variance clamps
    # at 0 (the decimal→double cast can round a true zero to ~-2e-18,
    # which DuckDB's SQRT hard-errors on), and corr is NULL — not a
    # division by zero — when either variable is constant in the group.
    vx, vy = n * sxx - sx * sx, n * syy - sy * sy
    return s.select(
        "event_type", "n",
        F.round(sx / n, 6).cast("double").alias("mean_value"),
        F.round(F.greatest(sxx / n - (sx / n) * (sx / n), F.lit(0.0)), 6)
         .cast("double").alias("var_value"),
        F.round(F.when((vx > 0) & (vy > 0),
                       (n * sxy - sx * sy) / F.sqrt(vx * vy)), 6)
         .cast("double").alias("corr_value_user"),
    )


# ---------------------------------------------------------------------------
# RANGE-frame window (value-based frame, the one frame type ROWS can't do).
# ---------------------------------------------------------------------------

@register(
    "q_window_range_frame",
    oracle="""
SELECT event_id, user_id,
       COUNT(*) OVER w AS n_last_hour,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))) OVER w, 4) AS DOUBLE)
         AS sum_last_hour
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
""",
    description="per-user trailing-hour RANGE frame: count and decimal-exact sum of the last 3600 s",
    tags=("events", "window", "range-frame"),
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-one-hour aggregate per event — a RANGE (value-based)
    frame over event time, which a ROWS frame cannot express when event
    spacing is irregular.

    Ordering is ``unix_micros(ts)`` (unique enough in the fixture;
    RANGE peers at equal timestamps enter the frame together in both
    engines, so ties are deterministic by definition). Same single
    user-keyed shuffle as any per-user window; the frame sum
    accumulates in DECIMAL so the result is partition-order-invariant.
    """
    ev = Catalog(spark, sf_dir).events
    w = (Window.partitionBy("user_id").orderBy(F.unix_micros(F.col("ts")))
         .rangeBetween(-3_600_000_000, 0))
    return ev.select(
        "event_id", "user_id",
        F.count("*").over(w).alias("n_last_hour"),
        F.round(F.sum(F.col("value").cast("decimal(18,6)")).over(w), 4)
         .cast("double").alias("sum_last_hour"),
    )


# ---------------------------------------------------------------------------
# SCD Type-2 dimension maintenance (CDC apply).
# ---------------------------------------------------------------------------

SCD2_D0 = "2024-01-01"      # dimension load date
SCD2_CHG = "2024-06-01"     # change-batch effective date


@register(
    "q_scd2_apply",
    oracle=f"""
WITH changes AS (
  SELECT c_custkey, c_mktsegment || '_v2' AS new_segment
  FROM customer WHERE c_custkey % 7 = 0
)
SELECT c.c_custkey, c.c_mktsegment AS segment,
       '{SCD2_D0}' AS effective_from,
       CASE WHEN ch.c_custkey IS NOT NULL THEN '{SCD2_CHG}' END AS effective_to,
       CAST(CASE WHEN ch.c_custkey IS NULL THEN 1 ELSE 0 END AS INT) AS is_current
FROM customer c LEFT JOIN changes ch USING (c_custkey)
UNION ALL
SELECT c_custkey, new_segment AS segment,
       '{SCD2_CHG}' AS effective_from,
       CAST(NULL AS VARCHAR) AS effective_to,
       CAST(1 AS INT) AS is_current
FROM changes
""",
    description="SCD type-2 apply: change batch closes old dimension rows and opens versioned ones",
    tags=("relational", "cdc", "scd2"),
)
def q_scd2_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) maintenance: apply a change
    batch to a dimension, closing each changed key's current row at the
    change date and opening a new versioned row — history preserved with
    validity intervals, the standard warehouse pattern for "what did
    this customer look like when the order shipped".

    The change batch is a deterministic fixture (segment rename for
    ``c_custkey % 7 == 0``). Formulation: LEFT-join the dimension to the
    (broadcast) change batch, emit 1 or 2 rows per key via a per-row
    array explode — no second scan of the dimension and no shuffle
    beyond the broadcast, so the apply is map-side at any dimension
    size; at 100 TB the change batch is the small side by construction
    (a day's CDC vs the full dimension).
    """
    c = Catalog(spark, sf_dir).customer
    changes = (c.where(F.col("c_custkey") % 7 == 0)
               .select("c_custkey",
                       F.concat(F.col("c_mktsegment"), F.lit("_v2"))
                        .alias("new_segment")))
    joined = c.join(F.broadcast(changes), "c_custkey", "left")
    changed = F.col("new_segment").isNotNull()
    rows = F.when(changed, F.array(
        F.struct(F.col("c_mktsegment").alias("segment"),
                 F.lit(SCD2_D0).alias("effective_from"),
                 F.lit(SCD2_CHG).alias("effective_to"),
                 F.lit(0).alias("is_current")),
        F.struct(F.col("new_segment").alias("segment"),
                 F.lit(SCD2_CHG).alias("effective_from"),
                 F.lit(None).cast("string").alias("effective_to"),
                 F.lit(1).alias("is_current")),
    )).otherwise(F.array(
        F.struct(F.col("c_mktsegment").alias("segment"),
                 F.lit(SCD2_D0).alias("effective_from"),
                 F.lit(None).cast("string").alias("effective_to"),
                 F.lit(1).alias("is_current")),
    ))
    return (joined.select("c_custkey", F.explode(rows).alias("r"))
            .select("c_custkey", "r.segment", "r.effective_from",
                    "r.effective_to", F.col("r.is_current").cast("int").alias("is_current")))


# ---------------------------------------------------------------------------
# TPC-H Q11: important stock (group value vs scaled global total).
# ---------------------------------------------------------------------------

Q11_NATION_MAX = 13   # suppliers in nations 0-12 (a single nation is empty
                      # at sf0.001 — one supplier per nation there)
Q11_SCALE = 1000  # group qualifies when value * SCALE > total, i.e. the
                  # Q11 fraction 1/SCALE = 0.001 — kept as an INTEGER
                  # scale so the HAVING comparison stays exact decimal
                  # arithmetic on both engines (a double 0.001 threshold
                  # can flip groups within a few ULP of the boundary)


@register(
    "q11_important_stock",
    oracle=f"""
WITH scoped AS (
  SELECT l.l_partkey,
         CAST(l.l_extendedprice AS DECIMAL(18,4)) * l.l_quantity AS val
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  WHERE n.n_nationkey < {Q11_NATION_MAX}
), grouped AS (
  SELECT l_partkey, SUM(val) AS value FROM scoped GROUP BY l_partkey
)
SELECT l_partkey, CAST(ROUND(value, 2) AS DOUBLE) AS value
FROM grouped
WHERE CAST(value AS DECIMAL(30,4)) * CAST({Q11_SCALE} AS DECIMAL(4,0))
      > (SELECT SUM(value) FROM grouped)
""",
    description="TPC-H Q11 adaptation: per-part inventory value vs a "
                "fraction of the scoped total (scalar-subquery threshold); "
                "partsupp stands in as lineitem price*qty",
    tags=("join", "subquery", "agg"),
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 completes the TPC-H numbered sweep (Q1-Q22; this was the one
    hole). The testdata has no partsupp table, so inventory value is
    adapted as lineitem extendedprice*quantity over a supplier-nation
    scope — same shape as the spec: scoped fact join, per-part decimal
    aggregate, HAVING against a scalar subquery of the same aggregate.

    Scale: supplier and nation broadcast; ONE fact shuffle on partkey
    with decimal map-side partials; the global threshold re-aggregates
    the per-part table (partial-agg-fed scalar funnel) and broadcasts
    back as a 1-row join — the grouped table is consumed twice but both
    consumers hang off the SAME partkey exchange, which Spark's
    ReuseExchange rule materializes once (no explicit persist: a cached
    dimension pinned for the session would leak across registry-wide
    sweeps that share one SparkSession). The HAVING comparison is EXACT
    decimal on both engines: ``value * 1000 > total`` with an integer
    scale — decimal(30,4) x decimal(4,0) = decimal(35,4), no precision
    cap, no double cast — mirroring the DuckDB oracle term-for-term, so
    groups at the threshold boundary cannot flip between engines. No
    sort: the driver compare is order-insensitive and Q11's ORDER BY
    value DESC would be the only global sort in the plan (TakeOrdered
    applies only with a LIMIT, which the spec query does not have).
    """
    cat = Catalog(spark, sf_dir)
    scoped = (
        cat.lineitem
        .join(F.broadcast(cat.supplier.select("s_suppkey", "s_nationkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cat.nation.where(
            F.col("n_nationkey") < Q11_NATION_MAX).select("n_nationkey")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("l_partkey",
                (_dec("l_extendedprice") * F.col("l_quantity")).alias("val"))
    )
    grouped = (scoped.groupBy("l_partkey")
               .agg(F.sum("val").alias("value")))
    total = grouped.agg(F.sum("value").alias("total"))
    scaled = (F.col("value").cast("decimal(30,4)")
              * F.lit(Q11_SCALE).cast("decimal(4,0)"))
    return (grouped.crossJoin(F.broadcast(total))
            .where(scaled > F.col("total"))
            .select("l_partkey", _money(F.col("value")).alias("value")))
