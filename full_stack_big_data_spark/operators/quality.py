"""Data-quality expectation checks (Deequ/dbt-test style).

A 100 TB warehouse runs assertion queries as part of every load: key
uniqueness, referential integrity, derived-column consistency, value
ranges. Each check here is a single aggregate over the table under
test — COUNT-based, partial-aggregatable, so the whole suite costs one
scan per table (FK checks fold the match marker from one key join into
the same aggregate), and the output is a
tiny (check, examined, violations, passed) table a scheduler can gate
deploys on. The violation COUNT (not just a boolean) is what an
operator pages on: "3 orphans" and "30 M orphans" are different
incidents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..engine.catalog import Catalog
from .registry import register

_QUALITY_SQL = """
WITH checks AS (
  SELECT 'orders_pk_unique' AS check_name,
         (SELECT COUNT(*) FROM orders) AS examined,
         (SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders) AS violations
  UNION ALL
  SELECT 'lineitem_fk_orders',
         (SELECT COUNT(*) FROM lineitem),
         (SELECT COUNT(*) FROM lineitem l
          WHERE NOT EXISTS (SELECT 1 FROM orders o
                            WHERE o.o_orderkey = l.l_orderkey))
  UNION ALL
  SELECT 'orders_fk_customer',
         (SELECT COUNT(*) FROM orders),
         (SELECT COUNT(*) FROM orders o
          WHERE NOT EXISTS (SELECT 1 FROM customer c
                            WHERE c.c_custkey = o.o_custkey))
  UNION ALL
  SELECT 'documents_nchars_consistent',
         (SELECT COUNT(*) FROM documents),
         (SELECT COUNT(*) FROM documents WHERE n_chars <> length(text))
  UNION ALL
  SELECT 'events_value_positive',
         (SELECT COUNT(*) FROM events),
         (SELECT COUNT(*) FROM events WHERE value <= 0)
)
SELECT check_name, examined, CAST(violations AS BIGINT) AS violations,
       violations = 0 AS passed
FROM checks
"""


@register(
    "q_data_quality_checks",
    oracle=_QUALITY_SQL,
    description="load-gate expectation suite: PK uniqueness, FK integrity, derived-column consistency, value ranges",
    tags=("quality", "agg", "anti-join"),
)
def q_data_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five representative expectations over the star schema. Shapes:

    - PK uniqueness: ``COUNT(*) − COUNT(DISTINCT pk)`` in ONE aggregate
      — one scan, one distinct-agg shuffle on the key.
    - FK integrity: LEFT join child→parent with a match marker, then
      one aggregate counting rows and null-marker rows together — one
      child scan per check (an anti-join + separate count pass would
      scan the child twice). The parent side broadcasts when
      dimension-sized; the fact-fact FK (lineitem→orders) shuffles on
      the key once.
    - Derived-column consistency / range: the predicate rides under the
      same COUNT aggregate as the examined total — one map-side scan.

    Every check is its own aggregate; the final result is a 5-row
    union, so the checks run independently (Spark schedules the tiny
    DAGs concurrently) and a failure in one cannot mask another.
    """
    cat = Catalog(spark, sf_dir)
    o, li, c = cat.orders, cat.lineitem, cat.customer
    d, ev = cat.documents, cat.events

    def emit(name: str, agg: DataFrame) -> DataFrame:
        """(examined, violations) 1-row aggregate → check row."""
        return agg.select(
            F.lit(name).alias("check_name"), "examined",
            F.col("violations").cast("bigint").alias("violations"),
            (F.col("violations") == 0).alias("passed"))

    def predicate_check(name: str, df: DataFrame, bad) -> DataFrame:
        """Map-side predicate under ONE aggregate — a single scan
        computes both the examined count and the violation count."""
        # coalesce: SUM over zero rows is NULL, and an empty table has
        # zero violations, not unknown ones (empty-corpus gauntlet)
        return emit(name, df.agg(
            F.count("*").alias("examined"),
            F.coalesce(F.sum(F.when(bad, 1).otherwise(0)), F.lit(0))
             .alias("violations")))

    def fk_check(name: str, child: DataFrame, key: str,
                 parent_keys: DataFrame) -> DataFrame:
        """LEFT join child→parent with a match marker, then one
        aggregate: examined = all child rows, violations = unmatched —
        one child scan, vs. a separate anti-join + count pass."""
        joined = child.select(key).join(
            parent_keys.withColumn("_m", F.lit(1)), key, "left")
        return emit(name, joined.agg(
            F.count("*").alias("examined"),
            F.coalesce(F.sum(F.when(F.col("_m").isNull(), 1).otherwise(0)),
                       F.lit(0)).alias("violations")))

    # PK uniqueness in one scan + one distinct-agg:
    # violations = COUNT(*) − COUNT(DISTINCT pk).
    pk = emit("orders_pk_unique", o.agg(
        F.count("*").alias("examined"),
        (F.count("*") - F.countDistinct("o_orderkey")).alias("violations")))
    checks = [
        pk,
        fk_check("lineitem_fk_orders", li, "l_orderkey",
                 o.select(F.col("o_orderkey").alias("l_orderkey")).distinct()),
        fk_check("orders_fk_customer", o, "o_custkey",
                 F.broadcast(c.select(F.col("c_custkey").alias("o_custkey")))),
        predicate_check("documents_nchars_consistent", d,
                        F.col("n_chars") != F.length("text")),
        predicate_check("events_value_positive", ev, F.col("value") <= 0),
    ]
    out = checks[0]
    for ch in checks[1:]:
        out = out.unionByName(ch)
    return out
