"""Data-quality expectation checks (Deequ/dbt-test style).

A 100 TB warehouse runs assertion queries as part of every load: key
uniqueness, referential integrity, derived-column consistency, value
ranges. Each check here is a single aggregate over the table under
test — COUNT-based, partial-aggregatable, so the whole suite costs one
scan per table plus one anti-join per FK check, and the output is a
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

    - PK uniqueness: ``COUNT(*) − COUNT(DISTINCT pk)`` — one scan, one
      distinct-agg shuffle on the key.
    - FK integrity: LEFT ANTI join child→parent, count survivors — the
      parent side broadcasts when dimension-sized; a fact-fact FK
      (lineitem→orders) shuffles both sides on the key once.
    - Derived-column consistency / range: map-side predicates under a
      COUNT — free at any scale.

    Every check is its own aggregate; the final result is a 5-row
    union, so the checks run independently (Spark schedules the tiny
    DAGs concurrently) and a failure in one cannot mask another.
    """
    cat = Catalog(spark, sf_dir)
    o, li, c = cat.orders, cat.lineitem, cat.customer
    d, ev = cat.documents, cat.events

    def check(name: str, examined: DataFrame, violations: DataFrame) -> DataFrame:
        ex = examined.agg(F.count("*").alias("examined"))
        vi = violations.agg(F.count("*").alias("violations"))
        return (ex.crossJoin(vi)  # two 1-row aggregates
                .select(F.lit(name).alias("check_name"), "examined",
                        F.col("violations").cast("bigint").alias("violations"),
                        (F.col("violations") == 0).alias("passed")))

    pk_dups = (o.groupBy("o_orderkey").agg(F.count("*").alias("n"))
               .where(F.col("n") > 1)
               .select(F.explode(F.sequence(F.lit(2), F.col("n"))).alias("_")))
    checks = [
        check("orders_pk_unique", o, pk_dups),
        check("lineitem_fk_orders", li,
              li.join(o.select(F.col("o_orderkey").alias("l_orderkey")),
                      "l_orderkey", "left_anti")),
        check("orders_fk_customer", o,
              o.join(F.broadcast(c.select(F.col("c_custkey").alias("o_custkey"))),
                     "o_custkey", "left_anti")),
        check("documents_nchars_consistent", d,
              d.where(F.col("n_chars") != F.length("text"))),
        check("events_value_positive", ev, ev.where(F.col("value") <= 0)),
    ]
    out = checks[0]
    for ch in checks[1:]:
        out = out.unionByName(ch)
    return out
