"""The /verify skill's drive recipe as a script (so background runs
don't mangle heredocs): vanilla untuned SparkSession through the driver
contract, full sf0.01 sweep against the DuckDB oracles."""
import importlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

spark = SparkSession.builder.master("local[8]").getOrCreate()  # deliberately untuned
mod = importlib.import_module("__spark_entry__")
print("entry rows:", len(mod.entry(spark).collect()), flush=True)  # must be >0

import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
from full_stack_big_data_spark.oracle import compare

qs, osql = mod.queries(), mod.oracle_sql()
fails = []
for n, fn in qs.items():
    if n not in osql:
        continue
    if not compare(n, fn(spark, sf), osql[n], con).ok:
        fails.append(n)
        print("FAIL:", n, flush=True)
print("FAILS:", fails or "none", "/", len(qs), "queries")
