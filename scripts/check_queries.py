"""Targeted oracle check for a subset of registry queries:
python scripts/check_queries.py <sf_dir> name [name ...]"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

from full_stack_big_data_spark.operators.registry import load_all
from full_stack_big_data_spark.engine.session import (release_scoped_cache,
                                                      tune_session)
from full_stack_big_data_spark.oracle import compare

sf = sys.argv[1]
names = sys.argv[2:]
spark = SparkSession.builder.master("local[8]").getOrCreate()
tune_session(spark)
con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
reg = load_all()
bad = []
for n in names:
    spec = reg[n]
    if spec.oracle is None:
        print(n, "SKIP (rows-only query, no oracle)", flush=True)
        continue
    r = compare(n, spec.builder(spark, sf), spec.oracle, con)
    print(n, "OK" if r.ok else f"FAIL {r}", flush=True)
    if not r.ok:
        bad.append(n)
    release_scoped_cache(spark)
print("BAD:", bad or "none")
sys.exit(1 if bad else 0)
