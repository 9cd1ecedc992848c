"""Registry-wide duplicated-Python-UDF audit (guide §4.4): flag any
batch plan where the same Python UDF name appears in MORE ArrowEval/
BatchEval nodes than distinct call sites would explain — the
InferFiltersFromGenerate / pushed-filter duplication signature."""
import os
import re
import sys
from collections import Counter

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

from full_stack_big_data_spark.engine.session import (get_spark,
                                                      release_scoped_cache)
from full_stack_big_data_spark.operators.registry import load_all

def udf_eval_names(plan: str) -> list[str]:
    """PythonUDF result names — ``name(args)#exprId`` with balanced
    parens — from every Python-eval node's Arguments list. Counting
    every ``name(`` token flagged legitimate repeated builtins (cast(,
    isnotnull() as DUPs and eroded the §4.4 signal (r14 ADVICE);
    chained UDFs nest arbitrarily deep (avro decode(encode(...)#a)#b),
    so a paren scanner, not a fixed-depth regex. Mirrored by
    tests/test_udf_single_eval.py's pin."""
    names = []
    for m in re.finditer(
            r"\(\d+\) (?:ArrowEvalPython|BatchEvalPython|MapInPandas|"
            r"MapInArrow)\n(?:[^\n]*\n)*?Arguments: \[([^\]]*)\]", plan):
        args = m.group(1)
        for c in re.finditer(r"(\w+)\(", args):
            depth, i = 1, c.end()
            while i < len(args) and depth:
                depth += {"(": 1, ")": -1}.get(args[i], 0)
                i += 1
            if depth == 0 and re.match(r"#\d+", args[i:]):
                names.append(c.group(1))
    return names


sf = "/root/testdata/sf0.01"
spark = get_spark(app_name="udf-dup-audit")
spark.sparkContext.setLogLevel("ERROR")
reg = load_all()
flagged = []
for n, spec in sorted(reg.items()):
    if "streaming" in spec.tags or n.startswith("stream_"):
        continue
    release_scoped_cache(spark)
    try:
        df = spec.builder(spark, sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
    except Exception as e:
        print(n, "ERR", type(e).__name__, str(e)[:80], flush=True)
        continue
    c = Counter(udf_eval_names(plan))
    dups = {k: v for k, v in c.items() if v > 1}
    if dups:
        flagged.append((n, dups))
        print(n, "DUP", dups, flush=True)
print("FLAGGED:", len(flagged))
spark.stop()
