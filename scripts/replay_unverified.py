"""Replay the driver's sf0.01 correctness gate for not-yet-driver-green
queries, with per-query wall time, so the round-3 sweep is pre-verified
locally (VERDICT r2, next-round item 1).

Usage: python scripts/replay_unverified.py [name ...]
With no args, replays every query lacking a green CORRECTNESS row.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from pyspark.sql import SparkSession

from full_stack_big_data_spark.engine.session import tune_session
from full_stack_big_data_spark.operators.registry import load_all
from full_stack_big_data_spark.oracle import compare, duckdb_connect

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def _green_names() -> set[str]:
    names: set[str] = set()
    files = []
    for fname in os.listdir(HERE):
        m = re.match(r"CORRECTNESS_r(\d+)\.json$", fname)
        if m:
            files.append((int(m.group(1)), fname))
    for _, fname in sorted(files):
        try:
            with open(os.path.join(HERE, fname)) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            green = (row.get("rows_match")
                     and row.get("schema_match", True)
                     and row.get("hash_match", True))
            (names.add if green else names.discard)(name)
    return names


def main() -> int:
    reg = load_all()
    targets = sys.argv[1:] or [n for n in reg if n not in _green_names()]
    spark = (SparkSession.builder.master(
                 f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "8g")
             .appName("replay-unverified").getOrCreate())
    # The driver runs builders through __spark_entry__.queries()'s wrap,
    # which applies tune_session (nanos-parquet + UTC confs) first —
    # replicate that or events-table streams read TIMESTAMP_NTZ and fail.
    tune_session(spark)
    con = duckdb_connect(SF_DIR)
    failures = []
    for name in targets:
        spec = reg[name]
        t0 = time.time()
        try:
            df = spec.builder(spark, SF_DIR)
            if spec.oracle is None:
                n = df.count()
                ok, detail = n >= 0, f"rows-only ({n} rows)"
            else:
                res = compare(name, df, spec.oracle, con)
                ok, detail = res.ok, res.detail or "ok"
        except Exception as exc:  # noqa: BLE001 — report, keep replaying
            ok, detail = False, f"EXC {type(exc).__name__}: {exc}"
        dt = time.time() - t0
        print(f"{'PASS' if ok else 'FAIL':4s} {dt:7.2f}s {name}  {detail}",
              flush=True)
        if not ok:
            failures.append(name)
    print(f"\n{len(targets) - len(failures)}/{len(targets)} pass; "
          f"failures: {failures or 'none'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
