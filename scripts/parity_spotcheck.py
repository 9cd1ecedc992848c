"""Parity spot-check at an arbitrary scale factor / query subset.

`chaos_parity.py` replays the WHOLE registry against DuckDB at one SF
dir; this is the targeted variant: a handful of named queries at a
bigger SF (the round-5 "26 heavyweight queries at sf0.1" check, the
round-6 heavy-family check at the generated sf1.0), where a full-
registry replay would take hours. Hash contracts are scale-free, so
any SF dir with the standard table set works — including the
builder-generated `.localdata/sf1.0`.

Usage: python scripts/parity_spotcheck.py SF_DIR query [query ...]
"""

from __future__ import annotations

import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from full_stack_big_data_spark.engine.session import (get_spark,
                                                      release_scoped_cache)
from full_stack_big_data_spark.operators.registry import load_all
from full_stack_big_data_spark.oracle import compare, duckdb_connect


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    sf, names = sys.argv[1], sys.argv[2:]
    spark = get_spark(app_name="fsbd-parity-spot")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb_connect(sf)
    reg = load_all()
    fails = []
    for name in names:
        spec = reg[name]
        if spec.oracle is None:
            print(f"{name}: SKIP (no oracle)")
            continue
        release_scoped_cache(spark)
        try:
            ok = compare(name, spec.builder(spark, sf), spec.oracle, con).ok
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            ok = False
            print(f"{name}: ERR {type(e).__name__}: {e}", flush=True)
        if not ok:
            fails.append(name)
        print(f"{name}: {'ok' if ok else 'FAIL'}", flush=True)
    print(f"\nSPOTCHECK({sf}) FAILS: {fails or 'none'} / {len(names)}")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
