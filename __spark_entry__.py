"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``full_stack_big_data_spark``; this module only
adapts the engine's query registry to the driver's contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from full_stack_big_data_spark.engine.session import tune_session
from full_stack_big_data_spark.operators.registry import load_all


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    TPC-H Q3-style shipping-priority: 3-way join + decimal-exact agg +
    top-k — exercises scan, pushdown, broadcast/shuffle join, partial agg
    and TakeOrderedAndProject in one plan.
    """
    tune_session(spark)
    reg = load_all()
    return reg["q3_shipping_priority"].builder(spark, "/root/testdata/sf0.001")


def _verified_names() -> set[str]:
    """Query names that already hold a clean driver CORRECTNESS row from
    a previous round. The driver sweeps ``queries()`` in dict order under
    a wall-clock budget (round 1 truncated at entry 50), so never-yet-
    verified queries are emitted FIRST and re-verification of known-green
    rows runs last."""
    import json
    import os

    import re

    names: set[str] = set()
    here = os.path.dirname(os.path.abspath(__file__))
    # Rounds in NUMERIC order; a LATER round's verdict overrides an
    # earlier one, so a query that regresses (or loses schema parity)
    # drops back out of the verified set and re-runs at the front of the
    # next sweep. Numeric (not lexicographic) sort so an unpadded
    # "CORRECTNESS_r2.json" cannot outrank "CORRECTNESS_r10.json".
    rounds = []
    for fname in os.listdir(here):
        m = re.match(r"CORRECTNESS_r(\d+)\.json$", fname)
        if m:
            rounds.append((int(m.group(1)), fname))
    for _, fname in sorted(rounds):
        try:
            with open(os.path.join(here, fname)) as f:
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


def _changed_query_names(reg) -> list[str]:
    """Queries whose code changed THIS round, derived from git: diff the
    working tree against the commit that recorded the newest
    CORRECTNESS_r{N}.json (= the start of the current round) and map
    changed engine files to the queries whose builder they define. A
    changed engine file that is nobody's builder module is shared
    infrastructure (catalog, session, serde, hashing...) — every query
    potentially reads through it, so the whole registry is treated as
    changed (ordering degrades to registration order, which is the
    conservative-correct answer). Any git failure degrades to "nothing
    changed" rather than breaking the sweep."""
    import inspect
    import os
    import re
    import subprocess

    here = os.path.dirname(os.path.abspath(__file__))
    rounds = []
    for fname in os.listdir(here):
        m = re.match(r"CORRECTNESS_r(\d+)\.json$", fname)
        if m:
            rounds.append((int(m.group(1)), fname))
    if not rounds:
        return []
    latest = max(rounds)[1]
    try:
        base = subprocess.run(
            ["git", "log", "-n", "1", "--format=%H", "--", latest],
            cwd=here, capture_output=True, text=True, timeout=30,
        ).stdout.strip()
        if not base:
            return []
        diff = subprocess.run(
            ["git", "diff", "--name-only", base, "--",
             "full_stack_big_data_spark"],
            cwd=here, capture_output=True, text=True, timeout=30,
        )
        if diff.returncode != 0:
            return []
        changed_files = {os.path.normpath(p) for p in
                         diff.stdout.splitlines() if p.strip()}
    except (OSError, subprocess.SubprocessError):
        return []
    if not changed_files:
        return []
    by_file: dict[str, list[str]] = {}
    for n, spec in reg.items():
        try:
            src = inspect.getsourcefile(inspect.unwrap(spec.builder))
            rel = os.path.normpath(os.path.relpath(src, here))
        except (TypeError, ValueError):
            continue
        by_file.setdefault(rel, []).append(n)
    if changed_files - set(by_file):  # shared-infra change → all changed
        return list(reg)
    return [n for f in sorted(changed_files) for n in by_file.get(f, [])]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    def wrap(spec):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_session(spark)  # nanos-timestamp + UTC confs on any session
            return spec.builder(spark, sf_dir)
        run.__name__ = spec.name
        run.__doc__ = spec.description
        return run

    reg = load_all()
    seen = _verified_names()
    # Re-verification tail ordering: queries whose code changed since
    # their last green row run before untouched ones, so a regression
    # surfaces this round, not next. The changed set is derived fresh
    # each round from git (see _changed_query_names), not hand-edited.
    changed = _changed_query_names(reg)
    tail_rank = {n: i for i, n in enumerate(changed)}
    tail = sorted((n for n in reg if n in seen),
                  key=lambda n: (tail_rank.get(n, len(tail_rank)),
                                 list(reg).index(n)))
    ordered = [n for n in reg if n not in seen] + tail
    return {name: wrap(reg[name]) for name in ordered}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every oracle-checkable query."""
    return {name: spec.oracle for name, spec in load_all().items()
            if spec.oracle is not None}
