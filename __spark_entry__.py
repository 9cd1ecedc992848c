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

from full_stack_big_data_spark.engine.session import (release_scoped_cache,
                                                      tune_session)
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


def _correctness_rounds() -> list[tuple[int, str]]:
    """(round, filename) for every CORRECTNESS_r{N}.json beside this
    file, sorted in NUMERIC round order — numeric, not lexicographic,
    so an unpadded "CORRECTNESS_r2.json" cannot outrank
    "CORRECTNESS_r10.json". Single source of truth for "which rounds
    exist / which is latest" (used by the verified set AND the
    changed-set base commit)."""
    import os
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    rounds = []
    for fname in os.listdir(here):
        m = re.match(r"CORRECTNESS_r(\d+)\.json$", fname)
        if m:
            rounds.append((int(m.group(1)), fname))
    return sorted(rounds)


def _verified_rounds() -> dict[str, int]:
    """Query name → round of its LATEST driver verdict, for names whose
    latest verdict is green. The driver sweeps ``queries()`` in dict
    order under a wall-clock budget (round 1 truncated at entry 50), so
    never-yet-verified queries are emitted FIRST and re-verification of
    known-green rows runs last, stalest verdict first. A LATER round's
    verdict overrides an earlier one, so a query that regresses drops
    back out of the verified set (and re-runs at the front)."""
    import json
    import os

    rounds: dict[str, int] = {}
    here = os.path.dirname(os.path.abspath(__file__))
    for rnd, fname in _correctness_rounds():
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
            if green:
                rounds[name] = rnd
            else:
                rounds.pop(name, None)
    return rounds


def _changed_query_names(reg) -> list[str]:
    """Queries whose code changed THIS round, derived from git: diff the
    working tree against the commit that recorded the newest
    CORRECTNESS_r{N}.json (= the start of the current round), then mark
    every query whose builder file changed OR whose builder file
    (transitively) imports a changed engine file — so a regression in a
    shared module (catalog, hashing, another operator module a builder
    composes) re-prioritizes its dependents too, not just the file's own
    queries. A changed engine file nobody reaches through the import
    graph falls back to "everything changed" (registration order — the
    conservative answer). Any git failure degrades to "nothing changed"
    rather than breaking the sweep."""
    import ast
    import inspect
    import os
    import subprocess

    here = os.path.dirname(os.path.abspath(__file__))
    rounds = _correctness_rounds()
    if not rounds:
        return []
    latest = rounds[-1][1]
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

    def _code_identical(relfile: str) -> bool:
        """True when a file's change is comment/docstring-only: compare
        the base and working-tree ASTs with docstrings stripped. A
        wording fix in a hot shared module (session, skew) must not
        mark the whole registry changed and crowd the stalest-verdict
        refresh out of the sweep's wall-clock budget. Any failure
        (new file, parse error) counts as a REAL change."""
        try:
            old = subprocess.run(
                ["git", "show", f"{base}:{relfile}"],
                cwd=here, capture_output=True, text=True, timeout=30)
            if old.returncode != 0:
                return False
            with open(os.path.join(here, relfile)) as f:
                new_src = f.read()

            def norm(src: str) -> str:
                tree = ast.parse(src)
                for node in ast.walk(tree):
                    body = getattr(node, "body", None)
                    # Lambda/IfExp carry a non-list body — skip those
                    if (isinstance(body, list) and body
                            and isinstance(body[0], ast.Expr)
                            and isinstance(body[0].value, ast.Constant)
                            and isinstance(body[0].value.value, str)):
                        node.body = body[1:] or [ast.Pass()]
                return ast.dump(tree)

            return norm(old.stdout) == norm(new_src)
        except Exception:
            return False

    changed_files = {f for f in changed_files if not _code_identical(f)}
    # Diagnostics/harness-only modules (consumed by scripts/tests or by
    # THIS ordering logic itself, never by a builder): a change here
    # cannot alter query results, so it must not trip the
    # unreached-engine-change → "everything changed" fallback below.
    # NOT subtracted here: the exclusion is applied only at the fallback
    # check AND only for files absent from the builders' import closure,
    # so it self-invalidates — if a builder ever starts importing one of
    # these, its changes mark dependents through the dependency walk and
    # the exclusion becomes a no-op (r7 ADVICE).
    _DIAG_ONLY = {
        os.path.normpath("full_stack_big_data_spark/streaming/audit.py"),
        os.path.normpath("full_stack_big_data_spark/engine/changedet.py"),
    }
    if not changed_files:
        return []

    pkg = "full_stack_big_data_spark"

    def _module_file(mod: str) -> str | None:
        """Package module name → repo-relative file (or its __init__)."""
        rel = os.path.join(*mod.split("."))
        for cand in (rel + ".py", os.path.join(rel, "__init__.py")):
            if os.path.exists(os.path.join(here, cand)):
                return os.path.normpath(cand)
        return None

    def _imports_of(relfile: str) -> set[str]:
        """Repo-relative engine files imported by ``relfile`` (absolute
        `full_stack_big_data_spark...` and relative `..x`/`.x` forms)."""
        try:
            tree = ast.parse(open(os.path.join(here, relfile)).read())
        except (OSError, SyntaxError):
            return set()
        pkg_parts = os.path.dirname(relfile).split(os.sep)
        out: set[str] = set()
        for node in ast.walk(tree):
            mods: list[str] = []
            if isinstance(node, ast.Import):
                mods = [a.name for a in node.names]
            elif isinstance(node, ast.ImportFrom):
                if node.level:  # relative: resolve against this file's pkg
                    base_parts = pkg_parts[:len(pkg_parts) - node.level + 1]
                    prefix = ".".join(base_parts)
                    mod = f"{prefix}.{node.module}" if node.module else prefix
                    mods = [mod] + [f"{mod}.{a.name}" for a in node.names]
                elif node.module and node.module.startswith(pkg):
                    mods = [node.module] + [f"{node.module}.{a.name}"
                                            for a in node.names]
            for m in mods:
                if m.startswith(pkg):
                    f = _module_file(m)
                    if f:
                        out.add(f)
        return out

    # Transitive closure: which engine files does each builder file
    # depend on (including itself)?
    dep_cache: dict[str, set[str]] = {}

    def _deps(relfile: str) -> set[str]:
        if relfile in dep_cache:
            return dep_cache[relfile]
        dep_cache[relfile] = {relfile}  # cycle guard
        closure = {relfile}
        for imp in _imports_of(relfile):
            closure |= _deps(imp)
        dep_cache[relfile] = closure
        return closure

    by_file: dict[str, list[str]] = {}
    for n, spec in reg.items():
        try:
            src = inspect.getsourcefile(inspect.unwrap(spec.builder))
            rel = os.path.normpath(os.path.relpath(src, here))
        except (TypeError, ValueError):
            continue
        by_file.setdefault(rel, []).append(n)

    reachable: set[str] = set()
    candidates: list[str] = []
    cand_roots: dict[str, tuple[str, str]] = {}
    for f in by_file:
        deps = _deps(f)
        reachable |= deps
        if deps & changed_files:
            candidates.extend(by_file[f])
            for n in by_file[f]:
                cand_roots[n] = (f.replace(os.sep, "/"),
                                 inspect.unwrap(reg[n].builder).__name__)
    # Unreached engine change → all changed, EXCEPT the diagnostics-only
    # files — and those are forgiven only while genuinely unreachable
    # (a _DIAG_ONLY file inside `reachable` never reaches this set, its
    # dependents were already marked above).
    if changed_files - reachable - _DIAG_ONLY:
        return list(reg)

    # File-level candidates over-mark badly (a new operator in a module
    # marks every query in it; a tweak in functions/skew.py marks every
    # grouped_topk consumer) and crowd the stalest-verdict refresh out
    # of the sweep budget. Refine to FUNCTION level: fingerprint each
    # candidate builder's reference closure (engine/changedet.py) in
    # the base snapshot vs the working tree; only a differing (or
    # unresolvable) fingerprint keeps it in the changed set.
    try:
        from full_stack_big_data_spark.engine.changedet import (
            builder_fingerprints)

        work_src: dict[str, str] = {}
        for root, _dirs, files in os.walk(os.path.join(here, pkg)):
            for fn in files:
                if fn.endswith(".py"):
                    p = os.path.join(root, fn)
                    rel = os.path.relpath(p, here).replace(os.sep, "/")
                    with open(p) as fh:
                        work_src[rel] = fh.read()
        base_src = dict(work_src)
        for f in changed_files:
            rel = f.replace(os.sep, "/")
            shown = subprocess.run(["git", "show", f"{base}:{rel}"],
                                   cwd=here, capture_output=True,
                                   text=True, timeout=30)
            if shown.returncode == 0:
                base_src[rel] = shown.stdout
            else:
                base_src.pop(rel, None)   # new file this round
        fp_work = builder_fingerprints(work_src, cand_roots)
        fp_base = builder_fingerprints(base_src, cand_roots)
        changed = [n for n in candidates
                   if fp_work.get(n) is None or fp_base.get(n) is None
                   or fp_work[n] != fp_base[n]]
    except Exception:
        changed = candidates  # refinement is an optimization, never a gate
    order = {n: i for i, n in enumerate(reg)}
    return sorted(set(changed), key=order.get)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    def wrap(spec):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_session(spark)  # nanos-timestamp + UTC confs on any session
            # Query boundary: the previous query's result is already
            # materialized by the driver, so drop its operator-level
            # persists — a 191-query sweep in one session must not
            # accumulate cached plans (see session.release_scoped_cache).
            release_scoped_cache(spark)
            return spec.builder(spark, sf_dir)
        run.__name__ = spec.name
        run.__doc__ = spec.description
        return run

    reg = load_all()
    seen = _verified_rounds()
    # Re-verification tail ordering, three keys: (1) queries whose code
    # changed since their last green row run before untouched ones, so a
    # regression surfaces this round, not next (the changed set is
    # derived fresh each round from git, see _changed_query_names, not
    # hand-edited); (2) oldest driver verdict first, so the sweep's
    # wall-clock budget refreshes the stalest greens each round instead
    # of re-running last round's; (3) registration order as tiebreak.
    changed = _changed_query_names(reg)
    tail_rank = {n: i for i, n in enumerate(changed)}
    reg_order = {n: i for i, n in enumerate(reg)}
    tail = sorted((n for n in reg if n in seen),
                  key=lambda n: (tail_rank.get(n, len(tail_rank)),
                                 seen[n], reg_order[n]))
    ordered = [n for n in reg if n not in seen] + tail
    return {name: wrap(reg[name]) for name in ordered}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every oracle-checkable query."""
    return {name: spec.oracle for name, spec in load_all().items()
            if spec.oracle is not None}
