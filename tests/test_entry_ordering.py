"""Unit tests for the driver-contract sweep machinery in
``__spark_entry__`` and the process-scoped scratch store (ADVICE r2
fixes: numeric round ordering, scratch cleanup)."""

from __future__ import annotations

import importlib
import json
import os

spark_entry = importlib.import_module("__spark_entry__")


def test_verified_names_numeric_round_order(tmp_path, monkeypatch):
    """An unpadded CORRECTNESS_r2.json must NOT outrank r10: rounds sort
    numerically, and the LATEST round's verdict wins either way."""
    def row(green):
        return {"q": {"rows_match": green, "schema_match": green,
                      "hash_match": green, "spark_rows": 1,
                      "oracle_rows": 1, "err": None}}
    # r2 green, r10 regressed: lexicographic order would read r2 AFTER
    # r10 ("CORRECTNESS_r10" < "CORRECTNESS_r2") and leave q verified.
    (tmp_path / "CORRECTNESS_r2.json").write_text(json.dumps(row(True)))
    (tmp_path / "CORRECTNESS_r10.json").write_text(json.dumps(row(False)))
    monkeypatch.setattr(os.path, "abspath", lambda p: str(tmp_path / "x"))
    assert spark_entry._verified_rounds() == {}
    # and the reverse: regressed early, re-proven in the later round —
    # and the recorded round is the LATEST green one (10, not 2)
    (tmp_path / "CORRECTNESS_r2.json").write_text(json.dumps(row(False)))
    (tmp_path / "CORRECTNESS_r10.json").write_text(json.dumps(row(True)))
    assert spark_entry._verified_rounds() == {"q": 10}


def test_queries_orders_unverified_first():
    names = list(spark_entry.queries())
    seen = spark_entry._verified_rounds()
    if not seen:  # fresh checkout without driver rows: nothing to assert
        return
    tail_started = False
    for n in names:
        if n in seen:
            tail_started = True
        else:
            assert not tail_started, f"unverified {n} after verified tail began"


def test_queries_tail_orders_oldest_verdict_first(monkeypatch):
    """Within the verified tail (and within the unchanged cohort), a
    query whose last green verdict is OLDER must run before a fresher
    one — the driver's wall-clock budget refreshes the stalest rows."""
    monkeypatch.setattr(spark_entry, "_changed_query_names", lambda reg: [])
    names = list(spark_entry.queries())
    seen = spark_entry._verified_rounds()
    rounds = [seen[n] for n in names if n in seen]
    assert rounds == sorted(rounds), "verified tail not oldest-first"


def test_scratch_purges_dead_pid_roots(tmp_path, monkeypatch):
    import full_stack_big_data_spark.engine.scratch as sc
    monkeypatch.setattr(sc, "_ROOT", str(tmp_path))
    monkeypatch.setattr(sc, "_proc_root", None)
    dead = tmp_path / "pid999999999-abc"   # no such pid on any sane box
    dead.mkdir()
    (dead / "junk").write_text("x")
    alive = tmp_path / f"pid{os.getpid()}-own"
    alive.mkdir()
    d = sc.scratch_dir("t_")
    assert os.path.isdir(d) and d.startswith(str(tmp_path))
    assert not dead.exists(), "stale root from a dead pid must be purged"
    assert alive.exists(), "a living process's root must be left alone"


def _fake_git(log_out="abc123\n", diff_out="", diff_rc=0):
    class R:
        def __init__(self, stdout, returncode):
            self.stdout, self.returncode = stdout, returncode

    def run(argv, **kw):
        if argv[:2] == ["git", "log"]:
            return R(log_out, 0)
        if argv[:2] == ["git", "diff"]:
            return R(diff_out, diff_rc)
        raise AssertionError(argv)
    return run


def test_changed_query_names_includes_import_dependents(monkeypatch):
    """A diff touching one operator module must surface that module's
    queries AND queries whose builders (transitively) import it — a
    regression in a composed helper re-prioritizes its dependents too —
    while unrelated modules stay unprioritized."""
    import subprocess

    from full_stack_big_data_spark.operators.registry import load_all
    reg = load_all()
    monkeypatch.setattr(subprocess, "run", _fake_git(
        diff_out="full_stack_big_data_spark/operators/dedup.py\n"))
    got = set(spark_entry._changed_query_names(reg))
    own = {n for n, spec in reg.items()
           if spec.builder.__module__.endswith("operators.dedup")}
    assert own <= got
    # pipeline.py composes dedup (dedup_clusters import); sketches.py
    # builds on _shingled — both must ride along
    assert "pipeline_curate" in got and "q_sketch_kmv" in got
    # relational never touches dedup
    assert "q1_pricing_summary" not in got
    assert got < set(reg)  # and it must NOT degrade to "everything"


def test_changed_query_names_unreached_infra_means_all(monkeypatch):
    """A changed engine file no builder reaches through the import graph
    (session.py is wired in by the driver shim, not by builders) must
    conservatively mark the whole registry changed."""
    import subprocess

    from full_stack_big_data_spark.operators.registry import load_all
    reg = load_all()
    monkeypatch.setattr(subprocess, "run", _fake_git(
        diff_out="full_stack_big_data_spark/engine/session.py\n"))
    assert spark_entry._changed_query_names(reg) == list(reg)


def test_changed_query_names_catalog_reaches_nearly_all(monkeypatch):
    """engine/catalog.py is imported by (almost) every builder module —
    the import graph alone must mark the bulk of the registry without
    needing the everything-changed fallback."""
    import subprocess

    from full_stack_big_data_spark.operators.registry import load_all
    reg = load_all()
    monkeypatch.setattr(subprocess, "run", _fake_git(
        diff_out="full_stack_big_data_spark/engine/catalog.py\n"))
    got = set(spark_entry._changed_query_names(reg))
    assert len(got) >= 0.9 * len(reg)
    assert "q1_pricing_summary" in got and "dedup_exact" in got


def test_changed_query_names_degrades_on_git_failure(monkeypatch):
    """Any git failure must mean "nothing changed", never a broken sweep."""
    import subprocess

    from full_stack_big_data_spark.operators.registry import load_all
    reg = load_all()
    monkeypatch.setattr(subprocess, "run", _fake_git(log_out=""))
    assert spark_entry._changed_query_names(reg) == []
    monkeypatch.setattr(subprocess, "run", _fake_git(diff_rc=128))
    assert spark_entry._changed_query_names(reg) == []
