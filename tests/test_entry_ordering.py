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
    assert spark_entry._verified_names() == set()
    # and the reverse: regressed early, re-proven in the later round
    (tmp_path / "CORRECTNESS_r2.json").write_text(json.dumps(row(False)))
    (tmp_path / "CORRECTNESS_r10.json").write_text(json.dumps(row(True)))
    assert spark_entry._verified_names() == {"q"}


def test_queries_orders_unverified_first():
    names = list(spark_entry.queries())
    seen = spark_entry._verified_names()
    if not seen:  # fresh checkout without driver rows: nothing to assert
        return
    tail_started = False
    for n in names:
        if n in seen:
            tail_started = True
        else:
            assert not tail_started, f"unverified {n} after verified tail began"


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
