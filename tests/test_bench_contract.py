"""The driver's bench contract: ``python bench.py`` prints exactly ONE
JSON line with the promised fields, and every headline name exists in
the registry (a renamed operator must break THIS test, not the driver's
round recording)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

from full_stack_big_data_spark.operators.registry import load_all

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_headline_queries_exist():
    import importlib
    bench = importlib.import_module("bench")
    reg = load_all()
    missing = [n for n in bench.HEADLINE + bench.STREAMING_HEADLINE
               if n not in reg]
    assert not missing, missing
    assert bench.CANARY in reg


def test_bench_emits_one_json_line():
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
               SPARK_GRAFT_BENCH_REPS="1")
    out = subprocess.run(
        [sys.executable, os.path.join(HERE, "bench.py")],
        capture_output=True, text=True, env=env, cwd=HERE, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [ln for ln in out.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, f"expected exactly one stdout line, got {lines}"
    rec = json.loads(lines[0])
    bench = __import__("bench")
    assert rec["unit"] == "sec" and rec["value"] > 0
    assert set(rec["queries"]) == set(bench.HEADLINE
                                      + bench.STREAMING_HEADLINE)
    assert all(v >= 0 for v in rec["queries"].values())
    # r12 verdict items 4+6: streaming additions labeled, batch-only
    # subtotal present, and the interleaved schedule's noise self-report
    assert rec["streaming_queries"] == bench.STREAMING_HEADLINE
    assert abs(rec["batch_subtotal"]
               - sum(rec["queries"][n] for n in bench.HEADLINE)) < 1e-6
    assert rec["bench_schedule"] == "interleaved"
    assert rec["band_spread"] >= 1.0
    assert len(rec["canary_secs"]) == 1  # REPS=1 in this test's env
    # Self-comparability fields (r8 verdict item 3): the like-for-like
    # subtotal over the previous round's headline set, and the
    # build/serve split of the write-dominated index-persist entry.
    prev, prev_src = __import__("bench")._prev_round_queries()
    if prev:
        assert rec["subtotal_prev_round"] > 0
        assert rec["subtotal_prev_round"] <= rec["value"] + 1e-6
        # r9 verdict item 8: the per-query table over the previous
        # round's set, plus explicit accounting of any prev-round query
        # this run no longer benches (never silently dropped).
        tbl = rec["queries_prev_round"]
        assert tbl and all(n in rec["queries"] for n in tbl)
        assert abs(sum(tbl.values()) - rec["subtotal_prev_round"]) < 1e-6
        missing = rec["prev_round_missing"] or []
        assert set(tbl) | set(missing) == set(prev)
        # r10 ADVICE: the comparison set's source round is recorded,
        # so a several-rounds-deep fallback is labeled, not implied.
        assert rec["prev_round_source"] == prev_src and prev_src >= 1
    comp = rec["components"]["ann_ivf_index_persist"]
    assert comp["build_s"] > 0 and comp["serve_s"] > 0
    assert (abs(comp["build_s"] + comp["serve_s"]
                - rec["queries"]["ann_ivf_index_persist"]) < 0.02)


def test_prev_round_skips_own_artifact(tmp_path, monkeypatch):
    """An artifact whose query set equals the current HEADLINE is the
    round's OWN snapshot (or an unchanged set, where subtotal == total
    regardless): _prev_round_queries must fall back to the next-newest
    DIFFERING set instead of comparing a re-run against itself
    (r9 ADVICE)."""
    import importlib

    bench = importlib.import_module("bench")
    older = {"queries": {"q1_pricing_summary": 1.0, "dropped_query": 2.0}}
    own = {"parsed": {"queries": {n: 0.5 for n in bench.HEADLINE}}}
    (tmp_path / "BENCH_r08.json").write_text(json.dumps(older))
    (tmp_path / "BENCH_r09.json").write_text(json.dumps(own))
    monkeypatch.setattr(bench.os.path, "abspath",
                        lambda _p: str(tmp_path / "bench.py"))
    prev, src = bench._prev_round_queries()
    assert prev == ["q1_pricing_summary", "dropped_query"] and src == 8


def test_prev_round_falls_back_to_newest_when_no_set_differs(
        tmp_path, monkeypatch):
    """When EVERY committed artifact's set equals the current HEADLINE
    (the headline genuinely didn't change between rounds), the
    comparison set must fall back to the newest artifact — subtotal ==
    total IS the like-for-like number — instead of [] (r10 ADVICE),
    and the source round labels how deep the comparison reaches."""
    import importlib

    bench = importlib.import_module("bench")
    own = {"parsed": {"queries": {n: 0.5 for n in bench.HEADLINE}}}
    (tmp_path / "BENCH_r08.json").write_text(json.dumps(own))
    (tmp_path / "BENCH_r09.json").write_text(json.dumps(own))
    monkeypatch.setattr(bench.os.path, "abspath",
                        lambda _p: str(tmp_path / "bench.py"))
    prev, src = bench._prev_round_queries()
    assert set(prev) == set(bench.HEADLINE) and src == 9


def test_prev_round_excludes_only_own_round_when_verdict_labels_it(
        tmp_path, monkeypatch):
    """r11 verdict item 6: with VERDICT.md present (the committed-repo
    case), "own artifact" is identified by ROUND NUMBER — a stable
    headline compares against LAST round's artifact, correctly
    labeled, instead of reaching past it to the newest differing set."""
    import importlib

    bench = importlib.import_module("bench")
    same = {"parsed": {"queries": {n: 0.5 for n in bench.HEADLINE}}}
    older = {"queries": {"q1_pricing_summary": 1.0, "dropped_query": 2.0}}
    (tmp_path / "BENCH_r10.json").write_text(json.dumps(older))
    (tmp_path / "BENCH_r11.json").write_text(json.dumps(same))
    (tmp_path / "BENCH_r12.json").write_text(json.dumps(same))
    (tmp_path / "VERDICT.md").write_text("# VERDICT — Round 11\n")
    monkeypatch.setattr(bench.os.path, "abspath",
                        lambda _p: str(tmp_path / "bench.py"))
    prev, src = bench._prev_round_queries()
    # current round = 11 + 1 = 12 → r12 is own; r11 is the previous
    # round even though its set equals HEADLINE.
    assert set(prev) == set(bench.HEADLINE) and src == 11
