"""Semantic tests for multimodal plumbing beyond oracle parity."""

from __future__ import annotations

from full_stack_big_data_spark.operators.multimodal import FRAME_BYTES, frame_rows


def test_frame_rows_empty_and_short_payloads(spark):
    """Empty text must yield ZERO frames (Spark's sequence(1, 0) is the
    descending [1, 0] — unguarded it fabricates two frames; the DuckDB
    oracle's range(1, 1) yields none). Sub-stride text yields exactly
    one frame."""
    d = spark.createDataFrame(
        [(1, ""), (2, "x"), (3, "y" * FRAME_BYTES), (4, "z" * (FRAME_BYTES + 1))],
        "doc_id long, text string")
    rows = frame_rows(d).collect()
    per_doc = {}
    for r in rows:
        per_doc[r.doc_id] = per_doc.get(r.doc_id, 0) + 1
    assert 1 not in per_doc          # empty payload: no frames at all
    assert per_doc[2] == 1
    assert per_doc[3] == 1
    assert per_doc[4] == 2
    assert all(r.frame_idx >= 0 for r in rows)
