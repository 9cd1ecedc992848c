"""Semantic tests for the pipeline operators (oracle parity is covered
for all of them by test_oracle_parity.py; these pin the properties the
oracle can't state)."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from full_stack_big_data_spark.engine.catalog import Catalog
from full_stack_big_data_spark.operators.pipeline import (
    HH_PER_MILLE, SESSION_GAP_US, _mg_candidates, q_heavy_hitters,
    q_sessionize, emb_quantize,
)
from full_stack_big_data_spark.functions.text import tokens
from conftest import SF_SMOKE


def test_sessionize_gap_invariant(spark):
    """Within a session every consecutive gap is ≤ 30 min; consecutive
    sessions of one user are separated by > 30 min. Reconstructed from
    the raw events, not from the operator's own output."""
    ev = sorted(
        Catalog(spark, SF_SMOKE).events
        .select("user_id", F.unix_micros("ts").alias("us"), "event_id").collect(),
        key=lambda r: (r.user_id, r.us, r.event_id),
    )
    expected = defaultdict(int)  # user -> session count
    prev = {}
    for r in ev:
        if r.user_id not in prev or r.us - prev[r.user_id] > SESSION_GAP_US:
            expected[r.user_id] += 1
        prev[r.user_id] = r.us
    got = {r.user_id: r.n for r in
           q_sessionize(spark, SF_SMOKE).groupBy("user_id")
           .agg(F.count("*").alias("n")).collect()}
    assert got == dict(expected)


def test_sessionize_partitions_events_completely(spark):
    """Session n_events sum to the events table count (no event dropped
    or double-assigned)."""
    sessions = q_sessionize(spark, SF_SMOKE)
    total = sessions.agg(F.sum("n_events")).first()[0]
    assert total == Catalog(spark, SF_SMOKE).events.count()


def test_mg_candidates_superset_of_heavy(spark):
    """The bounded-memory candidate pass must never lose a true heavy
    hitter (the no-false-negative bound in _mg_candidates' docstring) —
    the exact recount can only remove, not resurrect."""
    d = Catalog(spark, SF_SMOKE).documents
    toks = d.select(F.explode(tokens("text")).alias("tok"))
    exact = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    n = toks.count()
    heavy = {r.tok for r in exact.where(F.col("cnt") * 1000 >= n * HH_PER_MILLE).collect()}
    cand = {r.tok for r in _mg_candidates(toks).collect()}
    assert heavy <= cand
    got = {r.tok for r in q_heavy_hitters(spark, SF_SMOKE).collect()}
    assert got == heavy


def test_quantize_reconstruction_bound(spark):
    """Dequantized values are within half a quantization step of the
    original, and every code is in [-127, 127]."""
    e = Catalog(spark, SF_SMOKE).embeddings.limit(50)
    src = {r.vec_id: r.embedding for r in e.collect()}
    out = {r.vec_id: r for r in
           emb_quantize(spark, SF_SMOKE).where(F.col("vec_id").isin(*src)).collect()}
    import math
    for vid, emb in src.items():
        row = out[vid]
        mx = max(abs(float(x)) for x in emb)
        if mx == 0:
            continue
        scale = 127.0 / mx
        qv = [math.floor(float(x) * scale + 0.5) for x in emb]
        assert all(-127 <= c <= 127 for c in qv)
        step = 1.0 / scale
        assert all(abs(float(x) - c / scale) <= step / 2 + 1e-12
                   for x, c in zip(emb, qv))
        assert row.q_sum == sum(qv)


def test_chunk_windows_cover_every_token(spark):
    """No silent tail loss: for every document the last chunk must reach
    the final token (max over chunks of start-offset + chunk length ==
    token count), and consecutive chunks overlap by W−S tokens."""
    from pyspark.sql import functions as F
    from full_stack_big_data_spark.engine.catalog import Catalog
    from full_stack_big_data_spark.functions.text import tokens
    from full_stack_big_data_spark.operators.pipeline import (
        CHUNK_S, CHUNK_W, doc_chunk_windows,
    )

    chunks = doc_chunk_windows(spark, SF_SMOKE)
    reach = (chunks.groupBy("doc_id")
             .agg(F.max(F.col("chunk_idx") * CHUNK_S
                        + F.col("n_chunk_tokens")).alias("covered")))
    n_tok = (Catalog(spark, SF_SMOKE).documents
             .select("doc_id", F.size(tokens("text")).alias("n")))
    bad = (reach.join(n_tok, "doc_id")
           .where(F.col("covered") != F.col("n")).count())
    assert bad == 0
    # every chunk except a doc's last is exactly W tokens
    w = (chunks.groupBy("doc_id").agg(F.max("chunk_idx").alias("last")))
    short_nonlast = (chunks.join(w, "doc_id")
                     .where((F.col("chunk_idx") != F.col("last"))
                            & (F.col("n_chunk_tokens") != CHUNK_W)).count())
    assert short_nonlast == 0
