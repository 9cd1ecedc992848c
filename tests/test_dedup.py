"""Semantic tests for dedup operators (beyond oracle parity)."""

from __future__ import annotations

from full_stack_big_data_spark.operators.dedup import (
    dedup_exact, dedup_minhash_lsh, dedup_ngram_jaccard, dedup_simhash,
)
from conftest import SF_SMOKE


def _pairs(df):
    return {(r.doc_a, r.doc_b) for r in df.collect()}


def test_exact_dedup_covers_all_docs(spark):
    out = dedup_exact(spark, SF_SMOKE)
    total = out.agg({"n_copies": "sum"}).collect()[0][0]
    assert total == 500  # every doc lands in exactly one hash group


def test_minhash_recall_against_exact_jaccard(spark):
    """LSH candidates must recover (nearly) all true near-dup pairs.

    With 8 bands × 2 rows, P(miss) at j=0.8 is (1-0.64)^8 ≈ 3e-4 per pair;
    the planted pairs sit at j≈0.95+ where the miss rate is ~1e-11, so we
    pin full recall."""
    truth = _pairs(dedup_ngram_jaccard(spark, SF_SMOKE))
    found = _pairs(dedup_minhash_lsh(spark, SF_SMOKE))
    assert truth, "testdata should contain planted near-dup pairs"
    assert found == truth


def test_simhash_finds_planted_pairs(spark):
    """Near-identical docs must land within the hamming threshold."""
    truth = _pairs(dedup_ngram_jaccard(spark, SF_SMOKE))
    found = _pairs(dedup_simhash(spark, SF_SMOKE))
    # simhash is a different similarity proxy; require high overlap, not
    # equality (it may add a few borderline pairs or drop j≈0.8 ones).
    assert len(found & truth) / len(truth) >= 0.9
