"""Partitioning invariance: the engine's results must not depend on how
many partitions a shuffle lands in (the claim behind DECIMAL-exact
accumulation and hash-membership sampling — README "Scale posture").

On a cluster the partition count is an ops knob that changes with AQE,
executor count, and data volume; any result drift across partitioning is
a silent correctness bug at 100 TB. We re-run representative queries —
decimal aggregation, window prefix-sum, two-pass heavy hitters,
bucket-offset global enumeration, LSH banding — under deliberately
mismatched ``spark.sql.shuffle.partitions`` and require row-identical
results (not approximately equal: identical)."""

from __future__ import annotations

import pytest

from full_stack_big_data_spark.operators.registry import load_all
from conftest import SF_SMOKE

QUERIES = [
    "q1_pricing_summary",      # DECIMAL-exact additive aggregation
    "q_sessionize",            # window lag + running sum over a shuffle
    "q_heavy_hitters",         # bounded-memory candidate pass + recount
    "corpus_shuffle",          # bucket-offset global enumeration
    "dedup_minhash_lsh",       # banded LSH candidate generation
    "sample_stratified",       # hash-membership sampling
    "q_cdc_merge",             # max_by latest-wins merge (unique versions)
    "sample_weighted",         # race-key top-k across salt buckets
    "ann_incremental",         # bucket-index join + per-query top-k
    "q_attribution_last_touch",  # as-of carry-forward window
    "sample_domain_cap",       # per-domain quota via salted top-k
    "sample_temperature",      # integer alpha-weights + hash-rank cutoff
    "bpe_train_merges",        # argmax-merge loop over the word table
    "vocab_build",             # TakeOrdered top-V + bounded 1P window
    "text_boilerplate_ngrams",  # doc-frequency threshold vs broadcast scalar
    "layout_zorder",           # range-partitioned rewrite + filtered read-back
    "tokenize_corpus",         # position-weighted checksum pins sequence order
    "emb_kmeans_step",         # integer partial vector sums in any order
    "emb_label_outliers",      # n^2-scaled integer distance ranking
    "text_bm25_topk",          # broadcast-stats scoring + TakeOrdered
    "emb_pq_encode",           # map-only integer codes
    "ann_pq_adc",              # LUT-join partial sums + salted top-k
    "dedup_span_stats",        # gram-keyed mark-join + per-doc re-agg
    "dedup_span_rewrite",      # covered-position set + ordered rebuild
    "text_lm_score",           # pre-quantized log-prob integer sums
    "emb_pca_power_iter",      # iterated integer matvec + trunc rescale
    "q_triangle_count",        # degree-oriented wedge join
    "emb_cell_representatives",  # broadcast-centroid dot + max_by argmax
    "q_skyline_2d",            # bucketed two-phase Pareto frontier
    "emb_knn_graph",           # bucket-collision candidates + per-src window
    "q_feature_binning_equidepth",  # broadcast quartile bounds, map-side bins
    "emb_pca_second_component",  # integer deflation + rescale + power loop
    "dedup_editdistance",      # freq-ranked prefix join + levenshtein verify
    "q_sketch_bloom",          # distinct-bit build + broadcast probe counts
    "emb_pq_train",            # per-(sub,cell) integer dim sums in any order
    "ann_pq_adc_trained",      # trained-artifact fetch + LUT partial sums
    "q_delete_propagation",    # cascading anti-joins + modular checksum
    "q_ewma_daily",            # dyadic-integer banded self-join sums
    # round 9
    "multimodal_phash_neardup_scaled",  # Arrow-pass signature + banded hamming join
    "multimodal_phash_apply",  # component loop + broadcast anti-join checksums
    "ann_ivf_index_append",    # append + compaction + DPP serve, any layout
]


def _rows(spark, name):
    df = load_all()[name].builder(spark, SF_SMOKE)
    return sorted(map(tuple, df.collect()))


@pytest.mark.parametrize("name", QUERIES)
def test_result_invariant_under_shuffle_partitions(spark, name):
    key = "spark.sql.shuffle.partitions"
    before = spark.conf.get(key)
    try:
        spark.conf.set(key, "5")
        a = _rows(spark, name)
        spark.conf.set(key, "64")
        b = _rows(spark, name)
    finally:
        spark.conf.set(key, before)
    assert a == b, f"{name} drifted across shuffle partitioning"
    assert a, f"{name} returned no rows at {SF_SMOKE}"
