"""BPE training loop (operators/textanalysis.bpe_train_merges).

The oracle-parity gauntlet already replays the registered query against
its unrolled DuckDB twin; these tests pin the SEMANTICS with
hand-computed corpora — in particular the one place BPE implementations
quietly diverge: greedy application over runs of identical symbols
("aaaa" + merge (a,a) must become [aa, aa], leftmost non-overlapping,
never [aa, a, a])."""

from __future__ import annotations

from full_stack_big_data_spark.operators.registry import load_all

SF = "/root/testdata/sf0.001"


def _train_on(spark, tmp_path, docs):
    d = tmp_path / "corpus"
    (spark.createDataFrame(
        [(i, t, "en", "test", len(t)) for i, t in enumerate(docs)],
        "doc_id long, text string, lang string, source string, n_chars long")
     .write.parquet(str(d / "documents.parquet")))
    reg = load_all()
    return sorted(map(tuple,
                      reg["bpe_train_merges"].builder(spark, str(d)).collect()))


def test_hand_computed_merge_sequence(spark, tmp_path):
    # corpus: aa x3, b x1.
    # step 1 pairs: (a,a):3, (a,_):3, (b,_):1 — tie broken lexicographic,
    #   '_' < 'a', so (a,_) wins.
    # step 2: (a,a_):3 beats (b,_):1.  step 3: only (b,_):1 left.
    # step 4: every word is one symbol -> no pairs -> steps 4..8 empty.
    got = _train_on(spark, tmp_path, ["aa aa aa b"])
    assert got == [
        (1, "a", "_", "a_", 3),
        (2, "a", "a_", "aa_", 3),
        (3, "b", "_", "b_", 1),
    ]


def test_greedy_apply_over_symbol_runs(spark, tmp_path):
    # THE divergence trap: "aaaa" -> [a,a,a,a,_]; merge (a,a) has count
    # 3 (three adjacent occurrences) but greedy leftmost application
    # yields [aa, aa, _] — two merges, not one, and never [aa, a, a, _].
    # The step-2/3 rows are only reachable through that exact apply.
    got = _train_on(spark, tmp_path, ["aaaa"])
    assert got == [
        (1, "a", "a", "aa", 3),
        (2, "aa", "_", "aa_", 1),
        (3, "aa", "aa_", "aaaa_", 1),
    ]


def test_tokenize_apply_survives_exhausted_vocabulary(spark, tmp_path):
    # "aaaa" fully merges by step 3; steps 4..8 have an EMPTY argmax.
    # The left-join apply must carry the word table through those empty
    # rounds — the corpus tokenizes to its single fused symbol, it does
    # not vanish.
    d = tmp_path / "corpus"
    (spark.createDataFrame([(0, "aaaa", "en", "test", 4)],
                           "doc_id long, text string, lang string, "
                           "source string, n_chars long")
     .write.parquet(str(d / "documents.parquet")))
    reg = load_all()
    got = sorted(map(tuple,
                     reg["bpe_tokenize_apply"].builder(spark, str(d)).collect()))
    assert got == [("aaaa_", 1)]


def test_tokenize_histogram_reflects_the_final_merge(spark):
    # The step-8 merged symbol is created cnt_8 times and nothing after
    # step 8 can consume it, so the tokenizer's histogram must report
    # exactly that count for it.
    reg = load_all()
    merges = sorted(map(tuple,
                        reg["bpe_train_merges"].builder(spark, SF).collect()))
    last = merges[-1]
    hist = {r.token: r.cnt
            for r in reg["bpe_tokenize_apply"].builder(spark, SF).collect()}
    assert hist[last[3]] == last[4]


def test_trainer_consistency_on_the_fixture_corpus(spark):
    reg = load_all()
    merges = sorted(map(tuple,
                        reg["bpe_train_merges"].builder(spark, SF).collect()))
    assert len(merges) == 8
    # pre-merge pair counts are non-increasing across BPE steps (a
    # merge can only create pairs bounded by the merged pair's count)
    cnts = [m[4] for m in merges]
    assert cnts == sorted(cnts, reverse=True)
    # merged symbols are unique — re-merging an existing pair would
    # mean the apply step failed to consume it
    assert len({m[3] for m in merges}) == 8
    # step-1 merge == bpe_pair_counts rank 1
    top = {r.rank: (r.pair, r.cnt)
           for r in reg["bpe_pair_counts"].builder(spark, SF).collect()}
    assert (merges[0][1] + merges[0][2], merges[0][4]) == top[1]


def test_persist_serves_identical_tokens_from_disk(spark):
    """bpe_merges_persist must (a) scan the stored artifact, not a
    retraining lineage, and (b) produce exactly bpe_tokenize_apply's
    histogram — the persisted-artifact round-trip proof."""
    reg = load_all()
    inline = sorted(map(tuple,
                        reg["bpe_tokenize_apply"].builder(spark, SF).collect()))
    served = sorted(map(tuple,
                        reg["bpe_merges_persist"].builder(spark, SF).collect()))
    assert served == inline
    # the serve plan reads the parquet artifact (train-once economics):
    # a parquet relation bearing the merge-table schema, reachable only
    # through the stored artifact ('merged' never appears in the
    # tokenize path's own lineage)
    plan = reg["bpe_merges_persist"].builder(spark, SF) \
        ._jdf.queryExecution().optimizedPlan().toString()
    assert "merged#" in plan and "parquet" in plan
