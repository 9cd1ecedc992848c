"""Temperature mixture semantics (operators/sampling.sample_temperature).

Oracle parity is replayed by the gauntlet; these pin the PROPERTIES the
operator exists for — head-language share shrinks toward the tail under
alpha = 0.5, the budget is respected, and membership is append-stable."""

from __future__ import annotations

from full_stack_big_data_spark.operators.registry import load_all

SF = "/root/testdata/sf0.01"


def _mix(spark):
    reg = load_all()
    return {r.lang: r.asDict()
            for r in reg["sample_temperature"].builder(spark, SF).collect()}


def test_head_share_shrinks_tail_share_grows(spark):
    mix = _mix(spark)
    n = sum(m["n_docs"] for m in mix.values())
    kept = sum(m["n_kept"] for m in mix.values())
    head = max(mix.values(), key=lambda m: m["n_docs"])
    tail = min(mix.values(), key=lambda m: m["n_docs"])
    # alpha = 0.5 compresses the mixture: the head language's share of
    # the SAMPLE is strictly below its corpus share, the tail's above.
    assert head["n_kept"] / kept < head["n_docs"] / n
    assert tail["n_kept"] / kept > tail["n_docs"] / n


def test_budget_and_caps(spark):
    mix = _mix(spark)
    n = sum(m["n_docs"] for m in mix.values())
    kept = sum(m["n_kept"] for m in mix.values())
    # floor-division targets never exceed the budget; they can undershoot
    # by at most one doc per language.
    assert kept <= n // 2
    assert kept >= n // 2 - len(mix)
    for m in mix.values():
        assert m["n_kept"] == min(m["n_target"], m["n_docs"])


def test_membership_is_a_hash_order_prefix(spark):
    """The kept set must be exactly the first n_target docs of each
    language in content-hash order (reconstructed independently here
    via the same keyed hash) — the property that makes membership
    layout-independent and append-stable (hash-later arrivals rank
    behind every already-kept doc)."""
    from pyspark.sql import functions as F

    from full_stack_big_data_spark.engine.catalog import Catalog
    from full_stack_big_data_spark.functions.hashing import hex64

    d = Catalog(spark, SF).documents
    h = hex64(F.concat(F.lit("temp|"), F.col("doc_id").cast("string")))
    ranked = (d.select("lang", "doc_id", "n_chars").withColumn("h", h)
              .sort("lang", "h", "doc_id").collect())
    by_lang: dict[str, list] = {}
    for r in ranked:
        by_lang.setdefault(r.lang, []).append(r)
    mix = _mix(spark)
    for lang, m in mix.items():
        prefix = by_lang[lang][: m["n_target"]]
        assert len(prefix) == m["n_kept"]
        assert sum(r.n_chars for r in prefix) == m["chars_kept"]
