"""Physical-plan pins (SURVEY.md §4): the shapes we rely on at 100 TB.

The reference hand-tunes its physical layer (Kryo, sort shuffle, producer
pools — §4 table); in this engine Catalyst owns those choices, so these
tests pin the *outcomes*: dimension joins stay broadcast, predicates reach
the parquet scan, projection prunes the read schema, and no plan silently
degenerates to a cartesian product.
"""

from __future__ import annotations

import pytest

from full_stack_big_data_spark.operators.registry import load_all
from full_stack_big_data_spark.plans.checks import (
    assert_broadcast_join,
    assert_no_cartesian,
    assert_pushed_filters,
    assert_read_schema_only,
    plan_string,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def reg():
    return load_all()


def test_q5_broadcasts_dims(spark, reg):
    """nation/region/supplier are broadcast, never shuffled (Q5 star join)."""
    assert_broadcast_join(reg["q5_local_supplier_volume"].builder(spark, SF))


def test_q9_broadcasts_part(spark, reg):
    assert_broadcast_join(reg["q9_product_profit"].builder(spark, SF))


def test_q2_filter_pushdown(spark, reg):
    """o_orderstatus/o_totalprice predicates reach the parquet scan."""
    assert_pushed_filters(reg["q2_filter_project"].builder(spark, SF), "o_orderstatus")
    assert_pushed_filters(reg["q2_filter_project"].builder(spark, SF), "o_totalprice")


def test_q6_filter_pushdown(spark, reg):
    """Q6's shipdate/discount/quantity predicates all push into the scan."""
    df = reg["q6_forecast_revenue"].builder(spark, SF)
    assert_pushed_filters(df, "l_shipdate")
    assert_pushed_filters(df, "l_discount")
    assert_pushed_filters(df, "l_quantity")


def test_q2_column_pruning(spark, reg):
    """The orders scan reads only the three referenced columns."""
    assert_read_schema_only(
        reg["q2_filter_project"].builder(spark, SF), "orders.parquet",
        {"o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"})


def test_q1_column_pruning(spark, reg):
    """Q1 reads no lineitem columns beyond the 7 it aggregates."""
    assert_read_schema_only(
        reg["q1_pricing_summary"].builder(spark, SF), "lineitem.parquet",
        {"l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
         "l_discount", "l_tax", "l_shipdate"})


@pytest.mark.parametrize("name", [
    "q3_shipping_priority", "q5_local_supplier_volume", "q7_volume_shipping",
    "q8_market_share", "q9_product_profit", "q10_returned_items",
    "q17_small_qty_revenue", "q18_large_volume", "q19_brand_discount",
])
def test_no_cartesian_products(spark, reg, name):
    assert_no_cartesian(reg[name].builder(spark, SF))


def test_semi_anti_join_shapes(spark, reg):
    """EXISTS/NOT EXISTS compile to semi/anti joins, not row explosion."""
    assert "LeftSemi" in plan_string(reg["q4_order_priority"].builder(spark, SF))
    assert "LeftAnti" in plan_string(reg["q22_dormant_customers"].builder(spark, SF))


def test_q3_takeordered(spark, reg):
    """Top-k compiles to TakeOrderedAndProject, not global sort."""
    plan = plan_string(reg["q3_shipping_priority"].builder(spark, SF))
    assert "TakeOrderedAndProject" in plan, plan[:3000]


def test_bucketed_join_no_exchange(spark, reg):
    """q_bucketed_join: the fact-fact join consumes bucketed scans with
    ZERO exchanges — the only shuffle in the whole plan is the final
    groupBy. This is the pin for "bucketing deletes the join shuffle"."""
    df = reg["q_bucketed_join"].builder(spark, SF)
    plan = plan_string(df, "simple")
    assert "SortMergeJoin" in plan, plan[:3000]
    assert plan.count("Bucketed: true") == 2, plan[:3000]
    assert plan.count("Exchange") == 1, plan[:3000]


def test_partitioned_interval_prunes(spark, reg):
    """q_partitioned_interval: the interval reaches the scan as a
    PARTITION filter on event_date (directories skipped), not only as a
    row predicate."""
    df = reg["q_partitioned_interval"].builder(spark, SF)
    plan = plan_string(df)
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and any("event_date" in ln for ln in pf), plan[:3000]


def test_map_only_operators_have_no_exchange(spark, reg):
    """text_repetition and doc_chunk_windows are pure map-side: their
    plans must contain ZERO exchanges at any corpus size — the property
    that makes them free at 100 TB."""
    for name in ("text_repetition", "doc_chunk_windows"):
        plan = plan_string(reg[name].builder(spark, SF))
        assert plan.count("Exchange") == 0, f"{name}:\n{plan[:3000]}"


def test_decontam_broadcasts_eval_grams(spark, reg):
    """The eval n-gram set joins the train side as a broadcast — the
    train corpus must never shuffle on gram."""
    assert_broadcast_join(reg["decontam_overlap"].builder(spark, SF))


def test_pack_sequences_single_shuffle(spark, reg):
    """Sequence packing shuffles exactly once (hash by packing bucket);
    a global-order formulation would both add an exchange and serialize
    the prefix-sum into one partition."""
    plan = plan_string(reg["pack_sequences"].builder(spark, SF), "simple")
    assert plan.count("Exchange") == 1, plan[:3000]
    assert "SinglePartition" not in plan, plan[:3000]


def test_funnel_pushes_event_type_filters(spark, reg):
    """Each funnel stage's event_type predicate reaches its parquet scan."""
    assert_pushed_filters(reg["q_funnel"].builder(spark, SF), "event_type")


def test_anomaly_broadcasts_stats(spark, reg):
    """The 5-row per-type stats table joins back as a broadcast; the
    outlier pass must stay a map-side filter over the event scan."""
    assert_broadcast_join(reg["q_anomaly_zscore"].builder(spark, SF))


def test_scd2_apply_no_shuffle(spark, reg):
    """SCD2 apply = broadcast CDC join + per-row explode: the plan may
    contain broadcast exchanges but NO hash-partitioned shuffle of the
    dimension."""
    plan = plan_string(reg["q_scd2_apply"].builder(spark, SF), "simple")
    assert "BroadcastHashJoin" in plan, plan[:3000]
    assert "Exchange hashpartitioning" not in plan, plan[:3000]


def test_interval_query_pushes_ts_to_scan(spark, reg):
    """Event-time predicates reach the parquet scan as PushedFilters on
    ``ts``. Guarded by the inferTimestampNTZ=false read path: events'
    naive-micros parquet reads as a plain TIMESTAMP column, so the
    interval is a scan-level min/max row-group prune instead of a
    post-scan filter over a computed column — at 100 TB the difference
    between reading ten days and reading the year."""
    assert_pushed_filters(reg["q_interval_query"].builder(spark, SF), "ts")


def test_corpus_shuffle_single_data_exchange(spark, reg):
    """The global enumeration never plans a corpus-sized single-partition
    pass: the row_number window is keyed by the range bucket (one hash
    exchange of the data), there is no sampling rangepartitioning pass,
    and the only SinglePartition exchange feeds the B-row offset cumsum."""
    plan = plan_string(reg["corpus_shuffle"].builder(spark, SF))
    assert "rangepartitioning" not in plan
    rn = [ln for ln in plan.splitlines()
          if "row_number()" in ln and "windowspecdefinition" in ln]
    assert rn and all("blk" in ln.split("windowspecdefinition")[1][:30] for ln in rn), rn


def test_asof_join_is_union_window_no_join(spark, reg):
    """The as-of join compiles to union + one keyed window — NO join
    operator at all (and so no range-explosion risk): the composition
    that keeps as-of linear at 100 TB."""
    plan = plan_string(reg["q_asof_join"].builder(spark, SF))
    assert "Join" not in plan, plan[:3000]
    assert "Window" in plan


def test_range_join_is_bucketed_broadcast_equijoin(spark, reg):
    """The range join executes as an equi-join on (key, bucket) with a
    residual interval filter — never a cartesian/range-nested-loop."""
    plan = plan_string(reg["q_range_join"].builder(spark, SF))
    assert "BroadcastHashJoin" in plan, plan[:3000]
    assert "Cartesian" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_cdc_merge_single_shuffle_with_partial(spark, reg):
    """The CDC merge is ONE key exchange: max_by partials on the map side
    (SortAggregate — the struct-typed buffer rules out hash agg, but the
    partial/merge split is what matters: combiner before the wire), then
    the merge aggregate after. No per-key row_number window, no join."""
    import re
    plan = plan_string(reg["q_cdc_merge"].builder(spark, SF))
    # formatted mode prints each node twice (tree line + detail header);
    # count the detail headers, which occur exactly once per node
    n_exch = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exch == 1, plan[:3000]
    assert "Window" not in plan, plan[:3000]
    n_agg = len(re.findall(r"\(\d+\) SortAggregate", plan))
    assert n_agg == 2, plan[:3000]  # partial + merge


def test_random_projection_map_only(spark, reg):
    """16 zip_with/aggregate folds stay whole-stage-codegen map work:
    zero exchanges at any corpus size."""
    plan = plan_string(reg["emb_random_projection"].builder(spark, SF))
    assert plan.count("Exchange") == 0, plan[:3000]


def test_sample_weighted_heap_topk(spark, reg):
    """The weighted sample is a distributed heap top-k, never a global
    sort. Since grouped_topk's native-path dispatch (round 6), the
    constant-group rank filter compiles to TakeOrderedAndProject —
    per-partition heaps + one k-row merge, ZERO exchanges — with the
    rank window running over only the k survivors. (Previously: salted
    two-phase with a WindowGroupLimit and up to 2 exchanges; the new
    plan strictly dominates it.)"""
    plan = plan_string(reg["sample_weighted"].builder(spark, SF))
    assert "TakeOrderedAndProject" in plan, plan[:3000]
    assert plan.count("Exchange") == 0, plan[:3000]


def test_bm25_scoring_is_map_only_with_takeordered(spark, reg):
    """retrieval.py::text_bm25_topk — corpus stats broadcast as one row;
    scoring adds NO row-level join or extra shuffle; ranking is
    TakeOrdered, never a global sort."""
    plan = plan_string(reg["text_bm25_topk"].builder(spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastExchange") >= 1


def test_runtime_bloom_filter_injects_on_selective_join(spark):
    """Scale posture: Spark's runtime row-level filtering can guard the
    fact side of a selective fact-fact join with a bloom filter built
    from the small side — the 100 TB lever that prunes shuffle input
    before the exchange. Thresholds are lowered to fire on test data;
    on a cluster the defaults (10 MB creation side) govern."""
    from pyspark.sql import functions as F

    from full_stack_big_data_spark.engine.catalog import Catalog

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force shuffle join
    }
    before = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        cat = Catalog(spark, SF)
        li = cat.lineitem
        o = cat.orders.where(F.col("o_orderpriority") == "1-URGENT")
        j = li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_orderpriority").count()
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter" in plan.lower() or "mightcontain" in plan.lower(), plan[:2000]
    finally:
        for k, v in before.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_plan_audit_covers_every_batch_query(reg):
    """PLANAUDIT.md went stale twice (r3, r4 verdicts) because nothing
    failed when a new batch operator landed without an audit row. This
    diffs the committed audit against the live registry: every
    non-streaming registered query must have a row, and the audit must
    not carry rows for queries that no longer exist. Regenerate with
    `python scripts/plan_audit.py` on any failure."""
    import os
    import re

    path = os.path.join(os.path.dirname(__file__), "..", "PLANAUDIT.md")
    with open(path) as f:
        text = f.read()
    audited = set(re.findall(r"^\| (\w+) \|", text, flags=re.M)) - {"query", "scale"}
    batch = {n for n, spec in reg.items() if "streaming" not in spec.tags}
    stream = {n for n, spec in reg.items() if "streaming" in spec.tags}
    missing = sorted(batch - audited)
    stale = sorted(audited - batch - stream)
    assert not missing, f"batch queries missing from PLANAUDIT.md: {missing}"
    assert not stale, f"PLANAUDIT.md rows for unknown queries: {stale}"
    # r5 verdict item 2: the streaming entries need audit rows too (the
    # state-store section), same staleness discipline as batch
    missing_stream = sorted(stream - audited)
    assert not missing_stream, \
        f"streaming queries missing from PLANAUDIT.md state audit: {missing_stream}"
    assert "Streaming state audit" in text, \
        "PLANAUDIT.md lost its streaming section — regenerate"


def test_ann_persisted_index_lookup_prunes_partitions(spark):
    """The serving story ann_index_persist ships: a lookup against the
    persisted SRP index with a table_id predicate must PRUNE to that
    table's partition directory (PartitionFilters in the scan), so a
    single-bucket probe touches 1/16th of the index regardless of
    corpus size."""
    from pyspark.sql import functions as F
    from full_stack_big_data_spark.engine.catalog import Catalog
    from full_stack_big_data_spark.engine.scratch import scratch_dir
    from full_stack_big_data_spark.operators.similarity import srp_buckets

    e = srp_buckets(Catalog(spark, SF).embeddings)
    tbl = e.select("vec_id",
                   F.posexplode("buckets").alias("table_id", "bucket"))
    path = scratch_dir("fsbd_ann_index_plan_")
    tbl.write.mode("overwrite").partitionBy("table_id").parquet(path)
    lookup = (spark.read.parquet(path)
              .where((F.col("table_id") == 3) & (F.col("bucket") == 5)))
    plan = lookup._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "table_id" in plan.split(
        "PartitionFilters")[1][:200], plan[:1500]


def test_shuffle_audit_metric_extraction(spark, reg):
    """The measured-shuffle audit's metric walk (scripts/
    shuffle_audit.py) against two known shapes at smoke scale: a
    grouped aggregate must report real scanned + shuffled bytes, >= 1
    exchange and zero spill; a pure filter-project must report ZERO
    shuffled bytes and zero exchanges. Guards the py4j executed-plan
    walk (AQE unwrap, QueryStage unwrap, ReusedExchange skip) against
    Spark upgrades — if metric keys or wrapper classes change, the
    PLANAUDIT measured-volume section goes stale silently without this."""
    import importlib
    import os
    import sys

    root = os.path.join(os.path.dirname(__file__), "..")
    sys.path.insert(0, root)
    try:
        sa = importlib.import_module("scripts.shuffle_audit")
    finally:
        sys.path.remove(root)

    r = sa.measure(spark, reg["q1_pricing_summary"].builder, SF)
    assert r["scanned"] > 0, r
    assert r["shuffled"] > 0 and r["exchanges"] >= 1, r
    assert r["spilled"] == 0, r
    assert r["rows"] > 0, r

    r2 = sa.measure(spark, reg["q2_filter_project"].builder, SF)
    assert r2["scanned"] > 0, r2
    assert r2["shuffled"] == 0 and r2["exchanges"] == 0, r2


def test_ivf_persisted_index_serve_uses_static_partition_pruning(spark):
    """ann_ivf_index_persist stores the corpus cell-clustered and joins
    the broadcast probe set on the PARTITION column: the index scan
    must carry the probed-cell IN-list as a PartitionFilter so a serve
    reads only the probed cells' files (probes/C of the corpus) — the
    on-disk twin of the in-query variant's probes/C memory scan.
    STATIC since r14: the driver-built probe set makes the cell list a
    literal, so pruning happens at planning time (strictly stronger
    than the former runtime dynamicpruning subquery)."""
    from full_stack_big_data_spark.operators.registry import load_all

    reg = load_all()
    df = reg["ann_ivf_index_persist"].builder(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    idx_scans = [l for l in plan.splitlines()
                 if "fsbd_ivf_index" in l and "FileScan" in l]
    assert idx_scans, "index scan not found in plan"
    assert any("PartitionFilters" in l and ("INSET" in l or " IN (" in l)
               for l in idx_scans), idx_scans[0][:500]


def test_ivfpq_persisted_serve_static_pruning_and_no_generate(spark):
    """ann_ivfpq_index_persist's serve plan must (1) carry the
    probed-cell IN-list as a PartitionFilter on the codes scan — a
    query batch reads only probed cells' files, probes/C of the
    4-byte-code index (STATIC since r14, see the ivf pin above) —
    and (2) contain NO posexplode: r14's map-side ``_adc_fold``
    replaced the per-candidate code fan-out, so scoring is pure
    projection between the broadcast join and the top-k."""
    from full_stack_big_data_spark.operators.registry import load_all

    reg = load_all()
    df = reg["ann_ivfpq_index_persist"].builder(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    idx_scans = [l for l in plan.splitlines()
                 if "fsbd_ivfpq_index" in l and "FileScan" in l]
    assert idx_scans, "codes scan not found in plan"
    assert any("PartitionFilters" in l and ("INSET" in l or " IN (" in l)
               for l in idx_scans), idx_scans[0][:500]
    assert "posexplode" not in plan, "code fan-out resurfaced in ADC path"


def test_pq_adc_full_scan_is_fold_not_fanout(spark):
    """The full-scan ADC family (`_adc_search`: ann_pq_adc /
    _trained / ann_pq_persist) scores with the map-side ``_adc_fold``
    too (r14): no Generate (posexplode) fan-out of codes, no
    HashAggregate summing S fanned rows — scoring is pure projection
    after the broadcast of the per-query LUT arrays, and the only
    hash-partitioned exchange left is the top-k's."""
    from full_stack_big_data_spark.operators.registry import load_all

    reg = load_all()
    df = reg["ann_pq_adc"].builder(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Generate" not in plan, "code fan-out resurfaced in ADC path"
    assert "HashAggregate" not in plan, \
        "per-(query, vec) re-aggregation resurfaced in ADC path"


def test_phash_signature_stage_is_map_only(spark):
    """The perceptual-hash signature pipeline (render -> container
    decode -> 60-bit dHash) must be two chained Arrow passes with ZERO
    exchanges — the banded self-join downstream is the only shuffle the
    operator owns, so signature cost stays one corpus scan at any
    size."""
    from full_stack_big_data_spark.operators.multimodal import (
        _phash_signatures)

    plan = plan_string(_phash_signatures(spark, SF), mode="simple")
    assert "Exchange" not in plan, plan[:1500]
    assert plan.count("MapInPandas") == 2, plan[:1500]


def test_phash_signature_pred_filters_below_the_arrow_stages(spark):
    """The incremental/persist serve paths carve their dump out with
    _phash_signatures(pred=...): the doc_id predicate must sit BELOW
    both mapInPandas stages (on the documents scan), not above them —
    a post-UDF filter re-renders and re-hashes the ENTIRE corpus and
    discards the unwanted half (r9 ADVICE). Catalyst cannot push it
    down itself because doc_id is re-produced by the UDF."""
    from pyspark.sql import functions as F
    from full_stack_big_data_spark.operators.multimodal import (
        PHASH_INCR_MOD, PHASH_INCR_REM, _phash_signatures)

    df = _phash_signatures(
        spark, SF, pred=F.col("doc_id") % PHASH_INCR_MOD == PHASH_INCR_REM)
    plan = plan_string(df, mode="simple")
    lines = plan.splitlines()
    map_idx = [i for i, l in enumerate(lines) if "MapInPandas" in l]
    filt_idx = [i for i, l in enumerate(lines)
                if "Filter" in l and "doc_id" in l and f"% {PHASH_INCR_MOD}" in l]
    assert len(map_idx) == 2 and filt_idx, plan[:1500]
    # executedPlan prints top-down: a LATER line is DEEPER in the tree,
    # so the carve-out filter must print after both Arrow stages.
    assert min(filt_idx) > max(map_idx), plan[:1500]


def test_ivf_appended_index_serve_uses_static_partition_pruning(spark):
    """The appended-and-compacted index generation must serve exactly
    like the from-scratch one: broadcast probe set joined on the
    partition column with the probed-cell IN-list as a PartitionFilter
    (static since r14), so a serve reads only the probed cells' files
    no matter how many dumps were appended."""
    from pyspark.sql import functions as F
    from full_stack_big_data_spark.engine.catalog import Catalog
    from full_stack_big_data_spark.engine.scratch import scratch_dir
    from full_stack_big_data_spark.operators.similarity import (
        IVF_APPEND_MOD, _ivf_assigned, ivf_index_compact, ivf_index_serve)

    e = Catalog(spark, SF).embeddings
    path = scratch_dir("fsbd_ivf_append_plan_")
    _ivf_assigned(e.where(F.col("vec_id") % IVF_APPEND_MOD != 0)) \
        .write.mode("overwrite").partitionBy("cell").parquet(path)
    _ivf_assigned(e.where(F.col("vec_id") % IVF_APPEND_MOD == 0)) \
        .write.mode("append").partitionBy("cell").parquet(path)
    gen2 = scratch_dir("fsbd_ivf_append_plan_gen2_")
    ivf_index_compact(spark, path, gen2)
    plan = (ivf_index_serve(spark, SF, gen2)
            ._jdf.queryExecution().executedPlan().toString())
    idx_scans = [l for l in plan.splitlines()
                 if "gen2" in l and "FileScan" in l]
    assert idx_scans, "appended index scan not found in plan"
    assert any("PartitionFilters" in l and ("INSET" in l or " IN (" in l)
               for l in idx_scans), idx_scans[0][:500]


def test_point_fetch_prunes_directories_and_pushes_key(spark):
    """The gates' verify-payload fetch (engine.pointfetch): literal ids
    must reach the payload scan as BOTH a pk PartitionFilter (whole
    directories skipped) and a pushed key predicate (row-group
    skipping inside touched directories), and the files actually read
    must be only the touched pk directories — per-batch verify I/O ∝
    candidates, never the payload size (r10 verdict item 1)."""
    from pyspark.sql import functions as F
    from full_stack_big_data_spark.engine.pointfetch import (
        PF_PK_MOD, point_fetch, write_payload)
    from full_stack_big_data_spark.engine.scratch import scratch_dir

    path = scratch_dir("fsbd_pointfetch_plan_")
    write_payload(spark.range(0, 1000).select(
        F.col("id").alias("doc_id"), (F.col("id") * 7).alias("v")),
        "doc_id", path)
    got = point_fetch(spark, path, "doc_id", [3, 35, 67])
    plan = got._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters")[1][:300]
    assert "pk" in pf, plan[:1500]
    assert "PushedFilters" in plan and "doc_id" in plan.split(
        "PushedFilters")[1][:300], plan[:1500]
    # 3, 35, 67 share pk = 3 (mod 32): exactly ONE directory is read.
    files = {r[0] for r in
             got.select(F.input_file_name()).distinct().collect()}
    assert len(files) == 1 and all("pk=3" in f for f in files), files
    assert sorted(r.doc_id for r in got.collect()) == [3, 35, 67]
    # the empty id list reads zero files (constant-false prune)
    assert point_fetch(spark, path, "doc_id", []).count() == 0
    assert PF_PK_MOD == 32  # pk arithmetic above assumes the modulus


def test_gate_verify_fetches_never_scan_the_corpus(spark):
    """The r10 weak items, pinned closed: the text and embedding
    ingest gates' exact-verify subplans must read ONLY the payload
    artifact (pk-pruned point fetch) — a scan of documents.parquet or
    embeddings.parquet anywhere in the verify plan is the per-batch
    corpus pass the r10 verdict flagged."""
    from pyspark.sql import functions as F
    from full_stack_big_data_spark.operators.dedup import \
        minhash_payload_dir
    from full_stack_big_data_spark.operators.similarity import \
        srp_payload_dir
    from full_stack_big_data_spark.streaming.joins import (
        _cosine_verify_hits, _jaccard_verify_hits)

    text_payload = minhash_payload_dir(spark, SF)
    cand = spark.createDataFrame(
        [(0, 999001), (4, 999002)], "old_doc long, doc_id long")
    sh_new = spark.createDataFrame(
        [(999001, ["a b c"]), (999002, ["d e f"])],
        "doc_id long, s array<string>")
    hits = _jaccard_verify_hits(spark, cand, sh_new, text_payload)
    plan = hits._jdf.queryExecution().executedPlan().toString()
    assert "documents.parquet" not in plan, plan[:2000]
    assert "PartitionFilters" in plan and "pk" in plan.split(
        "PartitionFilters")[1][:300], plan[:2000]

    # Two-tier path (r11 verdict item 2): the hash-screen tier and the
    # raw-text tier are BOTH point fetches — still no corpus scan
    # anywhere in the verify, and the tier-1 screen runs pk-pruned.
    from full_stack_big_data_spark.operators.dedup import (
        doc_text_payload_dir, minhash_hash_payload_dir)
    hpay = minhash_hash_payload_dir(spark, SF)
    tpay = doc_text_payload_dir(spark, SF)
    scope = []
    try:
        hits2 = _jaccard_verify_hits(spark, cand, sh_new, None,
                                     hpay, tpay, scope=scope)
        plan2 = hits2._jdf.queryExecution().executedPlan().toString()
        assert "documents.parquet" not in plan2, plan2[:2000]
        assert scope, "tier-1 screen did not run"
        splan = scope[0]._jdf.queryExecution().executedPlan().toString()
        assert "documents.parquet" not in splan, splan[:2000]
        assert "PartitionFilters" in splan and "pk" in splan.split(
            "PartitionFilters")[1][:300], splan[:2000]
    finally:
        for df in scope:
            df.unpersist()

    emb_payload = srp_payload_dir(spark, SF)
    ecand = spark.createDataFrame(
        [(999001, 1), (999002, 2)], "vec_id long, old_id long")
    batch = spark.createDataFrame(
        [(999001, [0.1] * 64), (999002, [0.2] * 64)],
        "vec_id long, embedding array<float>")
    ehits = _cosine_verify_hits(spark, ecand, batch, emb_payload)
    eplan = ehits._jdf.queryExecution().executedPlan().toString()
    assert "embeddings.parquet" not in eplan, eplan[:2000]
    assert "PartitionFilters" in eplan and "pk" in eplan.split(
        "PartitionFilters")[1][:300], eplan[:2000]

    # Two-tier path (r12 verdict item 2): the quantized int16 screen
    # tier and the float tier are BOTH point fetches — still no corpus
    # scan anywhere in the verify, and the tier-1 screen runs pk-pruned.
    from full_stack_big_data_spark.operators.similarity import \
        srp_quant_payload_dir
    eqpay = srp_quant_payload_dir(spark, SF)
    escope = []
    try:
        ehits2 = _cosine_verify_hits(spark, ecand, batch, emb_payload,
                                     quant_payload_path=eqpay,
                                     scope=escope)
        eplan2 = ehits2._jdf.queryExecution().executedPlan().toString()
        assert "embeddings.parquet" not in eplan2, eplan2[:2000]
        assert escope, "tier-1 screen did not run"
        esplan = escope[0]._jdf.queryExecution().executedPlan().toString()
        assert "embeddings.parquet" not in esplan, esplan[:2000]
        assert "PartitionFilters" in esplan and "pk" in esplan.split(
            "PartitionFilters")[1][:300], esplan[:2000]
    finally:
        for df in escope:
            df.unpersist()


def test_fetch_payload_falls_back_past_the_id_gate(spark):
    """fetch_payload's two regimes return the same rows: the pushed-
    literal point fetch under the driver gate, the broadcast join
    against the payload past it (forced via a tiny max gate through
    fetch_ids' contract)."""
    from pyspark.sql import functions as F
    from full_stack_big_data_spark.engine import pointfetch as pf
    from full_stack_big_data_spark.engine.scratch import scratch_dir

    path = scratch_dir("fsbd_pointfetch_fallback_")
    pf.write_payload(spark.range(0, 500).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")), "k", path)
    ids_df = spark.range(0, 100).select((F.col("id") * 5).alias("k"))
    # gate not exceeded → literal path
    assert pf.fetch_ids(ids_df, "k", max_ids=200) == [
        i * 5 for i in range(100)]
    # gate exceeded → None → fetch_payload joins instead
    assert pf.fetch_ids(ids_df, "k", max_ids=50) is None
    via_join = (spark.read.parquet(path).drop("pk")
                .join(F.broadcast(ids_df), "k"))
    via_literal = pf.point_fetch(
        spark, path, "k", [i * 5 for i in range(100)])
    assert (sorted(map(tuple, via_join.collect()))
            == sorted(map(tuple, via_literal.collect())))


def test_dedup_incremental_two_tier_artifacts(spark):
    """r12 verdict item 7: the batch incremental-dedup entry shares
    the streaming gate's verify I/O discipline — candidates from the
    STORED band index, tier-1 int32-hash screen + tier-2 raw-text
    point fetches (both pk-pruned), and the retired one-tier
    pre-exploded shingle-string payload nowhere in the plan."""
    from full_stack_big_data_spark.operators.registry import load_all

    reg = load_all()
    df = reg["dedup_incremental"].builder(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "fsbd_minhash_index_" in plan, plan[:2000]      # stored index
    assert "fsbd_minhash_hash_payload_" in plan, plan[:2000]   # tier 1
    assert "fsbd_doc_text_payload_" in plan, plan[:2000]       # tier 2
    assert "fsbd_minhash_payload_" not in plan, \
        "one-tier shingle-string payload back on a registered path"
    # both payload fetches ride the pk-partitioned point-fetch layout
    assert plan.count("PartitionFilters") >= 2, plan[:2000]


def test_pagerank_dangling_mass_is_join_free(spark):
    """r14: dangling-ness (no out-degree) is a loop invariant, computed
    once as a boolean column of the persisted node table — each
    iteration's dangling-mass aggregate must be filter + SUM over the
    cached rank frame, with NO per-iteration anti-join (and no rank
    join) feeding the 1-row funnel. Pinned on the analyzed plan: the
    unrolled lineage must contain the invariant `dang` filter and zero
    LeftAnti joins."""
    from full_stack_big_data_spark.operators.registry import load_all

    # the unrolled 3-iteration lineage overflows the engine's 100k
    # plan-string cap, which would silently blank the assertion
    old_cap = spark.conf.get("spark.sql.maxPlanStringLength")
    spark.conf.set("spark.sql.maxPlanStringLength", "8000000")
    try:
        reg = load_all()
        df = reg["q_pagerank"].builder(spark, SF)
        plan = df._jdf.queryExecution().analyzed().toString()
        assert len(plan) < 8000000, "raise the cap: plan truncated"
        assert "LeftAnti" not in plan, \
            "per-iteration dangling anti-join resurfaced"
        assert "dang" in plan, "dangling flag missing from node table"
    finally:
        spark.conf.set("spark.sql.maxPlanStringLength", old_cap)
