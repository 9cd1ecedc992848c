"""Verify-fetch I/O measurement for the ingest gates (r10 verdict
item 1): the text/embedding gates' exact-verify used to broadcast-join
candidate ids into an UNPRUNED corpus scan every micro-batch; they now
point-fetch a pk-partitioned payload artifact (engine.pointfetch).
This probe reconstructs each gate's per-batch verify input exactly as
the foreachBatch body builds it (availableNow over the one-file feed =
one micro-batch = the whole new partition) and measures the bytes the
point fetch actually touches vs the payload's (and the raw corpus's)
total — the "per-batch I/O ∝ candidates, never the corpus" claim, as
file bytes.

Usage: python scripts/gate_io_probe.py [sf_dir]   (default sf0.1)
"""

from __future__ import annotations

import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from pyspark.sql import functions as F

from full_stack_big_data_spark.engine.catalog import Catalog
from full_stack_big_data_spark.engine.pointfetch import (fetch_ids,
                                                         point_fetch)
from full_stack_big_data_spark.engine.session import get_spark


def _tree_bytes(path: str) -> tuple[int, int]:
    files = n = 0
    for root, _dirs, names in os.walk(path):
        for f in names:
            if f.endswith(".parquet"):
                files += os.path.getsize(os.path.join(root, f))
                n += 1
    return files, n


def _touched_bytes(payload_path: str, key: str,
                   ids: list[int]) -> tuple[int, int, int, int]:
    """(touched bytes, touched row groups, total bytes, total row
    groups) a stats-pruning parquet reader must read for ``ids``: a
    row group is touched iff some candidate id falls in its key
    [min, max] — the per-value rule Spark's pushed parquet-native In
    filter evaluates against row-group statistics. point_fetch raises
    spark.sql.parquet.pushdown.inFilterThreshold to PF_IN_MAX for
    every literal fetch it issues (r11 ADVICE: at the DEFAULT
    threshold of 10, k > 10 ids degrade to a [min, max] RANGE push and
    this arithmetic would overstate the reader's pruning — with the
    raise, the k = 16/64/256 rows below match the reader's actual
    rule). Past PF_IN_MAX ids, fetch_payload switches to the
    broadcast-join fallback where ONLY the pk directory prune applies
    — this arithmetic mirrors that regime too (every row group in a
    touched directory counts), so each row reports what the reader's
    actual regime reads. pk directories no id maps to are never
    opened at all (PartitionFilters). Computed from parquet footers
    via pyarrow so the measurement is reader-independent."""
    import bisect

    import pyarrow.parquet as pq

    from full_stack_big_data_spark.engine.pointfetch import (PF_IN_MAX,
                                                             PF_PK_MOD)

    per_value = len(ids) <= PF_IN_MAX
    pks = {i % PF_PK_MOD for i in ids}
    touched = t_rg = total = n_rg = 0
    for root, _dirs, names in os.walk(payload_path):
        pk_dir = next((int(p.split("=", 1)[1]) for p in root.split(os.sep)
                       if p.startswith("pk=")), None)
        for fname in names:
            if not fname.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(root, fname)).metadata
            key_idx = next(i for i in range(md.num_columns)
                           if md.row_group(0).column(i).path_in_schema == key)
            for g in range(md.num_row_groups):
                rg = md.row_group(g)
                sz = sum(rg.column(c).total_compressed_size
                         for c in range(md.num_columns))
                total += sz
                n_rg += 1
                if pk_dir is not None and pk_dir not in pks:
                    continue   # directory pruned: never opened
                if not per_value:
                    touched += sz   # join fallback: whole touched dir
                    t_rg += 1
                    continue
                st = rg.column(key_idx).statistics
                lo = bisect.bisect_left(ids, st.min)
                if lo < len(ids) and ids[lo] <= st.max:
                    touched += sz
                    t_rg += 1
    return touched, t_rg, total, n_rg


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="fsbd-gate-io-probe")
    spark.sparkContext.setLogLevel("ERROR")

    print("| gate | candidates | distinct old ids | payload bytes "
          "(row groups) | fetched bytes (row groups) | corpus bytes "
          "| fetch/payload | fetch/corpus |")
    print("|---|---|---|---|---|---|---|---|")

    # --- text gate: the micro-batch is the whole new partition -------
    from full_stack_big_data_spark.functions.text import token_ngrams, tokens
    from full_stack_big_data_spark.operators.dedup import (
        INCR_MOD, INCR_REM, JACCARD_THRESHOLD, SHINGLE_N, _band_rows,
        doc_text_payload_dir, hashed_shingle_cols,
        minhash_hash_payload_dir, minhash_index_dir, minhash_payload_dir)

    idx_path = minhash_index_dir(spark, sf)
    pay_path = minhash_payload_dir(spark, sf)   # r11 one-tier baseline
    hpay_path = minhash_hash_payload_dir(spark, sf)
    tpay_path = doc_text_payload_dir(spark, sf)
    batch = (Catalog(spark, sf).documents
             .where(F.col("doc_id") % INCR_MOD == INCR_REM)
             .select("doc_id", "text"))
    toks = (batch.select("doc_id", tokens("text").alias("toks"))
            .where(F.size("toks") >= SHINGLE_N))
    sh_new = toks.select(
        "doc_id",
        F.array_distinct(token_ngrams(F.col("toks"), SHINGLE_N)).alias("s"))
    idx = spark.read.parquet(idx_path)
    cand = (idx.alias("a").join(
                _band_rows(sh_new).alias("b"),
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bucket") == F.col("b.bucket")))
            .select(F.col("a.doc_id").alias("old_doc"),
                    F.col("b.doc_id").alias("doc_id")).distinct())
    n_cand = cand.count()
    ids = fetch_ids(cand.select(F.col("old_doc").alias("doc_id")), "doc_id")
    # correctness of the pruned fetch: rows back == ids asked for
    got = point_fetch(spark, hpay_path, "doc_id", ids).count()
    assert got == len(ids), (got, len(ids))
    cb = _corpus_bytes(os.path.join(sf, "documents.parquet"))

    # Two-tier verify I/O (r11 verdict item 2): tier 1 fetches int32
    # shingle hashes for every candidate; only pairs passing the
    # hash-jaccard screen (≈ true near-dups) open tier-2 raw-text row
    # groups. Rows: the tiers separately, then combined vs what the
    # r11 one-tier shingle-string fetch for all candidates read.
    hp = (point_fetch(spark, hpay_path, "doc_id", ids)
          .select(F.col("doc_id").alias("old_doc"),
                  F.col("hs").alias("ho"), F.col("n").alias("no"),
                  F.col("collide").alias("coll_o")))
    nh = (hashed_shingle_cols(sh_new)
          .select("doc_id", F.col("hs").alias("hn"),
                  F.col("n").alias("nn"), F.col("collide").alias("coll_n")))
    ih = F.size(F.array_intersect("ho", "hn"))
    keep = (F.col("coll_o") | F.col("coll_n")
            | (F.col("ih") / (F.col("no") + F.col("nn") - F.col("ih"))
               >= JACCARD_THRESHOLD))
    surv = sorted(r.old_doc for r in
                  (cand.join(hp, "old_doc").join(nh, "doc_id")
                   .select("old_doc", ih.alias("ih"), "no", "nn",
                           "coll_o", "coll_n")
                   .where(keep).select("old_doc").distinct().collect()))
    t1b, t1rg, hpb, hprg = _touched_bytes(hpay_path, "doc_id", ids)
    t2b, t2rg, tpb, tprg = _touched_bytes(tpay_path, "doc_id", surv)
    old_b, old_rg, spb, _ = _touched_bytes(pay_path, "doc_id", ids)
    print(f"| text tier-1 (int32 hash screen) | {n_cand} | {len(ids)} "
          f"| {hpb} ({hprg}) | {t1b} ({t1rg}) | {cb} | {t1b / hpb:.3f} "
          f"| {t1b / cb:.3f} |")
    print(f"| text tier-2 (raw text, screen survivors) | {n_cand} "
          f"| {len(surv)} | {tpb} ({tprg}) | {t2b} ({t2rg}) | {cb} "
          f"| {t2b / tpb:.3f} | {t2b / cb:.3f} |")
    print(f"| stream_text_admit two-tier total (vs r11 one-tier "
          f"fetch {old_b} from the {spb}-byte string payload) "
          f"| {n_cand} | {len(ids)} | {hpb + tpb} "
          f"| {t1b + t2b} | {cb} | {(t1b + t2b) / max(old_b, 1):.3f}"
          f" of one-tier | {(t1b + t2b) / cb:.3f} |")

    # --- embedding gate ----------------------------------------------
    from full_stack_big_data_spark.operators.similarity import (
        ANN_INCR_MOD, ANN_INCR_REM, srp_buckets, srp_index_dir,
        srp_payload_dir, srp_quant_payload_dir)
    from full_stack_big_data_spark.streaming.joins import \
        _cosine_verify_hits

    eidx = (spark.read.parquet(srp_index_dir(spark, sf))
            .withColumnRenamed("vec_id", "old_id"))
    epay = srp_payload_dir(spark, sf)
    eqpay = srp_quant_payload_dir(spark, sf)
    ebatch = (Catalog(spark, sf).embeddings
              .where(F.col("vec_id") % ANN_INCR_MOD == ANN_INCR_REM)
              .select("vec_id", "embedding"))
    nb = (srp_buckets(ebatch)
          .select("vec_id", F.posexplode("buckets")
                  .alias("table_id", "bucket")))
    ecand = (nb.join(eidx, ["table_id", "bucket"])
             .select("vec_id", "old_id").distinct())
    en_cand = ecand.count()
    eids = fetch_ids(ecand.select(F.col("old_id").alias("vec_id")), "vec_id")
    egot = point_fetch(spark, epay, "vec_id", eids).count()
    assert egot == len(eids), (egot, len(eids))
    efb, efrg, epb, eprg = _touched_bytes(epay, "vec_id", eids)
    ecb = _corpus_bytes(os.path.join(sf, "embeddings.parquet"))
    print(f"| stream_embedding_admit (fixture 16×4 — sensor contrast; "
          f"one-tier float fetch) | {en_cand} | {len(eids)} | {epb} "
          f"({eprg}) | {efb} ({efrg}) | {ecb} | {efb / epb:.3f} "
          f"| {efb / ecb:.3f} |")

    def _emb_two_tier_rows(label: str, cand_df, cand_ids,
                           one_tier_bytes: int) -> list[int]:
        """The r13 two-tier verify I/O: tier 1 fetches packed-int16
        quantizations for every candidate; only bound-screen survivors
        (≈ true near-dups) open tier-2 float row groups. Returns the
        survivor ids so the per-k curve can price the combined tiers."""
        scope: list = []
        try:
            _cosine_verify_hits(spark, cand_df, ebatch, epay,
                                quant_payload_path=eqpay, scope=scope)
            surv = fetch_ids(scope[0].select(F.col("old_id")
                                             .alias("vec_id")), "vec_id")
        finally:
            for df in scope:
                df.unpersist()
        t1b, t1rg, qpb, qprg = _touched_bytes(eqpay, "vec_id", cand_ids)
        t2b, t2rg, fpb, fprg = _touched_bytes(epay, "vec_id", surv)
        print(f"| {label} tier-1 (packed int16 screen) | {len(cand_ids)} "
              f"ids | {len(cand_ids)} | {qpb} ({qprg}) | {t1b} ({t1rg}) "
              f"| {ecb} | {t1b / qpb:.3f} | {t1b / ecb:.3f} |")
        print(f"| {label} tier-2 (float, screen survivors) "
              f"| {len(cand_ids)} ids | {len(surv)} | {fpb} ({fprg}) "
              f"| {t2b} ({t2rg}) | {ecb} | {t2b / fpb:.3f} "
              f"| {t2b / ecb:.3f} |")
        print(f"| {label} two-tier total (vs one-tier float fetch "
              f"{one_tier_bytes}) | {len(cand_ids)} ids | {len(surv)} "
              f"| {qpb + fpb} | {t1b + t2b} | {ecb} "
              f"| {(t1b + t2b) / max(one_tier_bytes, 1):.3f} of one-tier "
              f"| {(t1b + t2b) / ecb:.3f} |")
        return surv

    _emb_two_tier_rows("stream_embedding_admit (fixture)", ecand, eids,
                       efb)

    # The DEPLOYMENT row (r12): the scaled gate's candidate set at the
    # N/64 geometry is ~3 orders smaller, so its verify fetch rides the
    # pushed-literal point-fetch regime instead of the fixture row's
    # join fallback — this is the per-batch I/O a production gate pays.
    from full_stack_big_data_spark.operators.similarity import \
        SRP_BITS_WIDE
    sidx = (spark.read.parquet(
                srp_index_dir(spark, sf, bits=SRP_BITS_WIDE))
            .withColumnRenamed("vec_id", "old_id"))
    snb = (srp_buckets(ebatch, bits=SRP_BITS_WIDE)
           .select("vec_id", F.posexplode("buckets")
                   .alias("table_id", "bucket")))
    scand = (snb.join(sidx, ["table_id", "bucket"])
             .select("vec_id", "old_id").distinct())
    sn_cand = scand.count()
    sids = fetch_ids(scand.select(F.col("old_id").alias("vec_id")),
                     "vec_id")
    sgot = point_fetch(spark, epay, "vec_id", sids).count()
    assert sgot == len(sids), (sgot, len(sids))
    sfb, sfrg, _, _ = _touched_bytes(epay, "vec_id", sids)
    print(f"| stream_embedding_admit_scaled (16×{SRP_BITS_WIDE}, "
          f"deployment; one-tier float fetch) | {sn_cand} | {len(sids)} "
          f"| {epb} ({eprg}) | {sfb} ({sfrg}) | {ecb} | {sfb / epb:.3f} "
          f"| {sfb / ecb:.3f} |")
    s_surv = _emb_two_tier_rows("stream_embedding_admit_scaled "
                                "(deployment)", scand, sids, sfb)

    # The proportionality curve: fetched bytes for id SUBSETS of the
    # text gate's candidates — a production micro-batch is minutes of
    # feed, not a quarter of the corpus like the sf fixture's one-shot
    # batch, so the per-batch number is the small-k row. Since r12 the
    # per-candidate fetch rides the HASH tier, so that's the payload
    # the curve measures.
    print("\n| gate | k (ids) | fetched bytes | row groups | of payload |")
    print("|---|---|---|---|---|")
    for k in (4, 16, 64, 256):
        sub = ids[:: max(1, len(ids) // k)][:k]   # spread across pk space
        b, rg, pb2, _ = _touched_bytes(hpay_path, "doc_id", sub)
        print(f"| stream_text_admit tier-1 | {len(sub)} | {b} | {rg} "
              f"| {b / pb2:.3f} |")
    # Embedding payload curve: the fixture's one-shot batch is 10% of
    # the corpus, so even the scaled gate's distinct-id set saturates
    # the 1800-vector corpus — a production micro-batch is a few
    # vectors, and THIS curve is its verify I/O. Since r13 the
    # per-candidate fetch rides the packed-int16 QUANT tier (float row
    # groups open only for bound-screen survivors), so that's the
    # payload the curve measures.
    surv_set = set(s_surv)
    for k in (4, 16, 64, 256):
        sub = sids[:: max(1, len(sids) // k)][:k]
        b, rg, pb2, _ = _touched_bytes(eqpay, "vec_id", sub)
        print(f"| stream_embedding_admit_scaled tier-1 | {len(sub)} "
              f"| {b} | {rg} | {b / pb2:.3f} |")
    # Combined two-tier per-k (the production per-batch number): tier-1
    # quant bytes for the k candidates + tier-2 FLOAT bytes for the
    # bound-screen survivors among them, vs the one-tier float fetch
    # for the same k — the ~0.5× claim priced at real batch sizes
    # instead of the corpus-saturating fixture one-shot.
    print("\n| k (ids) | tier-1 bytes | survivors | tier-2 bytes "
          "| two-tier total | one-tier float | two/one |")
    print("|---|---|---|---|---|---|---|")
    for k in (4, 16, 64, 256):
        sub = sids[:: max(1, len(sids) // k)][:k]
        b1, _, _, _ = _touched_bytes(eqpay, "vec_id", sub)
        sub_surv = sorted(i for i in sub if i in surv_set)
        b2, _, _, _ = _touched_bytes(epay, "vec_id", sub_surv)
        bf, _, _, _ = _touched_bytes(epay, "vec_id", sub)
        print(f"| {len(sub)} | {b1} | {len(sub_surv)} | {b2} "
              f"| {b1 + b2} | {bf} | {(b1 + b2) / max(bf, 1):.3f} |")
    spark.stop()
    return 0


def _corpus_bytes(path: str) -> int:
    return (os.path.getsize(path) if os.path.isfile(path)
            else _tree_bytes(path)[0])


if __name__ == "__main__":
    sys.exit(main())
