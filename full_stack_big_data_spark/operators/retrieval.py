"""Sparse-retrieval operators: inverted index and BM25 ranking.

The dense path (`operators/similarity.py`) answers "what is semantically
near this embedding"; production corpus tooling equally needs the SPARSE
path — token postings and BM25 — for contamination lookups, targeted
corpus slicing ("every doc mentioning X"), and hybrid retrieval. The
reference has no retrieval surface at all (its queries are key lookups,
``README.md:45-69``); this module adds one in stock DataFrame ops.

Scale posture: BM25's corpus statistics (N, avg doc length, per-term
document frequencies for the handful of query terms) are BROADCAST
SCALARS — scoring is then a map-only codegen projection over one corpus
scan, and ranking is TakeOrderedAndProject. No row-level join, no global
sort, nothing grows with the corpus except the scan itself. The postings
build is one explode+count shuffle, output bounded by vocabulary size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..engine.catalog import Catalog
from ..functions.text import tokens, tokens_sql
from .registry import register

POSTINGS_CAP = 8        # doc ids kept per token (index shard sample)

_TOKS = tokens_sql("text")


@register(
    "text_postings",
    oracle=f"""
WITH pairs AS (
  SELECT DISTINCT doc_id, g AS token
  FROM documents, UNNEST({_TOKS}) AS u(g)
), df AS (
  SELECT token, COUNT(*) AS doc_freq FROM pairs GROUP BY token
), capped AS (
  SELECT token, doc_id FROM (
    SELECT token, doc_id,
           ROW_NUMBER() OVER (PARTITION BY token ORDER BY doc_id) AS rn
    FROM pairs) WHERE rn <= {POSTINGS_CAP}
), lists AS (
  SELECT token, list_sort(list(doc_id)) AS postings FROM capped GROUP BY token
)
SELECT d.token, d.doc_freq,
       CAST(len(l.postings) AS INT) AS postings_n,
       md5(array_to_string(l.postings, ',')) AS postings_md5
FROM df d JOIN lists l USING (token)
""",
    description=f"inverted index: per-token document frequency + first "
                f"{POSTINGS_CAP} postings in doc-id order (md5-pinned)",
    tags=("retrieval", "index", "agg"),
)
def text_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build: token -> (document frequency, capped posting
    list in doc-id order). The df column drives idf weighting; the
    posting sample is what an index shard stores per term (a real
    deployment writes full postings partitioned by term — same plan,
    no cap).

    Scale: (doc, token) pairs are deduped map-side (``array_distinct``
    before the explode); ONE shuffle keyed on token computes df with
    map-side partial agg. The posting cap uses the salted two-phase
    top-k so a stopword's millions of postings never funnel through one
    task (term frequency is Zipfian — the hot-key case by construction).
    Both aggregates are vocabulary-sized; their join broadcasts.
    """
    from ..functions.skew import grouped_topk
    d = Catalog(spark, sf_dir).documents
    pairs = d.select(
        "doc_id",
        F.explode(F.array_distinct(tokens("text"))).alias("token"))
    df = pairs.groupBy("token").agg(F.count("*").alias("doc_freq"))
    capped = grouped_topk(pairs, ["token"], [F.col("doc_id").asc()],
                          POSTINGS_CAP, F.col("doc_id"))
    lists = (capped.groupBy("token")
             .agg(F.sort_array(F.collect_list("doc_id")).alias("postings")))
    # The posting list itself is pinned as an md5 of the joined ids (plus
    # its length) so the result stays scalar-typed — the driver's oracle
    # canonicalizer cannot sort on raw ARRAY cells (r4 verdict item 1).
    return df.join(F.broadcast(lists), "token").select(
        "token", "doc_freq",
        F.size("postings").alias("postings_n"),
        F.md5(F.concat_ws(",", F.transform(
            "postings", lambda x: x.cast("string")))).alias("postings_md5"))


# ---------------------------------------------------------------------------
# BM25 ranked retrieval.
# ---------------------------------------------------------------------------

BM25_QUERY = ("spark", "table", "merge")   # literal query terms
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP = 20


def _bm25_oracle() -> str:
    df_cols = ",\n         ".join(
        f"CAST(SUM(CASE WHEN list_contains(t, '{q}') THEN 1 ELSE 0 END) AS BIGINT) AS df_{i}"
        for i, q in enumerate(BM25_QUERY))
    terms = " + ".join(
        f"""ln(1 + ((SELECT n_docs FROM s) - (SELECT df_{i} FROM s) + 0.5)
                 / ((SELECT df_{i} FROM s) + 0.5))
            * len(list_filter(t, x -> x = '{q}'))
            / (len(list_filter(t, x -> x = '{q}'))
               + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl
                              / ((SELECT CAST(sum_dl AS DOUBLE) / n_docs FROM s))))"""
        for i, q in enumerate(BM25_QUERY))
    return f"""
WITH toks AS (
  SELECT doc_id, {_TOKS} AS t, len({_TOKS}) AS dl FROM documents
), s AS (
  SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS sum_dl,
         {df_cols}
  FROM toks
), scored AS (
  SELECT doc_id, CAST(ROUND({terms}, 6) AS DOUBLE) AS score FROM toks
)
SELECT doc_id, score FROM scored
ORDER BY score DESC, doc_id LIMIT {BM25_TOP}
"""


@register(
    "text_bm25_topk",
    oracle=_bm25_oracle(),
    description=f"BM25 top-{BM25_TOP} for a literal {len(BM25_QUERY)}-term "
                "query: broadcast corpus stats, map-only scoring, TakeOrdered",
    tags=("retrieval", "ranking", "map-only"),
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval for a fixed query — the corpus-slicing /
    contamination-lookup primitive. The plan is the 100 TB shape: the
    corpus statistics BM25 needs (N, total length, per-term document
    frequencies) reduce to ONE tiny broadcast row; scoring is a map-only
    whole-stage-codegen projection (array_contains/filter over the token
    array, no UDF); ranking is TakeOrderedAndProject. Nothing but the
    scan scales with the corpus.

    Determinism: every input to the float expression (tf, dl, df, N) is
    an integer identical in both engines, so the doubles agree to the
    last bit except for ln()'s <=1-ulp libm divergence — the score
    rounds at 1e-6 (the ``text_quality_model`` precedent) and ranking
    ties on the rounded score break by doc_id.
    """
    d = Catalog(spark, sf_dir).documents
    toks = (d.select("doc_id", tokens("text").alias("t"))
            .withColumn("dl", F.size("t")))
    stats = toks.agg(
        F.count("*").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("sum_dl"),
        *[F.sum(F.array_contains("t", q).cast("int")).cast("bigint")
           .alias(f"df_{i}") for i, q in enumerate(BM25_QUERY)])
    sc = toks.crossJoin(F.broadcast(stats))
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    score = None
    for i, q in enumerate(BM25_QUERY):
        tf = F.size(F.filter("t", lambda x: x == F.lit(q)))
        idf = F.log(1 + (F.col("n_docs") - F.col(f"df_{i}") + 0.5)
                    / (F.col(f"df_{i}") + 0.5))
        term = idf * tf / (tf + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / avgdl))
        score = term if score is None else score + term
    return (sc.select("doc_id", F.round(score, 6).alias("score"))
            .orderBy(F.col("score").desc(), "doc_id").limit(BM25_TOP))
