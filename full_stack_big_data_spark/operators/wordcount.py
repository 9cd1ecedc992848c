"""Lambda-architecture word count (the reference's declared product).

The reference README (``/root/reference/README.md:3-9, 27-69``) specifies:
"simple real time and batch word count … calculates the difference between
real time and batch (in case of data loss) and stores the result for
querying". The batch layer (Q1) and the reconciliation diff (Q3) live
here; the speed layer (Q2) is ``streaming/wordcount_stream.py`` — in
Spark both layers are the *same* DataFrame program, which dissolves the
lambda architecture's double-build problem.

Scale notes: tokenize → explode → groupBy is one shuffle with map-side
partial aggregation (Catalyst plans partial_count before the exchange);
word keys are near-uniform so no salting needed. At 100 TB the only knob
that matters is shuffle partition count, which AQE right-sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..engine.catalog import Catalog
from ..functions.text import tokens, tokens_sql
from .registry import register


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Core word-count operator: text column → (word, cnt)."""
    return (
        df.select(F.explode(tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


_WC_SQL = f"""
SELECT t.word AS word, COUNT(*) AS cnt
FROM documents, unnest({tokens_sql('text')}) AS t(word)
GROUP BY t.word
"""


@register(
    "wordcount_batch",
    oracle=_WC_SQL,
    description="batch word count over documents (reference README.md:5-7, Q1)",
    tags=("wordcount", "agg", "bench"),
)
def wordcount_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    return word_counts(Catalog(spark, sf_dir).documents)


@register(
    "wordcount_by_lang",
    oracle=f"""
SELECT lang, t.word AS word, COUNT(*) AS cnt
FROM documents, unnest({tokens_sql('text')}) AS t(word)
GROUP BY lang, t.word
""",
    description="keyed word count — reference A1 fieldsGrouping analog (StormSpec.scala:57)",
    tags=("wordcount", "agg"),
)
def wordcount_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    return (
        d.select("lang", F.explode(tokens("text")).alias("word"))
        .groupBy("lang", "word")
        .agg(F.count("*").alias("cnt"))
    )


@register(
    "wordcount_global",
    oracle=f"""
SELECT COUNT(*) AS total_words, COUNT(DISTINCT t.word) AS distinct_words
FROM documents, unnest({tokens_sql('text')}) AS t(word)
""",
    description="global count — reference A2 globalGrouping analog (StormSpec.scala:58-59)",
    tags=("wordcount", "agg"),
)
def wordcount_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    return (
        d.select(F.explode(tokens("text")).alias("word"))
        .agg(F.count("*").alias("total_words"),
             F.countDistinct("word").alias("distinct_words"))
    )


@register(
    "wordcount_diff",
    oracle=f"""
WITH batch AS (
  SELECT t.word AS word, COUNT(*) AS cnt
  FROM documents, unnest({tokens_sql('text')}) AS t(word)
  WHERE source <> 'src0'
  GROUP BY t.word
), speed AS (
  SELECT t.word AS word, COUNT(*) AS cnt
  FROM documents, unnest({tokens_sql('text')}) AS t(word)
  WHERE source = 'src0'
  GROUP BY t.word
)
SELECT COALESCE(batch.word, speed.word) AS word,
       COALESCE(batch.cnt, 0) AS batch_cnt,
       COALESCE(speed.cnt, 0) AS speed_cnt,
       COALESCE(batch.cnt, 0) - COALESCE(speed.cnt, 0) AS diff
FROM batch FULL OUTER JOIN speed ON batch.word = speed.word
""",
    description="batch-vs-speed reconciliation diff (reference README.md:9,49-55, Q3)",
    tags=("wordcount", "join", "lambda"),
)
def wordcount_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer diff of two word-count layers.

    The two "layers" are carved from the documents table by source so the
    query is deterministic; in production the speed side is the streaming
    sink table (see streaming/lambda_diff.py which wires the real thing).
    """
    d = Catalog(spark, sf_dir).documents
    batch = word_counts(d.where(F.col("source") != "src0")).withColumnRenamed("cnt", "batch_cnt")
    speed = word_counts(d.where(F.col("source") == "src0")).withColumnRenamed("cnt", "speed_cnt")
    return (
        batch.join(speed, "word", "full_outer")
        .select(
            "word",
            F.coalesce("batch_cnt", F.lit(0)).alias("batch_cnt"),
            F.coalesce("speed_cnt", F.lit(0)).alias("speed_cnt"),
            (F.coalesce("batch_cnt", F.lit(0)) - F.coalesce("speed_cnt", F.lit(0))).alias("diff"),
        )
    )


@register(
    "wordcount_salted",
    oracle=_WC_SQL,
    description="word count via two-phase salted aggregation (hot-key skew mitigation)",
    tags=("wordcount", "agg", "skew"),
)
def wordcount_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same result as ``wordcount_batch`` through the salted path: group
    by (word, salt) for partials, then by word for the merge — one hot
    word spreads over 16 reducers instead of one straggler. The oracle
    is identical to the plain word count because salting only
    reassociates the aggregation.

    Measured caveat (BENCHNOTES round 6): for ALGEBRAIC merges like
    this count, Spark's map-side partial aggregation already compresses
    the hot key to one row per map partition, and the salt exchange is
    pure overhead (plain 0.55 s vs salted 1.17 s on a 29 M-row hot-key
    fixture) — so ``wordcount_batch`` is the production path and THIS
    entry exists to keep the salted mechanism oracle-proven for the
    merges whose partial state does not compress (collect-style, exact
    distinct)."""
    from ..functions.skew import salted_agg
    from ..functions.text import tokens
    toks = (Catalog(spark, sf_dir).documents
            .select(F.explode(tokens("text")).alias("word")))
    return salted_agg(toks, ["word"], {"cnt": ("count", "*")}, salt=16)
