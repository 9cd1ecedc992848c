"""Cross-engine portability gauntlet for the shared function layer.

Every result-affecting helper in ``functions/`` ships as a Spark
expression plus a DuckDB SQL twin; the differential oracle is only
sound if the twins agree on EVERY input, not just the testdata. This
gauntlet feeds both sides deliberately nasty strings — unicode,
accents, emoji, mixed scripts, control characters, empty/degenerate
cases — and requires exact agreement.
"""

from __future__ import annotations

import duckdb
import pytest

from full_stack_big_data_spark.functions.hashing import hex64, hex64_sql
from full_stack_big_data_spark.functions.text import (
    char_ngrams, char_ngrams_sql, token_ngrams, token_ngrams_sql,
    tokens, tokens_sql,
)

GAUNTLET = [
    "",
    " ",
    "hello world",
    "Hello, World!  multiple   spaces",
    "tabs\tand\nnewlines\r\nhere",
    "MiXeD CaSe 123 abc456def",
    "accented: café résumé naïve Zürich",
    "emoji: 🚀 rocket 🎉 party",
    "chinese: 你好世界 mixed with ascii",
    "punctuation!!! ???",
    "a",
    "1234567890",
    "under_scores-and-dashes.and.dots",
    "quotes 'single' \"double\" `back`",
    "percent % ampersand & pipe | backslash \\",
    "ALLCAPS",
    "trailing space ",
    " leading space",
    "日本語テキスト",
    "русский текст тоже",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute("CREATE TABLE g (id INTEGER, s VARCHAR)")
    c.executemany("INSERT INTO g VALUES (?, ?)", list(enumerate(GAUNTLET)))
    return c


@pytest.fixture(scope="module")
def gdf(spark):
    return spark.createDataFrame(list(enumerate(GAUNTLET)), ["id", "s"])


def _spark_rows(df):
    return {r[0]: r[1] for r in df.collect()}


def _duck_rows(con, expr):
    return {r[0]: r[1] for r in con.execute(
        f"SELECT id, {expr} FROM g ORDER BY id").fetchall()}


def test_tokenizer_agrees(con, gdf):
    s = _spark_rows(gdf.select("id", tokens("s")))
    d = _duck_rows(con, tokens_sql("s"))
    assert s == d


def test_token_ngrams_agree(con, gdf):
    s = _spark_rows(gdf.select("id", token_ngrams(tokens("s"), 2)))
    d = _duck_rows(con, token_ngrams_sql(tokens_sql("s"), 2))
    assert s == d


def test_char_ngrams_agree(con, gdf):
    s = _spark_rows(gdf.select("id", char_ngrams("s", 3)))
    d = _duck_rows(con, char_ngrams_sql("s", 3))
    assert s == d


def test_hex64_agrees(con, gdf):
    s = _spark_rows(gdf.select("id", hex64("s")))
    d = _duck_rows(con, hex64_sql("s"))
    assert s == d


# ---------------------------------------------------------------------------
# Property-based extension: the gauntlet above is fixed cases; Hypothesis
# searches the input space. Batched (one DataFrame per example set, not
# one Spark job per string) and derandomized so CI time is bounded and
# failures replay exactly.
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402

_texts = st.lists(
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)),  # no lone surrogates
        max_size=40),
    min_size=1, max_size=24)


@settings(max_examples=12, deadline=None, derandomize=True)
@given(_texts)
def test_tokenizer_and_hex64_agree_on_random_strings(spark, strings):
    con = duckdb.connect()
    con.execute("CREATE TABLE g (id INTEGER, s VARCHAR)")
    con.executemany("INSERT INTO g VALUES (?, ?)", list(enumerate(strings)))
    gdf = spark.createDataFrame(list(enumerate(strings)), ["id", "s"])
    for spark_col, duck_expr in (
        (tokens("s"), tokens_sql("s")),
        (token_ngrams(tokens("s"), 3), token_ngrams_sql(tokens_sql("s"), 3)),
        (hex64("s"), hex64_sql("s")),
    ):
        assert _spark_rows(gdf.select("id", spark_col)) == _duck_rows(con, duck_expr)
