"""Tokenization and text-statistic column builders.

One tokenizer for the whole engine (word count, dedup shingles, text
analysis) so every operator agrees on what a "word" is — the reference
never defines one (its word-count fixture is pre-tokenized words,
``integration/StormSpec.scala:65-67``), so we standardize:

    lower → split on runs of non-alphanumerics → drop empties

Each builder has a ``*_sql`` twin producing the exactly-equivalent DuckDB
expression; the differential oracle depends on these staying in lockstep.
All of this is JVM-side Catalyst expressions — no Python UDFs in the
tokenize path (it sits inside the hot loop of every text operator).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

_TOKEN_SPLIT = "[^a-z0-9]+"

# Tiny embedded stopword lists for the language-ID heuristic and quality
# scoring. Deliberately short: these are features, not linguistics.
STOPWORDS_EN = ("the", "a", "of", "and", "to", "in", "is", "it")
STOPWORDS_BY_LANG = {
    "en": STOPWORDS_EN,
    "de": ("der", "die", "das", "und", "ist", "ein", "zu", "den"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "des"),
    "es": ("el", "la", "los", "y", "es", "un", "una", "de"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2", "you3", "wo3", "ta1"),
}


def tokens(col: Column | str) -> Column:
    """Array of lowercase word tokens, empties removed."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), _TOKEN_SPLIT), lambda t: t != F.lit(""))


def tokens_sql(expr: str) -> str:
    """DuckDB expression equivalent to :func:`tokens`."""
    return (f"list_filter(regexp_split_to_array(lower({expr}), '{_TOKEN_SPLIT}'),"
            f" t -> t <> '')")


def char_ngrams(col: Column | str, n: int, *, pre_lowered: bool = False) -> Column:
    """Array of character n-grams of the lowercased string (distinct not
    applied). Pure Catalyst: sequence + transform + substring.

    Guarded for inputs shorter than ``n``: Spark's ``sequence(1, 0)``
    yields a DESCENDING ``[1, 0]`` (it never returns empty), unlike SQL
    ``range`` — without the guard short inputs crash or diverge from the
    DuckDB twin (caught by tests/test_portability.py).

    Hot-path note: the input is referenced inside the ``transform``
    lambda, whose body re-evaluates non-attribute expressions per
    ELEMENT. Pass an attribute of pre-lowered text (``pre_lowered=True``)
    to keep the lowercase pass at once-per-row instead of O(len²).
    """
    c = F.col(col) if isinstance(col, str) else col
    s = c if pre_lowered else F.lower(c)
    grams = F.transform(
        F.sequence(F.lit(1), F.length(s) - (n - 1)),
        lambda i: s.substr(i, F.lit(n)),
    )
    return F.when(F.length(s) >= n, grams).otherwise(
        F.array().cast("array<string>"))


def char_ngrams_sql(expr: str, n: int) -> str:
    return (f"list_transform(range(1, greatest(length(lower({expr})) - {n - 1}, 0) + 1),"
            f" i -> substring(lower({expr}), i, {n}))")


def token_ngrams(tok: Column, n: int) -> Column:
    """Array of space-joined n-grams over a token array (Catalyst-only).
    Same short-input guard as :func:`char_ngrams` (see note there)."""
    grams = F.transform(
        F.sequence(F.lit(1), F.size(tok) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(tok, i, n)),
    )
    return F.when(F.size(tok) >= n, grams).otherwise(
        F.array().cast("array<string>"))


def token_ngrams_sql(tok_expr: str, n: int) -> str:
    return (f"list_transform(range(1, greatest(len({tok_expr}) - {n - 1}, 0) + 1),"
            f" i -> array_to_string(list_slice({tok_expr}, i, i + {n - 1}), ' '))")
