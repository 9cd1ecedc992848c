"""Vector math over ``array<float>`` embedding columns.

Pure Catalyst higher-order functions (``zip_with`` + ``aggregate``) so the
similarity kernels run inside whole-stage codegen with no Python transfer.
Floats are widened to double *before* any arithmetic so accumulation order
and precision match the DuckDB oracle (which computes list_* in double).

For very wide vectors or very hot loops an Arrow-batched pandas UDF using
numpy BLAS may win; see ``operators/similarity.py`` for that variant —
benchmarks at sf0.1 decide which one the headline query uses.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _d(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ with left-to-right double accumulation."""
    return F.aggregate(F.zip_with(_d(a), _d(b), lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(_d(a), lambda x: x * x),
                              F.lit(0.0), lambda acc, x: acc + x))


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL (not an ANSI divide-by-zero crash) when
    either vector has zero norm — a zero vector has no direction, and a
    NULL similarity drops out of every top-k/threshold filter, which is
    the only sensible semantics for degenerate embeddings."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot(a, b) / denom)
