"""Skew mitigation: salted aggregation and salted replicate-join.

AQE's skew-join splitting (enabled in ``engine/session.py``) handles
most runtime skew, but two patterns still need explicit salting at
100 TB — a single hot *aggregation* key whose partial states overwhelm
one reducer, and a shuffle join against a mid-size table too big to
broadcast where a few keys dominate. Both helpers preserve results
exactly (aggregation is reassociated, never changed; the join replicates
the small side across salt buckets so every matching pair still meets).

The salt on the big side must split a SINGLE key's rows, so it cannot be
a function of the key — it derives from ``monotonically_increasing_id``,
which is partitioning-dependent but result-invariant for the supported
(commutative, associative) merges.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# partial-aggregate builder and its merge for each supported aggregate
_MERGES = {
    "count": (lambda c: F.count("*"), F.sum),
    "sum": (F.sum, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(df: DataFrame, keys: list[str],
               aggs: dict[str, tuple[str, str | Column]],
               salt: int = 16) -> DataFrame:
    """Two-phase aggregation: group by (keys + salt) for partials, then by
    keys for the merge. ``aggs`` maps output column → (agg_name, input
    column); supported: count (input ignored), sum, min, max.

    Example::

        salted_agg(tokens, ["word"], {"cnt": ("count", "*")})
    """
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt)))
    partials = salted.groupBy(*keys, "_salt").agg(*[
        _MERGES[kind][0](col if kind != "count" else "*").alias(f"_p_{out}")
        for out, (kind, col) in aggs.items()
    ])
    return partials.groupBy(*keys).agg(*[
        _MERGES[kind][1](f"_p_{out}").alias(out)
        for out, (kind, col) in aggs.items()
    ])


def salted_join(big: DataFrame, small: DataFrame, on: list[str],
                salt: int = 8, how: str = "inner") -> DataFrame:
    """Equi-join with the big side salted and the small side replicated
    ``salt`` times, so one hot key spreads over ``salt`` reducers instead
    of one straggler. Small-side shuffle grows ×salt — use when the
    small side is too big to broadcast but the big side is skewed.

    Only ``inner`` and ``left`` are supported: replicating the small side
    is result-preserving when unmatched small-side rows are dropped, but
    a right/full outer join would emit every unmatched small-side row
    once per salt bucket."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how in ('inner', 'left'), got {how!r}: "
            "the replicated small side would duplicate unmatched rows "
            f"{salt}x under an outer join")
    bigs = big.withColumn(
        "_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt)))
    smalls = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i).cast("bigint") for i in range(salt)])))
    return bigs.join(smalls, on + ["_salt"], how).drop("_salt")


# Spark >= 3.5 rewrites `row_number() <= k` filters into WindowGroupLimit
# with a PARTIAL (map-side, pre-exchange) pass — a per-partition top-k
# heap, so the shuffle carries <= k rows per group per map partition and
# a hot group can never overwhelm one sort task. Verified by plan pin
# (tests/test_skew.py) and by measurement: on a 29 M-row single-hot-key
# fixture the native path beats the manual two-phase by ~1.8x
# (BENCHNOTES round 6) because it achieves the same bucketed partial
# top-k with one fewer exchange and one fewer window pass.
_RANK_LIMIT_NATIVE = False  # proven >= 3.5 below, else portable fallback
try:
    import pyspark
    _RANK_LIMIT_NATIVE = tuple(
        int(p) for p in pyspark.__version__.split(".")[:2]) >= (3, 5)
except Exception:  # pragma: no cover — version string oddities
    # unparseable version: stay False so an unrecognizable (possibly
    # pre-3.5) runtime gets grouped_topk_twophase — correct everywhere,
    # merely one exchange slower on a new runtime — instead of a plain
    # window whose low-cardinality skew ceiling the fallback exists
    # to avoid.
    pass


def grouped_topk(df: DataFrame, group_cols: list[str], order_cols: list[Column],
                 k: int, salt_col: Column, buckets: int = 64,
                 rank_col: str = "rank") -> DataFrame:
    """Per-group top-k without the low-cardinality-window ceiling.

    The naive worry: ``row_number() OVER (PARTITION BY group ...)``
    funnels every row of a group through ONE sort task — with few groups
    (languages, nations, query ids, n-gram orders) the whole table sorts
    on a handful of cores no matter the cluster size. On Spark >= 3.5
    the optimizer dissolves the worry for rank-LIMIT shapes: the plain
    window + ``rank <= k`` filter compiles to a map-side partial
    WindowGroupLimit (see `_RANK_LIMIT_NATIVE` above), which IS the
    two-phase trick, native and one exchange cheaper — so this helper
    emits the plain window there and keeps
    :func:`grouped_topk_twophase` as the portable fallback for older
    runtimes (and for rank functions the rewrite doesn't cover).

    ``order_cols`` must be a TOTAL order (callers pass an id tiebreak)
    so both implementations return the identical row set — pinned in
    tests/test_skew.py.
    """
    from pyspark.sql import Window

    if _RANK_LIMIT_NATIVE:
        w = Window.partitionBy(*group_cols).orderBy(*order_cols)
        return (df.withColumn(rank_col, F.row_number().over(w))
                .where(F.col(rank_col) <= k))
    return grouped_topk_twophase(df, group_cols, order_cols, k, salt_col,
                                 buckets, rank_col)


def grouped_topk_twophase(df: DataFrame, group_cols: list[str],
                          order_cols: list[Column], k: int, salt_col: Column,
                          buckets: int = 64,
                          rank_col: str = "rank") -> DataFrame:
    """The explicit two-phase top-k (the pre-3.5 portable path):

    1. rank per (group, salt bucket) and keep k — the true per-group
       top-k all survive, because a row beaten by ≥ k rows of its own
       salt bucket is beaten by ≥ k rows of its group;
    2. rank the ≤ k·buckets survivors per group — the original window,
       now over a bounded row count.

    ``salt_col`` must be deterministic row content (an id column — NOT
    ``spark_partition_id``/``rand``, which break retry determinism), so
    the phase-1 exchange is balanced and replay-safe.
    """
    from pyspark.sql import Window

    w1 = (Window.partitionBy(*group_cols, F.pmod(salt_col, F.lit(buckets)))
          .orderBy(*order_cols))
    cand = (df.withColumn("_topk_r1", F.row_number().over(w1))
            .where(F.col("_topk_r1") <= k).drop("_topk_r1"))
    w2 = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (cand.withColumn(rank_col, F.row_number().over(w2))
            .where(F.col(rank_col) <= k))
