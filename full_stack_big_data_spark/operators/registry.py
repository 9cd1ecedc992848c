"""Query registry.

Every operator the engine claims (SURVEY.md §2) registers here as a named
query: a builder ``(spark, sf_dir) -> DataFrame`` plus, when the semantics
are SQL-expressible, the exactly-equivalent DuckDB SQL used as a
differential oracle. ``__spark_entry__.py`` derives its ``queries()`` /
``oracle_sql()`` contract from this registry, and the pytest parity
harness (tests/test_oracle_parity.py) replays the same comparison locally
at sf0.001 so correctness regressions never wait for the driver.

Determinism rules every registered query follows:

- alias every computed column identically in Spark and SQL;
- money aggregates go through DECIMAL(18,4) (exact, order-independent)
  and are rounded before the final cast to double;
- integer SUMs in oracles are wrapped ``CAST(SUM(...) AS BIGINT)``:
  DuckDB widens SUM(BIGINT) to HUGEINT, which Arrow surfaces as
  decimal128 and the driver's value-hash then mismatches against
  Spark's int64 even when values are identical (round-1 q_json_extract
  failure). COUNT stays BIGINT; MIN/MAX don't widen;
- temporal outputs are formatted to strings (engine-neutral);
- result-affecting hashing uses the md5-portable helpers.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, or None → driver does rows-only check
    description: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, description: str = "",
             tags: tuple[str, ...] = ()):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` as a query."""
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name, fn, oracle, description, tags)
        return fn
    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every operator module (side effect: registration) and
    return the registry.

    Import order IS sweep order: the driver walks ``queries()`` in
    registration order with a wall-clock budget, so modules whose queries
    have never received a driver-green CORRECTNESS row run first
    (round 1's sweep truncated at entry 50, leaving everything after the
    relational corpus unverified). The relational queries — all driver-
    green in round 1 — re-verify last.
    """
    from . import timeseries  # noqa: F401  (round 4 cont.: never driver-verified → sweeps first)
    from . import retrieval  # noqa: F401  (round 5: never driver-verified → sweeps first)
    from . import cdc, quality  # noqa: F401
    from . import analytics, decontam, graph, textanalysis, dedup, pipeline, similarity, multimodal, wire  # noqa: F401
    from . import sampling, asof, sketches  # noqa: F401
    from . import jpeg  # noqa: F401  (r14: baseline JFIF codec entry)
    from ..streaming import queries as _streaming_queries  # noqa: F401
    from ..streaming import stateful as _streaming_stateful  # noqa: F401
    from ..streaming import joins as _streaming_joins  # noqa: F401
    from ..streaming import leaderboard as _streaming_leaderboard  # noqa: F401
    from ..streaming import reservoir as _streaming_reservoir  # noqa: F401
    from ..streaming import vacuum as _streaming_vacuum  # noqa: F401
    from ..streaming import ivf as _streaming_ivf  # noqa: F401  (r14)
    from . import wordcount, relational, relational_ext  # noqa: F401
    return REGISTRY
