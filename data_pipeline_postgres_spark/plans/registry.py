"""Driver-facing registry: every implemented operator from SURVEY.md §2
as a ``(spark, sf_dir) -> DataFrame`` callable plus (where expressible)
a DuckDB-runnable ANSI-SQL oracle string.

Conventions (driver contract, __spark_entry__.py):
- Keys are the stable SURVEY §2 IDs.
- Every computed column is aliased IDENTICALLY in the Spark plan and
  the oracle SQL (the driver sorts columns by name before hashing).
- Exact-arithmetic policy: 2-decimal measures are summed as
  DECIMAL(18,2) then cast to double on BOTH sides, so value hashes are
  bit-stable regardless of partial-agg ordering (SURVEY.md §5).
- Non-SQL-expressible ops (spark.ml LSH, stateful streaming) have no
  oracle entry → the driver records a rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query implementation and optionally its SQL oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    from . import queries_analytics  # noqa: F401
    from . import queries_core  # noqa: F401
    from . import queries_ext  # noqa: F401
    from . import queries_tpch  # noqa: F401
