"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``data_pipeline_postgres_spark``; this module
is a thin shim over its registry (plans/registry.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_pipeline_postgres_spark.catalog import SMOKE_SF_DIR
from data_pipeline_postgres_spark.plans import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship material-demand query on /root/testdata/sf0.001
    (SURVEY.md §7)."""
    from data_pipeline_postgres_spark.plans.flagship import flagship

    return flagship(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    registry.load_all()
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted for
    non-SQL-expressible ops → driver records rows-only checks)."""
    registry.load_all()
    return dict(registry.ORACLES)
