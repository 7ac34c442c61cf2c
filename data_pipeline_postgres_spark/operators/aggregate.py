"""Aggregation operators (SURVEY.md §2.3).

The reference's aggregations: a pandas hash groupby-sum over three
measure columns (reference: mnt/dags/02datalake_to_datawarehouse.py:69)
and a SQL GROUP BY + SUM over an unpivoted subquery (reference:
mnt/dags/unused_pipeline_sourcecode.py:61-91).

Spark runs these as partial (map-side) + final hash aggregation — the
shuffle moves one row per (group × partition), not per input row, so
the pattern scales with group cardinality, not data volume.

Exact-arithmetic policy: monetary/quantity doubles in this engine are
2-decimal; SUMs cast to DECIMAL(18,2) first so partial-agg ordering can
never change the result (floating-point sums are order-dependent;
decimal sums are not), then cast back to double at the boundary.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_sum(col: str, alias: str) -> F.Column:
    """Order-independent SUM of a 2-decimal double measure."""
    return F.sum(F.col(col).cast("decimal(18,2)")).cast("double").alias(alias)


def group_sum(
    df: DataFrame, keys: Sequence[str], measures: dict[str, str]
) -> DataFrame:
    """Hash-agg: group by ``keys``, exact-SUM each measure
    (``{src_col: out_alias}``)."""
    return df.groupBy(*keys).agg(
        *[exact_sum(src, alias) for src, alias in measures.items()]
    )
