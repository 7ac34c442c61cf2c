"""Reshape operators: wide→long unpivot (SURVEY.md §2.4).

The reference expresses the same reshape twice: ``pd.melt`` (reference:
mnt/dags/02datalake_to_datawarehouse.py:71) and a 3-way tagged
UNION ALL in SQL (reference: mnt/dags/unused_pipeline_sourcecode.py:66-87).
Both are provided and asserted equivalent in tests (metamorphic check,
SURVEY.md §5).

Scale note: ``unpivot`` is a narrow (per-row) transformation — no
shuffle; the UNION ALL form re-reads the input N times unless the
source is cached, which is why melt is the engine default.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def unpivot_melt(
    df: DataFrame,
    ids: Sequence[str],
    values: Sequence[str],
    var_name: str,
    value_name: str,
) -> DataFrame:
    """Wide→long via the native unpivot (Spark ≥3.4) — generates an
    Expand node, one output row per (input row × value column), no
    shuffle."""
    return df.unpivot(list(ids), list(values), var_name, value_name)


def unpivot_union_all(
    df: DataFrame,
    ids: Sequence[str],
    values: Sequence[str],
    var_name: str,
    value_name: str,
) -> DataFrame:
    """Same reshape as tagged UNION ALL of per-column projections —
    literal parity with the reference's SQL dialect (reference:
    mnt/dags/unused_pipeline_sourcecode.py:66-87, UNION ALL at :73,:80)."""
    parts = [
        df.select(
            *[F.col(c) for c in ids],
            F.lit(v).alias(var_name),
            F.col(v).alias(value_name),
        )
        for v in values
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
