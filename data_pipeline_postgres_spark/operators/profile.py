"""Data-profiling operator (SURVEY.md §2.11 [EXT]): per-column
null / distinct / min / max stats in ONE scan.

The shape matters at 100 TB: all per-column aggregates are expressions
of a single ``agg`` over one pass (exact distincts share one Expand —
N aggregate columns never mean N scans), and the wide single-row result
is re-shaped to long form with ``stack`` AFTER aggregation, so the
generator runs on one row, not on the table. min/max are canonicalized
to strings post-aggregation (decimal render for numerics, fixed
timestamp format) so heterogeneous column types share one result
schema and both engines print identical bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _canon_str(col: F.Column, dtype: T.DataType) -> F.Column:
    if isinstance(dtype, (T.DoubleType, T.FloatType, T.DecimalType)):
        return col.cast("decimal(18,2)").cast("string")
    if isinstance(dtype, T.TimestampType):
        return F.date_format(col, "yyyy-MM-dd HH:mm:ss")
    return col.cast("string")


def profile_table(df: DataFrame, exact: bool = True) -> DataFrame:
    """Profile every column of ``df``: (column, n_rows, n_nulls,
    n_distinct, min_str, max_str).

    ``exact=False`` swaps the N exact ``count_distinct``s (which share
    one Expand — correct, but ~n_cols× row amplification on the single
    scan) for HLL ``approx_count_distinct`` — no Expand at all, the
    profile every 100 TB run should use."""
    fields = df.schema.fields
    nd = F.count_distinct if exact else F.approx_count_distinct
    aggs = [F.count("*").alias("_n")]
    for f in fields:
        c = F.col(f.name)
        aggs += [
            F.count(c).alias(f"_cnt_{f.name}"),
            nd(c).alias(f"_nd_{f.name}"),
            _canon_str(F.min(c), f.dataType).alias(f"_min_{f.name}"),
            _canon_str(F.max(c), f.dataType).alias(f"_max_{f.name}"),
        ]
    wide = df.agg(*aggs)
    stack_args = []
    for f in fields:
        stack_args += [
            F.lit(f.name),
            F.col("_n") - F.col(f"_cnt_{f.name}"),
            F.col(f"_nd_{f.name}"),
            F.col(f"_min_{f.name}"),
            F.col(f"_max_{f.name}"),
        ]
    return wide.select(
        F.col("_n").alias("n_rows"),
        F.stack(
            F.lit(len(fields)), *stack_args
        ).alias("column", "n_nulls", "n_distinct", "min_str", "max_str"),
    ).select("column", "n_rows", "n_nulls", "n_distinct", "min_str", "max_str")
