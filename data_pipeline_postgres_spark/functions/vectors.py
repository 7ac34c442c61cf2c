"""Vector (embedding) column builders over ``array<float>`` columns.

All JVM-side higher-order functions (zip_with / aggregate) — Arrow or
Pandas never enter the picture for a dot product. Floats are cast to
double FIRST and accumulated left-to-right in index order, which is
exactly what DuckDB's list functions do on a DOUBLE[] — so cosine values
are bit-identical between engines and safe to hash after rounding.

At 100 TB the same expressions run unchanged: they are per-row (narrow)
transformations; the expensive part of similarity search is the join
strategy, which lives in operators/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    """Cast array<float> → array<double> (do this before any math)."""
    return vec.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Left-to-right ordered dot product of two array<double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    """L2 norm, ordered accumulation."""
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<double> columns."""
    return dot(a, b) / (norm(a) * norm(b))
