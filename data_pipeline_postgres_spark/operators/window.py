"""Window operators (SURVEY.md §2.7).

The reference's one window use: collapse a CDC batch to the newest
change per id via ``first_value(col) OVER (PARTITION BY id ORDER BY
last_updated DESC)`` ×10 columns + DISTINCT (reference:
mnt/dags/unused_02retail_stage.py:109-122).

The idiomatic Spark form is a ``row_number() == 1`` filter — one window
exec, no DISTINCT re-shuffle. Both forms are provided; tests assert
equivalence. Scale note: a single hash-partitioned shuffle on the key;
skewed keys are handled by AQE skew-join/partition splitting.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Latest-record-per-key dedup: keep the row with max ``order_col``
    per key. ``tiebreak`` columns make the winner deterministic when
    ``order_col`` ties (the reference's DISTINCT-over-first_value form
    silently keeps an arbitrary winner; we pin it — SURVEY.md §5 risk 5).
    """
    w = Window.partitionBy(*keys).orderBy(
        F.col(order_col).desc(), *[F.col(c).desc() for c in tiebreak]
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def latest_per_key_first_value(
    df: DataFrame, keys: Sequence[str], order_col: str
) -> DataFrame:
    """Literal-parity form: ``first_value`` of every non-key column over
    the descending window, then DISTINCT (reference:
    mnt/dags/unused_02retail_stage.py:109-122)."""
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).desc())
    others = [c for c in df.columns if c not in keys]
    return df.select(
        *[F.col(k) for k in keys],
        *[F.first(c).over(w).alias(c) for c in others],
    ).distinct()
