"""Extended join operators Spark lacks natively (SURVEY.md §2.11
[EXT]): as-of join.

The reference has no standalone joins at all (its join semantics live
inside MERGE DML — SURVEY.md §2.6); these cover the time-series /
feature-lookup joins a large-scale pipeline needs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload: Sequence[str],
    right_key: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for every left row, attach the payload of the
    newest right row with the same key and ``right_ts <= left_ts``
    (inclusive); nulls when no such row exists.
    ``direction="forward"`` mirrors it — the EARLIEST right row with
    ``right_ts >= left_ts`` (the next upcoming quote/order) — by
    reversing the carry scan's sort; same single shuffle.

    Implementation is the scale-correct *merge as-of*: tag both
    inputs, union, and carry the latest right payload forward with
    ``last(ignorenulls)`` over a (key, time)-sorted window — ONE
    shuffle on the key and a linear pass, instead of the naive
    range-join + per-key argmax (quadratic per hot key). At 100 TB
    the window shuffle is the only exchange, and AQE handles key
    skew like any other sort window.

    Right rows must be unique per (key, right_ts) — pre-dedup with a
    deterministic tiebreak (see callers) or results are ambiguous in
    any engine.
    """
    lcols = left.columns
    pay = F.struct(*[F.col(c) for c in payload])
    r = right.select(
        F.col(right_key or key).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(1).alias("_is_r"),
        pay.alias("_pay"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in lcols],
    )
    l = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(0).alias("_is_r"),
        F.lit(None).cast(r.schema["_pay"].dataType).alias("_pay"),
        *lcols,
    )
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    # right sorts before left at equal timestamps → inclusive bound;
    # forward scans time DESCENDING so the running last() carries the
    # smallest right_ts ≥ left_ts instead
    t_order = (
        F.col("_t").asc() if direction == "backward" else F.col("_t").desc()
    )
    w = (
        Window.partitionBy("_k")
        .orderBy(t_order, F.col("_is_r").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = r.unionByName(l).withColumn(
        "_match", F.last("_pay", ignorenulls=True).over(w)
    )
    out = merged.filter(F.col("_is_r") == 0).select(
        *lcols,
        *[F.col("_match").getField(c).alias(c) for c in payload],
    )
    return out


def dedup_right_for_asof(
    right: DataFrame, key: str, ts: str, tiebreak: str
) -> DataFrame:
    """Collapse right-side rows to one per (key, ts): keep the row
    with the max ``tiebreak`` — the determinism contract asof_join
    requires."""
    w = Window.partitionBy(key, ts).orderBy(F.desc(tiebreak))
    return (
        right.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload: Sequence[str],
    right_key: str | None = None,
) -> DataFrame:
    """Nearest-in-time as-of join: every left row takes the payload of
    the right row (same key) whose timestamp is CLOSEST in absolute
    time — the sensor-alignment variant of backward/forward as-of.
    Ties (equidistant matches) and one-sided cases resolve to the
    backward match; nulls when the key has no right rows at all.

    Cost shape: the SAME single key-shuffle as ``asof_join`` — both
    the backward and the forward carry are windows over one merged,
    key-partitioned relation (opposite time orders → Spark reuses the
    one Exchange and sorts twice), so "nearest" is NOT two joins.
    Right rows must be unique per (key, right_ts) — see
    ``dedup_right_for_asof``.
    """
    lcols = left.columns
    pay = F.struct(
        F.col(right_ts).alias("_rts"),
        *[F.col(c) for c in payload],
    )
    r = right.select(
        F.col(right_key or key).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(1).alias("_is_r"),
        pay.alias("_pay"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in lcols],
    )
    l = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(0).alias("_is_r"),
        F.lit(None).cast(r.schema["_pay"].dataType).alias("_pay"),
        *lcols,
    )
    w_b = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").asc(), F.col("_is_r").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_f = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").desc(), F.col("_is_r").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = (
        r.unionByName(l)
        .withColumn("_b", F.last("_pay", ignorenulls=True).over(w_b))
        .withColumn("_f", F.last("_pay", ignorenulls=True).over(w_f))
    )
    # NTZ-safe epoch: cast through TIMESTAMP (differences cancel the
    # session-zone offset, so only the deterministic deltas matter)
    t_us = F.unix_micros(F.col("_t").cast("timestamp"))
    d_b = t_us - F.unix_micros(F.col("_b._rts").cast("timestamp"))
    d_f = F.unix_micros(F.col("_f._rts").cast("timestamp")) - t_us
    best = (
        F.when(F.col("_b").isNull(), F.col("_f"))
        .when(F.col("_f").isNull(), F.col("_b"))
        .when(d_b <= d_f, F.col("_b"))
        .otherwise(F.col("_f"))
    )
    return (
        merged.filter(F.col("_is_r") == 0)
        .withColumn("_best", best)
        .select(
            *lcols,
            *[F.col("_best").getField(c).alias(c) for c in payload],
        )
    )
