"""Embedding-column operators (SURVEY.md §2.11 [EXT]): unit
normalization and per-group centroids — the feature-engineering passes
an embedding-bearing pipeline runs before clustering / ANN indexing.

Both are pure DataFrame ops (HOF transforms + one hash aggregation);
exactness follows the module's established quantization contract
(operators/dedup.py:quantize_col): sums of floats are never compared
across engines — sums of deterministic int64 quantizations are.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import vectors as V
from .dedup import QSCALE, quantize_col


def unit_normalize(emb: DataFrame, head: int = 8) -> DataFrame:
    """L2 unit normalization, emitted component-wise:
    (vec_id, pos, u) for the first ``head`` components (u rounded to
    6 digits — the repo's cross-engine float contract).

    The norm folds over the FULL vector; only the emitted slice is
    truncated, to keep result sets row-bounded. Per-row map stage —
    at scale this pipelines into the ANN index writer.
    """
    v = V.as_double(F.col("embedding"))
    unit = F.transform(v, lambda x: F.round(x / V.norm(v), 6))
    return emb.select(
        "vec_id", F.posexplode(F.slice(unit, 1, head)).alias("pos", "u")
    )


def int8_quantize(emb: DataFrame) -> DataFrame:
    """Symmetric int8 quantization per vector — the storage/transport
    compression an embedding lake runs before ANN indexing (4× smaller
    than float32, 8× than float64): (vec_id, scale, q array<int>),
    component q_i = round_half_up(x_i / scale), scale = max|x| / 127
    (1.0 for the all-zero vector so q stays all-zero instead of NaN).

    Shape note: the per-component lambda must NOT embed the scale
    expression (HOF lambdas re-evaluate embedded subtrees per
    element — see functions/text.py:word_shingles). ``array_repeat``
    evaluates scale ONCE per row, then ``zip_with`` walks two
    materialized arrays with an element-only lambda. Rounding is
    floor(x+0.5) — engines disagree on round()'s double ties, never on
    floor.
    """
    v = V.as_double(F.col("embedding"))
    maxabs = F.array_max(F.transform(v, lambda x: F.abs(x)))
    scale = F.when(maxabs > 0, maxabs / F.lit(127.0)).otherwise(F.lit(1.0))
    base = emb.select(
        "vec_id", v.alias("v"), scale.alias("scale")
    ).withColumn("scales", F.array_repeat(F.col("scale"), F.size(F.col("v"))))
    q = F.zip_with(
        F.col("v"),
        F.col("scales"),
        lambda x, s: F.floor(x / s + F.lit(0.5)).cast("int"),
    )
    return base.select("vec_id", "scale", q.alias("q"))


def centroid_per_label(emb: DataFrame) -> DataFrame:
    """Element-wise mean embedding per label:
    (label, pos, centroid, n_vecs).

    Float sums are order-dependent, so the mean goes through the
    module's deterministic int64 quantization: quantize each unit
    component to 2^20 (exact, engine-identical), SUM the integers
    (order-free), one double division at the end. One posexplode +
    one hash aggregation keyed by (label, pos) — map-side partials
    collapse the exchange to |labels|·64 rows.
    """
    q = quantize_col(V.as_double(F.col("embedding")))
    return (
        emb.select("label", F.posexplode(q).alias("pos", "qv"))
        .groupBy("label", "pos")
        .agg(
            (
                F.sum("qv").cast("double") / (F.lit(QSCALE) * F.count("*"))
            ).alias("centroid"),
            F.count("*").alias("n_vecs"),
        )
    )
