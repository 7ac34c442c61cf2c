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
