"""Weighted dataset mixing for pre-training (SURVEY.md §2.11 [EXT]):
materialize a training mixture where each source is repeated at a
fractional epoch weight — e.g. ``{"wiki": 2.5, "web": 0.3}`` means
every wiki doc appears 2-3 times and ~30% of web docs appear once.
This is the DoReMi / Pile-style "mixture weights" step that sits
between curation and sequence packing.

Scale shape: a pure MAP — no shuffle, no count pass, no RNG.

- Integer copies come from ``floor(weight)`` — a per-row
  ``explode(sequence(...))`` (row generator, stays in whole-stage
  codegen).
- The fractional remainder is a deterministic md5 hash gate on
  doc_id (operators/sampling.hash_permille): doc gets one extra copy
  iff its permille falls under ``weight % 1``. Reproducible across
  runs, engines, and task retries — ``rand()`` is none of those.
- Each emitted copy carries an ``epoch`` index so downstream packing
  can interleave epochs instead of concatenating them.

Weights are expressed in PERMILLE (2500 = 2.5 epochs) to keep every
comparison integer-exact between Spark and the DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sampling import hash_permille


def mix_sources(
    docs: DataFrame,
    weights_permille: Mapping[str, int],
    default_permille: int,
    source_col: str = "source",
) -> DataFrame:
    """(doc_id, source, epoch): the materialized mixture membership.

    ``n_copies(doc) = weight // 1000 + [hash_permille(doc_id) <
    weight % 1000]`` — exact expected mass, zero variance across the
    corpus per source beyond the hash gate's 2⁻²² bias.
    """
    w = F.lit(default_permille)
    for src, permille in weights_permille.items():
        w = F.when(F.col(source_col) == src, F.lit(permille)).otherwise(w)
    copies = (w / 1000).cast("int") + (
        hash_permille(F.col("doc_id")) < w % 1000
    ).cast("int")
    return (
        docs.select("doc_id", F.col(source_col).alias("source"))
        .withColumn(
            "epoch",
            F.explode(
                F.when(
                    copies > 0, F.sequence(F.lit(0), copies - 1)
                ).otherwise(F.array().cast("array<int>"))
            ),
        )
        .select("doc_id", "source", "epoch")
    )
