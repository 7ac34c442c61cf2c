"""Deterministic sampling operators for training-data curation
(SURVEY.md §2.11 [EXT]).

The 100 TB sampling idiom is HASH-GATED, not random: keep a row iff a
stable hash of its key falls under the stratum's rate. No count pass,
no sort, no RNG state — a pure map-side filter that is reproducible
across runs/engines and pushes into the scan. ``rand()``-based
sampling is none of those things (nondeterministic per task retry).

The md5-derived uniform is computed identically in DuckDB
(``('0x' || substr(md5(k),1,8))::BIGINT % 1000``) so every sample is
oracle-checkable.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_permille(key: Column) -> Column:
    """Stable uniform in [0, 1000): first 8 md5 hex digits of the
    stringified key, mod 1000. 32 bits ≫ 1000 → bias < 2⁻²², fine for
    data curation."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 1000
    )


def stratified_sample(
    docs: DataFrame,
    rates_permille: Mapping[str, int],
    default_permille: int,
    stratum_col: str = "lang",
) -> DataFrame:
    """Per-stratum deterministic sample: keep a doc iff
    ``hash_permille(doc_id) < rate(stratum)``.

    The classic pre-training rebalance (downsample the dominant
    language, keep the tail). The rate table is a CASE expression —
    a handful of strata compile to literals; a thousand-stratum table
    would broadcast-join instead. Map-only: no shuffle, no count."""
    rate = F.lit(default_permille)
    for stratum, permille in rates_permille.items():
        rate = F.when(
            F.col(stratum_col) == stratum, F.lit(permille)
        ).otherwise(rate)
    return docs.filter(hash_permille(F.col("doc_id")) < rate).select(
        "doc_id", stratum_col, "source"
    )
