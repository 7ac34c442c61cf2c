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

from pyspark.sql import Column, DataFrame, Window
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


def train_val_test_split(
    docs: DataFrame,
    val_permille: int = 50,
    test_permille: int = 50,
) -> DataFrame:
    """Deterministic corpus split: the same md5-permille gate as
    ``stratified_sample`` carves [0,1000) into train / val / test
    bands, so membership is a pure function of doc_id — stable across
    runs, engines, and re-ingests (a doc can never migrate between
    splits when the corpus grows). Map-only; the filter for any one
    split pushes into the scan."""
    pm = hash_permille(F.col("doc_id"))
    train_hi = 1000 - val_permille - test_permille
    split = (
        F.when(pm < train_hi, F.lit("train"))
        .when(pm < train_hi + val_permille, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return docs.select("doc_id", split.alias("split"))


def weighted_sample(docs: DataFrame, scale_permille_per_kchar: int = 2) -> DataFrame:
    """Deterministic size-weighted Bernoulli sample: keep a doc with
    probability proportional to its length (longer docs carry more
    training tokens), implemented as an integer hash gate —
    ``hash_permille(doc_id) < min(n_chars * rate, 1000)``. No RNG, no
    floating point, no count pass; reproducible and map-only."""
    cap = F.least(
        F.col("n_chars") * F.lit(scale_permille_per_kchar), F.lit(1000)
    )
    return docs.filter(hash_permille(F.col("doc_id")) < cap).select(
        "doc_id", "source", "n_chars"
    )


def shuffle_shard(docs: DataFrame, n_shards: int = 16) -> DataFrame:
    """Deterministic global shuffle + shard assignment for training
    dataloaders: shard = md5-bucket of doc_id, position-within-shard =
    rank by the md5 itself. The md5 acts as the shuffle permutation —
    reproducible, engine-independent, and each shard's window sorts
    independently (n_shards-way parallel; no global sort, no RNG).
    Writing one file per shard afterwards is a
    ``partitionBy("shard")`` parquet write."""
    key = F.md5(F.col("doc_id").cast("string"))
    shard = (
        F.conv(F.substring(key, 1, 8), 16, 10).cast("bigint")
        % F.lit(n_shards)
    )
    d = docs.select("doc_id", key.alias("mkey"), shard.alias("shard"))
    w = Window.partitionBy("shard").orderBy("mkey", "doc_id")
    return d.select(
        "doc_id",
        "shard",
        F.row_number().over(w).alias("pos"),
    )
