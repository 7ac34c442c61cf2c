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


def token_budget_select(
    docs: DataFrame, budget_tokens: int, n_ranges: int | None = None
) -> DataFrame:
    """Greedy token-budget selection: walk the corpus in quality order
    (longest docs first, doc_id tiebreak) and keep every doc that
    STARTS under the budget — how a training run fills its token
    quota from a curated pool. Returns
    (doc_id, n_tokens, cum_before), cum_before = tokens admitted
    before this doc in the global quality order.

    The global ordered prefix sum uses the classic two-level
    distributed scan — never a single-partition window:
    ``repartitionByRange`` on the quality key gives ordered,
    NON-OVERLAPPING ranges (partition i holds keys strictly before
    partition i+1's, and ``spark_partition_id`` reflects that order);
    a within-partition window sums each slice, and the per-partition
    totals — one row per range — are exclusive-prefix-summed with a
    window over that tiny relation only, then broadcast back as
    offsets. Unlike ``packing.pack_sequences``'s id-bucket variant,
    this needs no dense key domain: the range partitioner learns the
    quality-key distribution by sampling. cum_before is
    order-determined, so the result is identical whatever boundaries
    the sampler picks.
    """
    from ..functions import text as TX

    if n_ranges is None:
        # r15 (guide §2: scale-adaptive partitioning): a fixed 32
        # ranges caps the parallel scan on a wide cluster; the prefix
        # sum is range-boundary independent (exact int64 totals), so
        # sizing from defaultParallelism changes no result.
        n_ranges = max(
            32, docs.sparkSession.sparkContext.defaultParallelism
        )
    toks = docs.select(
        "doc_id",
        F.coalesce(TX.ws_token_count("text").cast("bigint"), F.lit(0)).alias(
            "n_tokens"
        ),
    )
    order = [F.desc("n_tokens"), F.asc("doc_id")]
    # ``ranged`` feeds TWO branches (the within-partition scan and the
    # per-range totals) that later join on spark_partition_id, so both
    # MUST observe the same range boundaries. RangePartitioner learns
    # boundaries by sampling; if the planner ever compiled two
    # independent range exchanges (instead of one ReusedExchange) the
    # two sides could disagree near partition edges. The lineage cut
    # pins ONE materialized partitioning that both branches provably
    # share — the relation is a narrow (doc_id, n_tokens, _pid)
    # projection, so the materialization is tiny relative to the scan.
    ranged = (
        toks.repartitionByRange(n_ranges, *order)
        .sortWithinPartitions(*order)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    w_in = (
        Window.partitionBy("_pid")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    within = ranged.withColumn("_cum_in", F.sum("n_tokens").over(w_in))
    totals = ranged.groupBy("_pid").agg(F.sum("n_tokens").alias("_ptot"))
    w_p = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        "_pid",
        F.coalesce(F.sum("_ptot").over(w_p), F.lit(0)).alias("_poff"),
    )
    cum_before = F.col("_poff") + F.col("_cum_in") - F.col("n_tokens")
    return (
        within.join(F.broadcast(offsets), "_pid")
        .select(
            "doc_id", "n_tokens", cum_before.alias("cum_before")
        )
        .filter(F.col("cum_before") < budget_tokens)
    )
