"""[EXT] Analytical surface beyond the reference: joins (broadcast +
shuffle), as-of join, window extensions (rolling, sliding, session,
top-k, lead/lag, percentiles), multi-dimensional aggregation
(ROLLUP / GROUPING SETS), HAVING, distinct counting.

The reference's only join semantics hide inside MERGE DML
(reference: mnt/dags/unused_02retail_stage.py:101-144) and its only
window is latest-per-key (:109-122); everything here is the natural
widening a warehouse engine needs, each expressed so Catalyst picks
the right physical strategy (broadcast vs sort-merge is asserted in
tests/test_plans.py) and each hash-checked against DuckDB.

Determinism notes: double sums always pass through DECIMAL(18,2)
(data is 2-decimal); revenue terms are rounded half-up to 2 digits
per row BEFORE the decimal sum on both engines; avg = decimal-sum /
count in one double division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import aggregate, join_ext
from ..operators.aggregate import exact_sum
from .registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# -- joins -----------------------------------------------------------------


@query(
    "join_broadcast_dim",
    """
SELECT r_name, n_name, COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
""",
)
def q_join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema dim join: customer ⋈ nation ⋈ region with both dims
    explicitly broadcast — zero shuffle on the fact side until the
    final aggregation."""
    c = _t(spark, sf_dir, "customer")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    r = F.broadcast(_t(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_customers"),
            exact_sum("c_acctbal", "total_acctbal"),
        )
    )


@query(
    "join_shuffle_fact",
    """
SELECT o_orderpriority,
       COUNT(*) AS n_lines,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
           AS revenue
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderpriority
""",
)
def q_join_shuffle_fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-fact ⋈ large-fact equi-join (orders ⋈ lineitem): both
    sides shuffle on the join key — the sort-merge/shuffled-hash
    case AQE manages. Revenue = price·(1-discount) entirely in exact
    decimal (the 2-decimal inputs are exactly representable), summed
    exactly, one final cast to double — no float-rounding divergence
    between engines."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(rev).cast("double").alias("revenue"),
        )
    )


@query(
    "join_asof",
    """
WITH od AS (
    SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice FROM (
        SELECT *, row_number() OVER (
            PARTITION BY o_custkey, o_orderdate
            ORDER BY o_orderkey DESC) AS rn
        FROM orders
    ) WHERE rn = 1
)
SELECT e.event_id, e.user_id, CAST(e.ts AS TIMESTAMP) AS ts,
       o.o_orderkey, o.o_totalprice
FROM events e
ASOF LEFT JOIN od o
  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
""",
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event picks up the newest order of the same
    key at-or-before its timestamp (merge-asof via union + sorted
    last-value carry — one shuffle, linear; operators/join_ext.py).
    Oracle is DuckDB's native ASOF JOIN."""
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = join_ext.dedup_right_for_asof(
        _t(spark, sf_dir, "orders"), "o_custkey", "o_orderdate", "o_orderkey"
    )
    return join_ext.asof_join(
        ev,
        orders,
        key="user_id",
        left_ts="ts",
        right_ts="o_orderdate",
        payload=["o_orderkey", "o_totalprice"],
        right_key="o_custkey",
    )


@query(
    "join_asof_forward",
    """
WITH od AS (
    SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice FROM (
        SELECT *, row_number() OVER (
            PARTITION BY o_custkey, o_orderdate
            ORDER BY o_orderkey DESC) AS rn
        FROM orders
    ) WHERE rn = 1
)
SELECT e.event_id, e.user_id, CAST(e.ts AS TIMESTAMP) AS ts,
       o.o_orderkey, o.o_totalprice
FROM events e
ASOF LEFT JOIN od o
  ON e.user_id = o.o_custkey AND e.ts <= o.o_orderdate
""",
)
def q_join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: each event picks up the EARLIEST order of
    the same key at-or-after its timestamp (the "next upcoming"
    lookup) — same merge-asof single-shuffle carry, scanned in
    reverse. Oracle is DuckDB's native ASOF with the flipped bound."""
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = join_ext.dedup_right_for_asof(
        _t(spark, sf_dir, "orders"), "o_custkey", "o_orderdate", "o_orderkey"
    )
    return join_ext.asof_join(
        ev,
        orders,
        key="user_id",
        left_ts="ts",
        right_ts="o_orderdate",
        payload=["o_orderkey", "o_totalprice"],
        right_key="o_custkey",
        direction="forward",
    )


# -- window extensions -----------------------------------------------------


@query(
    "window_rolling_7d",
    """
WITH daily AS (
    SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
           date_diff('day', DATE '1970-01-01',
                     CAST(date_trunc('day', ts) AS DATE)) AS day_num,
           SUM(CAST(value AS DECIMAL(18,2))) AS day_value
    FROM events GROUP BY 1, 2, 3
)
SELECT user_id, day,
       CAST(SUM(day_value) OVER (
           PARTITION BY user_id ORDER BY day_num
           RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS rolling_7d
FROM daily
""",
)
def q_window_rolling_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day sum per user: daily pre-aggregate (one shuffle)
    then a RANGE frame over day numbers — gap-correct, and the frame
    sum stays exact (decimal) so partial orders don't matter."""
    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "user_id",
            F.to_date("ts").alias("day"),
        )
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)")).alias("day_value")
        )
        .withColumn(
            "day_num", F.datediff("day", F.lit("1970-01-01"))
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day_num")
        .rangeBetween(-6, Window.currentRow)
    )
    return daily.select(
        "user_id",
        "day",
        F.sum("day_value").over(w).cast("double").alias("rolling_7d"),
    )


@query(
    "window_sliding_3d1d",
    """
SELECT CAST(date_trunc('day', ts) - o * INTERVAL '1 day' AS DATE)
           AS window_start,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events, (SELECT unnest(range(3)) AS o)
GROUP BY 1
""",
)
def q_window_sliding_3d1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window: 3-day windows advancing 1 day (each event lands
    in 3 windows). Spark's window() replicates rows window-side;
    the oracle unrolls the same 3 offsets explicitly."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "3 days", "1 day").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            exact_sum("value", "sum_value"),
        )
        .select(
            F.col("w.start").cast("date").alias("window_start"),
            "n_events",
            "sum_value",
        )
    )


@query(
    "window_session_1h",
    """
WITH ordered AS (
    SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
           CASE WHEN CAST(ts AS TIMESTAMP)
                     - lag(CAST(ts AS TIMESTAMP)) OVER w
                     >= INTERVAL '1 hour'
                OR lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL
                THEN 1 ELSE 0 END AS new_session
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
),
sessions AS (
    SELECT user_id, ts, value,
           SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS UNBOUNDED PRECEDING) AS session_id
    FROM ordered
)
SELECT user_id, MIN(ts) AS session_start,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM sessions GROUP BY user_id, session_id
""",
)
def q_window_session_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (1 h inactivity gap) via Spark's native
    session_window; the oracle derives identical sessions with the
    gaps-and-islands idiom (boundary: a gap of exactly 1 h starts a
    new session in both)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "1 hour").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            exact_sum("value", "sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


@query(
    "window_topk_per_group",
    """
SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
    SELECT o_custkey, o_orderkey, o_totalprice,
           row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey) AS rnk
    FROM orders
) WHERE rnk <= 3
""",
)
def q_window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by price — rank-filter window. At
    scale this is the standard 'group top-k' (no global sort; one
    hash shuffle + per-partition heaps via WindowGroupLimit)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rnk")
    )


@query(
    "window_lead_lag",
    """
SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value,
       value - lag(value) OVER w AS delta_prev,
       lead(value) OVER w - value AS delta_next
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
""",
)
def q_window_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-to-event deltas (lag/lead) — deterministic
    (ts, event_id) ordering; subtraction is elementwise double."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        (F.col("value") - F.lag("value").over(w)).alias("delta_prev"),
        (F.lead("value").over(w) - F.col("value")).alias("delta_next"),
    )


@query(
    "window_cumulative",
    """
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
            PARTITION BY o_custkey
            ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS running_spend
FROM orders
""",
)
def q_window_cumulative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per key (lifetime customer spend): one shuffle by
    key, per-partition streaming frame — every prefix sum is an exact
    decimal, cast once, so engines agree row-for-row."""
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("running_spend"),
    )


@query(
    "scd2_intervals",
    """
SELECT o_custkey, o_orderkey, o_totalprice,
       o_orderdate AS valid_from,
       lead(o_orderdate) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
       ) AS valid_to,
       (lead(o_orderdate) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
       ) IS NULL) AS is_current
FROM orders
""",
)
def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 historization: each change
    record's validity interval is [its ts, next change's ts) per key,
    open-ended (is_current) on the latest. One key-shuffled lead
    window — the standard MERGE-free way to build history tables at
    scale (reference's MERGE family only keeps latest state,
    mnt/dags/unused_02retail_stage.py:101-144)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    nxt = F.lead("o_orderdate").over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.col("o_orderdate").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


@query(
    "window_ntile",
    """
SELECT o_orderkey, o_orderpriority,
       ntile(4) OVER (
           PARTITION BY o_orderpriority
           ORDER BY o_totalprice, o_orderkey
       ) AS price_quartile
FROM orders
""",
)
def q_window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group quantile bucketing (price quartile within order
    priority) — deterministic tiebreak on o_orderkey. NTILE needs the
    whole group sorted in one partition, so it is only scale-correct
    PARTITIONed BY a real key (as here); GLOBAL quantile bucketing at
    100 TB goes through approx-quantile cutoffs + a range join
    (agg_approx_quantile) instead."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).alias("price_quartile"),
    )


@query(
    "agg_percentile",
    """
SELECT o_orderstatus,
       quantile_cont(o_totalprice, 0.5) AS p50,
       quantile_cont(o_totalprice, 0.9) AS p90,
       quantile_cont(o_totalprice, 0.99) AS p99
FROM orders GROUP BY o_orderstatus
""",
)
def q_agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group, ≡ DuckDB
    ``quantile_cont`` ((n-1)·p linear interpolation) — computed via
    bucket-counts + one refinement pass
    (operators.aggregate.bucket_refine_quantiles) instead of Spark's
    ``percentile()``, whose per-group full-value buffer cannot
    survive a 100 TB group. Prices go through exact cent encoding;
    interpolation divides back by 100, reconstructing the source
    doubles bit-for-bit."""
    o = _t(spark, sf_dir, "orders")
    cents = o.select(
        "o_orderstatus",
        (F.col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("x"),
    )
    return aggregate.bucket_refine_quantiles(
        cents,
        ["o_orderstatus"],
        "x",
        {"p50": 0.5, "p90": 0.9, "p99": 0.99},
        value_divisor=100.0,
    )


# -- multi-dimensional aggregation ----------------------------------------


@query(
    "agg_rollup",
    """
SELECT r_name, n_name, COUNT(*) AS n_customers
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
""",
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over the region→nation hierarchy (subtotals + grand
    total; one Expand + single shuffle)."""
    c = _t(spark, sf_dir, "customer")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    r = F.broadcast(_t(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(F.count("*").alias("n_customers"))
    )


@query(
    "agg_grouping_sets",
    """
SELECT c_mktsegment, n_name, COUNT(*) AS n_customers
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY GROUPING SETS ((c_mktsegment), (n_name))
""",
)
def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS: per-segment and per-nation counts in
    one pass (vs two scans + union)."""
    c = _t(spark, sf_dir, "customer")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    j = c.join(n, c.c_nationkey == n.n_nationkey)
    j.createOrReplaceTempView("_gs_join")
    return spark.sql(
        """
        SELECT c_mktsegment, n_name, COUNT(*) AS n_customers
        FROM _gs_join
        GROUP BY GROUPING SETS ((c_mktsegment), (n_name))
        """
    )


@query(
    "agg_having",
    """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n_lines
FROM lineitem
GROUP BY l_returnflag, l_linestatus
HAVING COUNT(*) > 1000
""",
)
def q_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + HAVING (post-aggregation filter)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n_lines"))
        .filter(F.col("n_lines") > 1000)
    )


@query(
    "agg_count_distinct",
    """
SELECT o_orderpriority,
       COUNT(DISTINCT o_custkey) AS n_customers,
       COUNT(*) AS n_orders
FROM orders GROUP BY o_orderpriority
""",
)
def q_agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct count per group (Expand-based two-phase
    count-distinct)."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count("*").alias("n_orders"),
    )


@query("agg_approx_distinct")  # sketch-based → rows-only; accuracy in tests
def q_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct count per group — the 100 TB path where
    exact distinct's Expand shuffle is unaffordable; accuracy vs
    exact is asserted in tests/test_analytics.py."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("n_customers")
    )


@query(
    "agg_stats_multi",
    """
SELECT o_orderstatus,
       MIN(o_totalprice) AS min_price,
       MAX(o_totalprice) AS max_price,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
           AS avg_price,
       COUNT(*) AS n_orders
FROM orders GROUP BY o_orderstatus
""",
)
def q_agg_stats_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min/max/avg/count in one aggregation pass; avg as exact
    decimal-sum ÷ count (single double division)."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        (
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
            / F.count("*")
        ).alias("avg_price"),
        F.count("*").alias("n_orders"),
    )


# -- partitioned lake layout ----------------------------------------------


@query(
    "partitioned_write_prune",
    """
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
WHERE CAST(date_trunc('day', ts) AS DATE) = DATE '2024-01-15'
GROUP BY event_type
""",
)
def q_partitioned_write_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned lake round-trip: write events partitioned by
    day (dynamic partition overwrite — the reference's replace=True
    idempotency, SURVEY.md §2.9), read back filtered to ONE day.

    The read plan must show PartitionFilters (asserted in
    tests/test_analytics.py): the scan touches 1/30th of the files —
    the same pruning that makes a [ds, next_ds) incremental run at
    100 TB read only its slice.
    """
    import os

    from ..scratch import scratch_dir

    ev = _t(spark, sf_dir, "events")
    path = scratch_dir(
        "events_by_day_" + os.path.basename(sf_dir.rstrip("/"))
    )
    (
        ev.withColumn("day", F.to_date("ts"))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("day")
        .parquet(path)
    )
    back = spark.read.parquet(path).filter(
        F.col("day") == F.lit("2024-01-15").cast("date")
    )
    return back.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        exact_sum("value", "sum_value"),
    )


# -- pipeline parity (SURVEY.md §3, §7 phase 6) ---------------------------


@query(
    "pipeline_incremental_day",
    None,  # oracle attached below (reuses the flagship oracle + day filter)
)
def q_pipeline_incremental_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One full scheduler day-run (the reference's DAG chain for a
    single ``ds``): extract the [ds, next_ds) slice into the
    day-partitioned raw zone, transform it, read the transformed
    partition back — partition-pruned at every hop and idempotent
    under re-runs (pipelines.py; metamorphic tests in
    tests/test_pipelines.py)."""
    import os

    from .. import pipelines
    from ..scratch import scratch_dir

    ds = "2024-01-15"
    work = scratch_dir(
        "pipeline_day_" + os.path.basename(sf_dir.rstrip("/")),
    )
    pipelines.extract_day(spark, sf_dir, work, ds)
    pipelines.transform_day(spark, work, ds)
    return pipelines.load_warehouse(spark, work)


from .queries_core import FLAGSHIP_ORACLE  # noqa: E402

from .registry import ORACLES  # noqa: E402

ORACLES["pipeline_incremental_day"] = (
    f"SELECT * FROM ({FLAGSHIP_ORACLE}) WHERE date = DATE '2024-01-15'"
)


# -- scale patterns: bucketing, skew salting, JSON source -----------------


@query(
    "join_bucketed_colocated",
    """
SELECT o_orderstatus, COUNT(*) AS n_lines,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderstatus
""",
)
def q_join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located join via bucketed tables: both facts written
    bucketed (8 buckets) + sorted on the join key, so the join runs
    WITHOUT a shuffle exchange on either side (asserted in
    tests/test_analytics.py) — the write-once/join-many idiom that
    removes the dominant cost of repeated fact-fact joins at 100 TB.
    """
    import os

    import shutil

    suffix = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    ot, lt = f"orders_b_{suffix}", f"lineitem_b_{suffix}"
    for src, tbl, key in (("orders", ot, "o_orderkey"), ("lineitem", lt, "l_orderkey")):
        if not spark.catalog.tableExists(tbl):
            # a previous session's managed-table files survive into a
            # fresh in-memory catalog; clear the location or CTAS fails
            from ..scratch import warehouse_dir

            loc = os.path.join(warehouse_dir(spark), tbl)
            if os.path.exists(loc):
                shutil.rmtree(loc)
            (
                _t(spark, sf_dir, src)
                .write.bucketBy(8, key)
                .sortBy(key)
                .mode("overwrite")
                .saveAsTable(tbl)
            )
    o = spark.table(ot)
    li = spark.table(lt)
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_lines"),
            exact_sum("l_quantity", "total_qty"),
        )
    )


@query(
    "join_salted_skew",
    """
SELECT c_nationkey, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY c_nationkey
""",
)
def q_join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted join: the (potentially hot-keyed) fact side gets a
    deterministic salt pmod(event_id, 8); the dim side is exploded
    across all 8 salts; the join key becomes (key, salt) so one hot
    key spreads over 8 reducers. Result is identical to the plain
    join (the oracle). AQE's skew-join split handles the same problem
    adaptively; explicit salting is the belt-and-braces form for
    known-pathological keys.
    """
    ev = _t(spark, sf_dir, "events").withColumn(
        "salt", F.pmod(F.col("event_id"), F.lit(8)).cast("int")
    )
    cust = (
        _t(spark, sf_dir, "customer")
        .select("c_custkey", "c_nationkey")
        .withColumn(
            "salt", F.explode(F.sequence(F.lit(0), F.lit(7)).cast("array<int>"))
        )
    )
    return (
        ev.join(
            cust,
            (ev.user_id == cust.c_custkey) & (ev.salt == cust.salt),
        )
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_events"),
            exact_sum("value", "sum_value"),
        )
    )


@query(
    "json_source_roundtrip",
    """
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events GROUP BY event_type
""",
)
def q_json_source_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines source/sink round-trip: events → .json write →
    schema-explicit read (no inference scan at 100 TB) → aggregate.
    Timestamps travel as ISO strings; values survive exactly."""
    import os

    from pyspark.sql import types as T

    from ..scratch import scratch_dir

    ev = _t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    path = scratch_dir(
        "events_json_" + os.path.basename(sf_dir.rstrip("/")),
    )
    ev.write.mode("overwrite").json(path)
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    back = spark.read.schema(schema).json(path)
    return back.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        exact_sum("value", "sum_value"),
    )


@query(
    "orc_roundtrip",
    """
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events GROUP BY event_type
""",
)
def q_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source/sink round-trip (the second columnar lake format
    Spark ships natively): events → .orc write → read → aggregate.
    ORC readers get the same pushdown/pruning treatment as parquet;
    the oracle runs on the original rows, so the round-trip must be
    value-exact."""
    import os

    from ..scratch import scratch_dir

    ev = _t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    path = scratch_dir(
        "events_orc_" + os.path.basename(sf_dir.rstrip("/")),
    )
    ev.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    return back.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        exact_sum("value", "sum_value"),
    )


@query(
    "text_ngram_topk",
    r"""
WITH toks AS (
    SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
    FROM documents
),
bg AS (
    SELECT w[i] || ' ' || w[i+1] AS bigram
    FROM toks, unnest(range(1, len(w))) AS t(i)
),
counts AS (SELECT bigram, COUNT(*) AS n FROM bg GROUP BY 1)
SELECT bigram, n FROM (
    SELECT bigram, n,
           row_number() OVER (ORDER BY n DESC, bigram) AS rnk
    FROM counts
) WHERE rnk <= 10
""",
)
def q_text_ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-10 word bigrams: one explode + count shuffle +
    ``orderBy().limit(10)`` → TakeOrderedAndProject (per-partition
    10-heaps, driver merges 10 rows per partition — the distinct-
    bigram relation never funnels through one partition; tie-broken
    lexicographically)."""
    from ..functions import text as TX

    docs = _t(spark, sf_dir, "documents")
    bg = docs.select(
        F.explode(TX.word_shingles(TX.tokens("text"), 2)).alias("bigram")
    )
    counts = bg.groupBy("bigram").agg(F.count("*").alias("n"))
    return (
        counts.orderBy(F.desc("n"), F.asc("bigram"))
        .limit(10)
        .select("bigram", "n")
    )


# -- set ops / global top-N / sketches ------------------------------------


@query(
    "sort_limit_topn",
    """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
""",
)
def q_sort_limit_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-100 by price: ORDER BY + LIMIT compiles to
    TakeOrderedAndProject (per-partition heaps + driver merge of 100
    rows — no global sort; plan-asserted), the only sane shape at
    100 TB."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@query(
    "set_intersect",
    """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
""",
)
def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics): nations having both customers
    and suppliers."""
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.intersect(s)


@query(
    "set_except",
    """
SELECT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey AS nationkey FROM supplier
""",
)
def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct semantics): nations with customers but no
    suppliers."""
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.subtract(s)


@query(
    "set_union_distinct",
    """
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey AS nationkey FROM supplier
""",
)
def q_set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION with distinct semantics (the reference only ever uses
    UNION ALL — SURVEY §2.5)."""
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.union(s).distinct()


@query("agg_approx_quantile")  # sketch-based → rows-only; accuracy in tests
def q_agg_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greenwald-Khanna approximate percentiles — the mergeable-sketch
    path for 100 TB where exact percentile's full sort-per-group is
    unaffordable; accuracy vs the exact query tested."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.percentile_approx("o_totalprice", 0.5, 1000).alias("p50"),
        F.percentile_approx("o_totalprice", 0.9, 1000).alias("p90"),
    )


# -- semi/anti/outer joins, pivot, cube, scalar subquery ------------------


@query(
    "join_semi",
    """
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as a left-semi join: customers with >=1 order. Semi join
    never duplicates the left side, so no post-join distinct — the
    probe side streams through one shuffle at most."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(
        o, c.c_custkey == o.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "join_anti",
    """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND EXTRACT(year FROM o.o_orderdate) = 1998)
""",
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as a left-anti join: customers with no 1998 order —
    the churn/retention query shape. The year filter pushes into the
    orders scan before the anti join shrinks its build side."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        F.year("o_orderdate") == 1998
    )
    return c.join(
        o, c.c_custkey == o.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@query(
    "join_left_outer",
    """
SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
       CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE)
         AS total_spent
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey
""",
)
def q_join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join preserving order-less customers (n_orders=0,
    total_spent=0.0): COUNT over the nullable right key + COALESCE'd
    decimal sum match SQL outer-agg null semantics exactly."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")),
                F.lit(0).cast("decimal(18,2)"),
            )
            .cast("double")
            .alias("total_spent"),
        )
    )


@query(
    "pivot_wide",
    """
SELECT o_orderstatus,
       COUNT(CASE WHEN EXTRACT(year FROM o_orderdate) = 1996 THEN 1 END) AS y1996,
       COUNT(CASE WHEN EXTRACT(year FROM o_orderdate) = 1997 THEN 1 END) AS y1997,
       COUNT(CASE WHEN EXTRACT(year FROM o_orderdate) = 1998 THEN 1 END) AS y1998
FROM orders
GROUP BY o_orderstatus
""",
)
def q_pivot_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long→wide PIVOT (inverse of unpivot_melt): order counts by
    status × year. The explicit value list keeps it one pass — no
    extra distinct-values job, which at 100 TB would be a full scan
    before the real one."""
    o = _t(spark, sf_dir, "orders")
    years = [1996, 1997, 1998]
    wide = (
        o.withColumn("yr", F.year("o_orderdate"))
        .groupBy("o_orderstatus")
        .pivot("yr", years)
        .count()
    )
    return wide.select(
        "o_orderstatus",
        *[
            F.coalesce(F.col(str(y)), F.lit(0)).alias(f"y{y}")
            for y in years
        ],
    )


@query(
    "agg_cube",
    """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 2^2 grouping combinations in one Expand + single
    shuffle (completes the rollup/grouping-sets family)."""
    o = _t(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders")
    )


@query(
    "filter_scalar_subquery",
    """
SELECT o_orderkey, o_totalprice
FROM orders
WHERE o_totalprice > 1.5 * (
  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
  FROM orders
)
""",
)
def q_filter_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery filter: orders above 1.5× the mean price. The
    scalar aggregates in one pass and broadcasts as a literal into the
    scan filter; the mean is a decimal-sum / count double division so
    both engines compute the identical threshold bit-for-bit."""
    o = _t(spark, sf_dir, "orders")
    mean = F.broadcast(
        o.agg(
            (
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast(
                    "double"
                )
                / F.count("*")
            ).alias("_mean")
        )
    )
    return (
        o.crossJoin(mean)
        .filter(F.col("o_totalprice") > 1.5 * F.col("_mean"))
        .select("o_orderkey", "o_totalprice")
    )


@query(
    "join_bloom_filtered",
    """
SELECT l_returnflag, COUNT(*) AS n_lines,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
           AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority = '1-URGENT'
  AND o_orderdate >= TIMESTAMP '2001-06-01'
GROUP BY l_returnflag
""",
)
def q_join_bloom_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective-dim ⋈ big-fact: the filter keeps a sliver of orders,
    but a plain shuffle join still shuffles EVERY lineitem row. The
    scale fix is Spark's runtime bloom filter (
    spark.sql.optimizer.runtime.bloomFilter.enabled): the optimizer
    builds a bloom over the surviving o_orderkeys and injects
    might_contain(l_orderkey) into the lineitem scan, so ~the sliver's
    share of the fact survives to the exchange. Size thresholds keep
    it off at toy scale — tests/test_analytics.py lowers them and
    asserts the bloom appears; semantics are unchanged either way
    (the same oracle passes with and without)."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderdate") >= F.to_timestamp(F.lit("2001-06-01")))
    )
    li = _t(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(rev).cast("double").alias("revenue"),
        )
    )


@query(
    "join_range_banded",
    """
WITH bands(band, lo, hi) AS (
    VALUES ('tiny', 0.0, 25.0), ('small', 25.0, 120.0),
           ('mid', 120.0, 333.0), ('large', 333.0, 1000.0)
)
SELECT band, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events JOIN bands ON value >= lo AND value < hi
GROUP BY band
""",
)
def q_join_range_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval-predicate) join via bin bucketing: Spark would
    execute `value >= lo AND value < hi` as a nested-loop join (O(n·m)
    row comparisons — unusable at 100 TB even with a broadcast side).
    Instead each band explodes to the fixed-width bins it overlaps and
    the fact side equi-joins on its bin, so candidate pairing is a
    hash lookup and the exact bounds filter only within-bin candidates
    — the standard bin-optimized range-join rewrite."""
    BIN = 50.0
    bands = spark.createDataFrame(
        [
            ("tiny", 0.0, 25.0),
            ("small", 25.0, 120.0),
            ("mid", 120.0, 333.0),
            ("large", 333.0, 1000.0),
        ],
        "band STRING, lo DOUBLE, hi DOUBLE",
    ).withColumn(
        "bin",
        F.explode(
            F.sequence(
                F.floor(F.col("lo") / BIN),
                # hi is exclusive: a band ending exactly on a bin edge
                # does not overlap the next bin
                F.floor((F.col("hi") - 1e-9) / BIN),
            )
        ),
    )
    ev = _t(spark, sf_dir, "events").withColumn(
        "bin", F.floor(F.col("value") / BIN)
    )
    return (
        ev.join(F.broadcast(bands), "bin")
        .filter((F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")))
        .groupBy("band")
        .agg(
            F.count("*").alias("n_events"),
            exact_sum("value", "sum_value"),
        )
    )


@query(
    "bucket_global_quantile",
    """
WITH c AS (
    SELECT quantile_cont(o_totalprice, 0.25) AS q1,
           quantile_cont(o_totalprice, 0.50) AS q2,
           quantile_cont(o_totalprice, 0.75) AS q3
    FROM orders
)
SELECT o_orderkey,
       CASE WHEN o_totalprice < q1 THEN 1
            WHEN o_totalprice < q2 THEN 2
            WHEN o_totalprice < q3 THEN 3
            ELSE 4 END AS price_quartile
FROM orders, c
""",
)
def q_bucket_global_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GLOBAL quantile bucketing without a global sort (the
    scale-correct alternative to an unpartitioned NTILE, which funnels
    the table through ONE partition): compute the three quartile
    cutoffs as a broadcast 1-row scalar, then bucket with a narrow
    CASE over the scan. The cutoffs come from bucket counts + one
    refinement pass (operators.aggregate.bucket_refine_quantiles,
    keys=[]) — exact ≡ DuckDB ``quantile_cont`` bit-for-bit, with no
    stage buffering more than max(|buckets|, width) values, unlike
    ``percentile()``'s whole-table buffer."""
    o = _t(spark, sf_dir, "orders")
    cents = o.select(
        (F.col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("x")
    )
    cuts = aggregate.bucket_refine_quantiles(
        cents,
        [],
        "x",
        {"q1": 0.25, "q2": 0.50, "q3": 0.75},
        value_divisor=100.0,
    )
    return o.crossJoin(F.broadcast(cuts)).select(
        "o_orderkey",
        F.when(F.col("o_totalprice") < F.col("q1"), 1)
        .when(F.col("o_totalprice") < F.col("q2"), 2)
        .when(F.col("o_totalprice") < F.col("q3"), 3)
        .otherwise(4)
        .alias("price_quartile"),
    )


@query(
    "profile_heavy_hitters",
    """
WITH tot AS (SELECT COUNT(*) AS n FROM events)
SELECT user_id,
       COUNT(*) AS n_events,
       CAST(COUNT(*) AS DOUBLE) / MAX(n) AS share
FROM events, tot
GROUP BY user_id
ORDER BY n_events DESC, user_id
LIMIT 20
""",
)
def q_profile_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew diagnostic: the 20 heaviest keys and their share of the
    table — what you run BEFORE choosing a salting factor for a skewed
    join. One map-side-combined groupBy + TakeOrderedAndProject; the
    total is a broadcast scalar, so no second full scan shuffles."""
    ev = _t(spark, sf_dir, "events")
    tot = ev.agg(F.count("*").alias("n"))
    return (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
        .crossJoin(F.broadcast(tot))
        .select(
            "user_id",
            "n_events",
            (F.col("n_events").cast("double") / F.col("n")).alias("share"),
        )
        .orderBy(F.desc("n_events"), "user_id")
        .limit(20)
    )


@query(
    "window_rank_suite",
    """
SELECT o_orderkey,
       rank() OVER w AS rnk,
       dense_rank() OVER w AS drnk,
       percent_rank() OVER w AS prnk,
       cume_dist() OVER w AS cdist
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
""",
)
def q_window_rank_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The four ranking functions in ONE window pass (rank /
    dense_rank / percent_rank / cume_dist share a single sort —
    Catalyst fuses same-spec window functions into one Window node).
    percent_rank and cume_dist are exact integer ratios, so the
    doubles hash identically across engines."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    return o.select(
        "o_orderkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.percent_rank().over(w).alias("prnk"),
        F.cume_dist().over(w).alias("cdist"),
    )


@query(
    "str_funcs_suite",
    """
SELECT c_custkey,
       upper(c_name) AS uname,
       length(c_name) AS name_len,
       lpad(CAST(c_custkey AS VARCHAR), 12, '0') AS padded_key,
       replace(c_name, 'Customer#', 'C-') AS short_name,
       substr(c_name, 10) AS key_digits,
       levenshtein(c_name, 'Customer#000000000') AS edit_dist
FROM customer
""",
)
def q_str_funcs_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string-function coverage in one narrow map: case, length,
    pad, replace, substring, and Levenshtein edit distance — all
    JVM-side codegen'd expressions, no UDFs."""
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("uname"),
        F.length("c_name").cast("bigint").alias("name_len"),
        F.lpad(F.col("c_custkey").cast("string"), 12, "0").alias(
            "padded_key"
        ),
        F.regexp_replace(
            "c_name", F.lit("Customer#"), F.lit("C-")
        ).alias("short_name"),
        F.substring("c_name", 10, 2_000_000).alias("key_digits"),
        F.levenshtein(F.col("c_name"), F.lit("Customer#000000000"))
        .cast("bigint")
        .alias("edit_dist"),
    )


@query(
    "date_funcs_suite",
    """
SELECT o_orderkey,
       CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
       CAST(last_day(o_orderdate) AS DATE) AS month_end,
       CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus_3m,
       date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since,
       CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
       CAST(EXTRACT(quarter FROM o_orderdate) AS INT) AS qtr
FROM orders
""",
)
def q_date_funcs_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar date-function coverage in one narrow map: truncation,
    month arithmetic, day differences, day-of-week, quarter — all
    codegen'd JVM expressions. (Engines number weekdays differently:
    Spark dayofweek is 1=Sunday, DuckDB's is 0=Sunday — the oracle
    adds 1.)"""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").cast("date").alias(
            "month_start"
        ),
        F.last_day("o_orderdate").alias("month_end"),
        F.add_months("o_orderdate", 3).alias("plus_3m"),
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")
        )
        .cast("bigint")
        .alias("days_since"),
        F.dayofweek("o_orderdate").cast("int").alias("dow"),
        F.quarter("o_orderdate").cast("int").alias("qtr"),
    )


@query(
    "agg_zscore_exact",
    """
WITH g AS (
    SELECT o_orderkey, o_orderpriority,
           CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS c
    FROM orders
),
a AS (
    SELECT o_orderkey, c,
           SUM(c) OVER w AS s1,
           SUM(CAST(c AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0)))
               OVER w AS s2,
           COUNT(*) OVER w AS n
    FROM g WINDOW w AS (PARTITION BY o_orderpriority)
),
z AS (
    SELECT o_orderkey,
           (CAST(c AS DOUBLE) - CAST(s1 AS DOUBLE) / n)
           / sqrt((CAST(s2 AS DOUBLE)
                   - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
                  / (n - 1)) AS zraw
    FROM a
)
SELECT o_orderkey, floor(zraw * 1000000 + 0.5) / 1000000 AS zscore
FROM z
""",
)
def q_agg_zscore_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score normalization with DETERMINISTIC moments:
    stddev_samp's running/merged float accumulation differs across
    engines and partitionings, so mean and variance derive from EXACT
    power sums over integer cents: Σc stays int64, while Σc² rides
    DECIMAL(38,0) — at 10× the dev scale Σc² already exceeds int64
    (caught by an sf0.1 differential; ANSI Spark raises
    ARITHMETIC_OVERFLOW), and at any scale the decimal sum is exact.
    Wide-decimal→double lowering can differ by 1 ulp between engines
    (Spark's BigDecimal path rounds once, DuckDB's int128 path twice),
    so the final z is snapped to 6 digits with the repo's
    floor(x·1e6+0.5) contract — same rounded value on both engines on
    any partitioning. The window is key-partitioned (never global)."""
    o = _t(spark, sf_dir, "orders")
    c = (
        F.col("o_totalprice").cast("decimal(12,2)") * 100
    ).cast("bigint")
    cd = c.cast("decimal(19,0)")
    w = Window.partitionBy("o_orderpriority")
    a = o.select(
        "o_orderkey",
        c.alias("c"),
        F.sum(c).over(w).alias("s1"),
        F.sum(cd * cd).over(w).alias("s2"),
        F.count("*").over(w).alias("n"),
    )
    mean = F.col("s1").cast("double") / F.col("n")
    var = (
        F.col("s2").cast("double")
        - F.col("s1").cast("double") * F.col("s1").cast("double") / F.col("n")
    ) / (F.col("n") - 1)
    zraw = (F.col("c").cast("double") - mean) / F.sqrt(var)
    return a.select(
        "o_orderkey",
        (F.floor(zraw * 1000000 + F.lit(0.5)) / 1000000).alias("zscore"),
    )


@query(
    "parquet_schema_merge",
    """
WITH v1 AS (
    SELECT o_orderkey, o_totalprice, NULL AS o_orderpriority
    FROM orders WHERE o_orderkey % 2 = 0
),
v2 AS (
    SELECT o_orderkey, o_totalprice, o_orderpriority
    FROM orders WHERE o_orderkey % 2 = 1
)
SELECT o_orderkey, o_totalprice, o_orderpriority
FROM (SELECT * FROM v1 UNION ALL SELECT * FROM v2)
""",
)
def q_parquet_schema_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lake schema evolution: an old writer produced 2-column files, a
    new writer adds a column; ``mergeSchema`` reconciles the footers
    and back-fills nulls. At 100 TB pin the superset schema explicitly
    instead (footer merging is a distributed job over every file) —
    this query demonstrates the read semantics the pinned schema must
    reproduce."""
    import os

    from ..scratch import scratch_dir

    o = _t(spark, sf_dir, "orders")
    root = scratch_dir(
        "schema_merge_" + os.path.basename(sf_dir.rstrip("/"))
    )
    (
        o.filter(F.col("o_orderkey") % 2 == 0)
        .select("o_orderkey", "o_totalprice")
        .write.mode("overwrite")
        .parquet(os.path.join(root, "v=1"))
    )
    (
        o.filter(F.col("o_orderkey") % 2 == 1)
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
        .write.mode("overwrite")
        .parquet(os.path.join(root, "v=2"))
    )
    back = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(root, "v=1"), os.path.join(root, "v=2")
    )
    return back.select("o_orderkey", "o_totalprice", "o_orderpriority")


@query(
    "window_moving_avg_rows",
    """
SELECT event_id, user_id,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
       / COUNT(*) OVER w AS avg_4
FROM events
WINDOW w AS (PARTITION BY user_id
             ORDER BY CAST(ts AS TIMESTAMP), event_id
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
""",
)
def q_window_moving_avg_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROWS-frame moving average (last 4 events per user) — the
    count-based frame complements the time-based RANGE frames
    (window_rolling_7d). The mean is an explicit exact-decimal frame
    sum over an explicit frame count — engines' AVG(decimal) return
    types differ (Spark keeps decimal and truncates, DuckDB promotes
    to double), so AVG itself is never used."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        (
            F.sum(F.col("value").cast("decimal(18,2)"))
            .over(w)
            .cast("double")
            / F.count("*").over(w)
        ).alias("avg_4"),
    )


@query(
    "events_forward_fill",
    """
WITH daily AS (
    SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS day_value
    FROM events GROUP BY 1, 2
),
bounds AS (
    SELECT user_id, MIN(day) AS lo, MAX(day) AS hi FROM daily GROUP BY 1
),
spine AS (
    SELECT user_id, CAST(s.d AS DATE) AS day
    FROM bounds, unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS s(d)
)
SELECT s.user_id, s.day,
       LAST_VALUE(d.day_value IGNORE NULLS) OVER (
           PARTITION BY s.user_id ORDER BY s.day
           ROWS UNBOUNDED PRECEDING
       ) AS filled_value,
       (d.day_value IS NULL) AS was_filled
FROM spine s LEFT JOIN daily d ON d.user_id = s.user_id AND d.day = s.day
""",
)
def q_events_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap filling: build each user's full day spine
    (sequence+explode, no driver loop), left-join observed daily sums,
    forward-fill holes with last_value(ignore nulls) over a key-
    partitioned running frame — the classic time-series densification,
    shuffled once by user."""
    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
        )
        .agg(exact_sum("value", "day_value"))
    )
    spine = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
        .select(
            "user_id",
            F.explode(F.sequence("lo", "hi")).alias("day"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        spine.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            F.last("day_value", ignorenulls=True)
            .over(w)
            .alias("filled_value"),
            F.col("day_value").isNull().alias("was_filled"),
        )
    )


@query(
    "agg_histogram",
    """
SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bucket,
       COUNT(*) AS n,
       CAST(MIN(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS lo,
       CAST(MAX(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS hi
FROM orders GROUP BY 1
""",
)
def q_agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram (50k buckets of order value): the
    bucket id is a narrow floor-division, so the whole histogram is
    one map-side-combined groupBy whose exchange carries only the
    bucket rows — the profiling primitive that replaces a sort-based
    percentile sweep when bucket edges are known."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.floor(F.col("o_totalprice") / 50000.0)
            .cast("bigint")
            .alias("bucket")
        )
        .agg(
            F.count("*").alias("n"),
            F.min(F.col("o_totalprice").cast("decimal(12,2)"))
            .cast("double")
            .alias("lo"),
            F.max(F.col("o_totalprice").cast("decimal(12,2)"))
            .cast("double")
            .alias("hi"),
        )
    )


@query(
    "window_first_last_nth",
    """
SELECT o_orderkey,
       FIRST_VALUE(o_orderkey) OVER w AS first_key,
       LAST_VALUE(o_orderkey) OVER (
           PARTITION BY o_orderpriority
           ORDER BY o_totalprice, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
       ) AS last_key,
       NTH_VALUE(o_orderkey, 3) OVER w AS third_key
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority
             ORDER BY o_totalprice, o_orderkey
             ROWS UNBOUNDED PRECEDING)
""",
)
def q_window_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value coverage with explicit
    frames — last_value over the running default frame is the classic
    footgun (it returns the CURRENT row), so the full-partition frame
    is spelled out; deterministic tiebreak ordering throughout."""
    o = _t(spark, sf_dir, "orders")
    running = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_totalprice", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    full = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_totalprice", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        F.first("o_orderkey").over(running).alias("first_key"),
        F.last("o_orderkey").over(full).alias("last_key"),
        F.nth_value("o_orderkey", 3).over(running).alias("third_key"),
    )


@query(
    "docs_cap_per_source",
    """
SELECT doc_id, source FROM (
    SELECT doc_id, source,
           row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
           ) AS rn
    FROM documents
) WHERE rn <= 20
""",
)
def q_docs_cap_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain capping: keep at most 20 docs per source, chosen by
    deterministic md5 order (a reproducible "random" cap — the
    crawl-curation step that stops one domain from dominating the
    corpus). Rank-limited window → WindowGroupLimit per-partition
    heaps before the source exchange; no RNG, no count pass."""
    d = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        d.select("doc_id", "source")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select("doc_id", "source")
    )


@query(
    "agg_corr_exact",
    """
WITH g AS (
    SELECT l_returnflag,
           CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT) AS x,
           CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS y
    FROM lineitem
),
a AS (
    SELECT l_returnflag, COUNT(*) AS n,
           SUM(CAST(x AS DECIMAL(19,0))) AS sx,
           SUM(CAST(y AS DECIMAL(19,0))) AS sy,
           SUM(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))) AS sxx,
           SUM(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) AS syy,
           SUM(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) AS sxy
    FROM g GROUP BY 1
)
SELECT l_returnflag, n,
       floor((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (sqrt(n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * sqrt(n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
             * 1000000 + 0.5) / 1000000 AS corr_qty_price
FROM a
""",
)
def q_agg_corr_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group Pearson correlation with DETERMINISTIC moments:
    ``corr()``'s float accumulation is partitioning-dependent, so all
    five power sums ride exact integer cents (Σx/Σy as DECIMAL(19,0)
    sums, Σx²/Σy²/Σxy as DECIMAL(38,0) — int64 would overflow at 10×
    dev scale, same lesson as agg_zscore_exact), combined in double
    once and snapped to 6 digits. One partial-agg shuffle on the
    3-value group key."""
    li = _t(spark, sf_dir, "lineitem")
    x = (F.col("l_quantity").cast("decimal(12,2)") * 100).cast("bigint")
    y = (F.col("l_extendedprice").cast("decimal(12,2)") * 100).cast(
        "bigint"
    )
    xd, yd = x.cast("decimal(19,0)"), y.cast("decimal(19,0)")
    a = li.select(
        "l_returnflag", xd.alias("xd"), yd.alias("yd")
    ).groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum("xd").alias("sx"),
        F.sum("yd").alias("sy"),
        F.sum(F.col("xd") * F.col("xd")).alias("sxx"),
        F.sum(F.col("yd") * F.col("yd")).alias("syy"),
        F.sum(F.col("xd") * F.col("yd")).alias("sxy"),
    )
    n = F.col("n")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy, sxy = (
        F.col("sxx").cast("double"),
        F.col("syy").cast("double"),
        F.col("sxy").cast("double"),
    )
    raw = (n * sxy - sx * sy) / (
        F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    )
    return a.select(
        "l_returnflag",
        "n",
        (F.floor(raw * 1000000 + F.lit(0.5)) / 1000000).alias(
            "corr_qty_price"
        ),
    )


@query(
    "agg_winsorize",
    """
WITH c AS (
    SELECT l_returnflag,
           CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS x
    FROM lineitem
),
p AS (
    SELECT l_returnflag,
           quantile_cont(x, 0.05) AS p05,
           quantile_cont(x, 0.95) AS p95
    FROM c GROUP BY 1
),
w AS (
    SELECT c.l_returnflag, c.x,
           CAST(floor(least(greatest(CAST(c.x AS DOUBLE), p.p05), p.p95)
                      + 0.5) AS BIGINT) AS xw
    FROM c JOIN p USING (l_returnflag)
)
SELECT l_returnflag, COUNT(*) AS n,
       floor(SUM(CAST(x AS DECIMAL(19,0))) / COUNT(*) / 100.0 * 1000000
             + 0.5) / 1000000 AS mean_raw,
       floor(SUM(CAST(xw AS DECIMAL(19,0))) / COUNT(*) / 100.0 * 1000000
             + 0.5) / 1000000 AS mean_winsorized
FROM w GROUP BY 1
""",
)
def q_agg_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean per group: clamp extended price to the exact
    interpolated [p05, p95] band (Spark ``percentile`` ≡ DuckDB
    ``quantile_cont``), snap the clamped value to integer cents, then
    average via exact DECIMAL sums — the robust-statistics guard
    against fat-tail outliers. The quantile band comes from bucket
    counts + one refinement pass
    (operators.aggregate.bucket_refine_quantiles): no stage sorts or
    buffers more than max(|buckets|, bucket_width) rows per group,
    so the shape survives a billion-row return-flag group; the clamp
    +mean pass is one map-side-combined 3-group agg with the band
    broadcast onto the scan."""
    li = _t(spark, sf_dir, "lineitem")
    cents = li.select(
        "l_returnflag",
        (F.col("l_extendedprice").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("x"),
    )
    # ONE pass over lineitem: the narrow (flag, cents) projection is
    # lineage-cut and shared by all three consumers (bucket counts,
    # refinement, clamp+mean) — previously each re-scanned the fact.
    # A value histogram is deliberately NOT the shared relation:
    # extendedprice is ~97% distinct, so the histogram would be as
    # big as the fact and its exchange dearer than the rescans.
    cents = cents.localCheckpoint(eager=False)
    p = aggregate.bucket_refine_quantiles(
        cents, ["l_returnflag"], "x", {"p05": 0.05, "p95": 0.95},
        materialize=False,
    )
    w = cents.join(F.broadcast(p), "l_returnflag").withColumn(
        "xw",
        F.floor(
            F.least(
                F.greatest(F.col("x").cast("double"), F.col("p05")),
                F.col("p95"),
            )
            + 0.5
        ).cast("bigint"),
    )
    n = F.count("*")
    return w.groupBy("l_returnflag").agg(
        n.alias("n"),
        (
            F.floor(
                F.sum(F.col("x").cast("decimal(19,0)")) / n / 100.0 * 1000000
                + F.lit(0.5)
            )
            / 1000000
        ).alias("mean_raw"),
        (
            F.floor(
                F.sum(F.col("xw").cast("decimal(19,0)")) / n / 100.0 * 1000000
                + F.lit(0.5)
            )
            / 1000000
        ).alias("mean_winsorized"),
    )


@query(
    "events_funnel_batch",
    """
WITH v AS (
    SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS t_view
    FROM events WHERE event_type = 'view' GROUP BY 1
),
c AS (
    SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t_click
    FROM events e JOIN v USING (user_id)
    WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) > v.t_view
    GROUP BY 1
),
p AS (
    SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t_purchase
    FROM events e JOIN c USING (user_id)
    WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > c.t_click
    GROUP BY 1
)
SELECT (SELECT COUNT(*) FROM v) AS n_view,
       (SELECT COUNT(*) FROM c) AS n_view_click,
       (SELECT COUNT(*) FROM p) AS n_view_click_purchase
""",
)
def q_events_funnel_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered three-stage funnel (view → later click → later
    purchase): per-stage first-timestamp aggs chained by inner joins
    on user_id, so every stage stays hash-partitioned on the same key
    (AQE plans the 3-row-per-user joins without re-exchange); the
    final stage counts are single-row global aggs. No window over all
    events, no session state — the batch mirror of
    stream_stream_funnel."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.agg(F.count("*").alias("n_view"))
        .crossJoin(c.agg(F.count("*").alias("n_view_click")))
        .crossJoin(
            p.agg(F.count("*").alias("n_view_click_purchase"))
        )
    )


def _morton16(x, y):
    """Interleave the low 16 bits of two integer columns into a 32-bit
    Morton (Z-order) key — pure integer Column arithmetic, identical
    in DuckDB."""
    z = F.lit(0).cast("bigint")
    for i in range(16):
        z = (
            z
            + F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(
                F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1
            )
        )
    return z


def _morton16_sql(x: str, y: str) -> str:
    terms = []
    for i in range(16):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


@query(
    "layout_zorder",
    f"""
WITH k AS (
    SELECT o_orderkey,
           CAST(o_custkey AS BIGINT) & 65535 AS xk,
           CAST(date_diff('day', DATE '1970-01-01', o_orderdate) AS BIGINT)
           & 65535 AS yk
    FROM orders
)
SELECT o_orderkey, {_morton16_sql('xk', 'yk')} AS zkey,
       ({_morton16_sql('xk', 'yk')}) >> 27 AS file_bucket
FROM k
""",
)
def q_layout_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over (customer, order day):
    interleaving the two dimensions' bits gives a 1-D sort key whose
    ranges are 2-D-local, so range-partitioned files prune on BOTH
    predicates (the Delta/Iceberg OPTIMIZE ZORDER idiom, computed
    with plain integer Column arithmetic). ``file_bucket`` = top 5
    Morton bits ≈ the 32 files a repartitionByRange write would cut;
    map-only, no shuffle — the sort happens in the writer."""
    o = _t(spark, sf_dir, "orders")
    xk = F.col("o_custkey").cast("bigint").bitwiseAND(F.lit(65535))
    yk = (
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01"))
        .cast("bigint")
        .bitwiseAND(F.lit(65535))
    )
    k = o.select("o_orderkey", xk.alias("xk"), yk.alias("yk"))
    z = _morton16(F.col("xk"), F.col("yk"))
    return k.select(
        "o_orderkey",
        z.alias("zkey"),
        F.shiftright(z, 27).alias("file_bucket"),
    )


@query(
    "events_retention_cohorts",
    """
WITH f AS (
    SELECT user_id, CAST(MIN(date_trunc('day', ts)) AS DATE) AS cohort_day
    FROM events GROUP BY 1
)
SELECT f.cohort_day,
       CAST(date_diff('day', f.cohort_day,
                      CAST(date_trunc('day', e.ts) AS DATE)) AS BIGINT)
           AS day_offset,
       COUNT(DISTINCT e.user_id) AS n_users
FROM events e JOIN f USING (user_id)
GROUP BY 1, 2
""",
)
def q_events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity day,
    counted distinct on each (cohort, day-offset) cell — the classic
    product-analytics rollup. Two aggregations, both hash-keyed on
    user_id first (the cohort agg and the join stay co-partitioned;
    AQE plans one exchange), then the small (cohort, offset)-keyed
    distinct count; no window over the event stream."""
    ev = _t(spark, sf_dir, "events").select("user_id", "ts")
    first = ev.groupBy("user_id").agg(
        F.to_date(F.date_trunc("day", F.min("ts"))).alias("cohort_day")
    )
    return (
        ev.join(first, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff(
                F.to_date(F.date_trunc("day", "ts")), F.col("cohort_day")
            )
            .cast("bigint")
            .alias("day_offset"),
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@query(
    "supplier_pareto_share",
    """
WITH r AS (
    SELECT l_suppkey,
           SUM(CAST(l_extendedprice AS DECIMAL(12,2))
               * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS revenue
    FROM lineitem GROUP BY 1
),
t AS (SELECT SUM(revenue) AS total FROM r),
c AS (
    SELECT l_suppkey, revenue,
           SUM(revenue) OVER (ORDER BY revenue DESC, l_suppkey
               ROWS UNBOUNDED PRECEDING) AS cum_rev
    FROM r
)
SELECT l_suppkey, CAST(revenue AS DOUBLE) AS revenue,
       CAST(cum_rev AS DOUBLE) / CAST(total AS DOUBLE) AS cum_share,
       CAST(cum_rev - revenue AS DOUBLE) / CAST(total AS DOUBLE)
           < 0.8 AS in_top80
FROM c, t
""",
)
def q_supplier_pareto_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto (80/20) revenue concentration per supplier: each
    supplier's cumulative revenue share in descending-revenue order,
    flagged while the running share BEFORE the supplier is under 80%.
    The global ordered cumulative sum rides the same two-level
    repartitionByRange prefix scan as docs_token_budget_select
    (ordered non-overlapping ranges + prefix-summed per-range totals
    — never a single-partition window). Revenues are EXACT scale-4
    decimals end to end (the q1 convention: no intermediate rounding
    casts), so the cumulative is order-exact; doubles appear only in
    the final share division."""
    from pyspark.sql import Window as W

    li = _t(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(12,2)")
            * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))
        ).alias("revenue")
    )
    order = [F.desc("revenue"), F.asc("l_suppkey")]
    # lineage cut: both consumers (within-scan + per-range totals)
    # must see ONE set of sampled range boundaries — same rationale
    # as operators/sampling.py token_budget_select
    # r15: range count scale-adaptive (floor 32 keeps the local
    # harness layout; a wide cluster gets one range per core). The
    # two-level cumulative is range-boundary independent — exact
    # decimal sums, offsets from per-range totals — so the count
    # changes no result.
    n_ranges = max(
        32, spark.sparkContext.defaultParallelism
    )
    ranged = (
        rev.repartitionByRange(n_ranges, *order)
        .sortWithinPartitions(*order)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    w_in = (
        W.partitionBy("_pid")
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, 0)
    )
    within = ranged.withColumn("_cum_in", F.sum("revenue").over(w_in))
    totals = ranged.groupBy("_pid").agg(F.sum("revenue").alias("_ptot"))
    # r16 (guide §2.4): the grand total is the exact decimal sum of
    # the per-range totals — deriving it from `totals` (a ≤n_ranges
    # relation the plan already builds) instead of a separate
    # rev-aggregate removes a second full lineitem scan + groupBy
    # exchange. Decimal sums are order-free exact, so the value (and
    # the final double share) is bit-identical.
    total = totals.agg(F.sum("_ptot").alias("total"))
    w_p = W.orderBy("_pid").rowsBetween(W.unboundedPreceding, -1)
    offsets = totals.select(
        "_pid",
        F.coalesce(F.sum("_ptot").over(w_p), F.lit(0)).alias("_poff"),
    )
    cum = F.col("_poff") + F.col("_cum_in")
    return (
        within.join(F.broadcast(offsets), "_pid")
        .crossJoin(F.broadcast(total))
        .select(
            "l_suppkey",
            F.col("revenue").cast("double").alias("revenue"),
            (cum.cast("double") / F.col("total").cast("double")).alias(
                "cum_share"
            ),
            (
                (cum - F.col("revenue")).cast("double")
                / F.col("total").cast("double")
                < 0.8
            ).alias("in_top80"),
        )
    )


@query(
    "customer_rfm_segments",
    """
WITH m AS (
    SELECT o_custkey,
           date_diff('day', CAST(MAX(o_orderdate) AS DATE),
                     DATE '1998-08-02') AS recency_days,
           COUNT(*) AS frequency,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT)
               AS monetary_cents
    FROM orders GROUP BY 1
),
q AS (
    SELECT quantile_cont(recency_days, 0.25) AS r1,
           quantile_cont(recency_days, 0.50) AS r2,
           quantile_cont(recency_days, 0.75) AS r3,
           quantile_cont(frequency, 0.25) AS f1,
           quantile_cont(frequency, 0.50) AS f2,
           quantile_cont(frequency, 0.75) AS f3,
           quantile_cont(monetary_cents, 0.25) AS m1,
           quantile_cont(monetary_cents, 0.50) AS m2,
           quantile_cont(monetary_cents, 0.75) AS m3
    FROM m
)
SELECT o_custkey, CAST(recency_days AS BIGINT) AS recency_days,
       frequency, monetary_cents,
       CASE WHEN recency_days < r1 THEN 1 WHEN recency_days < r2 THEN 2
            WHEN recency_days < r3 THEN 3 ELSE 4 END AS r_score,
       CASE WHEN frequency < f1 THEN 1 WHEN frequency < f2 THEN 2
            WHEN frequency < f3 THEN 3 ELSE 4 END AS f_score,
       CASE WHEN monetary_cents < m1 THEN 1 WHEN monetary_cents < m2 THEN 2
            WHEN monetary_cents < m3 THEN 3 ELSE 4 END AS m_score
FROM m, q
""",
)
def q_customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per-customer recency/frequency/monetary
    metrics, each scored 1-4 by its GLOBAL quartile. All three
    quartile triples come from one bounded-state source
    (operators.aggregate.bucket_refine_quantiles, keys=[]) and ride
    back as a broadcast 1-row relation each; the scoring pass is a
    narrow CASE over the customer-metric aggregate — the
    bucket_global_quantile idiom applied three-wide."""
    o = _t(spark, sf_dir, "orders")
    m = o.groupBy("o_custkey").agg(
        F.datediff(
            F.lit("1998-08-02").cast("date"),
            F.max(F.col("o_orderdate").cast("date")),
        )
        .cast("bigint")
        .alias("recency_days"),
        F.count("*").alias("frequency"),
        (F.sum(F.col("o_totalprice").cast("decimal(12,2)")) * 100)
        .cast("bigint")
        .alias("monetary_cents"),
    )
    # the customer-metric aggregate feeds SEVEN consumers (3 × two
    # quantile branches + the scoring pass) — lineage-cut it so the
    # orders groupBy runs once, not four times
    m = m.localCheckpoint(eager=False)
    cuts = {}
    for col, pre in (
        ("recency_days", "r"),
        ("frequency", "f"),
        ("monetary_cents", "m"),
    ):
        cuts[pre] = aggregate.bucket_refine_quantiles(
            m.select(col),
            [],
            col,
            {f"{pre}1": 0.25, f"{pre}2": 0.50, f"{pre}3": 0.75},
            materialize=False,
        )

    def score(col: str, pre: str) -> F.Column:
        v = F.col(col).cast("double")
        return (
            F.when(v < F.col(f"{pre}1"), 1)
            .when(v < F.col(f"{pre}2"), 2)
            .when(v < F.col(f"{pre}3"), 3)
            .otherwise(4)
            .alias(f"{pre}_score")
        )

    out = m
    for pre in ("r", "f", "m"):
        out = out.crossJoin(F.broadcast(cuts[pre]))
    return out.select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary_cents",
        score("recency_days", "r"),
        score("frequency", "f"),
        score("monetary_cents", "m"),
    )


@query(
    "orders_copurchase_pairs",
    """
WITH basket AS (
    SELECT DISTINCT l.l_orderkey, p.p_brand
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
pairs AS (
    SELECT a.p_brand AS brand_a, b.p_brand AS brand_b
    FROM basket a JOIN basket b
      ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
)
SELECT brand_a, brand_b, COUNT(*) AS n_orders
FROM pairs GROUP BY brand_a, brand_b
ORDER BY n_orders DESC, brand_a, brand_b
LIMIT 20
""",
)
def q_orders_copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket pair mining: the 20 brand pairs most often bought
    together in one order. (brand_a, brand_b, n_orders).

    Scale shape: the brand dim is broadcast onto lineitem (no fact
    shuffle for the enrich); ONE l_orderkey exchange folds each order
    into its sorted distinct brand array, and the pairs are generated
    NARROWLY from that array with higher-order functions — no
    self-join at all (a naive basket-self-join plans l_orderkey
    exchanges per subtree; Spark does not reuse them even under AQE —
    measured 5 shuffles vs these 2). Pair blow-up is O(basket²) per
    order, bounded by the ~7-line basket. The pair-count exchange is
    over the |brands|² key space and the top-20 is
    TakeOrderedAndProject. Plan-asserted: exactly 2 hash exchanges.
    """
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    basket = l.join(F.broadcast(p), l.l_partkey == p.p_partkey).select(
        "l_orderkey", "p_brand"
    )
    arrs = basket.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("p_brand")).alias("bs")
    )
    pairs = arrs.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("bs"),
                    lambda x, i: F.transform(
                        F.slice(F.col("bs"), i + 2, F.size("bs")),
                        lambda y: F.struct(
                            x.alias("brand_a"), y.alias("brand_b")
                        ),
                    ),
                )
            )
        ).alias("pr")
    ).select("pr.*")
    return (
        pairs.groupBy("brand_a", "brand_b")
        .agg(F.count("*").alias("n_orders"))
        .orderBy(F.desc("n_orders"), "brand_a", "brand_b")
        .limit(20)
    )


@query("agg_hll_sketch_rollup")  # DataSketches binary — no DuckDB analog
def q_agg_hll_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level mergeable distinct counts: HLL sketch per
    (event_type, day), merged to monthly estimates without re-scanning
    raw events (operators/sketches.py). Error vs exact COUNT(DISTINCT)
    measured in tests + PLANS.md."""
    from ..operators import sketches

    return sketches.hll_rollup(
        sketches.hll_daily_sketches(_t(spark, sf_dir, "events"))
    ).orderBy("event_type", "month")


@query("agg_kll_quantile_sketch")  # DataSketches binary — no DuckDB analog
def q_agg_kll_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level mergeable quantiles: KLL sketch per (status, month),
    merged per status, p50/p90/p99 read from the merged sketch — the
    one-scan bounded-error alternative to the exact bucket-refine
    quantile path. Error measured in tests + PLANS.md."""
    from ..operators import sketches

    return sketches.kll_quantile_rollup(_t(spark, sf_dir, "orders"))


@query(
    "events_anomaly_mad",
    """
WITH daily AS (
    SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
           COUNT(*) AS cnt
    FROM events GROUP BY 1, 2
),
med AS (
    SELECT event_type, quantile_cont(cnt, 0.5) AS med
    FROM daily GROUP BY 1
),
dev AS (
    SELECT d.event_type, d.day, d.cnt, m.med,
           abs(d.cnt - m.med) AS dev
    FROM daily d JOIN med m USING (event_type)
),
mad AS (
    SELECT event_type, quantile_cont(dev, 0.5) AS mad
    FROM dev GROUP BY 1
)
SELECT d.event_type, d.day, CAST(d.cnt AS BIGINT) AS cnt,
       d.med, m.mad, (d.dev > 3 * m.mad) AS is_anomaly
FROM dev d JOIN mad m USING (event_type)
""",
)
def q_events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust volume-anomaly detection: flag (event_type, day) cells
    whose daily event count deviates from the type's median by more
    than 3× the median absolute deviation — the outlier-resistant
    alternative to z-scores (one wild day cannot drag its own
    threshold).

    Exactness: daily counts are integers, so both medians are dyadic
    rationals (k or k+0.5 steps) that IEEE doubles represent exactly
    — the `dev > 3·mad` gate compares identical values on both
    engines, no rounding rule in play. Scale shape: the only
    data-sized shuffle is the (event_type, day) count with map-side
    combine; the two `percentile` aggregates buffer one value per DAY
    per type (bounded by the calendar, not by event volume — the
    reason plain exact percentile is the right tool here while
    lineitem-sized value sets use bucket_refine_quantiles), and both
    medians broadcast back onto the ~types×days relation."""
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(
            "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
        )
        .agg(F.count("*").alias("cnt"))
    )
    med = daily.groupBy("event_type").agg(
        F.percentile("cnt", F.lit(0.5)).alias("med")
    )
    dev = daily.join(F.broadcast(med), "event_type").withColumn(
        "dev", F.abs(F.col("cnt") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile("dev", F.lit(0.5)).alias("mad")
    )
    return dev.join(F.broadcast(mad), "event_type").select(
        "event_type",
        "day",
        "cnt",
        "med",
        "mad",
        (F.col("dev") > F.lit(3) * F.col("mad")).alias("is_anomaly"),
    )


def _copurchase_edge_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STORED co-purchase edge list for ``sf_dir``: materialized to
    scratch parquet once per (sf_dir, lineitem mtime) — the
    production shape where the graph is built at ingest and
    centrality/traversal queries read the edge artifact, never
    re-deriving 2M+ pairs per run (same stored-index pattern as
    _minhash_corpus_index and the IVF-PQ code table)."""
    from ..operators import graph
    from ..scratch import stored_index

    def build() -> DataFrame:
        e = graph.copurchase_edges(
            _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "part")
        )
        ow = e.groupBy(F.col("src").alias("_s")).agg(
            F.sum("weight").alias("outw")
        )
        # store the transition probability too, so centrality runs
        # start straight at superstep 1 (pagerank prenormalized=True)
        return e.join(ow, e["src"] == ow["_s"]).select(
            "src",
            "dst",
            "weight",
            (F.col("weight") / F.col("outw")).alias("p"),
        )

    return stored_index(
        spark, sf_dir, "lineitem", "copurchase_edges", "edges.parquet", build
    )


# PageRank oracle: the SAME 8 synchronous supersteps as chained CTEs.
# Bit-exactness across engines comes from binary-fixed-point
# contributions (operators/graph.pagerank quantize_bits=30): every
# term is FLOOR(rank·p·2^30)/2^30, a multiple of 2^-30, so the
# per-destination sums are EXACT in any order on any engine; all
# remaining ops (IEEE multiplies, the final base + d·Σ) are
# order-free. Literals use e-notation so DuckDB parses them as DOUBLE
# (a bare 0.85 would be DECIMAL and change the arithmetic).
_PR_Q = "1073741824e0"  # 2^30
_PR_STEP = """
r{next} AS (
    SELECT e.dst AS node,
           (1e0 - 0.85e0) / CAST(nn.n AS DOUBLE)
           + 0.85e0 * SUM(FLOOR(r{cur}.rank * e.p * {q}) / {q}) AS rank
    FROM e JOIN r{cur} ON e.src = r{cur}.node, nn
    GROUP BY e.dst, nn.n
)"""
_PAGERANK_ORACLE = (
    """
WITH basket AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pw AS (
    SELECT a.l_partkey AS src, b.l_partkey AS dst,
           CAST(COUNT(*) AS DOUBLE) AS w
    FROM basket a JOIN basket b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
    GROUP BY 1, 2
),
e AS (SELECT src, dst, w / SUM(w) OVER (PARTITION BY src) AS p FROM pw),
nn AS (SELECT COUNT(DISTINCT src) AS n FROM e),
deg AS (
    SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS n_neighbors
    FROM e GROUP BY 1
),
r0 AS (
    SELECT src AS node, 1e0 / CAST(nn.n AS DOUBLE) AS rank
    FROM (SELECT DISTINCT src FROM e), nn
),"""
    + ",".join(
        _PR_STEP.format(cur=i, next=i + 1, q=_PR_Q) for i in range(8)
    )
    + """
SELECT r8.node, r8.rank, deg.n_neighbors
FROM r8 JOIN deg USING (node)
ORDER BY rank DESC, node LIMIT 50
"""
)


@query("graph_pagerank_copurchase", _PAGERANK_ORACLE)
def q_graph_pagerank_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank centrality over the STORED part co-purchase edge
    index: the 50 most structurally central parts (node, rank,
    n_neighbors). Hash-checked since round 8: contributions are
    floored to binary fixed point (quantize_bits=30 — multiples of
    2^-30 sum exactly in any order), which makes all 8 supersteps
    bit-identical to the oracle's chained CTEs regardless of
    partitioning; the pytest gate additionally checks the
    full-precision path against a single-machine power iteration to
    1e-9 (operators/graph.py)."""
    from ..operators import graph

    edges = _copurchase_edge_index(spark, sf_dir)
    degree = edges.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("n_neighbors")
    )
    return (
        graph.pagerank(edges, prenormalized=True, quantize_bits=30)
        .join(degree, "node")
        .orderBy(F.desc("rank"), "node")
        .limit(50)
    )


@query(
    "events_trend_ols",
    """
WITH daily AS (
    SELECT event_type,
           datediff('day', DATE '1995-01-01',
                    CAST(date_trunc('day', ts) AS DATE)) AS x,
           COUNT(*) AS y
    FROM events GROUP BY 1, 2
),
m AS (
    SELECT event_type,
           COUNT(*) AS n,
           SUM(CAST(x AS BIGINT)) AS sx,
           SUM(CAST(y AS BIGINT)) AS sy,
           SUM(CAST(x * x AS BIGINT)) AS sxx,
           SUM(CAST(x * y AS BIGINT)) AS sxy
    FROM daily GROUP BY 1
)
SELECT event_type, CAST(n AS BIGINT) AS n_days,
       CAST(sy AS BIGINT) AS total_events,
       CAST(n * sxy - sx * sy AS DOUBLE)
           / CAST(n * sxx - sx * sx AS DOUBLE) AS slope,
       (CAST(sy AS DOUBLE)
        - (CAST(n * sxy - sx * sy AS DOUBLE)
           / CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))
           / n AS intercept
FROM m
""",
)
def q_events_trend_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type volume trend: exact least-squares slope/intercept of
    daily event count vs day offset (days since 1995-01-01) — the
    capacity-planning "is this stream growing" primitive.

    Exactness: all four moments are exact int64 sums over ~calendar
    rows, and the normal-equation polynomial stays in exactly-
    representable double range while n·Σxy < 2^53 (holds through
    ~10^14 daily events; beyond that widen the moments to DECIMAL as
    agg_corr_exact does). Identical op order on both engines → the
    two final divisions are bit-identical. One map-side-combined
    (type, day) count shuffle + one tiny per-type aggregate."""
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.datediff(
                F.date_trunc("day", "ts").cast("date"),
                F.lit("1995-01-01").cast("date"),
            ).alias("x"),
        )
        .agg(F.count("*").alias("y"))
    )
    m = daily.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("x").cast("bigint")).alias("sx"),
        F.sum("y").alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast("bigint")).alias("sxx"),
        F.sum((F.col("x") * F.col("y")).cast("bigint")).alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    slope = num / den
    return m.select(
        "event_type",
        F.col("n").alias("n_days"),
        F.col("sy").alias("total_events"),
        slope.alias("slope"),
        (
            (F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
            / F.col("n")
        ).alias("intercept"),
    )


@query(
    "events_changepoint_cusum",
    """
WITH daily AS (
    SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
           COUNT(*) AS cnt
    FROM events GROUP BY 1, 2
),
st AS (
    SELECT event_type, CAST(SUM(cnt) AS DOUBLE) / COUNT(*) AS mean_daily
    FROM daily GROUP BY 1
),
cs AS (
    SELECT d.event_type, d.day, d.cnt, st.mean_daily,
           SUM(d.cnt - st.mean_daily) OVER (
               PARTITION BY d.event_type ORDER BY d.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS cusum
    FROM daily d JOIN st USING (event_type)
),
rk AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY event_type ORDER BY abs(cusum) DESC, day
    ) AS rn
    FROM cs
)
SELECT event_type, day AS cp_day, CAST(cnt AS BIGINT) AS cnt,
       mean_daily, cusum AS cusum_peak
FROM rk WHERE rn = 1
""",
)
def q_events_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint estimate per event type: the day where the
    running sum of (daily count − overall mean) peaks in magnitude —
    the classic single-changepoint location statistic for "when did
    this stream's level shift".

    Exactness: the running sum folds int-minus-double terms in
    day order (identical sequential order on both engines →
    bit-identical doubles); the peak pick tiebreaks on day. Scale
    shape: one (type, day) count shuffle; the windows run over
    calendar-bounded per-type partitions (~days rows each), and the
    per-type mean broadcasts back."""
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(
            "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
        )
        .agg(F.count("*").alias("cnt"))
    )
    st = daily.groupBy("event_type").agg(
        (F.sum("cnt").cast("double") / F.count("*")).alias("mean_daily")
    )
    w_cs = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cs = daily.join(F.broadcast(st), "event_type").withColumn(
        "cusum", F.sum(F.col("cnt") - F.col("mean_daily")).over(w_cs)
    )
    w_rk = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("cusum")).desc(), "day"
    )
    return (
        cs.withColumn("rn", F.row_number().over(w_rk))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("day").alias("cp_day"),
            "cnt",
            "mean_daily",
            F.col("cusum").alias("cusum_peak"),
        )
    )


# LPA oracle: the SAME 5 synchronous supersteps as chained CTEs. Every
# round is exact — integer labels, integer-valued weight sums, and a
# total-order argmax (weight DESC, label ASC) — so no quantization is
# needed; the iteration was only ever "not SQL-expressible" until
# written as a fixed CTE chain.
_LPA_STEP = """
w{next} AS (
    SELECT e.dst AS n2, l.label, SUM(e.w) AS w
    FROM e JOIN l{cur} l ON e.src = l.node GROUP BY 1, 2
),
l{next} AS (
    SELECT n2 AS node, label FROM (
        SELECT n2, label,
               ROW_NUMBER() OVER (
                   PARTITION BY n2 ORDER BY w DESC, label) AS rn
        FROM w{next}) WHERE rn = 1
)"""
_LPA_ORACLE = (
    """
WITH basket AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pw AS (
    SELECT a.l_partkey AS src, b.l_partkey AS dst,
           CAST(COUNT(*) AS DOUBLE) AS w
    FROM basket a JOIN basket b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
    GROUP BY 1, 2
),
e AS (SELECT src, dst, w FROM pw WHERE w >= 2),
l0 AS (SELECT DISTINCT src AS node, src AS label FROM e),"""
    + ",".join(_LPA_STEP.format(cur=i, next=i + 1) for i in range(5))
    + """
SELECT label, CAST(COUNT(*) AS BIGINT) AS n_members
FROM l5 GROUP BY 1 ORDER BY n_members DESC, label LIMIT 20
"""
)


@query("graph_communities_lpa", _LPA_ORACLE)
def q_graph_communities_lpa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection on the STORED co-purchase edge index via
    synchronous label propagation: the 20 largest communities
    (label, n_members) among parts co-purchased at least TWICE (the
    weight≥2 filter prunes the all-connecting single-co-occurrence
    haze that would collapse the dense graph into one giant
    community — and cuts the superstep input ~10×). Hash-checked
    since round 8: every round is exact (integer labels,
    integer-valued weight sums, min-label tiebreak), so the 5-round
    fixpoint is mirrored verbatim as chained CTEs in the oracle; the
    planted-graph pytest gate remains (operators/graph.py)."""
    from ..operators import graph

    edges = _copurchase_edge_index(spark, sf_dir).filter(
        F.col("weight") >= 2
    )
    return (
        graph.label_propagation(edges)
        .groupBy("label")
        .agg(F.count("*").alias("n_members"))
        .orderBy(F.desc("n_members"), "label")
        .limit(20)
    )


@query(
    "graph_triangle_stats",
    """
WITH basket AS (
    SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
e AS (
    SELECT a.l_partkey AS src, b.l_partkey AS dst
    FROM basket a JOIN basket b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2 HAVING COUNT(*) >= 2
),
tri AS (
    SELECT COUNT(*) AS n_triangles
    FROM e e1
    JOIN e e2 ON e1.dst = e2.src
    WHERE EXISTS (
        SELECT 1 FROM e e3 WHERE e3.src = e1.src AND e3.dst = e2.dst
    )
),
deg AS (
    SELECT node, COUNT(*) AS d FROM (
        SELECT src AS node FROM e UNION ALL SELECT dst FROM e
    ) GROUP BY 1
),
w AS (SELECT CAST(SUM(d * (d - 1)) // 2 AS BIGINT) AS n_wedges FROM deg),
ne AS (SELECT COUNT(*) AS n_edges FROM e)
SELECT ne.n_edges, tri.n_triangles, w.n_wedges,
       CASE WHEN w.n_wedges > 0
            THEN 3 * CAST(tri.n_triangles AS DOUBLE) / w.n_wedges
            ELSE 0.0 END AS global_clustering
FROM tri, w, ne
""",
)
def q_graph_triangle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census + global clustering coefficient of the strong
    (weight ≥ 2) co-purchase subgraph, computed off the STORED edge
    index via the ordered-triangle join — the one graph op whose
    whole computation is SQL-expressible, so it is hash-checked
    (operators/graph.triangle_stats)."""
    from ..operators import graph

    return graph.triangle_stats(_copurchase_edge_index(spark, sf_dir))


@query(
    "join_asof_nearest",
    """
WITH od AS (
    SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice FROM (
        SELECT *, row_number() OVER (
            PARTITION BY o_custkey, o_orderdate
            ORDER BY o_orderkey DESC) AS rn
        FROM orders
    ) WHERE rn = 1
),
b AS (
    SELECT e.event_id, o.o_orderdate AS bt, o.o_orderkey AS bk,
           o.o_totalprice AS bp
    FROM events e
    ASOF LEFT JOIN od o
      ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
),
f AS (
    SELECT e.event_id, o.o_orderdate AS ft, o.o_orderkey AS fk,
           o.o_totalprice AS fp
    FROM events e
    ASOF LEFT JOIN od o
      ON e.user_id = o.o_custkey AND e.ts <= o.o_orderdate
)
SELECT e.event_id, e.user_id, CAST(e.ts AS TIMESTAMP) AS ts,
       CASE WHEN bt IS NULL THEN fk
            WHEN ft IS NULL THEN bk
            WHEN epoch_us(e.ts) - epoch_us(bt)
                 <= epoch_us(ft) - epoch_us(e.ts) THEN bk
            ELSE fk END AS o_orderkey,
       CASE WHEN bt IS NULL THEN fp
            WHEN ft IS NULL THEN bp
            WHEN epoch_us(e.ts) - epoch_us(bt)
                 <= epoch_us(ft) - epoch_us(e.ts) THEN bp
            ELSE fp END AS o_totalprice
FROM events e
LEFT JOIN b USING (event_id)
LEFT JOIN f USING (event_id)
""",
)
def q_join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-in-time as-of: each event takes the order of the same
    key CLOSEST in absolute time (ties → backward) — the
    sensor-alignment variant. ONE key shuffle: both directional
    carries are windows over the same merged relation
    (operators/join_ext.asof_join_nearest); the oracle composes two
    native DuckDB ASOF joins and picks per-row."""
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = join_ext.dedup_right_for_asof(
        _t(spark, sf_dir, "orders"), "o_custkey", "o_orderdate", "o_orderkey"
    )
    return join_ext.asof_join_nearest(
        ev,
        orders,
        key="user_id",
        left_ts="ts",
        right_ts="o_orderdate",
        payload=["o_orderkey", "o_totalprice"],
        right_key="o_custkey",
    )


@query(
    "orders_assoc_rules",
    """
WITH basket AS (
    SELECT DISTINCT l.l_orderkey, p.p_brand
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM basket),
na AS (SELECT p_brand, COUNT(*) AS n_a FROM basket GROUP BY 1),
nab AS (
    SELECT a.p_brand AS brand_a, b.p_brand AS brand_b, COUNT(*) AS n_ab
    FROM basket a JOIN basket b
      ON a.l_orderkey = b.l_orderkey AND a.p_brand <> b.p_brand
    GROUP BY 1, 2
)
SELECT brand_a, brand_b, CAST(n_ab AS BIGINT) AS n_ab,
       CAST(n_ab AS DOUBLE) / n.n_orders AS support,
       CAST(n_ab AS DOUBLE) / x.n_a AS confidence,
       CAST(n_ab AS DOUBLE) * n.n_orders / x.n_a / y.n_a AS lift
FROM nab
JOIN na x ON x.p_brand = brand_a
JOIN na y ON y.p_brand = brand_b, n
ORDER BY lift DESC, brand_a, brand_b
LIMIT 20
""",
)
def q_orders_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule mining over brand baskets: the 20 directed
    rules a→b with the highest lift, with support and confidence —
    the market-basket trio (extends orders_copurchase_pairs' raw
    counts into the actual recommendation metrics).

    Exactness: every count is an exact integer; support/confidence
    are ONE division each, lift is the identical left-associated
    double chain (n_ab·N)/n_a/n_b on both engines (products stay
    under 2^53). Scale shape: the same narrow basket-array idiom
    (no basket self-join — pairs explode per-row from the sorted
    basket, both directions for directed rules); per-brand counts
    broadcast back onto the |brands|²-bounded pair relation; top-20
    is TakeOrderedAndProject."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    # r16 (guide §2.3/§2.4, reworking the r15 basket pin the driver
    # bench read flat-to-negative): every consumer derives from the
    # per-order brand-set relation, and collect_set ITSELF dedups —
    # so the separate distinct exchange disappears and the single
    # orderkey exchange (with map-side partial collect_set) is the
    # only corpus-scale shuffle. n = rows of arrs (≡ countDistinct
    # orderkey), na = exploded per-brand order counts (≡ counts over
    # the distinct (order, brand) relation) — both exact identities.
    arrs = (
        l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .select("l_orderkey", "p_brand")
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("p_brand")).alias("bs"))
        .localCheckpoint(eager=False)
    )
    n = arrs.agg(F.count("*").alias("n_orders"))
    na = (
        arrs.select(F.explode("bs").alias("p_brand"))
        .groupBy("p_brand")
        .agg(F.count("*").alias("n_a"))
    )
    nab = (
        arrs.select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.col("bs"),
                        lambda a: F.filter(
                            F.transform(
                                F.col("bs"),
                                lambda b: F.struct(
                                    a.alias("brand_a"), b.alias("brand_b")
                                ),
                            ),
                            lambda s: s["brand_a"] != s["brand_b"],
                        ),
                    )
                )
            ).alias("e")
        )
        .select("e.brand_a", "e.brand_b")
        .groupBy("brand_a", "brand_b")
        .agg(F.count("*").alias("n_ab"))
    )
    na_a = na.select(
        F.col("p_brand").alias("_ba"), F.col("n_a").alias("n_a_a")
    )
    na_b = na.select(
        F.col("p_brand").alias("_bb"), F.col("n_a").alias("n_a_b")
    )
    return (
        nab.join(F.broadcast(na_a), F.col("brand_a") == F.col("_ba"))
        .join(F.broadcast(na_b), F.col("brand_b") == F.col("_bb"))
        .crossJoin(F.broadcast(n))
        .select(
            "brand_a",
            "brand_b",
            "n_ab",
            (F.col("n_ab").cast("double") / F.col("n_orders")).alias(
                "support"
            ),
            (F.col("n_ab").cast("double") / F.col("n_a_a")).alias(
                "confidence"
            ),
            (
                F.col("n_ab").cast("double")
                * F.col("n_orders")
                / F.col("n_a_a")
                / F.col("n_a_b")
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "brand_a", "brand_b")
        .limit(20)
    )


@query(
    "events_activity_streaks",
    """
WITH daily AS (
    SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
    FROM events
),
grp AS (
    SELECT user_id, day,
           datediff('day', DATE '1995-01-01', day)
           - row_number() OVER (PARTITION BY user_id ORDER BY day) AS g
    FROM daily
),
streak AS (
    SELECT user_id, g, COUNT(*) AS len, MIN(day) AS streak_start
    FROM grp GROUP BY 1, 2
)
SELECT user_id, CAST(len AS BIGINT) AS longest_streak, streak_start
FROM (
    SELECT *, row_number() OVER (
        PARTITION BY user_id ORDER BY len DESC, streak_start
    ) AS rn FROM streak
) WHERE rn = 1
""",
)
def q_events_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: each user's longest run of consecutive active
    days and when it started (tiebreak: earliest). The classic
    day-index-minus-row-number island key — all integers/dates, fully
    hash-checked. Scale shape: one (user, day) distinct shuffle, then
    every window/aggregate rides the same user_id partitioning (one
    Exchange; calendar-bounded per-user partitions)."""
    daily = (
        _t(spark, sf_dir, "events")
        .select(
            "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
        )
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day")
    grp = daily.withColumn(
        "g",
        F.datediff(F.col("day"), F.lit("1995-01-01").cast("date"))
        - F.row_number().over(w),
    )
    streak = grp.groupBy("user_id", "g").agg(
        F.count("*").alias("len"), F.min("day").alias("streak_start")
    )
    pick = Window.partitionBy("user_id").orderBy(
        F.desc("len"), F.asc("streak_start")
    )
    return (
        streak.withColumn("rn", F.row_number().over(pick))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("len").alias("longest_streak"),
            "streak_start",
        )
    )


@query(
    "events_markov_transitions",
    """
WITH seq AS (
    SELECT user_id, event_type,
           lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) AS next_type
    FROM events
),
n AS (
    SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS n
    FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2
),
tot AS (SELECT from_type, SUM(n) AS t FROM n GROUP BY 1)
SELECT n.from_type, n.to_type, CAST(n.n AS BIGINT) AS n,
       CAST(n.n AS DOUBLE) / CAST(t AS DOUBLE) AS prob
FROM n JOIN tot USING (from_type)
ORDER BY from_type, to_type
""",
)
def q_events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next event type | current), the session-flow /
    next-action-prediction primitive. The (ts, event_id) sort key is
    unique so every lead() is deterministic; counts are exact ints
    with ONE division. Scale shape: one user_id window shuffle (the
    same Exchange the session/funnel family uses), then a
    |types|²-bounded aggregate; row totals broadcast back."""
    seq = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.lead("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("next_type"),
    )
    n = (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count("*").alias("n"))
    )
    tot = n.groupBy("from_type").agg(F.sum("n").alias("t"))
    return (
        n.join(F.broadcast(tot), "from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            (F.col("n").cast("double") / F.col("t").cast("double")).alias(
                "prob"
            ),
        )
        .orderBy("from_type", "to_type")
    )


@query(
    "orders_cohort_ltv",
    """
WITH first_order AS (
    SELECT o_custkey, MIN(o_orderdate) AS fd FROM orders GROUP BY 1
),
aged AS (
    SELECT CAST(date_trunc('month', f.fd) AS DATE) AS cohort_month,
           (EXTRACT(year FROM o.o_orderdate) - EXTRACT(year FROM f.fd)) * 12
           + (EXTRACT(month FROM o.o_orderdate) - EXTRACT(month FROM f.fd))
               AS age_months,
           o.o_totalprice, o.o_custkey
    FROM orders o JOIN first_order f USING (o_custkey)
)
SELECT cohort_month, CAST(age_months AS BIGINT) AS age_months,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       COUNT(DISTINCT o_custkey) AS n_active_customers
FROM aged
GROUP BY 1, 2
""",
)
def q_orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value matrix: customers grouped by first-order
    month, revenue and active-customer counts accumulated per
    integer month-age — the LTV companion of the retention matrix
    (events_retention_cohorts). Month arithmetic is all-integer
    (year·12+month differences) and revenue is an exact decimal sum,
    so the matrix hashes identically. Scale shape: the first-order
    aggregate and the enrich join share the o_custkey shuffle (AQE
    co-partitions); the final aggregate is calendar²-bounded."""
    o = _t(spark, sf_dir, "orders")
    first = o.groupBy("o_custkey").agg(F.min("o_orderdate").alias("fd"))
    aged = o.join(first, "o_custkey").select(
        F.date_trunc("month", "fd").cast("date").alias("cohort_month"),
        (
            (F.year("o_orderdate") - F.year("fd")) * 12
            + (F.month("o_orderdate") - F.month("fd"))
        ).alias("age_months"),
        "o_totalprice",
        "o_custkey",
    )
    return aged.groupBy(
        "cohort_month", F.col("age_months").cast("bigint").alias("age_months")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue"),
        F.countDistinct("o_custkey").alias("n_active_customers"),
    )


@query(
    "graph_degree_stats",
    """
WITH basket AS (
    SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
e AS (
    SELECT a.l_partkey AS src, b.l_partkey AS dst
    FROM basket a JOIN basket b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2 HAVING COUNT(*) >= 2
),
deg AS (
    SELECT node, COUNT(*) AS d FROM (
        SELECT src AS node FROM e UNION ALL SELECT dst FROM e
    ) GROUP BY 1
)
SELECT CAST(d AS BIGINT) AS degree, COUNT(*) AS n_nodes
FROM deg GROUP BY 1 ORDER BY degree
""",
)
def q_graph_degree_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the strong co-purchase subgraph (how
    connectivity is spread — the skew/hub diagnostic read before
    choosing broadcast vs shuffle for graph supersteps). Reads the
    STORED edge index; all-integer counting, hash-checked."""
    edges = _copurchase_edge_index(spark, sf_dir).filter(
        (F.col("weight") >= 2) & (F.col("src") < F.col("dst"))
    )
    deg = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("degree"))
    )
    return (
        deg.groupBy("degree")
        .agg(F.count("*").alias("n_nodes"))
        .orderBy("degree")
    )


@query(
    "events_hourly_seasonality",
    """
WITH h AS (
    SELECT event_type,
           CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour_of_day,
           COUNT(*) AS n
    FROM events GROUP BY 1, 2
),
tot AS (SELECT event_type, SUM(n) AS t FROM h GROUP BY 1)
SELECT h.event_type, h.hour_of_day, CAST(h.n AS BIGINT) AS n,
       CAST(h.n AS DOUBLE) / CAST(t AS DOUBLE) AS share
FROM h JOIN tot USING (event_type)
ORDER BY event_type, hour_of_day
""",
)
def q_events_hourly_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day activity profile per event type (the capacity /
    traffic-shaping seasonality curve): count and within-type share
    for each of the 24 hours. One map-side-combined count shuffle to
    a 24·|types| relation; totals broadcast back. Exact ints, one
    division — hash-checked."""
    h = (
        _t(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.hour("ts").cast("bigint").alias("hour_of_day"),
        )
        .agg(F.count("*").alias("n"))
    )
    tot = h.groupBy("event_type").agg(F.sum("n").alias("t"))
    return (
        h.join(F.broadcast(tot), "event_type")
        .select(
            "event_type",
            "hour_of_day",
            "n",
            (F.col("n").cast("double") / F.col("t").cast("double")).alias(
                "share"
            ),
        )
        .orderBy("event_type", "hour_of_day")
    )


@query(
    "customer_churn_inactive",
    """
WITH cutoff AS (
    SELECT MAX(o_orderdate) - INTERVAL 90 DAY AS c FROM orders
),
active AS (
    SELECT DISTINCT o_custkey FROM orders, cutoff WHERE o_orderdate > c
)
SELECT o.o_custkey AS custkey,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           AS lifetime_value,
       MAX(o.o_orderdate) AS last_order
FROM orders o
WHERE NOT EXISTS (
    SELECT 1 FROM active a WHERE a.o_custkey = o.o_custkey
)
GROUP BY 1
""",
)
def q_customer_churn_inactive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Churn candidates: customers with NO order in the 90 days
    before the dataset's last order date, with order count, exact-
    decimal lifetime value, and last-order date — the win-back
    campaign feed. Plan shape: the cutoff is a 1-row broadcast
    scalar; the recently-active key set prunes via a broadcast
    anti-join (it is far smaller than the customer dimension); one
    custkey aggregate. Hash-checked."""
    o = _t(spark, sf_dir, "orders")
    # Cutoff stays in TIMESTAMP space (max − 90 days, no date casts)
    # so rows with a time-of-day component land on the same side of
    # the boundary as the oracle's raw-timestamp compare.
    cutoff = o.agg(
        (F.max("o_orderdate") - F.expr("INTERVAL 90 DAYS")).alias("c")
    )
    active = (
        o.crossJoin(F.broadcast(cutoff))
        .filter(F.col("o_orderdate") > F.col("c"))
        .select("o_custkey")
        .distinct()
    )
    return (
        o.join(F.broadcast(active), "o_custkey", "left_anti")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("lifetime_value"),
            F.max("o_orderdate").alias("last_order"),
        )
    )


@query(
    "events_user_diversity",
    """
WITH pt AS (
    SELECT user_id, event_type, COUNT(*) AS n
    FROM events GROUP BY 1, 2
),
agg AS (
    SELECT user_id, SUM(n) AS total, SUM(n * n) AS sum_sq,
           COUNT(*) AS n_types
    FROM pt GROUP BY 1
)
SELECT user_id, CAST(total AS BIGINT) AS n_events,
       CAST(n_types AS BIGINT) AS n_types,
       1.0 - CAST(sum_sq AS DOUBLE) / (CAST(total AS DOUBLE) * total)
           AS simpson_diversity
FROM agg
""",
)
def q_events_user_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user behavioral diversity via the Gini-Simpson index
    1 − Σpᵢ² (probability two random events differ in type) — the
    entropy-style engagement-breadth metric WITHOUT log(), whose
    last-ulp libm differences would break cross-engine hashing
    (same determinism rationale as text_rarity_score). All-integer
    sums, one double expression. Two map-side-combined shuffles that
    both key on user_id — AQE reuses the partitioning."""
    pt = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count("*").alias("n"))
    )
    agg = pt.groupBy("user_id").agg(
        F.sum("n").alias("total"),
        F.sum(F.col("n") * F.col("n")).alias("sum_sq"),
        F.count("*").alias("n_types"),
    )
    return agg.select(
        "user_id",
        F.col("total").alias("n_events"),
        F.col("n_types"),
        (
            F.lit(1.0)
            - F.col("sum_sq").cast("double")
            / (F.col("total").cast("double") * F.col("total"))
        ).alias("simpson_diversity"),
    )


@query(
    "orders_interarrival_stats",
    """
WITH gaps AS (
    SELECT o_custkey,
           datediff('day',
               lag(o_orderdate) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ),
               o_orderdate) AS gap
    FROM orders
)
SELECT o_custkey AS custkey,
       COUNT(*) AS n_gaps,
       CAST(SUM(gap) AS DOUBLE) / COUNT(*) AS mean_gap_days,
       quantile_cont(gap, 0.5) AS median_gap_days
FROM gaps WHERE gap IS NOT NULL
GROUP BY 1 HAVING COUNT(*) >= 2
""",
)
def q_orders_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchase-rhythm profile: mean and exact median days between a
    customer's consecutive orders (≥ 2 gaps) — the reorder-cadence
    input to replenishment forecasting. Integer day gaps make the
    median a dyadic rational (hash-exact, same rationale as
    events_anomaly_mad) and the mean one double division; the lag
    window and the aggregate share the custkey shuffle. Per-group
    percentile state is bounded by orders-per-customer."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (
        _t(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            F.datediff(
                F.col("o_orderdate"), F.lag("o_orderdate").over(w)
            ).alias("gap"),
        )
        .filter(F.col("gap").isNotNull())
    )
    return (
        gaps.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.count("*").alias("n_gaps"),
            (F.sum("gap").cast("double") / F.count("*")).alias(
                "mean_gap_days"
            ),
            F.percentile("gap", F.lit(0.5)).alias("median_gap_days"),
        )
        .filter(F.col("n_gaps") >= 2)
    )


@query(
    "events_attribution_first_touch",
    """
WITH conv AS (
    SELECT event_id AS conv_id, user_id, ts AS conv_ts
    FROM events WHERE event_type = 'purchase'
),
touch AS (
    SELECT user_id, ts, event_id, event_type
    FROM events WHERE event_type <> 'purchase'
),
attributed AS (
    SELECT conv_id, event_type FROM (
        SELECT c.conv_id, t.event_type,
               row_number() OVER (
                   PARTITION BY c.conv_id ORDER BY t.ts, t.event_id
               ) AS rn
        FROM conv c JOIN touch t
          ON t.user_id = c.user_id
         AND t.ts < c.conv_ts
         AND t.ts >= c.conv_ts - INTERVAL 7 DAY
    ) WHERE rn = 1
)
SELECT event_type AS channel, COUNT(*) AS n_conversions
FROM attributed GROUP BY 1 ORDER BY n_conversions DESC, channel
""",
)
def q_events_attribution_first_touch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """First-touch attribution: each purchase credits the FIRST
    non-purchase event of the same user in the preceding 7 days; the
    report counts conversions per channel. The (ts, event_id)
    ordering makes the credited touch deterministic. Scale shape:
    the touch↔conversion band join is co-keyed on user_id (one
    shuffle each side) and its fan-out is bounded by
    events-per-user-week, not events² — the same banded-interval
    discipline as join_range_banded; the per-conversion argmin is a
    rank-limited window on the conversion key."""
    ev = _t(spark, sf_dir, "events")
    conv = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"),
        F.col("user_id").alias("cu"),
        F.col("ts").alias("conv_ts"),
    )
    touch = ev.filter(F.col("event_type") != "purchase").select(
        "user_id", "ts", "event_id", "event_type"
    )
    j = conv.join(
        touch,
        (F.col("user_id") == F.col("cu"))
        & (F.col("ts") < F.col("conv_ts"))
        & (F.col("ts") >= F.col("conv_ts") - F.expr("INTERVAL 7 DAYS")),
    )
    w = Window.partitionBy("conv_id").orderBy("ts", "event_id")
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy(F.col("event_type").alias("channel"))
        .agg(F.count("*").alias("n_conversions"))
        .orderBy(F.desc("n_conversions"), "channel")
    )


def _corr_sql(a: str, b: str) -> str:
    """Snap-6 Pearson from the named moment columns (oracle side)."""
    return (
        f"floor((n * CAST(s{a}{b} AS DOUBLE)"
        f" - CAST(s{a} AS DOUBLE) * CAST(s{b} AS DOUBLE))"
        f" / (sqrt(n * CAST(s{a}{a} AS DOUBLE)"
        f" - CAST(s{a} AS DOUBLE) * CAST(s{a} AS DOUBLE))"
        f" * sqrt(n * CAST(s{b}{b} AS DOUBLE)"
        f" - CAST(s{b} AS DOUBLE) * CAST(s{b} AS DOUBLE)))"
        f" * 1000000 + 0.5) / 1000000 AS corr_{a}{b}"
    )


_CORR_MATRIX_ORACLE = f"""
WITH g AS (
    SELECT CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT) AS q,
           CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS p,
           CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT) AS d,
           CAST(CAST(l_tax AS DECIMAL(12,2)) * 100 AS BIGINT) AS t
    FROM lineitem
),
a AS (
    SELECT COUNT(*) AS n,
           SUM(CAST(q AS DECIMAL(19,0))) AS sq,
           SUM(CAST(p AS DECIMAL(19,0))) AS sp,
           SUM(CAST(d AS DECIMAL(19,0))) AS sd,
           SUM(CAST(t AS DECIMAL(19,0))) AS st,
           SUM(CAST(q AS DECIMAL(19,0)) * CAST(q AS DECIMAL(19,0))) AS sqq,
           SUM(CAST(p AS DECIMAL(19,0)) * CAST(p AS DECIMAL(19,0))) AS spp,
           SUM(CAST(d AS DECIMAL(19,0)) * CAST(d AS DECIMAL(19,0))) AS sdd,
           SUM(CAST(t AS DECIMAL(19,0)) * CAST(t AS DECIMAL(19,0))) AS stt,
           SUM(CAST(q AS DECIMAL(19,0)) * CAST(p AS DECIMAL(19,0))) AS sqp,
           SUM(CAST(q AS DECIMAL(19,0)) * CAST(d AS DECIMAL(19,0))) AS sqd,
           SUM(CAST(q AS DECIMAL(19,0)) * CAST(t AS DECIMAL(19,0))) AS sqt,
           SUM(CAST(p AS DECIMAL(19,0)) * CAST(d AS DECIMAL(19,0))) AS spd,
           SUM(CAST(p AS DECIMAL(19,0)) * CAST(t AS DECIMAL(19,0))) AS spt,
           SUM(CAST(d AS DECIMAL(19,0)) * CAST(t AS DECIMAL(19,0))) AS sdt
    FROM g
)
SELECT n,
       {_corr_sql('q', 'p')}, {_corr_sql('q', 'd')}, {_corr_sql('q', 't')},
       {_corr_sql('p', 'd')}, {_corr_sql('p', 't')}, {_corr_sql('d', 't')}
FROM a
"""


@query("profile_corr_matrix", _CORR_MATRIX_ORACLE)
def q_profile_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full pairwise Pearson matrix over lineitem's four numeric
    measures (quantity, price, discount, tax) in ONE scan: all 15
    power sums ride a single map-side-combined global aggregate as
    exact integer-cent DECIMALs (agg_corr_exact's determinism
    discipline, widened to a matrix), then the 6 correlations
    combine in double once and snap to 6 digits. The one-pass
    many-statistics shape a profiler wants at 100 TB — the scan cost
    is paid once however many cells the matrix has."""
    li = _t(spark, sf_dir, "lineitem")

    def cents(col: str) -> F.Column:
        return (F.col(col).cast("decimal(12,2)") * 100).cast("bigint")

    cols = {
        "q": "l_quantity",
        "p": "l_extendedprice",
        "d": "l_discount",
        "t": "l_tax",
    }
    g = li.select(
        *[cents(src).cast("decimal(19,0)").alias(k) for k, src in cols.items()]
    )
    pairs = [("q", "p"), ("q", "d"), ("q", "t"), ("p", "d"), ("p", "t"), ("d", "t")]
    aggs = [F.count("*").alias("n")]
    aggs += [F.sum(k).alias(f"s{k}") for k in cols]
    aggs += [F.sum(F.col(k) * F.col(k)).alias(f"s{k}{k}") for k in cols]
    aggs += [F.sum(F.col(a) * F.col(b)).alias(f"s{a}{b}") for a, b in pairs]
    m = g.agg(*aggs)

    def corr(a: str, b: str) -> F.Column:
        n = F.col("n")
        sa, sb = F.col(f"s{a}").cast("double"), F.col(f"s{b}").cast("double")
        saa = F.col(f"s{a}{a}").cast("double")
        sbb = F.col(f"s{b}{b}").cast("double")
        sab = F.col(f"s{a}{b}").cast("double")
        raw = (n * sab - sa * sb) / (
            F.sqrt(n * saa - sa * sa) * F.sqrt(n * sbb - sb * sb)
        )
        return (F.floor(raw * 1000000 + F.lit(0.5)) / 1000000).alias(
            f"corr_{a}{b}"
        )

    return m.select("n", *[corr(a, b) for a, b in pairs])


@query(
    "events_attribution_last_touch",
    """
WITH conv AS (
    SELECT event_id AS conv_id, user_id, ts AS conv_ts
    FROM events WHERE event_type = 'purchase'
),
touch AS (
    SELECT user_id, ts, event_id, event_type
    FROM events WHERE event_type <> 'purchase'
),
attributed AS (
    SELECT conv_id, event_type FROM (
        SELECT c.conv_id, t.event_type,
               row_number() OVER (
                   PARTITION BY c.conv_id ORDER BY t.ts DESC, t.event_id DESC
               ) AS rn
        FROM conv c JOIN touch t
          ON t.user_id = c.user_id
         AND t.ts < c.conv_ts
         AND t.ts >= c.conv_ts - INTERVAL 7 DAY
    ) WHERE rn = 1
)
SELECT event_type AS channel, COUNT(*) AS n_conversions
FROM attributed GROUP BY 1 ORDER BY n_conversions DESC, channel
""",
)
def q_events_attribution_last_touch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Last-touch attribution — the closing-channel complement of
    events_attribution_first_touch (same user-co-keyed banded join,
    argmax instead of argmin); marketers read the two side by side to
    see opener vs closer channels."""
    ev = _t(spark, sf_dir, "events")
    conv = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"),
        F.col("user_id").alias("cu"),
        F.col("ts").alias("conv_ts"),
    )
    touch = ev.filter(F.col("event_type") != "purchase").select(
        "user_id", "ts", "event_id", "event_type"
    )
    j = conv.join(
        touch,
        (F.col("user_id") == F.col("cu"))
        & (F.col("ts") < F.col("conv_ts"))
        & (F.col("ts") >= F.col("conv_ts") - F.expr("INTERVAL 7 DAYS")),
    )
    w = Window.partitionBy("conv_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy(F.col("event_type").alias("channel"))
        .agg(F.count("*").alias("n_conversions"))
        .orderBy(F.desc("n_conversions"), "channel")
    )


@query(
    "graph_link_prediction",
    """
WITH basket AS (
    SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
e AS (
    SELECT a.l_partkey AS src, b.l_partkey AS dst
    FROM basket a JOIN basket b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2 HAVING COUNT(*) >= 2
),
und AS (
    SELECT src AS u, dst AS v FROM e
    UNION ALL SELECT dst, src FROM e
),
deg AS (SELECT u, COUNT(*) AS d FROM und GROUP BY 1),
common AS (
    SELECT a.u AS node_a, b.u AS node_b, COUNT(*) AS n_common
    FROM und a JOIN und b ON a.v = b.v AND a.u < b.u
    WHERE NOT EXISTS (
        SELECT 1 FROM e WHERE e.src = a.u AND e.dst = b.u
    )
    GROUP BY 1, 2
)
SELECT node_a, node_b, CAST(n_common AS BIGINT) AS n_common,
       CAST(n_common AS DOUBLE)
           / (da.d + db.d - n_common) AS neighbor_jaccard
FROM common
JOIN deg da ON da.u = node_a
JOIN deg db ON db.u = node_b
ORDER BY neighbor_jaccard DESC, node_a, node_b
LIMIT 20
""",
)
def q_graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction on the strong co-purchase subgraph: the 20
    NON-adjacent part pairs with the highest neighbor-overlap Jaccard
    (|N(a)∩N(b)| / |N(a)∪N(b)|) — "these two parts are never bought
    together, but share most of their co-purchase company", the
    recommender candidate-generation primitive. All-integer counts
    with one division → hash-checked. Scale shape: the wedge join
    (shared-neighbor pairing) is the bounded-fan-out triangle-join
    idiom; existing edges are removed by a broadcast anti-join before
    degrees attach."""
    # (r15: a localCheckpoint pin on edges was A/B-measured at
    # 0.78→0.91 s and REVERTED — the 5 repeated reads are pruned
    # scans of the already-materialized stored index, cheaper than
    # pinning a second copy.)
    edges = _copurchase_edge_index(spark, sf_dir).filter(
        (F.col("weight") >= 2) & (F.col("src") < F.col("dst"))
    ).select("src", "dst")
    und = edges.select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    ).unionAll(edges.select(F.col("dst").alias("u"), F.col("src").alias("v")))
    deg = und.groupBy("u").agg(F.count("*").alias("d"))
    a = und.select(F.col("u").alias("node_a"), "v")
    b = und.select(F.col("u").alias("node_b"), F.col("v").alias("v2"))
    common = (
        a.join(b, (F.col("v") == F.col("v2")) & (F.col("node_a") < F.col("node_b")))
        .join(
            F.broadcast(edges),
            (F.col("src") == F.col("node_a")) & (F.col("dst") == F.col("node_b")),
            "left_anti",
        )
        .groupBy("node_a", "node_b")
        .agg(F.count("*").alias("n_common"))
    )
    da = deg.select(F.col("u").alias("_a"), F.col("d").alias("da"))
    db = deg.select(F.col("u").alias("_b"), F.col("d").alias("db"))
    return (
        common.join(F.broadcast(da), F.col("node_a") == F.col("_a"))
        .join(F.broadcast(db), F.col("node_b") == F.col("_b"))
        .select(
            "node_a",
            "node_b",
            "n_common",
            (
                F.col("n_common").cast("double")
                / (F.col("da") + F.col("db") - F.col("n_common"))
            ).alias("neighbor_jaccard"),
        )
        .orderBy(F.desc("neighbor_jaccard"), "node_a", "node_b")
        .limit(20)
    )


_RI_EDGES = (
    # (child table, child key, parent table, parent key)
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
)


def _ri_oracle() -> str:
    parts = []
    for child, ck, parent, pk in _RI_EDGES:
        parts.append(
            f"""SELECT '{child}.{ck}->{parent}.{pk}' AS relation,
       (SELECT COUNT(*) FROM {child}) AS n_rows,
       (SELECT COUNT(*) FROM {child} c
        WHERE NOT EXISTS (
            SELECT 1 FROM {parent} p WHERE p.{pk} = c.{ck}
        )) AS n_orphans,
       (SELECT COUNT(*) FROM {child} c
        WHERE NOT EXISTS (
            SELECT 1 FROM {parent} p WHERE p.{pk} = c.{ck}
        )) = 0 AS ok"""
        )
    return "\nUNION ALL\n".join(parts) + "\nORDER BY relation"


@query("referential_integrity_sweep", _ri_oracle())
def q_referential_integrity_sweep(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Whole-warehouse foreign-key conformance in one report: every
    FK edge of the star schema checked for orphaned child keys →
    (relation, n_rows, n_orphans, ok). The cross-table companion of
    table_quality_checks' single-table suite — the first thing a
    migration/backfill validation runs.

    Scale shape: each edge is a projected child keyset anti-joined
    against its (broadcast where dim-sized) parent keyset — child
    scans read ONE column; the per-edge counts are 1-row aggregates
    unioned into the report, so the whole sweep is a handful of
    column-pruned scans, never a wide join.

    (r15: a one-pass-per-child rewrite — all FK columns on one scan,
    broadcast LEFT joins + a single multi-orphan aggregate — was
    interleaved-A/B-measured at 2.2→2.8 s and REVERTED: the per-edge
    form's six single-column pushed scans are cheap, while the fused
    pass pays wider reads, per-row join probes for every edge at
    once, and checkpoint job boundaries. At scale the per-edge form
    also keeps each parent join independently plannable — a
    non-broadcastable parent degrades only its own edge's pass.)"""
    out = None
    for child, ck, parent, pk in _RI_EDGES:
        c = _t(spark, sf_dir, child).select(F.col(ck).alias("k"))
        p = _t(spark, sf_dir, parent).select(F.col(pk).alias("k")).distinct()
        orphans = c.join(F.broadcast(p), "k", "left_anti").agg(
            F.count("*").alias("n_orphans")
        )
        total = c.agg(F.count("*").alias("n_rows")).withColumn(
            "_j", F.lit(1)
        )
        row = (
            total.join(orphans.withColumn("_j", F.lit(1)), "_j")
            .select(
                F.lit(f"{child}.{ck}->{parent}.{pk}").alias("relation"),
                "n_rows",
                "n_orphans",
                (F.col("n_orphans") == 0).alias("ok"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("relation")


@query(
    "events_dau_wau_mau",
    """
WITH ud AS (
    SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
    FROM events
),
days AS (SELECT DISTINCT day FROM ud),
dau AS (SELECT day, COUNT(*) AS dau FROM ud GROUP BY 1),
wau AS (
    SELECT d.day, COUNT(DISTINCT u.user_id) AS wau
    FROM days d JOIN ud u
      ON u.day <= d.day AND u.day >= d.day - INTERVAL 6 DAY
    GROUP BY 1
),
mau AS (
    SELECT d.day, COUNT(DISTINCT u.user_id) AS mau
    FROM days d JOIN ud u
      ON u.day <= d.day AND u.day >= d.day - INTERVAL 29 DAY
    GROUP BY 1
)
SELECT day, CAST(dau AS BIGINT) AS dau, CAST(wau AS BIGINT) AS wau,
       CAST(mau AS BIGINT) AS mau,
       CAST(dau AS DOUBLE) / mau AS stickiness
FROM dau JOIN wau USING (day) JOIN mau USING (day)
ORDER BY day
""",
)
def q_events_dau_wau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engagement dashboard trio — daily / trailing-7-day /
    trailing-30-day active users per day, plus DAU/MAU stickiness.

    Scale shape: the trailing distinct counts do NOT range-join the
    activity relation against the calendar (that is |ud|·|days| at
    100 TB) — each (user, day) activity row EXPLODES into its ≤30
    forward day-contributions (linear, bounded blow-up), is clipped
    to observed days by a broadcast semi-join, and one
    (day, user)-keyed partial-distinct aggregate finishes. Counts are
    exact ints; stickiness is one division — hash-checked."""
    ud = (
        _t(spark, sf_dir, "events")
        .select(
            "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
        )
        .distinct()
    )
    days = ud.select("day").distinct()
    dau = ud.groupBy("day").agg(F.count("*").alias("dau"))

    def trailing(n_days: int, name: str) -> DataFrame:
        contrib = ud.select(
            "user_id",
            F.explode(
                F.sequence(
                    F.col("day"),
                    F.date_add(F.col("day"), n_days - 1),
                    F.expr("INTERVAL 1 DAY"),
                )
            ).alias("day"),
        )
        return (
            contrib.join(F.broadcast(days), "day", "left_semi")
            .groupBy("day")
            .agg(F.countDistinct("user_id").alias(name))
        )

    return (
        dau.join(trailing(7, "wau"), "day")
        .join(trailing(30, "mau"), "day")
        .select(
            "day",
            "dau",
            "wau",
            "mau",
            (F.col("dau").cast("double") / F.col("mau")).alias("stickiness"),
        )
        .orderBy("day")
    )


@query(
    "orders_monthly_revenue_yoy",
    """
WITH m AS (
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue
    FROM orders GROUP BY 1
)
SELECT month, revenue,
       lag(revenue, 12) OVER (ORDER BY month) AS revenue_prior_year,
       CASE WHEN lag(revenue, 12) OVER (ORDER BY month) IS NOT NULL
            THEN revenue / lag(revenue, 12) OVER (ORDER BY month) - 1.0
            END AS yoy_growth
FROM m ORDER BY month
""",
)
def q_orders_monthly_revenue_yoy(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Monthly revenue with year-over-year growth — the board-deck
    reporting staple. Exact-decimal monthly sums (so the lag-12
    comparison is bit-stable), one division for the growth rate.
    The unpartitioned lag window runs over the ~months relation
    (calendar-bounded — the same deliberately-tiny-window rationale
    as the per-range-totals scans), never over the fact."""
    m = (
        _t(spark, sf_dir, "orders")
        .groupBy(
            F.date_trunc("month", "o_orderdate").cast("date").alias("month")
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue")
        )
    )
    w = Window.orderBy("month")
    prior = F.lag("revenue", 12).over(w)
    return m.select(
        "month",
        "revenue",
        prior.alias("revenue_prior_year"),
        F.when(prior.isNotNull(), F.col("revenue") / prior - 1.0).alias(
            "yoy_growth"
        ),
    ).orderBy("month")


@query(
    "events_user_gini",
    """
WITH ux AS (
    SELECT event_type, user_id, COUNT(*) AS x
    FROM events GROUP BY 1, 2
),
rk AS (
    SELECT event_type, x,
           ROW_NUMBER() OVER (
               PARTITION BY event_type ORDER BY x, user_id) AS i
    FROM ux
),
s AS (
    SELECT event_type,
           COUNT(*) AS n,
           SUM(CAST(x AS BIGINT)) AS sx,
           SUM(CAST(i * x AS BIGINT)) AS six
    FROM rk GROUP BY 1
)
SELECT event_type, CAST(n AS BIGINT) AS n_users,
       CAST(sx AS BIGINT) AS total_events,
       CAST(2 * six - (n + 1) * sx AS DOUBLE)
           / CAST(n * sx AS DOUBLE) AS gini
FROM s
""",
)
def q_events_user_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of event volume across users, per event type —
    the concentration ("do 1% of users generate 90% of traffic")
    metric behind rate-limit and capacity policy. G = (2·Σi·x_i −
    (n+1)·Σx) / (n·Σx) over users sorted ascending by volume.

    Exactness: every moment is an exact int64 sum (per-row i·x ≤
    n·max_count keeps products far under 2^63; widen to DECIMAL as
    agg_corr_exact does beyond ~10^9 heavy users), tie-stable rank
    (x, user_id), ONE double division per type. Scale shape: one
    (type, user) count shuffle, then the rank window sorts only the
    per-type USER relation (cardinality |users|, not |events|) — the
    same per-key ordering cost Gini inherently requires — and the
    moments fold map-side into one row per type."""
    ux = (
        _t(spark, sf_dir, "events")
        .groupBy("event_type", "user_id")
        .agg(F.count("*").alias("x"))
    )
    w = Window.partitionBy("event_type").orderBy("x", "user_id")
    rk = ux.select(
        "event_type", "x", F.row_number().over(w).alias("i")
    )
    s = rk.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("x").cast("bigint")).alias("sx"),
        F.sum((F.col("i") * F.col("x")).cast("bigint")).alias("six"),
    )
    return s.select(
        "event_type",
        F.col("n").alias("n_users"),
        F.col("sx").alias("total_events"),
        (
            (F.lit(2) * F.col("six") - (F.col("n") + 1) * F.col("sx")).cast(
                "double"
            )
            / (F.col("n") * F.col("sx")).cast("double")
        ).alias("gini"),
    )


@query(
    "orders_ship_backlog_daily",
    """
WITH iv AS (
    SELECT CAST(o_orderdate AS DATE) AS opened_day,
           CAST(l_shipdate AS DATE) AS shipped_day
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
),
delta AS (
    SELECT day, SUM(opened) AS opened, SUM(shipped) AS shipped
    FROM (
        SELECT opened_day AS day, 1 AS opened, 0 AS shipped FROM iv
        UNION ALL
        SELECT shipped_day AS day, 0 AS opened, 1 AS shipped FROM iv
    ) GROUP BY 1
)
SELECT day, CAST(opened AS BIGINT) AS opened,
       CAST(shipped AS BIGINT) AS shipped,
       CAST(SUM(opened - shipped) OVER (
           ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS open_backlog
FROM delta
""",
)
def q_orders_ship_backlog_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily fulfillment backlog: how many order lines are placed but
    not yet shipped at each day's close — the warehouse-operations
    point-in-time series. Classic interval-stabbing done as a SWEEP:
    each line emits +1 at its order date and −1 at its ship date, the
    deltas aggregate per day, and one running sum rebuilds the open
    count — total cost two linear passes, versus the
    calendar×interval join (days × open lines, quadratic in horizon)
    the naive phrasing costs at 100 TB. The running-sum window spans
    the ~calendar-days relation only (bounded, single partition by
    construction); all counts stay int64-exact."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    iv = li.join(o, F.col("o_orderkey") == F.col("l_orderkey")).select(
        F.col("o_orderdate").cast("date").alias("opened_day"),
        F.col("l_shipdate").cast("date").alias("shipped_day"),
    )
    delta = (
        iv.select(
            F.col("opened_day").alias("day"),
            F.lit(1).alias("opened"),
            F.lit(0).alias("shipped"),
        )
        .unionAll(
            iv.select(
                F.col("shipped_day").alias("day"),
                F.lit(0).alias("opened"),
                F.lit(1).alias("shipped"),
            )
        )
        .groupBy("day")
        .agg(
            F.sum("opened").alias("opened"),
            F.sum("shipped").alias("shipped"),
        )
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return delta.select(
        "day",
        "opened",
        "shipped",
        F.sum(F.col("opened") - F.col("shipped")).over(w).alias(
            "open_backlog"
        ),
    )


@query(
    "events_rolling_slope_7d",
    """
WITH daily AS (
    SELECT event_type,
           datediff('day', DATE '1995-01-01',
                    CAST(date_trunc('day', ts) AS DATE)) AS x,
           COUNT(*) AS y
    FROM events GROUP BY 1, 2
),
w AS (
    SELECT event_type, x,
           COUNT(*) OVER win AS n,
           SUM(CAST(x AS BIGINT)) OVER win AS sx,
           SUM(CAST(y AS BIGINT)) OVER win AS sy,
           SUM(CAST(x * x AS BIGINT)) OVER win AS sxx,
           SUM(CAST(x * y AS BIGINT)) OVER win AS sxy
    FROM daily
    WINDOW win AS (PARTITION BY event_type ORDER BY x
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT event_type,
       CAST(x AS BIGINT) AS day_offset,
       CAST(n AS BIGINT) AS n_win,
       CASE WHEN n * sxx - sx * sx > 0
            THEN CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE) END AS slope
FROM w
""",
)
def q_events_rolling_slope_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day OLS slope of daily event volume per type — the
    windowed sibling of events_trend_ols (global fit): a per-day
    "how fast is this stream growing right now" signal for alerting.

    Exactness: the four rolling moments are exact int64 window sums
    and the normal-equation polynomial stays in exactly-representable
    double range (see events_trend_ols); slope is ONE double division
    per row, NULL while the window is degenerate (n·Σxx = (Σx)² when
    every x is equal — including n=1). Scale shape: one (type, day)
    count shuffle; the rolling windows run over calendar-bounded
    per-type partitions, never over raw events."""
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.datediff(
                F.date_trunc("day", "ts").cast("date"),
                F.lit("1995-01-01").cast("date"),
            ).alias("x"),
        )
        .agg(F.count("*").alias("y"))
    )
    win = (
        Window.partitionBy("event_type").orderBy("x").rowsBetween(-6, 0)
    )
    w = daily.select(
        "event_type",
        "x",
        F.count("*").over(win).alias("n"),
        F.sum(F.col("x").cast("bigint")).over(win).alias("sx"),
        F.sum(F.col("y").cast("bigint")).over(win).alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast("bigint")).over(win).alias("sxx"),
        F.sum((F.col("x") * F.col("y")).cast("bigint")).over(win).alias("sxy"),
    )
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return w.select(
        "event_type",
        F.col("x").cast("bigint").alias("day_offset"),
        F.col("n").alias("n_win"),
        F.when(den > 0, num.cast("double") / den.cast("double")).alias(
            "slope"
        ),
    )


@query(
    "events_new_vs_returning",
    """
WITH ud AS (
    SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
    FROM events
),
first_seen AS (SELECT user_id, MIN(day) AS fday FROM ud GROUP BY 1)
SELECT day,
       CAST(SUM(CASE WHEN day = fday THEN 1 ELSE 0 END) AS BIGINT)
           AS n_new_users,
       CAST(SUM(CASE WHEN day > fday THEN 1 ELSE 0 END) AS BIGINT)
           AS n_returning_users
FROM ud JOIN first_seen USING (user_id)
GROUP BY 1
""",
)
def q_events_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users split into NEW (first-ever active day) vs
    RETURNING — the growth-accounting staple every activation
    dashboard leads with. Scale shape: one distinct (user, day) pass,
    a per-user MIN (map-side combined to |users| rows) joined back on
    the user key, one day-keyed aggregate; all exact integer counts."""
    ud = (
        _t(spark, sf_dir, "events")
        .select(
            "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
        )
        .distinct()
    )
    first_seen = ud.groupBy("user_id").agg(F.min("day").alias("fday"))
    return (
        ud.join(first_seen, "user_id")
        .groupBy("day")
        .agg(
            F.sum(F.when(F.col("day") == F.col("fday"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_new_users"),
            F.sum(F.when(F.col("day") > F.col("fday"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_returning_users"),
        )
    )


@query(
    "events_dormancy_revival",
    """
WITH ud AS (
    SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
    FROM events
),
g AS (
    SELECT user_id, day,
           datediff('day',
                    lag(day) OVER (PARTITION BY user_id ORDER BY day),
                    day) AS gap
    FROM ud
)
SELECT day,
       CAST(COUNT(*) AS BIGINT) AS n_active,
       CAST(SUM(CASE WHEN gap >= 30 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_revived,
       CAST(SUM(CASE WHEN gap >= 30 THEN 1 ELSE 0 END) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS revived_frac
FROM g GROUP BY 1
""",
)
def q_events_dormancy_revival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Win-back signal: per day, how many active users are REVIVALS —
    returning after a dormancy gap of ≥30 days (lag over each user's
    active-day sequence) — and their share of that day's actives.
    The metric that tells a re-engagement campaign whether it worked.
    Scale shape: distinct (user, day), a per-user-partitioned lag
    window (bounded by each user's active days, never events), one
    day aggregate; integer gaps, one division per day."""
    ud = (
        _t(spark, sf_dir, "events")
        .select(
            "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
        )
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day")
    g = ud.select(
        "day", F.datediff(F.col("day"), F.lag("day").over(w)).alias("gap")
    )
    revived = F.sum(F.when(F.col("gap") >= 30, 1).otherwise(0))
    return g.groupBy("day").agg(
        F.count("*").alias("n_active"),
        revived.cast("bigint").alias("n_revived"),
        (revived.cast("double") / F.count("*").cast("double")).alias(
            "revived_frac"
        ),
    )
