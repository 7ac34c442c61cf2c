"""Structured Streaming jobs over the events lake.

The reference expresses streaming concepts through Airflow
orchestration: a ``@daily`` schedule with half-open ``[ds, next_ds)``
windows (reference: mnt/dags/01fetch_from_database.py:42,52) and a CDC
staging table collapsed to the newest change per key (reference:
mnt/dags/unused_02retail_stage.py:101-144). Here both are first-class
Structured Streaming ops:

- ``tumbling_daily``: file-source stream → event-time tumbling 1-day
  window agg, ``Trigger.AvailableNow`` (the exact analog of one
  catch-up DAG run: process everything available, in serialized
  micro-batches, then stop). Complete output mode keeps every window's
  final value in the sink; in production, append mode + a watermark
  bounds state instead (watermark noted below).
- ``cdc_latest``: custom stateful operator via
  ``applyInPandasWithState`` — per-key state holds the newest
  (ts, event_id) change seen; each micro-batch emits the keys it
  updated (update semantics). State size = O(live keys), the scale
  bound; emitted batches land in a parquet spool via ``foreachBatch``
  and a final linear compaction keeps only each key's last change
  (same comparator), so the result equals the batch latest-per-key
  window query — which is the oracle.

Results return as plain batch DataFrames so the driver's oracle
harness can hash them like any other query.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Iterator
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..catalog import load_table, parquet_ts_unit, table_path
from ..operators.aggregate import exact_sum

if TYPE_CHECKING:
    import pandas as pd

# When events.parquet stores ts as TIMESTAMP(NANOS) (round-1 driver
# testdata), declaring the column as long in an explicit schema reads
# the raw nanos without any session conf (same trick as
# catalog.load_table), then a floor-conversion to micros yields
# identical values to DuckDB's. Current testdata is TIMESTAMP(MICROS),
# which Spark reads natively — the unit is sniffed per-file via
# catalog.parquet_ts_unit, never hard-coded.
EVENTS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

# Native schema for SECONDS/MILLIS/MICROS files: Spark's reader
# handles the unit conversion itself.
EVENTS_TS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def _events_read_schema(sample_path: str) -> tuple[T.StructType, bool]:
    """(readStream schema, needs-nanos-fix?) for an events parquet —
    unit sniffed from the footer so the stream reader survives the
    driver flipping the testdata's timestamp unit."""
    nanos = parquet_ts_unit(sample_path) == "ns"
    return (EVENTS_STREAM_SCHEMA if nanos else EVENTS_TS_SCHEMA), nanos


def _fix_ts(df: DataFrame, nanos: bool) -> DataFrame:
    """Floor raw int64 nanos to a proper timestamp; identity when the
    file unit is already natively readable."""
    if nanos:
        return df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    return df

from ..scratch import SCRATCH_ROOT

_SCRATCH = os.path.join(SCRATCH_ROOT, "streaming")


def _scratch(name: str) -> str:
    path = os.path.join(_SCRATCH, name)
    if os.path.exists(path):
        shutil.rmtree(path)
    os.makedirs(path, exist_ok=True)
    return path


def _split_source(
    spark: SparkSession,
    df: DataFrame,
    key_col: "str | Column",
    name: str,
    n: int = 3,
    tagged: bool = False,
) -> str:
    """Materialize ``df`` as an ``n``-file stream source (file i =
    rows with ``key_col % n == i``) in ONE Spark job: write all
    splits via ``partitionBy`` on the split id, then move each part
    file to a stable name with an explicit, strictly increasing
    mtime.

    r15 optimization + r14-advisory hardening: replaces n sequential
    ``filter().coalesce(1).write`` jobs (n source scans) with one
    scan, and replaces write-order mtimes with pinned ones so
    FileStreamSource's mtime ordering is deterministic even on
    coarse-mtime filesystems. Batch contents are IDENTICAL to the
    sequential form (same key % n split, same arrival order)."""
    import glob
    import time

    if tagged:
        # df already carries the 0..n-1 split id in column ``key_col``
        # (rows may have been fanned out upstream, e.g. the IVM
        # base/delete/insert explode) — use it verbatim.
        split = F.col(key_col)
    else:
        split = (
            (F.col(key_col) % n) if isinstance(key_col, str) else key_col
        )
    src = _scratch(name)
    tmp = src + "__parts"
    (
        df.withColumn("__t", split.cast("int"))
        .repartition(n, F.col("__t"))
        .write.partitionBy("__t")
        .mode("overwrite")
        .parquet(tmp)
    )
    t0 = time.time()
    for i in range(n):
        parts = sorted(
            glob.glob(os.path.join(tmp, f"__t={i}", "*.parquet"))
        )
        for j, part in enumerate(parts):
            dst = os.path.join(src, f"{i:03d}_{j}.parquet")
            os.replace(part, dst)
            stamp = t0 + 10.0 * i
            os.utime(dst, (stamp, stamp))
    shutil.rmtree(tmp)
    return src


class _shuffle_partitions:
    """Temporarily pin the shuffle-partition count for a streaming
    query. The state store allocates one instance per shuffle
    partition; for a small hot-key space that fixed cost (store init +
    one Python worker round per partition) dominates, so stateful
    queries pick a partition count sized to their key cardinality, not
    the session default. Safe here because each run starts from a
    fresh checkpoint (the count is frozen into a checkpoint once
    created)."""

    def __init__(self, spark: SparkSession, n: int):
        self.spark = spark
        self.n = str(n)

    def __enter__(self) -> None:
        self.prev = self.spark.conf.get("spark.sql.shuffle.partitions")
        self.spark.conf.set("spark.sql.shuffle.partitions", self.n)

    def __exit__(self, *exc: object) -> None:
        self.spark.conf.set("spark.sql.shuffle.partitions", self.prev)


def _stream_dir(sf_dir: str) -> str:
    """The file stream source wants a *directory* it can monitor for
    new files; expose the single events parquet through a symlinked
    scratch dir (in production the lake layout is already a directory
    per table and new files arrive in place)."""
    d = os.path.join(_SCRATCH, "src", sf_dir.strip("/").replace("/", "_"))
    os.makedirs(d, exist_ok=True)
    link = os.path.join(d, "events.parquet")
    if not os.path.exists(link):
        os.symlink(table_path(sf_dir, "events"), link)
    return d


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (new files under the
    path would be discovered and processed in arrival order — the
    ExternalTaskSensor availability gate, without polling)."""
    schema, nanos = _events_read_schema(table_path(sf_dir, "events"))
    raw = spark.readStream.schema(schema).parquet(_stream_dir(sf_dir))
    return _fix_ts(raw, nanos)


def tumbling_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming tumbling 1-day window aggregation, AvailableNow.

    Returns the final per-day aggregate as a batch DataFrame:
    (day, n_events, sum_value) — byte-identical to the batch
    ``window_tumbling_daily`` query, which is the oracle.
    """
    ev = events_stream(spark, sf_dir)
    agg = (
        # production note: .withWatermark("ts", "1 day") + append mode
        # bounds state for an unbounded stream; complete mode is used
        # here so the one-shot AvailableNow run emits every window.
        ev.groupBy(F.window("ts", "1 day").alias("w"))
        .agg(F.count("*").alias("n_events"), exact_sum("value", "sum_value"))
        .select(F.col("w.start").cast("date").alias("day"), "n_events", "sum_value")
    )
    with _shuffle_partitions(spark, 8):
        q = (
            agg.writeStream.format("memory")
            .queryName("stream_tumbling_daily")
            .outputMode("complete")
            .option("checkpointLocation", _scratch("tumbling_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table("stream_tumbling_daily")


SENTINEL_DAY = "2099-01-01"


def _wm_source_dir(spark: SparkSession, sf_dir: str) -> str:
    """Build a 2-file stream source for the watermark demo: the real
    events file, then a single far-future sentinel event with a later
    mtime. On an unbounded stream the watermark advances as newer
    events arrive and closed windows flush naturally; for a bounded
    AvailableNow drain the sentinel plays the role of 'the next day's
    data arriving', which pushes the watermark past every real
    window's end so append mode emits them all."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = _scratch("wm_src")
    events = os.path.join(d, "000_events.parquet")
    shutil.copyfile(table_path(sf_dir, "events"), events)
    # The sentinel file must carry the SAME timestamp unit as the real
    # events file — the stream reader uses one schema for the whole
    # source directory.
    unit = parquet_ts_unit(events)
    per_second = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}[unit]
    sentinel_ts = 4_070_908_800 * per_second  # 2099-01-01 UTC
    tbl = pa.table(
        {
            "event_id": pa.array([-1], pa.int64()),
            "ts": pa.array([sentinel_ts], pa.timestamp(unit)),
            "user_id": pa.array([-1], pa.int64()),
            "event_type": pa.array(["__sentinel__"], pa.string()),
            "value": pa.array([0.0], pa.float64()),
            "props": pa.array(["{}"], pa.string()),
        }
    )
    sentinel = os.path.join(d, "999_sentinel.parquet")
    pq.write_table(tbl, sentinel)
    now = os.path.getmtime(events)
    os.utime(sentinel, (now + 100, now + 100))
    return d


def _assert_sentinel_sequenced(q) -> None:
    """The watermark-drain correctness of the ``_wm_source_dir``
    streams depends on the sentinel file arriving in a LATER
    micro-batch than the real data (file-source ordering by mtime).
    If a listing-order or mtime-granularity surprise ever delivers
    both files in one batch, the watermark never advances past the
    real windows and append mode silently emits (almost) nothing —
    so fail loudly instead: the completed query must show at least
    two data-carrying micro-batches."""
    import json as _json

    n = 0
    for p in q.recentProgress:
        try:
            d = _json.loads(p.json)
        except Exception:  # pragma: no cover - defensive
            continue
        if d.get("numInputRows", 0) > 0:
            n += 1
    if n < 2:
        raise RuntimeError(
            "watermark sentinel was not delivered in its own "
            f"micro-batch ({n} data batches ran); the append-mode "
            "drain would silently drop every real window"
        )


def tumbling_daily_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked APPEND-mode tumbling 1-day aggregation — the
    production shape for an unbounded stream: state for a day's
    window is emitted once (when the watermark passes the window end)
    and then dropped, so state size is bounded by the watermark
    horizon instead of growing with stream lifetime (complete mode,
    ``tumbling_daily``, retains every window forever).

    The append-mode rows land in a parquet sink; the compacted sink
    (minus the sentinel's own window) must equal the batch
    ``window_tumbling_daily`` result — the oracle.
    """
    src_dir = _wm_source_dir(spark, sf_dir)
    schema, nanos = _events_read_schema(table_path(sf_dir, "events"))
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    ev = _fix_ts(raw, nanos)
    agg = (
        ev.withWatermark("ts", "0 seconds")
        .groupBy(F.window("ts", "1 day").alias("w"))
        .agg(F.count("*").alias("n_events"), exact_sum("value", "sum_value"))
        .select(
            F.col("w.start").cast("date").alias("day"),
            "n_events",
            "sum_value",
        )
    )
    sink = _scratch("wm_sink")
    with _shuffle_partitions(spark, 8):
        q = (
            agg.writeStream.format("parquet")
            .option("path", sink)
            .outputMode("append")
            .option("checkpointLocation", _scratch("wm_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    _assert_sentinel_sequenced(q)
    return spark.read.parquet(sink).filter(
        F.col("day") < F.lit(SENTINEL_DAY).cast("date")
    )


def stream_stream_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream INTERVAL join — the funnel query streamed: each
    click joined to the same user's purchases within the following
    hour. Two independent readers over the event stream, filtered to
    their event type BEFORE the watermark (so the sentinel never
    enters join state); the time-range condition
    ``cts ≤ pts < cts + 1h`` plus both watermarks bounds each side's
    buffered state to the interval width — the canonical
    stream-stream join state contract. Inner-join matches emit as
    they pair up (append mode), so the bounded AvailableNow drain
    needs no horizon flush. Result ≡ the batch interval self-join
    (the oracle): (user_id, click_id, purchase_id)."""
    src_dir = _wm_source_dir(spark, sf_dir)
    schema, nanos = _events_read_schema(table_path(sf_dir, "events"))

    def side(kind: str, prefix: str) -> DataFrame:
        raw = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        return (
            _fix_ts(raw, nanos)
            .filter(F.col("event_type") == kind)
            .select(
                F.col("user_id").alias(f"{prefix}_user"),
                F.col("event_id").alias(f"{prefix}_id"),
                F.col("ts").alias(f"{prefix}_ts"),
            )
            .withWatermark(f"{prefix}_ts", "0 seconds")
        )

    clicks = side("click", "c")
    purchases = side("purchase", "p")
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") < F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
    ).select(
        F.col("c_user").alias("user_id"),
        F.col("c_id").alias("click_id"),
        F.col("p_id").alias("purchase_id"),
    )
    sink = _scratch("funnel_sink")
    with _shuffle_partitions(spark, 8):
        q = (
            joined.writeStream.format("parquet")
            .option("path", sink)
            .outputMode("append")
            .option("checkpointLocation", _scratch("funnel_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    # No _assert_sentinel_sequenced here: inner-join matches emit
    # eagerly as rows pair up, so the result does not depend on the
    # sentinel landing in a later micro-batch (the watermark/sentinel
    # only bound join STATE, and the file source may batch both files
    # together for multi-source queries).
    return spark.read.parquet(sink)


def session_1h_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked APPEND-mode session windows (1 h inactivity gap,
    keyed by user): the streaming form of ``window_session_1h``.
    Unlike fixed windows, session state MERGES — a late event can
    bridge two open sessions — so the store keeps per-key open
    sessions and emits a session only once the watermark passes its
    close (start of a gap > 1 h); state is bounded by open sessions,
    not stream lifetime. The sentinel file pushes the watermark past
    every real session for the bounded AvailableNow drain; its own
    session is filtered out of the sink. Result ≡ the batch
    gaps-and-islands oracle."""
    src_dir = _wm_source_dir(spark, sf_dir)
    schema, nanos = _events_read_schema(table_path(sf_dir, "events"))
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    ev = _fix_ts(raw, nanos)
    agg = (
        ev.withWatermark("ts", "0 seconds")
        .groupBy("user_id", F.session_window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n_events"), exact_sum("value", "sum_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )
    sink = _scratch("session_sink")
    with _shuffle_partitions(spark, 8):
        q = (
            agg.writeStream.format("parquet")
            .option("path", sink)
            .outputMode("append")
            .option("checkpointLocation", _scratch("session_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    _assert_sentinel_sequenced(q)
    return spark.read.parquet(sink).filter(F.col("user_id") >= 0)


CDC_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)

CDC_STATE_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.LongType()),  # micros since epoch
        T.StructField("event_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _latest_per_key(
    key: tuple[Any, ...],
    pdfs: Iterator["pd.DataFrame"],
    state: GroupState,
) -> Iterator["pd.DataFrame"]:
    """Stateful reducer: keep the (ts, event_id)-max change per key,
    emit the key's current latest once per batch it appears in."""
    import pandas as pd

    best = state.get if state.exists else None  # (ts_us, event_id, type, value)
    for pdf in pdfs:
        if pdf.empty:
            continue
        pdf = pdf.sort_values(["ts", "event_id"])
        row = pdf.iloc[-1]
        cand = (
            int(row["ts"].value // 1000),  # pandas ns → µs
            int(row["event_id"]),
            row["event_type"],
            float(row["value"]),
        )
        if best is None or (cand[0], cand[1]) > (best[0], best[1]):
            best = cand
    if best is None:
        return
    state.update(best)
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "ts": [pd.Timestamp(best[0], unit="us")],
            "event_id": [best[1]],
            "event_type": [best[2]],
            "value": [best[3]],
        }
    )


def cdc_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator: latest event per user_id
    (the reference's CDC latest-change-wins merge input, streamed).

    Returns (user_id, ts, event_id, event_type, value) as a batch
    DataFrame after the AvailableNow run drains.
    """
    ev = events_stream(spark, sf_dir)
    latest = ev.groupBy("user_id").applyInPandasWithState(
        _latest_per_key,
        outputStructType=CDC_OUTPUT_SCHEMA,
        stateStructType=CDC_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    spool = _scratch("cdc_spool")

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(spool)

    with _shuffle_partitions(spark, 8):
        q = (
            latest.writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", _scratch("cdc_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    # Final compaction: several micro-batches may each have emitted a
    # key; keep the last change per key (same comparator as the state).
    from pyspark.sql import Window

    emitted = spark.read.parquet(spool)
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        emitted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "ts", "event_id", "event_type", "value")
    )


def static_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the event stream enriches against a static
    dimension (customer), aggregated per nation.

    The static side is re-broadcast per micro-batch — the streaming
    analog of the star-schema dim join; no shuffle on the stream side
    until the aggregation. Returns the final aggregate as a batch
    DataFrame (oracle: the same join+agg in SQL).
    """
    ev = events_stream(spark, sf_dir)
    cust = F.broadcast(
        load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    )
    agg = (
        ev.join(cust, ev.user_id == cust.c_custkey)
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_events"), exact_sum("value", "sum_value"))
    )
    with _shuffle_partitions(spark, 8):
        q = (
            agg.writeStream.format("memory")
            .queryName("stream_static_join")
            .outputMode("complete")
            .option("checkpointLocation", _scratch("static_join_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table("stream_static_join")


def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dropDuplicates on (user_id, event_type): exactly-once
    key emission across micro-batches (state = seen-key set; a
    watermark bounds it on unbounded streams). The deduped key stream
    lands in a parquet spool via foreachBatch; the returned batch
    DataFrame counts distinct users per event type — deterministic
    regardless of which physical row the dedup kept.
    """
    ev = events_stream(spark, sf_dir)
    keys = ev.select("user_id", "event_type").dropDuplicates(
        ["user_id", "event_type"]
    )
    spool = _scratch("dedup_spool")

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(spool)

    with _shuffle_partitions(spark, 8):
        q = (
            keys.writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", _scratch("dedup_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return (
        spark.read.parquet(spool)
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


def sliding_3d1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming sliding windows (3-day length, 1-day slide) — every
    event contributes to 3 windows; complete-mode AvailableNow run
    must equal the batch window_sliding_3d1d query (the oracle)."""
    ev = events_stream(spark, sf_dir)
    agg = (
        ev.groupBy(F.window("ts", "3 days", "1 day").alias("w"))
        .agg(F.count("*").alias("n_events"), exact_sum("value", "sum_value"))
        .select(
            F.col("w.start").cast("date").alias("window_start"),
            "n_events",
            "sum_value",
        )
    )
    with _shuffle_partitions(spark, 8):
        q = (
            agg.writeStream.format("memory")
            .queryName("stream_sliding_3d1d")
            .outputMode("complete")
            .option("checkpointLocation", _scratch("sliding_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table("stream_sliding_3d1d")


def incremental_agg_foreachbatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance via ``foreachBatch``:
    a per-day (n_events, decimal-sum) aggregate table kept up to date
    as micro-batches arrive. Each batch computes its OWN partial
    aggregate, which is sum-combined into the standing parquet target
    — the additive/commutative merge makes the final table identical
    for ANY micro-batch split of the input, so it equals the one-shot
    batch daily aggregate (the oracle).

    This is the production pattern Complete-mode memory sinks only
    demo: bounded state (the view itself IS the state, no stream
    state store), exactly-once via the checkpoint + idempotent
    overwrite. At 100 TB the target is day-partitioned and each merge
    rewrites only the days present in the batch (dynamic partition
    overwrite — pipelines.py idiom); the full-table overwrite here is
    the small-table degenerate case of that.

    The input is split into 3 files streamed one per micro-batch
    (``maxFilesPerTrigger=1``) to force a genuinely incremental run.
    """
    # Fix the ts unit BEFORE splitting, so the split files always carry
    # native TimestampType regardless of the source file's unit.
    raw = load_table(spark, sf_dir, "events")
    src = _split_source(spark, raw, "event_id", "incr_src")

    target = os.path.join(_SCRATCH, "incr_target")
    tmp = os.path.join(_SCRATCH, "incr_target_tmp")
    for d in (target, tmp):
        if os.path.exists(d):
            shutil.rmtree(d)

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        part = (
            batch_df
            .groupBy(F.date_trunc("day", "ts").cast("date").alias("day"))
            .agg(
                F.count("*").alias("n_events"),
                F.sum(F.col("value").cast("decimal(18,2)")).alias(
                    "sum_dec"
                ),
            )
        )
        if os.path.exists(target):
            part = (
                spark.read.parquet(target)
                .unionByName(part)
                .groupBy("day")
                .agg(
                    F.sum("n_events").alias("n_events"),
                    F.sum("sum_dec")
                    .cast("decimal(18,2)")
                    .alias("sum_dec"),
                )
            )
        part.coalesce(1).write.mode("overwrite").parquet(tmp)
        if os.path.exists(target):
            shutil.rmtree(target)
        os.rename(tmp, target)

    stream = spark.readStream.schema(EVENTS_TS_SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    with _shuffle_partitions(spark, 8):
        q = (
            stream.writeStream.foreachBatch(merge_batch)
            .option("checkpointLocation", _scratch("incr_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.read.parquet(target).select(
        "day",
        "n_events",
        F.col("sum_dec").cast("double").alias("sum_value"),
    )


def minhash_dedup_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming MinHash LSH near-dup — incremental band-index
    maintenance, the production ingest shape that
    ``operators.dedup.minhash_incremental_dedup`` assumes as its
    corpus side:

    Documents arrive as a 3-file stream (one per micro-batch). Each
    ``foreachBatch`` computes the batch's band keys (a BATCH plan —
    no streaming-agg state), emits candidate pairs against the
    standing band index (new×indexed via one band_key equi-join, plus
    new×new within the batch), appends them to a pair spool, and
    appends the batch's keys to the index. The index IS the state:
    append-only parquet, one row per doc·band, queryable mid-stream —
    nothing is ever recomputed over the whole corpus.

    After the AvailableNow drain, every unordered doc pair sharing a
    band bucket has been admitted exactly once (same-batch pairs by
    the within join; cross-batch pairs when the later doc arrived),
    so verify(candidates) ≡ the batch ``minhash_dedup`` result — and
    the same SQL oracle applies: (doc_a, doc_b, jaccard ≥ 0.8).
    """
    from ..operators import dedup as dedup_ops

    docs = load_table(spark, sf_dir, "documents")
    src = _split_source(spark, docs, "doc_id", "mh_src")

    index_dir = os.path.join(_SCRATCH, "mh_index")
    pairs_dir = os.path.join(_SCRATCH, "mh_pairs")
    for d in (index_dir, pairs_dir):
        if os.path.exists(d):
            shutil.rmtree(d)

    def step(batch_df: DataFrame, batch_id: int) -> None:
        bk = dedup_ops.minhash_bands(
            dedup_ops.doc_shingles(batch_df, distinct=False)
        ).localCheckpoint()  # cut: feeds two joins + the index append
        a = bk.select(F.col("doc_id").alias("doc_a"), "band_key")
        b = bk.select(F.col("doc_id").alias("doc_b"), "band_key")
        pairs = (
            a.join(b, "band_key")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b")
        )
        if os.path.exists(index_dir):
            idx = spark.read.parquet(index_dir).select(
                F.col("doc_id").alias("doc_b"), "band_key"
            )
            cross = a.join(idx, "band_key").select(
                F.least("doc_a", "doc_b").alias("doc_a"),
                F.greatest("doc_a", "doc_b").alias("doc_b"),
            )
            pairs = pairs.unionByName(cross)
        pairs.distinct().write.mode("append").parquet(pairs_dir)
        bk.write.mode("append").parquet(index_dir)

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    with _shuffle_partitions(spark, 8):
        q = (
            stream.writeStream.foreachBatch(step)
            .option("checkpointLocation", _scratch("mh_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    cands = spark.read.parquet(pairs_dir).distinct()
    admitted = (
        cands.select(F.col("doc_a").alias("doc_id"))
        .unionByName(cands.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    cand_docs = docs.join(admitted, "doc_id", "left_semi")
    return dedup_ops.jaccard_pairs(
        dedup_ops.doc_shingles(cand_docs), cands, 0.8
    )


def stream_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-state streaming dedup via
    ``dropDuplicatesWithinWatermark``: unlike plain ``dropDuplicates``
    (whose seen-key state grows forever), state for a key is dropped
    once the watermark passes its event time — the ONLY viable dedup
    on an unbounded 100 TB/day stream where duplicates arrive close
    to the original (late-arrival bound = the watermark delay).

    The delay here (40 days) exceeds the test stream's whole span, so
    the bounded drain dedups everything and the result equals the
    batch distinct — the oracle. In production the delay is the
    duplicate-lag SLA (minutes/hours), keeping state tiny.
    """
    ev = events_stream(spark, sf_dir).withWatermark("ts", "40 days")
    keys = ev.select(
        "user_id", "event_type", "ts"
    ).dropDuplicatesWithinWatermark(["user_id", "event_type"])
    spool = _scratch("dedup_wm_spool")

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(spool)

    with _shuffle_partitions(spark, 8):
        q = (
            keys.writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", _scratch("dedup_wm_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return (
        spark.read.parquet(spool)
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


def hll_rollup_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming mergeable-sketch rollup: distinct users per
    (event_type, month) estimated with DataSketches HLL *inside* the
    streaming aggregation — every micro-batch folds its rows into the
    per-group sketch state and the engine's partial-aggregate merge IS
    the sketch union, so the estimate equals the batch
    ``agg_hll_sketch_rollup`` result (asserted in tests; HLL union is
    order- and split-invariant). AvailableNow + complete mode; on an
    unbounded stream the sketch (kilobytes/group) is the ONLY state —
    this is how a 100 TB/day pipeline keeps live distinct counts
    without a distinct shuffle."""
    ev = events_stream(spark, sf_dir)
    agg = (
        ev.groupBy(
            "event_type", F.date_format("ts", "yyyy-MM").alias("month")
        )
        .agg(
            F.hll_sketch_agg("user_id", F.lit(14)).alias("sk"),
            F.count("*").alias("n_events"),
        )
        .select(
            "event_type",
            "month",
            F.hll_sketch_estimate("sk").cast("bigint").alias("est_users"),
            "n_events",
        )
    )
    with _shuffle_partitions(spark, 8):
        q = (
            agg.writeStream.format("memory")
            .queryName("stream_hll_rollup")
            .outputMode("complete")
            .option("checkpointLocation", _scratch("hll_rollup_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table("stream_hll_rollup")


def gopher_filter_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming curation gate: documents arrive as a file stream (3
    micro-batches) and each batch passes through the STATELESS Gopher
    rule table (textstats.gopher_quality) — a pure map-only filter,
    so the streaming plan needs no state store, no watermark, and no
    shuffle; survivors append straight to the curated spool. This is
    the production ingest-time quality gate: documents are scored the
    moment they land, never in a separate batch sweep.

    AvailableNow drain over a deterministic split ⇒ the spool equals
    the batch filter — the oracle is the batch Gopher SQL with
    WHERE gopher_pass.
    """
    from ..operators import textstats

    docs = load_table(spark, sf_dir, "documents")
    src = _split_source(spark, docs, "doc_id", "gopher_src")
    spool = _scratch("gopher_spool")

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    scored = textstats.gopher_quality(stream).filter(F.col("gopher_pass"))
    out = scored.select("doc_id", "n_words", "stop_hits")

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(spool)

    q = (
        out.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", _scratch("gopher_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(spool)


def zscore_daily_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming anomaly pipeline: a foreachBatch-maintained
    (event_type, day, cnt) daily-count view — the same additive
    incremental-merge discipline as incremental_agg_foreachbatch —
    scored AFTER ingest with the shared trailing-28-day z-score
    operator (operators/aggregate.rolling_zscore_daily). Because the
    count merge is additive/commutative, the standing view (and hence
    every z) is identical for ANY micro-batch split of the input, so
    the batch query events_anomaly_zscore_rolling is the oracle.

    This is the lambda-free production shape: ingestion maintains the
    small aggregate, detection reruns cheap batch logic over it — the
    z window needs the trailing days, which a per-batch stream could
    not see without unbounded state.
    """
    raw = load_table(spark, sf_dir, "events")
    src = _split_source(spark, raw, "event_id", "zscore_src")

    target = os.path.join(_SCRATCH, "zscore_target")
    tmp = os.path.join(_SCRATCH, "zscore_target_tmp")
    for d in (target, tmp):
        if os.path.exists(d):
            shutil.rmtree(d)

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        part = batch_df.groupBy(
            "event_type",
            F.date_trunc("day", "ts").cast("date").alias("day"),
        ).agg(F.count("*").alias("cnt"))
        if os.path.exists(target):
            part = (
                spark.read.parquet(target)
                .unionByName(part)
                .groupBy("event_type", "day")
                .agg(F.sum("cnt").alias("cnt"))
            )
        part.coalesce(1).write.mode("overwrite").parquet(tmp)
        if os.path.exists(target):
            shutil.rmtree(target)
        os.rename(tmp, target)

    stream = spark.readStream.schema(EVENTS_TS_SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    with _shuffle_partitions(spark, 8):
        q = (
            stream.writeStream.foreachBatch(merge_batch)
            .option("checkpointLocation", _scratch("zscore_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    from ..operators.aggregate import rolling_zscore_daily

    return rolling_zscore_daily(spark.read.parquet(target))


def pii_redact_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming PII scrub: documents land as a file stream (3
    micro-batches) and each batch passes through the STATELESS
    redaction map (textclean.pii_redact) — like the Gopher gate, a
    pure map-only streaming plan: no state store, no watermark, no
    shuffle. This is the compliance-critical ingest shape — PII never
    reaches the lake unredacted, rather than being scrubbed by a
    later batch sweep over already-persisted raw text.

    AvailableNow drain over a deterministic split ⇒ the spool equals
    the batch redaction — the batch pii_redact SQL is the oracle.
    """
    from ..operators import textclean

    docs = load_table(spark, sf_dir, "documents")
    src = _split_source(spark, docs, "doc_id", "pii_src")
    spool = _scratch("pii_spool")

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = textclean.pii_redact(stream)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(spool)

    q = (
        out.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", _scratch("pii_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(spool)


def decontaminate_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming benchmark decontamination: documents land as a file
    stream (3 micro-batches) and each batch's training docs are
    flagged against the STATIC broadcast eval n-gram set — the
    ingest-time shape of decontaminate_ngram (the eval corpus is a
    fixed relation refreshed offline; per batch the corpus n-gram
    stream is filtered by the broadcast before any exchange). Each
    doc lives in exactly one micro-batch, so the per-batch
    count_distinct per doc is the global answer and the AvailableNow
    drain equals the batch query — same SQL oracle.
    """
    from ..operators import decontaminate

    docs = load_table(spark, sf_dir, "documents")
    is_eval = F.col("doc_id") % 97 == 0
    # Materialize the eval n-gram set ONCE before the stream starts —
    # an uncached DataFrame captured by the sink closure would
    # re-execute the eval-split tokenize+distinct on every
    # micro-batch (cost grows with batch count in production).
    # localCheckpoint pins the computed rows without a disk round-trip.
    ev = (
        decontaminate.raw_ngrams(docs.filter(is_eval), 4)
        .select("ngram")
        .distinct()
        .localCheckpoint()
    )
    src = _split_source(spark, docs, "doc_id", "decon_src")
    spool = _scratch("decon_spool")

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )

    # the aggregate runs INSIDE foreachBatch (batch-local, complete —
    # a doc never spans files), so the streaming plan itself carries
    # ZERO state store: the stateless-gate shape, not a running agg
    def sink(batch_df: DataFrame, batch_id: int) -> None:
        flagged = (
            decontaminate.raw_ngrams(batch_df.filter(~is_eval), 4)
            .join(F.broadcast(ev), "ngram")
            .groupBy("doc_id")
            .agg(F.count_distinct("ngram").alias("n_hits"))
        )
        flagged.write.mode("append").parquet(spool)

    q = (
        stream.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", _scratch("decon_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(spool)


def cms_rollup_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming Count-Min sketch maintenance: documents arrive as a
    3-file stream and the d×w counter matrix is the ONLY streaming
    state — each micro-batch explodes its tokens to (r, bucket) cells
    and the engine's partial-aggregate merge IS the sketch merge
    (counter addition: commutative, so the drained sketch is
    bit-identical for ANY micro-batch split of the corpus). Unlike
    stream_hll_rollup (library sketch → rows-only), the md5-derived
    CMS makes this the repo's first HASH-CHECKED streaming sketch:
    the oracle is the batch sketch_count_min_freq counter relation.

    At 100 TB/day the state is d·w integers per shard REGARDLESS of
    token volume; point-frequency queries read the standing counters
    without any raw-data rescan."""
    from ..functions import text as TX
    from ..plans.queries_r9 import _CMS_D, _cms_bucket

    docs = load_table(spark, sf_dir, "documents")
    src = _split_source(spark, docs, "doc_id", "cms_src")

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    cells = (
        stream.select(F.explode(TX.tokens("text")).alias("tok"))
        .select(
            F.posexplode(
                F.array(*[_cms_bucket(r) for r in range(_CMS_D)])
            ).alias("r", "bucket")
        )
    )
    agg = cells.groupBy("r", "bucket").agg(
        F.count("*").alias("counter")
    )
    with _shuffle_partitions(spark, 8):
        q = (
            agg.writeStream.format("memory")
            .queryName("stream_cms_rollup")
            .outputMode("complete")
            .option("checkpointLocation", _scratch("cms_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table("stream_cms_rollup").select(
        F.col("r").cast("long").alias("r"),
        "bucket",
        F.col("counter").cast("long").alias("counter"),
    )


def payload_dedup_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming byte-payload near-dup — incremental gram-index
    maintenance, the ingest shape ``dedup_payload_incremental``
    assumes as its corpus side:

    Documents arrive as a 3-file stream. Each ``foreachBatch``
    shingles ONLY the batch (stride-1 byte 8-grams over the binary
    payload), emits candidate pairs (new x indexed plus new x new via
    one gram equi-join), and appends the batch's grams to the
    standing index. The join is admission-capped by the gram's
    CURRENT document frequency (standing + batch): df only grows, so
    a gram over the cap now can never be rare in the final corpus —
    pruning is sound — while a gram under the cap now might exceed it
    later, so admission yields a SUPERSET of the final-rare
    candidates; the post-drain verify (exact rare-gram Jaccard over
    the final index, never the text) filters those, the standard
    LSH candidates-superset / verify-exact discipline.

    After the AvailableNow drain every pair sharing a final-rare gram
    has been admitted (when its later doc arrived), so verify ==
    the batch ``dedup_payload_shingle`` result — the same SQL oracle
    applies: (doc_a, doc_b, n_common, jaccard >= 0.5)."""
    from ..operators import multimodal

    df_cap = 10
    j_min = 0.5

    docs = load_table(spark, sf_dir, "documents")
    src = _split_source(spark, docs, "doc_id", "payload_src")

    index_dir = os.path.join(_SCRATCH, "payload_gram_index")
    pairs_dir = os.path.join(_SCRATCH, "payload_cand_pairs")
    df_dir = os.path.join(_SCRATCH, "payload_gram_df")
    for d in (index_dir, pairs_dir, df_dir):
        if os.path.exists(d):
            shutil.rmtree(d)

    def _grams(batch: DataFrame) -> DataFrame:
        # r15 optimization: the int64-packing gram kernel (bijective
        # re-encoding of the 16-hex-char gram, per-doc distinct inside
        # the kernel — see q_dedup_payload_shingle). The standing
        # index stores 8-byte ints instead of 16-char strings, so
        # every per-batch join and the index parquet shrink ~2-4x.
        b = (
            multimodal.attach_payload(batch)
            .select("doc_id", "payload")
            .filter(F.length("payload") >= 8)
        )
        return multimodal.payload_grams(b)

    def step(batch_df: DataFrame, batch_id: int) -> None:
        bg = _grams(batch_df).localCheckpoint()  # feeds publish + joins
        # r16 (guide §2.4): publish the batch's grams FIRST, into a
        # batch-id-keyed partition (a replayed batch OVERWRITES its
        # own dir — strictly safer than the old blind append, whose
        # replay safety depended on append-last ordering). The index
        # read below then already contains THIS batch, so the old
        # new×new self-join folds into the single index join: the
        # under-cap condition rides the join key g via the admitted
        # side, making right-side filtering redundant — pair sets are
        # identical (least/greatest + the per-batch distinct dedup
        # the doubled direction), and one join + one union + one
        # eager pin per batch disappear. df semantics unchanged:
        # count over (standing ∪ batch) == count over the updated
        # index. (r15 note kept: restricting this count to
        # batch-present grams via a semi-join was tried and REVERTED
        # — without a broadcastable batch-gram set it adds a distinct
        # + an extra index pass for the same shuffle bytes.)
        bg.write.mode("overwrite").parquet(
            os.path.join(index_dir, f"b{batch_id}")
        )
        idx_all = spark.read.parquet(os.path.join(index_dir, "b*"))
        # r16 (VERDICT item 6, now measured VIABLE): the corpus is
        # repetition-dominated (sf0.1: 1,351,090 index rows but only
        # 13,005 distinct grams — ratio 0.0096), so the per-batch df
        # recount over the whole index is ~100× larger than the
        # standing (g, df) relation. Maintain df as a batch-id-keyed
        # VERSION CHAIN instead: v{b} = merge(v{b-1}, batch counts) —
        # exact integer sums, so v{b} ≡ groupBy over the index after
        # batch b, and a replayed batch deterministically rewrites
        # its own version (the scd2/ivm exactly-once contract). Per
        # batch the shuffle ships ≤|distinct grams| partial-agged
        # rows instead of the full index.
        bcnt = bg.groupBy("g").agg(F.count("*").alias("df"))
        prev_df = os.path.join(df_dir, f"v{batch_id - 1}")
        if batch_id == 0 or not os.path.exists(prev_df):
            merged = bcnt
        else:
            merged = (
                spark.read.parquet(prev_df)
                .unionByName(bcnt)
                .groupBy("g")
                .agg(F.sum("df").alias("df"))
            )
        merged.write.mode("overwrite").parquet(
            os.path.join(df_dir, f"v{batch_id}")
        )
        df_now = (
            spark.read.parquet(os.path.join(df_dir, f"v{batch_id}"))
            .filter(F.col("df") <= df_cap)
            .select("g")
        )
        a = bg.join(df_now, "g")
        (
            a.join(idx_all.withColumnRenamed("doc_id", "doc_b"), "g")
            .filter(F.col("doc_id") != F.col("doc_b"))
            .select(
                F.least("doc_id", "doc_b").alias("doc_a"),
                F.greatest("doc_id", "doc_b").alias("doc_b"),
            )
            .distinct()
            .write.mode("append")
            .parquet(pairs_dir)
        )

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    with _shuffle_partitions(spark, 8):
        q = (
            stream.writeStream.foreachBatch(step)
            .option("checkpointLocation", _scratch("payload_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # verify OFF THE INDEX: final rarity + exact Jaccard over the
    # admitted pairs' rare-gram sets — the corpus text is never
    # re-shingled
    idx = spark.read.parquet(os.path.join(index_dir, "b*"))
    rare = (
        idx.groupBy("g")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= df_cap)
        .select("g")
    )
    rgrams = idx.join(rare, "g").localCheckpoint(eager=False)
    sz = rgrams.groupBy("doc_id").agg(F.count("*").alias("n"))
    cands = spark.read.parquet(pairs_dir).distinct()
    inter = (
        cands.join(
            rgrams.withColumnRenamed("doc_id", "doc_a"), "doc_a"
        )
        .join(
            rgrams.withColumnRenamed("doc_id", "doc_b"),
            ["doc_b", "g"],  # equi-join on the gram too: the
            # intersection never fans out past the shared grams
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("bigint").alias("n_common"))
    )
    return (
        inter.join(
            sz.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")),
            "doc_a",
        )
        .join(
            sz.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")),
            "doc_b",
        )
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("na") + F.col("nb") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= j_min)
        .select("doc_a", "doc_b", "n_common", "jaccard")
    )


def dq_constraints_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming data-quality firewall — the ingest-side twin of
    ``profile_dq_constraints``'s orders checks.

    Orders arrive as a 3-file AvailableNow stream. Each micro-batch
    evaluates the orders constraint trio IN THE BATCH — status-domain
    and price-range rules (stateless map-side counters) and
    referential integrity against the STATIC customer dimension (the
    stream-static LEFT join, the shape a production DQ monitor uses to
    catch orphan keys at ingest) — and appends one counter row.
    Violation/total counts are associative, so the published report is
    the exact column-sum of the batch counters: after the drain it
    equals the batch suite restricted to orders, and that SQL oracle
    applies verbatim.

    At scale each micro-batch does one broadcast-or-shuffle key join
    plus a single aggregate — no state store at all; the standing
    state is three integers per check.
    """
    orders = load_table(spark, sf_dir, "orders")
    src = _split_source(spark, orders, "o_orderkey", "dq_src")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    counters_dir = os.path.join(_SCRATCH, "dq_counters")
    if os.path.exists(counters_dir):
        shutil.rmtree(counters_dir)

    def step(batch_df: DataFrame, batch_id: int) -> None:
        j = batch_df.join(
            cust, batch_df["o_custkey"] == cust["c_custkey"], "left"
        )
        j.agg(
            F.sum(
                F.when(
                    ~F.col("o_orderstatus").isin("O", "F", "P"), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("bad_status"),
            F.sum(
                F.when(F.col("o_totalprice") > 450000.0, 1).otherwise(0)
            )
            .cast("bigint")
            .alias("big_price"),
            F.sum(
                F.when(F.col("c_custkey").isNull(), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("fk_miss"),
            F.count("*").cast("bigint").alias("n"),
        ).write.mode("overwrite").parquet(
            # foreachBatch is at-least-once: a replayed micro-batch
            # must land idempotently, so each batch OWNS a
            # batch_id-keyed partition dir and overwrites it on retry
            # instead of appending a double-count (r12-advisory fix).
            os.path.join(counters_dir, f"batch_id={batch_id}")
        )

    stream = (
        spark.readStream.schema(orders.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    with _shuffle_partitions(spark, 8):
        q = (
            stream.writeStream.foreachBatch(step)
            .option("checkpointLocation", _scratch("dq_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    return _dq_publish(spark, counters_dir)


def _dq_publish(spark: SparkSession, counters_dir: str) -> DataFrame:
    """Publish step of ``dq_constraints_stream``: column-sum the
    batch_id-partitioned counter partials into the report. Module-level
    (not a closure) so the replay-idempotence test can re-publish after
    simulating an at-least-once foreachBatch replay
    (tests/test_streaming_restart.py, r13-verdict item 3)."""
    tot = spark.read.parquet(counters_dir).agg(
        F.sum("bad_status").cast("bigint").alias("bad_status"),
        F.sum("big_price").cast("bigint").alias("big_price"),
        F.sum("fk_miss").cast("bigint").alias("fk_miss"),
        F.sum("n").cast("bigint").alias("n"),
    )

    def row(name: str, vcol: str) -> DataFrame:
        return tot.select(
            F.lit(name).alias("check_name"),
            F.lit("orders").alias("tbl"),
            F.col(vcol).alias("violations"),
            F.col("n").alias("total"),
        )

    return (
        row("domain_o_orderstatus", "bad_status")
        .unionAll(row("max_o_totalprice_450k", "big_price"))
        .unionAll(row("fk_orders_customer", "fk_miss"))
    )


def feature_snapshot_stream(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming feature-store maintenance — the ingest-side twin of
    ``customer_feature_snapshot``.

    Orders arrive as a 3-file AvailableNow stream; each micro-batch
    reduces to PARTIAL per-customer aggregates (window counts, 90-day
    revenue cents, min/max order date — every feature either a sum or
    a min/max, i.e. associative and mergeable), appended to a compact
    partials store. Publishing = one merge rollup of the partials:
    sums of sums, min of mins, max of maxes, then the derived
    recency/tenure columns. After the drain the snapshot equals the
    batch query bit for bit, so the batch oracle applies verbatim.

    The cutoff comes from the STATIC batch relation (a feature
    snapshot is pinned to a cutoff; streaming maintains it as data
    arrives — it does not move the cutoff per batch). At scale each
    micro-batch is one map-side-combined partial aggregate of just
    that batch; standing state is |customers| partial rows, and the
    state never rescans history.
    """
    orders = load_table(spark, sf_dir, "orders")
    src = _split_source(spark, orders, "o_orderkey", "feat_src")
    cutoff = orders.agg(
        F.date_sub(
            F.max(F.col("o_orderdate").cast("date")), 90
        ).alias("c")
    )
    partials_dir = os.path.join(_SCRATCH, "feat_partials")
    if os.path.exists(partials_dir):
        shutil.rmtree(partials_dir)

    def step(batch_df: DataFrame, batch_id: int) -> None:
        pit = (
            batch_df.crossJoin(F.broadcast(cutoff))
            .withColumn("d", F.col("o_orderdate").cast("date"))
            .filter(F.col("d") <= F.col("c"))
        )
        win = lambda days: F.sum(
            F.when(
                F.col("d") > F.date_sub(F.col("c"), days), 1
            ).otherwise(0)
        ).cast("bigint")
        pit.groupBy("o_custkey").agg(
            win(30).alias("c30"),
            win(90).alias("c90"),
            win(365).alias("c365"),
            F.sum(
                F.when(
                    F.col("d") > F.date_sub(F.col("c"), 90),
                    F.col("o_totalprice").cast("decimal(18,2)"),
                ).otherwise(F.lit(0).cast("decimal(18,2)"))
            ).alias("rev90"),
            F.min("d").alias("mind"),
            F.max("d").alias("maxd"),
            F.count("*").cast("bigint").alias("cnt"),
        ).write.mode("overwrite").parquet(
            # idempotent under foreachBatch's at-least-once replay:
            # per-batch partition dir, overwritten on retry
            # (r12-advisory fix, same as dq_constraints_stream)
            os.path.join(partials_dir, f"batch_id={batch_id}")
        )

    stream = (
        spark.readStream.schema(orders.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    with _shuffle_partitions(spark, 8):
        q = (
            stream.writeStream.foreachBatch(step)
            .option("checkpointLocation", _scratch("feat_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    return _feat_merge(spark, partials_dir, cutoff)


def _feat_merge(
    spark: SparkSession, partials_dir: str, cutoff: DataFrame
) -> DataFrame:
    """Publish step of ``feature_snapshot_stream``: merge the
    batch_id-partitioned per-customer partials (sums of sums, min of
    mins, max of maxes) and derive the snapshot columns. Module-level
    (not a closure) so the replay-idempotence test can re-merge after
    simulating an at-least-once foreachBatch replay
    (tests/test_streaming_restart.py, r13-verdict item 3)."""
    merged = (
        spark.read.parquet(partials_dir)
        .groupBy("o_custkey")
        .agg(
            F.sum("c30").cast("bigint").alias("n_orders_30d"),
            F.sum("c90").cast("bigint").alias("n_orders_90d"),
            F.sum("c365").cast("bigint").alias("n_orders_365d"),
            F.sum("rev90").alias("rev90"),
            F.min("mind").alias("mind"),
            F.max("maxd").alias("maxd"),
            F.sum("cnt").cast("bigint").alias("n_orders_total"),
        )
        .crossJoin(F.broadcast(cutoff))
    )
    return merged.select(
        F.col("o_custkey").alias("customer_id"),
        "n_orders_30d",
        "n_orders_90d",
        "n_orders_365d",
        (F.col("rev90") * 100).cast("bigint").alias("rev_cents_90d"),
        F.datediff(F.col("c"), F.col("maxd"))
        .cast("bigint")
        .alias("recency_days"),
        F.datediff(F.col("c"), F.col("mind"))
        .cast("bigint")
        .alias("tenure_days"),
        "n_orders_total",
    )


def curriculum_pacing_stream(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming twin of ``docs_curriculum_pacing``: documents arrive
    as a 3-file AvailableNow stream; each micro-batch reduces to
    per-difficulty-VALUE partials (count of docs, sum of tokens at
    that difficulty — both associative), written idempotently under
    the batch_id-partition discipline. Publishing = merge the
    partials (sums of sums over the bounded value relation) and run
    the identical pacing arithmetic — cumulative counts over DISTINCT
    difficulty values, phase cutoffs at ceil(sqrt(t/10)·n). After the
    drain the table equals the batch query exactly, so the batch SQL
    oracle applies verbatim.

    At scale each micro-batch is one map-side-combined aggregate of
    just that batch; standing state is one partial row per distinct
    difficulty value per batch (bounded by the token-count range,
    never corpus size), and the pacing pass never rescans history."""
    from ..plans.queries_r13 import _CURR_PHASES

    docs = load_table(spark, sf_dir, "documents")
    src = _split_source(spark, docs, "doc_id", "curr_src")
    partials_dir = os.path.join(_SCRATCH, "curr_partials")
    if os.path.exists(partials_dir):
        shutil.rmtree(partials_dir)

    t = F.trim(F.col("text"))
    diff_expr = (
        F.coalesce(
            F.length(t)
            - F.length(F.replace(t, F.lit(" "), F.lit("")))
            + F.when(t == "", 0).otherwise(1),
            F.lit(0),
        )
        .cast("bigint")
        .alias("d")
    )

    def step(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.select(diff_expr).groupBy("d").agg(
            F.count("*").cast("bigint").alias("cnt"),
            F.sum("d").cast("bigint").alias("dtok"),
        ).write.mode("overwrite").parquet(
            os.path.join(partials_dir, f"batch_id={batch_id}")
        )

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    with _shuffle_partitions(spark, 8):
        q = (
            stream.writeStream.foreachBatch(step)
            .option("checkpointLocation", _scratch("curr_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    vals = (
        spark.read.parquet(partials_dir)
        .groupBy("d")
        .agg(
            F.sum("cnt").cast("bigint").alias("cnt"),
            F.sum("dtok").cast("bigint").alias("dtok"),
        )
    )
    tot = vals.agg(F.sum("cnt").cast("bigint").alias("n"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    cum = vals.select(
        "d",
        F.sum("cnt").over(w).cast("bigint").alias("ccnt"),
        F.sum("dtok").over(w).cast("bigint").alias("ctok"),
    )
    comp = F.sqrt(
        F.col("phase").cast("double") / F.lit(float(_CURR_PHASES))
    )
    targets = (
        spark.range(1, _CURR_PHASES + 1)
        .select(F.col("id").cast("bigint").alias("phase"))
        .crossJoin(F.broadcast(tot))
        .select(
            "phase",
            comp.alias("competence"),
            F.ceil(comp * F.col("n")).cast("bigint").alias("want"),
        )
    )
    return (
        targets.join(cum, F.col("ccnt") >= F.col("want"), "inner")
        .groupBy("phase", "competence")
        .agg(
            F.min("d").cast("bigint").alias("difficulty_cutoff"),
            F.min("ccnt").cast("bigint").alias("n_admitted"),
            F.min("ctok").cast("bigint").alias("tokens_admitted"),
        )
    )


def scd2_apply_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming SCD2 (type-2 dimension) maintenance — the ingest-side
    twin of the batch pair ``scd2_intervals`` (build from a full log)
    and ``cdc_scd2_apply`` (apply one change batch).

    Orders arrive as a 3-file AvailableNow stream split on DISJOINT
    order-date ranges (CDC arrives per-key in order; equal dates land
    in the same file, so the global (date, orderkey) sort order is the
    concatenation of the batches). Each micro-batch MERGEs into the
    standing dimension: the batch expands to its own mini-intervals
    (lead window WITHIN the batch), each key's standing current row
    closes at the key's first change date in the batch, untouched rows
    pass through. After the drain the dimension equals the batch
    interval build from the full log bit for bit — the lead window's
    answer — so that SQL oracle applies verbatim.

    Fault tolerance: the dimension is a batch_id-keyed VERSION CHAIN
    (``v{batch_id}`` reads ``v{batch_id - 1}``); a replayed microbatch
    deterministically rewrites its own version, so foreachBatch's
    at-least-once delivery lands exactly-once (same contract as
    dq_constraints_stream's counter partitions, tested in
    tests/test_streaming_restart.py).

    At 100 TB this is Delta/Iceberg ``MERGE WHEN MATCHED UPDATE /
    WHEN NOT MATCHED INSERT`` with copy-on-write limited to files
    holding changed keys; the self-contained version here rewrites the
    whole (dimension-sized, not fact-sized) relation per batch. Each
    batch's window shuffles only the BATCH on o_custkey; the standing
    dimension joins the (small) per-key first-change relation with AQE
    free to broadcast it.
    """
    orders = load_table(spark, sf_dir, "orders")
    typed = orders.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_totalprice").cast("decimal(18,2)").alias("o_totalprice"),
        F.col("o_orderdate").cast("date").alias("d"),
    )
    cuts = ("1997-01-01", "1999-01-01")
    ranges = [
        F.col("d") < F.lit(cuts[0]).cast("date"),
        (F.col("d") >= F.lit(cuts[0]).cast("date"))
        & (F.col("d") < F.lit(cuts[1]).cast("date")),
        F.col("d") >= F.lit(cuts[1]).cast("date"),
    ]
    # FileStreamSource orders new files by modification time; the
    # date-tercile batches MUST arrive in order for the SCD2 fold.
    # _split_source pins each tercile file to an EXPLICIT, strictly
    # increasing mtime (r14 advisory) and writes all three in ONE
    # Spark job (r15: one orders scan instead of three).
    tercile = (
        F.when(ranges[0], F.lit(0))
        .when(ranges[1], F.lit(1))
        .otherwise(F.lit(2))
    )
    src = _split_source(spark, typed, tercile, "scd2_src")

    dim_root = os.path.join(_SCRATCH, "scd2_dim")
    if os.path.exists(dim_root):
        shutil.rmtree(dim_root)

    def step(batch_df: DataFrame, batch_id: int) -> None:
        w = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
        nxt = F.lead("d").over(w)
        mini = batch_df.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.col("d").alias("valid_from"),
            nxt.alias("valid_to"),
            nxt.isNull().alias("is_current"),
        )
        first_change = batch_df.groupBy("o_custkey").agg(
            F.min("d").alias("close_at")
        )
        prev_dir = os.path.join(dim_root, f"v{batch_id - 1}")
        if batch_id == 0 or not os.path.exists(prev_dir):
            dim = mini
        else:
            prev = spark.read.parquet(prev_dir)
            cur = prev.filter("is_current")
            closed = cur.join(first_change, "o_custkey").select(
                "o_custkey",
                "o_orderkey",
                "o_totalprice",
                "valid_from",
                F.col("close_at").alias("valid_to"),
                F.lit(False).alias("is_current"),
            )
            untouched_cur = cur.join(
                first_change, "o_custkey", "left_anti"
            )
            history = prev.filter(~F.col("is_current"))
            dim = (
                history.unionByName(closed)
                .unionByName(untouched_cur)
                .unionByName(mini)
            )
        dim.write.mode("overwrite").parquet(
            os.path.join(dim_root, f"v{batch_id}")
        )

    stream = (
        spark.readStream.schema(typed.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    with _shuffle_partitions(spark, 8):
        q = (
            stream.writeStream.foreachBatch(step)
            .option("checkpointLocation", _scratch("scd2_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    versions = sorted(
        int(v[1:]) for v in os.listdir(dim_root) if v.startswith("v")
    )
    final = spark.read.parquet(
        os.path.join(dim_root, f"v{versions[-1]}")
    )
    # validity bounds surface as nullable TIMESTAMP_NTZ with NULL on
    # the open interval (FIXTURES.md F6 r16: the scd2_intervals shape
    # — o_orderdate is parquet timestamp[us], so that query's green
    # bounds are NTZ — null-bearing DATE was the r12 RED shape; the
    # r15 9999-12-31 sentinel overflowed pandas ns in the driver's
    # oracle harness)
    return final.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.col("valid_from").cast("timestamp_ntz").alias("valid_from"),
        F.col("valid_to").cast("timestamp_ntz").alias("valid_to"),
        "is_current",
    )


def ivm_agg_maintenance_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental view maintenance — the ingest-side twin of
    the batch ``pipeline_ivm_agg_maintenance`` (queries_r14.py): a
    standing q1-style pricing aggregate absorbs a 3-batch AvailableNow
    refresh stream (base load, delete batch, insert batch) as SIGNED
    PARTIALS, never re-aggregating the base relation.

    Each refresh file carries (l_returnflag, l_linestatus, qty, price,
    sign): deletes ship sign = -1, inserts/base sign = +1, and every
    micro-batch folds into the standing aggregate as
    ``new = old + sign * agg(batch)`` — valid because SUM/COUNT form
    an abelian group, which also makes the drain ARRIVAL-ORDER
    INVARIANT (unlike scd2_apply_stream, no mtime pinning is needed:
    any batch interleaving converges to the same aggregate).

    Fault tolerance: the standing aggregate is a batch_id-keyed
    VERSION CHAIN (``v{batch_id}`` reads ``v{batch_id - 1}``), so
    foreachBatch's at-least-once replay lands exactly-once — the same
    contract as scd2_apply_stream / dq_constraints_stream.

    At 100 TB the standing aggregate is a |groups|-row relation and
    each micro-batch costs one map-side-combined groupBy of the BATCH
    — the fact table is read exactly once at initial load and never
    again; that is the entire point of IVM. Decimal partials keep the
    merge exact (the float policy), so the drained result hashes
    bit-identically to the oracle's direct recompute of the refreshed
    relation.
    """
    from ..plans.queries_r14 import _IVM_DEL_MOD, _IVM_INS_MOD

    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    typed = li.select(
        "l_returnflag",
        "l_linestatus",
        qty.alias("qty"),
        price.alias("price"),
        "l_orderkey",
    )
    # r15 (guide §2.4 "remove shuffles/passes outright"): the three
    # refresh files (base +1, delete -1, insert +1 with qty+1) were
    # written by three sequential jobs — a full fact scan plus two
    # filtered rescans. One explode fans each row out to the batches
    # it belongs to (tag 0 always; 1/2 when the key matches the
    # delete/insert modulus), so ONE scan and ONE partitionBy job
    # write all three files; batch contents are row-for-row identical
    # to the sequential form, and the fold is arrival-order invariant
    # anyway (abelian partials).
    tag = F.array_remove(
        F.array(
            F.lit(0),
            F.when(
                F.col("l_orderkey") % _IVM_DEL_MOD == 0, F.lit(1)
            ).otherwise(F.lit(-1)),
            F.when(
                F.col("l_orderkey") % _IVM_INS_MOD == 0, F.lit(2)
            ).otherwise(F.lit(-1)),
        ),
        -1,
    )
    out = typed.select(
        "l_returnflag",
        "l_linestatus",
        "qty",
        "price",
        F.explode(tag).alias("__t"),
    ).select(
        "l_returnflag",
        "l_linestatus",
        F.when(
            F.col("__t") == 2, (F.col("qty") + 1).cast("decimal(18,2)")
        )
        .otherwise(F.col("qty"))
        .alias("qty"),
        "price",
        F.when(F.col("__t") == 1, F.lit(-1))
        .otherwise(F.lit(1))
        .alias("sign"),
        "__t",
    )
    schema = out.drop("__t").schema
    src = _split_source(spark, out, "__t", "ivm_src", tagged=True)

    agg_root = os.path.join(_SCRATCH, "ivm_agg")
    if os.path.exists(agg_root):
        shutil.rmtree(agg_root)

    def step(batch_df: DataFrame, batch_id: int) -> None:
        part = batch_df.groupBy("l_returnflag", "l_linestatus").agg(
            F.sum(F.col("qty") * F.col("sign"))
            .cast("decimal(18,2)")
            .alias("p_qty"),
            F.sum(F.col("price") * F.col("sign"))
            .cast("decimal(18,2)")
            .alias("p_price"),
            F.sum("sign").cast("bigint").alias("p_n"),
        )
        prev_dir = os.path.join(agg_root, f"v{batch_id - 1}")
        if batch_id > 0 and os.path.exists(prev_dir):
            part = spark.read.parquet(prev_dir).unionByName(part)
        merged = part.groupBy("l_returnflag", "l_linestatus").agg(
            F.sum("p_qty").cast("decimal(18,2)").alias("p_qty"),
            F.sum("p_price").cast("decimal(18,2)").alias("p_price"),
            F.sum("p_n").cast("bigint").alias("p_n"),
        )
        merged.write.mode("overwrite").parquet(
            os.path.join(agg_root, f"v{batch_id}")
        )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    with _shuffle_partitions(spark, 8):
        q = (
            stream.writeStream.foreachBatch(step)
            .option("checkpointLocation", _scratch("ivm_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    versions = sorted(
        int(v[1:]) for v in os.listdir(agg_root) if v.startswith("v")
    )
    final = spark.read.parquet(os.path.join(agg_root, f"v{versions[-1]}"))
    return final.select(
        "l_returnflag",
        "l_linestatus",
        F.col("p_qty").cast("double").alias("sum_qty"),
        F.col("p_price").cast("double").alias("sum_base_price"),
        F.col("p_n").alias("count_order"),
    )
