"""Continuous-trigger soak: the one streaming mode the AvailableNow
suite (SURVEY §2.13) cannot exercise. A query runs under
``Trigger.ProcessingTime`` while new source files land MID-RUN, and
must absorb them incrementally — multiple micro-batches, no restart,
final state equal to the batch answer over everything that arrived.

This is the always-on analog of the reference's sensor-gated daily
run (reference: mnt/dags/02datalake_to_datawarehouse.py:170-186
ExternalTaskSensor): instead of polling for upstream completion, the
file source discovers arrivals and the engine folds them in.
"""

from __future__ import annotations

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _write_batch(src_dir: str, batch_id: int, n: int) -> None:
    """Land one parquet file the way a lake ingest would: a complete
    file appearing atomically (write to a temp name, then rename)."""
    import datetime

    base = datetime.datetime(1995, 1, 1) + datetime.timedelta(days=batch_id)
    tbl = pa.table(
        {
            "ts": pa.array(
                [base + datetime.timedelta(minutes=i) for i in range(n)],
                type=pa.timestamp("us"),
            ),
            "user_id": pa.array(
                [(batch_id * 7 + i) % 50 for i in range(n)], type=pa.int64()
            ),
            "event_type": pa.array(
                [f"type_{i % 3}" for i in range(n)], type=pa.string()
            ),
            "value": pa.array([float(i % 10) for i in range(n)]),
        }
    )
    tmp = os.path.join(src_dir, f"_tmp_batch_{batch_id}.parquet")
    pq.write_table(tbl, tmp)
    os.rename(tmp, os.path.join(src_dir, f"batch_{batch_id}.parquet"))


def _wait(pred, timeout_s: float = 90.0, poll_s: float = 0.25):
    deadline = time.monotonic() + timeout_s
    while time.monotonic() < deadline:
        if pred():
            return True
        time.sleep(poll_s)
    return False


def test_processing_time_trigger_absorbs_midrun_files(spark, tmp_path):
    src_dir = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src_dir)
    _write_batch(src_dir, 0, 120)

    stream = spark.readStream.schema(SCHEMA).parquet(src_dir)
    agg = stream.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_value"),
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    q = (
        agg.writeStream.format("memory")
        .queryName("soak_counts")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="300 milliseconds")
        .start()
    )
    try:

        def total() -> int:
            rows = spark.table("soak_counts").agg(F.sum("n")).collect()
            return rows[0][0] or 0

        # batch 0 must surface without any stop/restart
        assert _wait(lambda: total() == 120), (
            f"initial file never processed (total={total()})"
        )
        # two more files land while the query is LIVE
        _write_batch(src_dir, 1, 80)
        assert _wait(lambda: total() == 200), (
            f"mid-run file 1 not absorbed (total={total()})"
        )
        _write_batch(src_dir, 2, 50)
        assert _wait(lambda: total() == 250), (
            f"mid-run file 2 not absorbed (total={total()})"
        )

        # the stream stayed healthy and genuinely ran multiple
        # nonempty micro-batches (one per arrival, not one big one)
        assert q.exception() is None
        nonempty = [
            p["batchId"]
            for p in (q.recentProgress or [])
            if p and p["numInputRows"] > 0
        ]
        assert len(set(nonempty)) >= 3, (
            f"expected >=3 nonempty micro-batches, saw {nonempty}"
        )
    finally:
        q.stop()
        spark.conf.set("spark.sql.shuffle.partitions", prev)

    # final state == the batch answer over every file that arrived
    batch = (
        spark.read.schema(SCHEMA)
        .parquet(src_dir)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
    )
    got = {
        r["event_type"]: (r["n"], r["sum_value"])
        for r in spark.table("soak_counts").collect()
    }
    want = {r["event_type"]: (r["n"], r["sum_value"]) for r in batch.collect()}
    assert got == want
