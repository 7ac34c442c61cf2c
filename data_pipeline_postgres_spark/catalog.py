"""Table registry for the parquet test lake.

The driver's testdata (TESTDATA.md) is a TPC-H-ish star schema plus
``events`` / ``documents`` / ``embeddings``. Every query callable takes
``(spark, sf_dir)``; this module centralizes loading and temp-view
registration so Spark and the DuckDB oracle see identically-named
relations.

At 100 TB these would be partitioned/bucketed catalog tables; the
loader keeps that swap local to one function.
"""

from __future__ import annotations

import glob
import os
from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SMOKE_SF_DIR = "/root/testdata/sf0.001"

# events.parquet physical layout (TESTDATA.md) when the ts column is
# TIMESTAMP(NANOS): read as raw long — see load_table.
EVENTS_RAW_SCHEMA = (
    "event_id bigint, ts long, user_id bigint, "
    "event_type string, value double, props string"
)


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def parquet_ts_unit(path: str, column: str = "ts") -> str:
    """Time unit ('s'|'ms'|'us'|'ns') of a parquet timestamp column,
    read from the file footer. The testdata has flipped units between
    driver versions (NANOS in round 1, MICROS by round 5); sniffing
    the footer instead of hard-coding the unit makes the reader
    unit-proof. One footer read on the driver per (file, mtime,
    column) — cached, negligible even at 100 TB. The mtime rides in
    the cache key so a regenerated file (the unit-flip scenario this
    sniffing exists for) can never serve a stale cached unit within a
    long-lived session."""
    if os.path.isdir(path):
        inner = sorted(glob.glob(os.path.join(path, "*.parquet")))
        if not inner:
            raise FileNotFoundError(f"no parquet files under {path}")
        path = inner[0]
    return _parquet_ts_unit_cached(
        path, os.stat(path).st_mtime_ns, column
    )


@lru_cache(maxsize=64)
def _parquet_ts_unit_cached(path: str, mtime_ns: int, column: str) -> str:
    import pyarrow.parquet as pq

    return pq.read_schema(path).field(column).type.unit


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one lake table as a DataFrame (columnar parquet scan —
    column pruning and predicate pushdown reach the file scan)."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    path = table_path(sf_dir, name)
    if name == "events" and parquet_ts_unit(path) == "ns":
        # TIMESTAMP(NANOS) is rejected by Spark's vectorized reader
        # when inferring the schema (PARQUET_TYPE_ILLEGAL). Supplying
        # the schema explicitly with ``ts long`` reads the raw nanos
        # without touching the session-wide
        # ``spark.sql.legacy.parquet.nanosAsLong`` conf (no leak into
        # other readers); floor-division to microseconds matches
        # DuckDB's truncation, so both engines see identical
        # timestamps. SECONDS/MILLIS/MICROS need no workaround —
        # Spark reads them natively as TimestampType.
        df = spark.read.schema(EVENTS_RAW_SCHEMA).parquet(path)
        return df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    if name == "events":
        # MICROS files without isAdjustedToUTC infer as timestamp_ntz;
        # the session timezone is pinned to UTC (session.py), so the
        # cast to TIMESTAMP is value-preserving and keeps one ts type
        # across batch, streaming, and the DuckDB oracle.
        return spark.read.parquet(path).withColumn(
            "ts", F.col("ts").cast("timestamp")
        )
    return spark.read.parquet(path)


def table_num_rows(sf_dir: str, name: str) -> int:
    """Row count of a lake table from the parquet footer — a
    driver-side metadata read (no Spark job), cached on (path, mtime)
    like ``parquet_ts_unit``. Used to derive scale-adaptive
    partitioning constants (e.g. the textdup prefix-sum bucket width)
    instead of hard-coding either the local or the cluster value."""
    path = table_path(sf_dir, name)
    if os.path.isdir(path):
        inner = sorted(glob.glob(os.path.join(path, "*.parquet")))
        return sum(
            _parquet_num_rows_cached(p, os.stat(p).st_mtime_ns)
            for p in inner
        )
    return _parquet_num_rows_cached(path, os.stat(path).st_mtime_ns)


@lru_cache(maxsize=64)
def _parquet_num_rows_cached(path: str, mtime_ns: int) -> int:
    import pyarrow.parquet as pq

    return pq.ParquetFile(path).metadata.num_rows


def spread_scan(df: DataFrame, key: str) -> DataFrame:
    """Scale-adaptive scan-parallelism fix for heavy per-row work
    (optimization guide §2.5 "input skew: one huge unsplittable file
    ... repartition immediately after the read"). The test lake's
    tables are ONE parquet file with ONE row group, so every stage up
    to the first exchange — tokenize/shingle/md5/explode, often the
    dominant cost of a text query — runs as a single task on one core
    regardless of cluster width. Hash-repartition by ``key`` up to
    ``defaultParallelism`` ONLY when the scan yields fewer partitions
    than cores: at 100 TB a table scan already carries thousands of
    splits, the branch is a no-op, and no gratuitous exchange is ever
    added at scale. Results are unchanged for any downstream plan
    that is row-order independent (everything here is: aggregations,
    joins, windows keyed by columns) — do NOT use upstream of
    ``monotonically_increasing_id``/``spark_partition_id`` consumers,
    whose values depend on the physical partitioning."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target, F.col(key))
    return df


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Register lake tables as temp views (same names the DuckDB oracle
    uses) and return them keyed by name."""
    out = {}
    for name in names:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
