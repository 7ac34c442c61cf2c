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

import os

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

# events.parquet physical layout (TESTDATA.md), with the TIMESTAMP(NANOS)
# ts column read as raw long — see load_table.
EVENTS_RAW_SCHEMA = (
    "event_id bigint, ts long, user_id bigint, "
    "event_type string, value double, props string"
)


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one lake table as a DataFrame (columnar parquet scan —
    column pruning and predicate pushdown reach the file scan)."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark's
        # vectorized reader rejects when inferring the schema
        # (PARQUET_TYPE_ILLEGAL). Supplying the schema explicitly with
        # ``ts long`` reads the raw nanos without touching the
        # session-wide ``spark.sql.legacy.parquet.nanosAsLong`` conf
        # (no leak into other readers); floor-division to microseconds
        # matches DuckDB's truncation, so both engines see identical
        # timestamps.
        df = spark.read.schema(EVENTS_RAW_SCHEMA).parquet(
            table_path(sf_dir, name)
        )
        return df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    return spark.read.parquet(table_path(sf_dir, name))


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
