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


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one lake table as a DataFrame (columnar parquet scan —
    column pruning and predicate pushdown reach the file scan)."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
        # reader rejects (PARQUET_TYPE_ILLEGAL). Read nanos as long and
        # floor-convert to microseconds — the same truncation DuckDB
        # applies — so both engines see identical timestamps.
        # The conf must OUTLIVE this call: the returned DataFrame is
        # lazy and the scan consults the session conf when an action
        # finally runs, so a set/restore here would break execution.
        # It is scoped to TIMESTAMP(NANOS) columns only — parquet with
        # micro/milli timestamps is unaffected. Bounded streaming runs
        # do scope it (streaming/jobs._nanos_as_long).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
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
