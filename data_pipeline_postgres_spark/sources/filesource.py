"""CSV / parquet file source & sink utilities (SURVEY.md §2.1).

The reference round-trips every stage through header CSVs on local disk
and MinIO (reference: mnt/dags/02datalake_to_datawarehouse.py:62,84-95).
Here CSV is an ingest/egress format only — parquet is engine-native
(columnar, statistics, partition pruning). Readers take an explicit
schema: the reference's inference-on-read (pandas ``read_csv``) is the
source of its VARCHAR-numerics bug class (SURVEY.md §1.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def csv_read(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
) -> DataFrame:
    """CSV → DataFrame, header row, explicit schema when given
    (reference: ``pd.read_csv(path, index_col=False)`` at
    mnt/dags/02datalake_to_datawarehouse.py:62)."""
    reader = spark.read.option("header", True)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def csv_write(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """DataFrame → header CSV (reference: ``df.to_csv(path, index=False)``
    at mnt/dags/02datalake_to_datawarehouse.py:84-85). ``overwrite``
    keeps re-runs idempotent (the reference's ``replace=True``)."""
    df.write.mode(mode).option("header", True).csv(path)


def parquet_write(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).parquet(path)


def parquet_read(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
