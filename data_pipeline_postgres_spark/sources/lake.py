"""Date-partitioned lake layout (SURVEY.md §2.1 ``s3_put``/``s3_get``/
``file_rename``/``ddl_monthly_shard``).

The reference hand-builds ``src/…/YYYY/MM/table_<ds>.csv`` object keys
(reference: mnt/dags/02datalake_to_datawarehouse.py:76-95, key template
mnt/dags/01fetch_from_database.py:55) and month-sharded table *names*
``table_material_demand_{YYYY_MM}`` (reference: README.md:774-787).
Both are manual partitioning. Here the same layout is a Hive-partitioned
parquet dataset — ``partitionBy("year","month")`` on write, automatic
partition pruning on read — so "download + rename + re-upload"
(reference: mnt/dags/02datalake_to_datawarehouse.py:28-50) disappears:
executors read ``s3a://`` paths directly.

At 100 TB, partition columns are the primary scan-elimination tool:
a day-filtered query touches one partition, not the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    date_col: str = "date",
    mode: str = "overwrite",
) -> None:
    """Write with derived year/month partition columns. With
    ``spark.sql.sources.partitionOverwriteMode=dynamic`` (engine
    default), re-running a day replaces only that day's partitions —
    the reference's ``replace=True`` idempotency, per-partition."""
    (
        df.withColumn("year", F.year(date_col))
        .withColumn("month", F.month(date_col))
        .write.mode(mode)
        .partitionBy("year", "month")
        .parquet(path)
    )


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read the partitioned dataset; year/month come back as partition
    columns and filters on them prune directories before any I/O."""
    return spark.read.parquet(path)
