"""JDBC source/sink wrappers (SURVEY.md §2.1 ``jdbc_scan_*``,
``bulk_load_copy``).

The reference extracts with templated SQL shipped to Postgres
(reference: mnt/dags/01fetch_from_database.py:49-59, pushdown predicate
at :52; parameterized cursor variant
mnt/dags/unused_postgres_hooks_V02.py:25-34) and bulk-loads with
``COPY … FROM STDIN CSV HEADER`` (reference:
mnt/dags/02datalake_to_datawarehouse.py:136-148).

Engine design (100 TB idiom, SURVEY.md §7 risk 6):

- Reads are *partitioned*: ``partitionColumn/lowerBound/upperBound/
  numPartitions`` so N executors each pull a key-range slice in
  parallel; a single-connection JDBC read is a driver bottleneck.
- Filters/column pruning push into the generated remote SQL
  automatically (Catalyst JDBC pushdown) — the reference does this by
  hand-editing its extract SQL.
- Writes batch inserts (``batchsize``); a COPY-protocol fast path via
  ``foreachPartition`` + psycopg2 is sketched for parity with the
  reference's bulk loader (one COPY per partition — parallel, not
  driver-funneled).

No Postgres exists in the test container, so every wrapper takes a
``Source``/``Sink`` that is file-backed in tests; the JDBC binding is
exercised as plan construction only.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from .filesource import parquet_read


@dataclass
class JdbcConfig:
    url: str  # e.g. jdbc:postgresql://host:5432/db
    properties: dict[str, str] = field(default_factory=dict)
    # Partitioned-read knobs — REQUIRED at scale:
    partition_column: str | None = None
    lower_bound: str | None = None
    upper_bound: str | None = None
    num_partitions: int = 32


def jdbc_scan(
    spark: SparkSession, cfg: JdbcConfig, table: str, query: str | None = None
) -> DataFrame:
    """Full-table or query scan from a JDBC database, partitioned by
    key range when configured (reference ``SELECT * FROM
    dbo.table_product_demand`` — mnt/dags/01fetch_from_database.py:52)."""
    reader = spark.read.format("jdbc").option("url", cfg.url)
    for k, v in cfg.properties.items():
        reader = reader.option(k, v)
    if query is not None:
        reader = reader.option("query", query)
    else:
        reader = reader.option("dbtable", table)
        if cfg.partition_column:
            reader = (
                reader.option("partitionColumn", cfg.partition_column)
                .option("lowerBound", cfg.lower_bound)
                .option("upperBound", cfg.upper_bound)
                .option("numPartitions", str(cfg.num_partitions))
            )
    return reader.load()


def jdbc_write(
    df: DataFrame,
    cfg: JdbcConfig,
    table: str,
    mode: str = "append",
    batchsize: int = 10_000,
) -> None:
    """Batched-insert sink (the engine's ``bulk_load_copy``); set
    ``batchsize`` high — each executor partition writes concurrently."""
    (
        df.write.format("jdbc")
        .option("url", cfg.url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .mode(mode)
        .save()
    )


def pg_dsn(jdbc_url: str, properties: dict[str, str] | None = None) -> str:
    """``jdbc:postgresql://host:port/db`` → libpq URI, folding user/
    password properties in (psycopg2 accepts the URI form directly)."""
    from urllib.parse import quote

    if not jdbc_url.startswith("jdbc:"):
        raise ValueError(f"not a JDBC url: {jdbc_url}")
    uri = jdbc_url[len("jdbc:") :]
    props = properties or {}
    creds = ""
    if props.get("user"):
        # Percent-encode: credentials containing '@', ':', '/', '#'
        # would otherwise produce a malformed libpq URI.
        creds = quote(props["user"], safe="")
        if props.get("password"):
            creds += ":" + quote(props["password"], safe="")
        creds += "@"
    scheme, rest = uri.split("://", 1)
    return f"{scheme}://{creds}{rest}"


def copy_rows(
    conn_factory: Callable[[], object],
    table: str,
    columns: list[str],
    rows,
    chunk_rows: int = 50_000,
) -> int:
    """Core of the COPY sink, connection-agnostic so a fake cursor can
    unit-test it: encode ``rows`` (iterable of Row/tuple) as CSV in
    ``chunk_rows`` batches and stream each batch through
    ``cursor.copy_expert("COPY … FROM STDIN WITH (FORMAT CSV, NULL '\\N')")``
    — the same protocol as the reference's bulk loader (reference:
    mnt/dags/02datalake_to_datawarehouse.py:136-148). NULL is the
    unquoted ``\\N`` marker while every non-null field is force-quoted,
    so an empty string round-trips as ``""`` instead of silently
    loading as NULL (Postgres treats an unquoted field matching the
    null string as NULL, a quoted one as a literal). One transaction
    per partition: all chunks commit together or not at all. Returns
    the row count written."""
    import io
    import itertools

    def enc(v) -> str:
        if v is None:
            return "\\N"
        return '"' + str(v).replace('"', '""') + '"'

    collist = ", ".join(columns)
    sql = f"COPY {table} ({collist}) FROM STDIN WITH (FORMAT CSV, NULL '\\N')"
    n = 0
    conn = conn_factory()
    try:
        cur = conn.cursor()
        it = iter(rows)
        while True:
            chunk = list(itertools.islice(it, chunk_rows))
            if not chunk:
                break
            buf = io.StringIO(
                "".join(",".join(enc(v) for v in row) + "\r\n" for row in chunk)
            )
            cur.copy_expert(sql, buf)
            n += len(chunk)
        conn.commit()
    except Exception:
        conn.rollback()
        raise
    finally:
        conn.close()
    return n


def copy_sink(df: DataFrame, cfg: JdbcConfig, table: str) -> None:
    """COPY-protocol fast-path sink: each partition opens ONE
    connection and streams itself via Postgres COPY (parity with the
    reference's bulk loader), parallel across executors — never
    funneled through the driver. psycopg2 must be importable on
    executors (guarded; the CSV-encode + copy_expert core is
    unit-tested with a fake cursor in tests/test_analytics.py)."""
    columns = list(df.columns)
    dsn = pg_dsn(cfg.url, cfg.properties)

    def _copy_partition(rows) -> None:  # pragma: no cover - needs psycopg2+PG
        try:
            import psycopg2
        except ImportError as e:
            raise NotImplementedError(
                "copy_sink requires psycopg2 on executors"
            ) from e
        copy_rows(lambda: psycopg2.connect(dsn), table, columns, rows)

    df.foreachPartition(_copy_partition)


def file_backed_source(sf_dir: str) -> Callable[[SparkSession, str], DataFrame]:
    """Test-container stand-in for a JDBC database: same scan contract,
    parquet-backed. Lets every jdbc_* operator run (and be
    oracle-checked) without a live Postgres."""

    def scan(spark: SparkSession, table: str) -> DataFrame:
        return parquet_read(spark, f"{sf_dir}/{table}.parquet")

    return scan
