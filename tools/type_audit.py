"""Strict oracle-vs-Spark TYPE audit (driver-hasher contract).

CORRECTNESS_r10's only hash-fail (`multimodal_shard_manifest`) was a
pure type divergence: a DuckDB window ``SUM(BIGINT)`` yields HUGEINT,
which surfaces through Arrow as ``decimal128(38,0)`` — value-equal to
Spark's BIGINT under row-sorted comparison, but hashed differently by
the driver. Row equality is NOT the driver contract; Arrow-level type
identity is the safe one.

This tool fetches every oracle's result as an Arrow table and compares
column types to the Spark query's schema, flagging any column whose
Arrow type family differs (int vs decimal, int width, date vs
timestamp, float32 vs float64). Run it whenever an oracle is added.

Usage: python tools/type_audit.py [--sf DIR] [name ...]
       (no names = audit every oracle-backed query)
"""
import sys

sys.path.insert(0, "/root/repo")

args = sys.argv[1:]
SF = "/root/testdata/sf0.001"
if args and args[0] == "--sf":
    SF = args[1]
    args = args[2:]

import duckdb
import __spark_entry__ as E
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[8]")
    .appName("type-audit")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

qs, os_ = E.queries(), E.oracle_sql()
names = args or [n for n in qs if n in os_]

con = duckdb.connect()
for t in [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")


from tests.oracle_util import (  # noqa: E402  (one shared impl)
    arrow_type_family as arrow_family,
    spark_type_family as spark_family,
)


bad, err = [], []
for name in names:
    try:
        sdf = qs[name](spark, SF)
        s_types = {f.name: spark_family(f.dataType) for f in sdf.schema.fields}
        tbl = con.execute(os_[name]).fetch_arrow_table()
        d_types = {
            f.name: arrow_family(f.type) for f in tbl.schema
        }
    except Exception as e:  # noqa: BLE001
        err.append(name)
        print(f"{name}: ERROR {type(e).__name__}: {e}")
        continue
    if sorted(s_types) != sorted(d_types):
        bad.append(name)
        print(f"{name}: COLUMN MISMATCH spark={sorted(s_types)} "
              f"duck={sorted(d_types)}")
        continue
    diffs = {
        c: (s_types[c], d_types[c])
        for c in s_types
        if s_types[c] != d_types[c]
    }
    if diffs:
        bad.append(name)
        print(f"{name}: TYPE MISMATCH {diffs}")
        continue
    # Null-bearing DATE sweep (FIXTURES.md F6, round 13): the only
    # driver hash-red whose values AND type families were locally
    # exact (cdc_scd2_apply, r12) was also the fleet's only query
    # emitting a DATE column that contains NULLs; null-bearing
    # TIMESTAMP is 10-round driver-green. Until a null-bearing DATE
    # column gets a green driver row, flag the shape as a warning so
    # new oracles don't reintroduce it unknowingly.
    import pyarrow.types as pat
    for f in tbl.schema:
        if pat.is_date(f.type) and tbl.column(f.name).null_count > 0:
            print(f"{name}: WARN null-bearing DATE column '{f.name}' "
                  f"({tbl.column(f.name).null_count} nulls) — "
                  "driver-hash-suspect shape, prefer TIMESTAMP_NTZ "
                  "(FIXTURES.md F6)")
    # Null-bearing LTZ sweep (FIXTURES.md F6, round 14): Spark
    # TimestampType (LTZ) surfaces through Arrow as
    # timestamp[us, tz=UTC]; the r13 driver history separates on
    # exactly this axis — LTZ-with-nulls was the fleet's only red
    # (cdc_scd2_apply r13 repin) while LTZ-without-nulls and NTZ are
    # many-round green. HARD-FAIL the shape: a nullable timestamp
    # output must be cast to timestamp_ntz.
    from pyspark.sql import types as _T
    ltz = [f.name for f in sdf.schema.fields
           if isinstance(f.dataType, _T.TimestampType)]
    if ltz:
        from pyspark.sql import functions as _F
        nulls = sdf.select([
            _F.sum(_F.col(c).isNull().cast("int")).alias(c) for c in ltz
        ]).collect()[0]
        null_ltz = [c for c in ltz if (nulls[c] or 0) > 0]
        if null_ltz:
            bad.append(name)
            print(f"{name}: NULL-BEARING LTZ column(s) {null_ltz} — "
                  "driver-hash-red shape, cast to timestamp_ntz "
                  "(FIXTURES.md F6, cdc_scd2_apply r13)")
    # Per-column NULLABILITY report (FIXTURES.md F6, round 15): the
    # type-family comparison alone let cdc_scd2_apply pass locally
    # while the driver hash-failed three rounds running — the blind
    # spot was WHICH columns actually carry nulls. Report every
    # null-bearing oracle column with its Arrow type so the
    # null-timestamp sweep is mechanical; WARN on any null-bearing
    # timestamp flavor until the r15 scd2_intervals experiment lands.
    for f in tbl.schema:
        nc = tbl.column(f.name).null_count
        if nc > 0:
            suspect = pat.is_timestamp(f.type) or pat.is_date(f.type)
            tag = " [HASH-SUSPECT: null-bearing timestamp]" if suspect else ""
            print(f"{name}: NULLS {f.name} arrow={f.type} "
                  f"nulls={nc}/{tbl.num_rows}{tag}")

print(f"\naudited {len(names)}; type-mismatched {len(bad)}; errors {len(err)}")
if bad:
    print("mismatched:", " ".join(sorted(bad)))
sys.exit(1 if (bad or err) else 0)
