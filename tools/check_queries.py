"""Targeted subset of tools/drive_contract.py: check only the named
queries against their DuckDB oracles (rows-only queries get a count).

Each oracle-backed check ALSO runs the Arrow-level type audit inline
(the tools/type_audit.py comparison): value equality is NECESSARY but
not SUFFICIENT for a driver hash-green — the driver's hasher is
sensitive to Arrow-level types (DuckDB HUGEINT → decimal128 vs Spark
int64 — the multimodal_shard_manifest r10 failure, value-equal yet
hash-red). A type-family mismatch fails the query here even when the
values match. Full contract in FIXTURES.md §F6.

Usage: python tools/check_queries.py [--sf DIR] name [name ...]
"""
import sys, time
sys.path.insert(0, "/root/repo")

args = sys.argv[1:]
SF = "/root/testdata/sf0.01"
if args and args[0] == "--sf":
    SF = args[1]
    args = args[2:]
names = args

import __spark_entry__ as E
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[8]")
         .appName("check-queries").config("spark.sql.shuffle.partitions", "8")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

qs, os_ = E.queries(), E.oracle_sql()

import duckdb, datetime, decimal, math
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")


def canon(v):
    if v is None: return "N"
    if isinstance(v, float): return "nan" if math.isnan(v) else repr(v)
    if isinstance(v, decimal.Decimal): return repr(float(v))
    if isinstance(v, (datetime.datetime, datetime.date)): return v.isoformat()
    return str(v)


from tests.oracle_util import (  # noqa: E402  (shared with type_audit)
    arrow_type_family,
    spark_type_family,
)


def type_mismatches(sdf, oracle_sql):
    """Inline tools/type_audit.py check: Arrow type family per column."""
    tbl = con.sql(oracle_sql).fetch_arrow_table()
    d_fam = {f.name: arrow_type_family(f.type) for f in tbl.schema}
    s_fam = {f.name: spark_type_family(f.dataType) for f in sdf.schema}
    return [
        (c, s_fam[c], d_fam[c])
        for c in sorted(set(d_fam) & set(s_fam))
        if d_fam[c] != s_fam[c]
    ]


fails = []
for name in names:
    if name not in qs:
        print(f"{name}: UNKNOWN query")
        fails.append(name)
        continue
    t0 = time.time()
    if name not in os_:
        try:
            n = qs[name](spark, SF).count()
            print(f"{name}: rows-only n={n} {time.time()-t0:.1f}s")
        except Exception as e:  # noqa: BLE001
            fails.append(name)
            print(f"{name}: rows-only ERROR {type(e).__name__}: {e}")
        continue
    sdf = qs[name](spark, SF)
    scols = sorted(sdf.columns)
    raw = sdf.collect()
    srows = sorted(tuple(canon(r[c]) for c in scols) for r in raw)
    # FIXTURES.md F6 (r14): null-bearing LTZ output is driver-hash-red
    # (cdc_scd2_apply r13) even when values/types/rows all match —
    # fail it here so the shape can't pass the local checker.
    from pyspark.sql import types as _T
    null_ltz = [
        f.name for f in sdf.schema.fields
        if isinstance(f.dataType, _T.TimestampType)
        and any(r[f.name] is None for r in raw)
    ]
    if null_ltz:
        fails.append(name)
        print(f"{name}: NULL-BEARING LTZ column(s) {null_ltz} — "
              "driver-hash-red shape, cast to timestamp_ntz "
              "(FIXTURES.md F6, cdc_scd2_apply r13)")
        continue
    rel = con.sql(os_[name]); dcols = sorted(rel.columns)
    idx = [rel.columns.index(c) for c in dcols]
    drows = sorted(tuple(canon(r[i]) for i in idx) for r in rel.fetchall())
    tdiffs = type_mismatches(sdf, os_[name]) if scols == dcols else []
    ok = scols == dcols and srows == drows and not tdiffs
    print(f"{name}: cols={'OK' if scols==dcols else (scols, dcols)} "
          f"n={len(srows)}/{len(drows)} "
          f"types={'OK' if not tdiffs else tdiffs} match={ok} "
          f"{time.time()-t0:.1f}s")
    if not ok:
        fails.append(name)
        for a, b in list(zip(srows, drows))[:3]:
            if a != b:
                print("   diff:", a, "VS", b)
print("FAILURES:", fails if fails else "none")
