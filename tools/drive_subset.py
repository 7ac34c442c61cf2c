"""Driver-simulation over a SUBSET of queries (names as argv), same
protocol as tools/drive_contract.py: DuckDB oracle differential at
sf0.01 for oracle-backed queries, rows-only count otherwise.

Usage: python tools/drive_subset.py q1 q2 ...      (or: --file list.txt)
"""
import sys, time
sys.path.insert(0, "/root/repo")
import __spark_entry__ as E
from pyspark.sql import SparkSession

names = sys.argv[1:]
if names and names[0] == "--file":
    names = [l.strip() for l in open(names[1]) if l.strip()]

spark = (SparkSession.builder.master("local[8]")
         .appName("driver-sim-subset").config("spark.sql.shuffle.partitions", "8")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

qs, os_ = E.queries(), E.oracle_sql()
unknown = [n for n in names if n not in qs]
if unknown:
    print("UNKNOWN:", unknown)
    sys.exit(2)

import duckdb, datetime, decimal, math
SF = "/root/testdata/sf0.01"
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

fails = []
for name in names:
    t0 = time.time()
    try:
        if name in os_:
            sdf = qs[name](spark, SF)
            scols = sorted(sdf.columns)
            srows = sorted(tuple(canon(r[c]) for c in scols) for r in sdf.collect())
            rel = con.sql(os_[name]); dcols = sorted(rel.columns)
            idx = [rel.columns.index(c) for c in dcols]
            drows = sorted(tuple(canon(r[i]) for i in idx) for r in rel.fetchall())
            ok = scols == dcols and srows == drows
            print(f"{name}: cols={'OK' if scols==dcols else (scols,dcols)} "
                  f"n={len(srows)}/{len(drows)} match={ok} {time.time()-t0:.1f}s")
            if not ok:
                fails.append(name)
                for a, b in list(zip(srows, drows))[:3]:
                    if a != b: print("   diff:", a, "VS", b)
        else:
            n = qs[name](spark, SF).count()
            print(f"{name}: rows-only n={n} {time.time()-t0:.1f}s")
    except Exception as e:  # noqa: BLE001
        fails.append(name)
        print(f"{name}: ERROR {type(e).__name__}: {str(e)[:300]}")
print("FAILURES:", fails if fails else "none")
sys.exit(1 if fails else 0)
