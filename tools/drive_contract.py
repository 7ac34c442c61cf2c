"""Driver-simulation: consume __spark_entry__ exactly like the driver does."""
import sys, time
sys.path.insert(0, "/root/repo")
import __spark_entry__ as E
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[8]")
         .appName("driver-sim").config("spark.sql.shuffle.partitions","8")
         .config("spark.sql.session.timeZone","UTC")
         .config("spark.ui.enabled","false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

# 1. smoke: entry() on sf0.001, rows > 0, stable schema
df = E.entry(spark)
rows = df.collect()
print("entry rows:", len(rows), "schema:", df.schema.simpleString())
print("sample:", rows[:2])

# 2. contract shape
qs, os_ = E.queries(), E.oracle_sql()
print("queries:", len(qs), "oracles:", len(os_), "rows-only:", sorted(set(qs)-set(os_)))

# 3. sf0.01 differential for every oracle query (what CORRECTNESS_rN does)
import duckdb, datetime, decimal, math
SF="/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
def canon(v):
    if v is None: return "N"
    if isinstance(v, float): return "nan" if math.isnan(v) else repr(v)
    if isinstance(v, decimal.Decimal): return repr(float(v))
    if isinstance(v, (datetime.datetime, datetime.date)): return v.isoformat()
    return str(v)
fails=[]
for name in sorted(os_):
    t0=time.time()
    # one raising query must not abort the sweep (the r10 theil-sen
    # guard crash hid every result after it alphabetically)
    try:
        sdf = qs[name](spark, SF)
        scols = sorted(sdf.columns)
        srows = sorted(tuple(canon(r[c]) for c in scols) for r in sdf.collect())
        rel = con.sql(os_[name]); dcols = sorted(rel.columns)
        idx = [rel.columns.index(c) for c in dcols]
        drows = sorted(tuple(canon(r[i]) for i in idx) for r in rel.fetchall())
        ok = scols==dcols and srows==drows
    except Exception as e:  # noqa: BLE001
        fails.append(name)
        print(f"{name}: ERROR {type(e).__name__}: {str(e)[:200]}")
        continue
    print(f"{name}: cols={'OK' if scols==dcols else (scols,dcols)} n={len(srows)}/{len(drows)} match={ok} {time.time()-t0:.1f}s")
    if not ok:
        fails.append(name)
        for a,b in list(zip(srows,drows))[:3]:
            if a!=b: print("   diff:", a, "VS", b)
# 4. rows-only queries: the driver still runs them and records a
# rows>=0 check — an exception here becomes a CORRECTNESS error row.
for name in sorted(set(qs) - set(os_)):
    t0 = time.time()
    try:
        n = qs[name](spark, SF).count()
        print(f"{name}: rows-only n={n} {time.time()-t0:.1f}s")
    except Exception as e:  # noqa: BLE001
        fails.append(name)
        print(f"{name}: rows-only ERROR {type(e).__name__}: {e}")
print("FAILURES:", fails if fails else "none")
