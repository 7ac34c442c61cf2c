"""10x-scale differential: the exact drive_contract procedure at sf0.1
instead of the driver's sf0.01 — catches overflow/precision/plan bugs
that only appear as data grows (found the agg_zscore_exact int64
overflow). Slow queries (quadratic ground-truth oracles) still run;
expect several minutes total."""
import sys, time
sys.path.insert(0, "/root/repo")
import __spark_entry__ as E
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[16]")
         .appName("driver-sim-sf01").config("spark.sql.shuffle.partitions","16")
         .config("spark.sql.session.timeZone","UTC")
         .config("spark.driver.memory","16g")
         .config("spark.ui.enabled","false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

qs, os_ = E.queries(), E.oracle_sql()
import duckdb, datetime, decimal, math
SF="/root/testdata/sf0.1"
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
    try:
        sdf = qs[name](spark, SF)
        scols = sorted(sdf.columns)
        srows = sorted(tuple(canon(r[c]) for c in scols) for r in sdf.collect())
        rel = con.sql(os_[name]); dcols = sorted(rel.columns)
        idx = [rel.columns.index(c) for c in dcols]
        drows = sorted(tuple(canon(r[i]) for i in idx) for r in rel.fetchall())
        ok = scols==dcols and srows==drows
    except Exception as ex:
        ok=False; srows=drows=[]
        print(f"{name}: ERROR {str(ex)[:160]}")
    print(f"{name}: n={len(srows)}/{len(drows)} match={ok} {time.time()-t0:.1f}s", flush=True)
    if not ok:
        fails.append(name)
        for a,b in list(zip(srows,drows))[:3]:
            if a!=b: print("   diff:", a, "VS", b)
print("SF0.1 FAILURES:", fails if fails else "none")
