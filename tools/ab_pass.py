"""One timing pass for an interleaved A/B: --root REPO names...
bench.py protocol (warm noop pass + median of 3 timed noop runs) in a
fresh JVM; prints one JSON line {name: [median, spread]}.
"""
import json
import os
import sys
import time

root = sys.argv[sys.argv.index("--root") + 1]
names = [a for a in sys.argv[1:] if not a.startswith("--") and a != root]
sys.path.insert(0, root)

from data_pipeline_postgres_spark.plans import registry  # noqa: E402
from data_pipeline_postgres_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="ab-pass")
spark.sparkContext.setLogLevel("ERROR")
registry.load_all()

from data_pipeline_postgres_spark.catalog import load_table  # noqa: E402

load_table(spark, SF, "events").limit(1000).write.format("noop").mode(
    "overwrite"
).save()

out = {}
for name in names:
    fn = registry.QUERIES[name]
    fn(spark, SF).write.format("noop").mode("overwrite").save()
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn(spark, SF).write.format("noop").mode("overwrite").save()
        runs.append(time.perf_counter() - t0)
    out[name] = [round(sorted(runs)[1], 3), round(max(runs) - min(runs), 3)]
print("ABPASS " + json.dumps(out))
