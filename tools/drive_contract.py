"""Drive the driver contract cold: plain SparkSession, no engine defaults."""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

spark = SparkSession.builder.master("local[8]").appName("driver-sim").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as e

# t1 smoke
df = e.entry(spark)
rows = df.collect()
print("SMOKE rows:", len(rows), "schema:", df.columns)
assert len(rows) > 0

# t2: every oracle query at sf0.01, duckdb side-by-side
sys.path.insert(0, "/root/repo/tests")
from oracle_harness import compare
qs, osql = e.queries(), e.oracle_sql()
print("queries:", len(qs), "with oracle:", len(osql))
fails = []
for name, fn in sorted(qs.items()):
    t0 = time.time()
    sdf = fn(spark, "/root/testdata/sf0.01")
    try:
        if name in osql:
            compare(name, sdf, osql[name], "/root/testdata/sf0.01")
            print(f"  OK {name} ({time.time()-t0:.1f}s)")
        else:
            n = sdf.count()
            print(f"  OK(rows-only) {name} rows={n} ({time.time()-t0:.1f}s)")
    except AssertionError as ex:
        fails.append(name); print(f"  FAIL {name}: {str(ex)[:200]}")
print("FAILS:", fails)
sys.exit(1 if fails else 0)
