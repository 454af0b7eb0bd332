"""Vanilla-driver simulation: run queries() vs oracle_sql() like the real driver.

Usage: python tools/driver_sim.py [query ...]   (no args = full sweep)
"""
import sys, os, time
sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")

import duckdb
from pyspark.sql import SparkSession

SF = os.environ.get("SIM_SF", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

spark = (SparkSession.builder.master("local[8]")
         .config("spark.driver.memory", "8g")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as e
qs = e.queries()
oracles = e.oracle_sql()

con = duckdb.connect()
for t in TABLES:
    p = f"{SF}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

names = sys.argv[1:] if len(sys.argv) > 1 else list(qs)

from tests.conftest import assert_parity

fails = []
for name in names:
    t0 = time.time()
    try:
        sdf = qs[name](spark, SF)
        if name in oracles:
            assert_parity(sdf, con.sql(oracles[name]))
            status = "OK"
        else:
            n = sdf.count()
            status = f"ROWS-ONLY ({n} rows)"
    except Exception as ex:
        status = f"FAIL: {type(ex).__name__}: {str(ex)[:300]}"
        fails.append(name)
    print(f"{name}: {status}  [{time.time()-t0:.1f}s]", flush=True)

print(f"\n{len(names)-len(fails)}/{len(names)} passed")
if fails:
    print("FAILS:", fails)
    sys.exit(1)
