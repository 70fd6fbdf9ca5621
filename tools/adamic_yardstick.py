"""Reproducible DuckDB yardstick for adamic_adar_parts (BASELINE.md).

Runs the EXACT oracle_sql() string for adamic_adar_parts against the
sf0.1 parquet tables on 32 threads, 3 timed runs after 1 warmup, and
prints the median. Usage:

    python tools/adamic_yardstick.py [sf_dir]
"""
import sys
import time

import duckdb

sys.path.insert(0, ".")
import __spark_entry__ as e  # noqa: E402

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
con = duckdb.connect()
con.execute("SET threads TO 32")
con.execute("SET memory_limit = '48GB'")
con.execute("SET max_temp_directory_size = '20GB'")
for t in ("lineitem",):
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
sql = e.oracle_sql()["adamic_adar_parts"]
con.execute(sql).fetchall()  # warmup
times = []
for _ in range(3):
    t0 = time.time()
    rows = con.execute(sql).fetchall()
    times.append(round(time.time() - t0, 2))
print({"sf": sf, "rows": len(rows), "runs": times, "median": sorted(times)[1]})
