"""Reproducible ISOLATED yardstick for any registered query (BASELINE.md).

Generalizes the round-6 adamic_adar tool: given a query name, measures
in THIS fresh process (the committed bench-methodology: marathon-JVM
numbers are contaminated 3-25x by JIT/ContextCleaner debt, so only
fresh-process medians are authoritative):

- DuckDB: the EXACT oracle_sql() string on the same parquet tables,
  32 threads, 1 warmup + 3 timed runs, median.
- Spark: the queries() DataFrame through the noop sink (engine time,
  no collect), prepared-plan model — 1 cold build+run, then 3 warm
  re-executions, median (C2 JIT tails converge by rep 3-4 on this
  box).

Run each engine in its OWN invocation so they never share a process,
page cache pressure, or CPU:

    python tools/yardstick.py QUERY [sf_dir] --engine spark
    python tools/yardstick.py QUERY [sf_dir] --engine duckdb

Prints one JSON line per run.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def duckdb_median(name: str, sf_dir: str, reps: int = 3) -> dict:
    import duckdb

    import __spark_entry__ as e

    sql = e.oracle_sql().get(name)
    if not sql:
        return {"engine": "duckdb", "query": name, "err": "no_oracle"}
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    con.execute("SET memory_limit = '48GB'")
    con.execute("SET max_temp_directory_size = '20GB'")
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            src = f"{path}/*.parquet" if os.path.isdir(path) else path
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')"
            )
    con.execute(sql).fetchall()  # warmup
    times = []
    rows = 0
    for _ in range(reps):
        t0 = time.time()
        rows = len(con.execute(sql).fetchall())
        times.append(round(time.time() - t0, 3))
    return {
        "engine": "duckdb",
        "query": name,
        "sf_dir": sf_dir,
        "rows": rows,
        "runs": times,
        "median": sorted(times)[len(times) // 2],
    }


def spark_median(name: str, sf_dir: str, reps: int = 3) -> dict:
    import __spark_entry__ as e
    from bytewax_spark.io import read_parquet
    from bytewax_spark.session import get_spark

    spark = get_spark("yardstick")
    spark.range(1).count()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            read_parquet(spark, path).count()
    fn = e.queries()[name]
    t0 = time.time()
    df = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    cold = round(time.time() - t0, 3)
    times = []
    for _ in range(reps):
        # same debt control as bench.py --worker: heavy reps leave
        # multi-GB of dereferenced shuffle/agg garbage; without a
        # collection the next rep measures old-gen churn, not the
        # query (measured r7: adamic reps 12-76 s dirty vs 4-6 s
        # steady). Runs BETWEEN timings — nothing measured changes.
        if cold > 5.0:
            spark.sparkContext._jvm.System.gc()
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        times.append(round(time.time() - t0, 3))
    return {
        "engine": "spark",
        "query": name,
        "sf_dir": sf_dir,
        "cold": cold,
        "runs": times,
        "median": sorted(times)[len(times) // 2],
    }


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = {a.split("=")[0]: (a.split("=") + ["1"])[1] for a in sys.argv[1:] if a.startswith("--")}
    if not args:
        print(__doc__)
        return
    name = args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.1"
    engine = opts.get("--engine", "duckdb")
    reps = int(opts.get("--reps", "3"))
    if engine == "duckdb":
        print(json.dumps(duckdb_median(name, sf_dir, reps)))
    elif engine == "spark":
        print(json.dumps(spark_median(name, sf_dir, reps)))
    else:
        raise SystemExit(f"unknown --engine={engine}")


if __name__ == "__main__":
    main()
