"""SparkSession factory with scale-aware defaults.

Centralizes the configuration every entry point (tests, bench,
``__spark_entry__``, the ``run`` CLI) shares, so the engine behaves the
same everywhere:

- AQE on (runtime coalesce, skew-join splitting) — at 100 TB the
  static plan is always wrong somewhere; AQE re-plans from shuffle
  statistics.
- ``spark.sql.shuffle.partitions`` sized to cores locally; on a real
  cluster this should be ~2-3x total cores (AQE coalesces down).
- UTC session timezone so event-time semantics are stable and DuckDB
  oracle comparisons are exact.
- Arrow enabled for the Pandas-UDF slow path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "default_parallelism"]


def default_parallelism() -> int:
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if cpus:
        return max(1, int(cpus))
    return os.cpu_count() or 8


def get_spark(app_name: str = "bytewax_spark", master: str | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine defaults."""
    par = default_parallelism()
    # local mode: the driver JVM is the whole engine — the 1g default
    # heap causes GC-locker stalls/OOM on wide shuffles long before the
    # machine is used. Sized for this 128 GiB box; override via env.
    mem = os.environ.get("SPARK_GRAFT_MEM", "24g")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.driver.memory", mem)
        .config("spark.sql.shuffle.partitions", str(par))
        .config("spark.default.parallelism", str(par))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # MIN/MAX/COUNT over unfiltered scans answered from parquet
        # footer statistics — no row reads at all
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
    )
    if master is not None:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{par}]")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
