"""Table loading helpers.

``read_parquet`` handles parquet TIMESTAMP(NANOS) columns, which Spark
(4.x) cannot scan natively: it inspects the footer schema driver-side
(pyarrow — cheap, metadata only), enables
``spark.sql.legacy.parquet.nanosAsLong`` for the scan, and rewrites
each nano column to ``TIMESTAMP_NTZ`` via integer microsecond math
(``ts div 1000`` — long division, no double precision loss at 1e18
nanos). Pure column expressions: stays in codegen, pushdown on other
columns is unaffected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "read_parquet",
    "write_bucketed",
    "bucketed_table",
    "ensure_min_partitions",
]


def ensure_min_partitions(df: DataFrame, n: int | None = None) -> DataFrame:
    """Round-robin repartition ``df`` up to ``n`` partitions (default:
    the cluster's core count) ONLY when it currently has fewer — the
    scale-adaptive guard for per-row-expensive stages that sit
    directly on a scan.

    Why: scan parallelism is bounded by file splits, and a parquet
    file is only splittable at row-group boundaries — a small table
    written as one row group becomes ONE task no matter what
    ``maxPartitionBytes``/``minPartitionNum`` say, serializing any
    heavy per-row compute (Arrow kernels, md5 pipelines) onto a single
    core. At real scale inputs carry plenty of splits and this helper
    no-ops, so no shuffle is ever added where the scan already
    parallelizes; the repartition only fires for under-split inputs,
    where the shuffled bytes (the raw projected rows) are trivially
    small by the same token."""
    target = n or df.sparkSession.sparkContext.defaultParallelism
    # .rdd here only plans the scan (no exchanges below a projected
    # scan, so AQE has nothing to execute); it reports the file-split
    # count the scan would actually get.
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    n_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` hash-bucketed (and bucket-sorted) on ``key`` —
    the co-located-join layout.

    Two tables bucketed on the same key with the same bucket count
    join WITHOUT an exchange: every bucket pairs file-to-file, so the
    100 TB fact-to-fact join (the one that can't broadcast) runs
    shuffle-free, and repeated joins amortize ONE write-time shuffle
    across every downstream query. ``sort=True`` additionally
    bucket-sorts so sort-merge joins skip their sort. Catalog-backed
    (``saveAsTable``) because bucket metadata lives in the table
    catalog, not the parquet files — plain ``.parquet(path)`` cannot
    carry it."""
    keys = [key] if isinstance(key, str) else list(key)
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    writer.saveAsTable(table)


def bucketed_table(spark: SparkSession, table: str) -> DataFrame:
    """Read back a bucketed table (the catalog carries the bucket
    spec, so joins/aggregations on the bucket key plan exchange-free
    when ``spark.sql.sources.bucketing.enabled`` is on — default)."""
    return spark.table(table)


def _nano_cols(path: str) -> list[str]:
    try:
        import pyarrow.dataset as ds

        schema = ds.dataset(path, format="parquet").schema
    except Exception:
        return []
    out = []
    for field in schema:
        t = field.type
        if str(t).startswith("timestamp[ns"):
            out.append(field.name)
    return out


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """``spark.read.parquet`` that tolerates nanosecond timestamps."""
    nanos = _nano_cols(path)
    if not nanos:
        return spark.read.parquet(path)
    key = "spark.sql.legacy.parquet.nanosAsLong"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "true")
    try:
        # Schema resolution happens here; the flag is only needed while
        # the relation is analyzed, so restore it before returning.
        df = spark.read.parquet(path)
        for c in nanos:
            df = df.withColumn(
                c, F.expr(f"CAST(timestamp_micros(`{c}` div 1000) AS TIMESTAMP_NTZ)")
            )
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    return df
