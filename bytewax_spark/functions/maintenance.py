"""Dataset maintenance — the table-keeping operations a 100 TB
parquet lake needs between queries: a file census (the small-files
diagnosis) and bin-packed compaction (the cure). Streaming ingests and
fine-grained backfills leave thousands of KB-sized files per
partition; every downstream scan then pays task-per-file scheduling
and footer-read overhead. Compacting to ~128 MB files is the standard
fix (the same job Delta's OPTIMIZE / Iceberg's rewrite_data_files run,
both public designs).

Spark-first: the census reads ONLY file metadata through Hadoop's
``FileSystem`` API (public, works on local/HDFS/S3A alike) plus an
optional per-file row count via ``input_file_name()`` — one
column-pruned scan. Compaction is a plain read → ``repartition(N)`` →
write of a fresh directory; the swap is two filesystem renames. Atomic
visibility is the catalog's job (Delta/Iceberg commit protocols); this
module implements the HADOOP-STYLE swap (write temp, rename) and
documents the gap rather than pretending otherwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["compact", "file_census"]

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024


def _fs(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(jsc.hadoopConfiguration()), hpath, jvm


def file_census(
    spark: SparkSession, path: str, fmt: str = "parquet", with_rows: bool = True
) -> DataFrame:
    """One row per data file under ``path``:
    ``(file, n_bytes, n_rows)`` (``n_rows`` null when
    ``with_rows=False`` — sizes alone need no data scan at all).

    Sizes come from ``FileSystem.listFiles`` (metadata only); row
    counts from a zero-payload aggregation grouped by
    ``input_file_name()`` (parquet answers it from footers — the scan
    reads no columns)."""
    fs, hpath, _ = _fs(spark, path)
    it = fs.listFiles(hpath, True)
    sizes = []
    while it.hasNext():
        st = it.next()
        p = st.getPath().toString()
        name = p.rsplit("/", 1)[-1]
        if name.startswith(("_", ".")):
            continue
        sizes.append((p, int(st.getLen())))
    size_df = spark.createDataFrame(sizes or [("", 0)], "file string, n_bytes long")
    if sizes == []:
        size_df = size_df.filter(F.col("file") != "")
    if not with_rows:
        return size_df.withColumn("n_rows", F.lit(None).cast("long"))
    # input_file_name() yields a URI (file:///x); listFiles yields
    # file:/x — normalize both to a bare path before joining.
    norm = lambda c: F.regexp_replace(c, "^[a-z0-9+.-]+:/+", "/")  # noqa: E731
    rows = (
        spark.read.format(fmt)
        .load(path)
        .groupBy(norm(F.input_file_name()).alias("file"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    return (
        size_df.withColumn("file", norm(F.col("file")))
        .join(rows, "file", "left")
    )


def compact(
    spark: SparkSession,
    path: str,
    target_bytes: int = DEFAULT_TARGET_BYTES,
    fmt: str = "parquet",
) -> dict:
    """Rewrite ``path`` as ``ceil(total_bytes / target_bytes)``
    bin-packed files. Returns
    ``{"files_before", "files_after", "n_bytes", "n_rows"}``.

    Swap protocol: write to ``<path>.__compact_tmp``, rename the old
    directory to ``<path>.__compact_old``, rename temp into place,
    delete old. Readers that list the directory mid-swap can see a
    missing-directory window — wrap the call in your catalog's commit
    if you need atomic visibility (this is the classic Hadoop rename
    swap, not a Delta/Iceberg transaction). The rewrite itself is a
    round-robin ``repartition`` so output files are uniformly sized
    regardless of input skew."""
    if target_bytes <= 0:
        raise ValueError(f"target_bytes must be positive, got {target_bytes}")
    census = file_census(spark, path, fmt=fmt, with_rows=False).collect()
    files_before = len(census)
    total = sum(r["n_bytes"] for r in census)
    n_files = max(1, -(-total // target_bytes))
    df = spark.read.format(fmt).load(path)
    n_rows = df.count()

    fs, hpath, jvm = _fs(spark, path)
    P = jvm.org.apache.hadoop.fs.Path
    tmp, old = P(path + ".__compact_tmp"), P(path + ".__compact_old")
    df.repartition(n_files).write.format(fmt).mode("overwrite").save(
        path + ".__compact_tmp"
    )
    if fs.exists(old):
        fs.delete(old, True)
    if not fs.rename(hpath, old):
        raise IOError(f"compact: could not move {path} aside")
    if not fs.rename(tmp, hpath):
        fs.rename(old, hpath)  # roll back
        raise IOError(f"compact: could not move compacted data into {path}")
    fs.delete(old, True)
    files_after = len(file_census(spark, path, fmt=fmt, with_rows=False).collect())
    return {
        "files_before": files_before,
        "files_after": files_after,
        "n_bytes": total,
        "n_rows": n_rows,
    }
