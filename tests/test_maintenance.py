"""Dataset maintenance (functions/maintenance.py): file census and
small-file compaction on real temp-dir parquet datasets."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from bytewax_spark.functions import maintenance


def _fragmented(spark, path, n_files=20, rows_per=50):
    df = spark.range(n_files * rows_per).withColumn(
        "v", (F.col("id") * 7 % 100).cast("double")
    )
    df.repartition(n_files).write.parquet(path)
    return df


def test_file_census_counts_every_file(spark, tmp_path):
    path = str(tmp_path / "frag")
    _fragmented(spark, path, n_files=8, rows_per=10)
    rows = maintenance.file_census(spark, path).collect()
    assert len(rows) == 8
    assert all(r["n_bytes"] > 0 for r in rows)
    assert sum(r["n_rows"] for r in rows) == 80
    # metadata markers (_SUCCESS) excluded
    assert all(not r["file"].rsplit("/", 1)[-1].startswith("_") for r in rows)


def test_file_census_rowless_mode_scans_nothing(spark, tmp_path):
    path = str(tmp_path / "frag2")
    _fragmented(spark, path, n_files=3, rows_per=5)
    rows = maintenance.file_census(spark, path, with_rows=False).collect()
    assert len(rows) == 3 and all(r["n_rows"] is None for r in rows)


def test_compact_preserves_data_and_reduces_files(spark, tmp_path):
    path = str(tmp_path / "ds")
    _fragmented(spark, path, n_files=20, rows_per=50)
    before = spark.read.parquet(path)
    checksum_before = before.agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.col("id") * F.col("v")).alias("s")
    ).collect()[0]

    stats = maintenance.compact(spark, path, target_bytes=10**9)
    assert stats["files_before"] == 20
    assert stats["files_after"] == 1  # everything fits one target bin
    assert stats["n_rows"] == 1000

    after = spark.read.parquet(path)
    checksum_after = after.agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.col("id") * F.col("v")).alias("s")
    ).collect()[0]
    assert checksum_before == checksum_after
    # no leftover swap directories
    assert not os.path.exists(path + ".__compact_tmp")
    assert not os.path.exists(path + ".__compact_old")


def test_compact_respects_target_size(spark, tmp_path):
    path = str(tmp_path / "ds2")
    _fragmented(spark, path, n_files=10, rows_per=100)
    total = sum(
        r["n_bytes"]
        for r in maintenance.file_census(spark, path, with_rows=False).collect()
    )
    # target ~ half the total -> 2 output files (ceil division)
    stats = maintenance.compact(spark, path, target_bytes=total // 2 + 1)
    assert stats["files_after"] == 2


def test_compact_validates_target(spark, tmp_path):
    with pytest.raises(ValueError):
        maintenance.compact(spark, str(tmp_path / "x"), target_bytes=0)
