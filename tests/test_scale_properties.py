"""Cluster-scale machinery proven on real plans: partition pruning on
hive-layout writes, parquet footer-statistics aggregate pushdown, and
AQE skew-join splitting. These are the mechanisms the 100 TB design
claims lean on; each test pins one on an executed plan so a config or
refactor regression is loud."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_partitioned_write_prunes_partitions(spark):
    """A lang=... filter over a lang-partitioned layout must become a
    PartitionFilter (directory pruning — non-matching files are never
    opened), not a data filter."""
    docs = spark.createDataFrame(
        [(i, ["en", "de", "fr"][i % 3], f"text {i}") for i in range(300)],
        "doc_id long, lang string, text string",
    )
    with tempfile.TemporaryDirectory() as d:
        docs.write.partitionBy("lang").parquet(f"{d}/docs")
        back = spark.read.parquet(f"{d}/docs").filter(F.col("lang") == "en")
        plan = _executed(back)
        assert "PartitionFilters: [isnotnull(lang" in plan or (
            "PartitionFilters" in plan and "lang" in plan.split("PartitionFilters")[1][:120]
        ), plan
        assert back.count() == 100
        # the pruned read must not carry lang as a pushed DATA filter —
        # pruning happened at the directory level
        scan = plan.split("FileScan")[1]
        assert "PushedFilters: []" in scan, scan


def test_count_scan_reads_zero_columns(spark):
    """COUNT(*) over parquet prunes the read schema to ZERO columns
    (struct<>) — the scan moves row-group row counts, not data pages.
    (Footer-stats aggregate pushdown proper needs the DSv2 reader;
    the v1 path still never decodes a column.)"""
    df = spark.range(10_000).select(F.col("id"), (F.col("id") * 2).alias("v"))
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/t")
        agg = spark.read.parquet(f"{d}/t").agg(F.count(F.lit(1)).alias("n"))
        plan = _executed(agg)
        assert "ReadSchema: struct<>" in plan, plan
        assert agg.collect()[0]["n"] == 10_000


def test_aqe_splits_skewed_join_partitions(spark):
    """One hot key dominating a sort-merge join gets split by AQE skew
    handling (skew=true in the final adaptive plan) instead of pinning
    a single task — the runtime safety net behind every keyed join at
    scale."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "4KB",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # key 0 is ~100x hotter than the rest
        left = spark.range(200_000).select(
            F.when(F.col("id") % 100 < 99, F.lit(0)).otherwise(F.col("id")).alias("k"),
            F.concat(F.lit("pad-" * 8), F.col("id")).alias("payload"),
        )
        right = spark.range(2_000).select(F.col("id").alias("k"), F.lit(1).alias("v"))
        joined = left.join(right, "k")
        # execute THIS DataFrame (a derived .count() builds its own
        # plan and would leave joined's adaptive plan unfinalized)
        assert len(joined.collect()) > 0
        plan = _executed(joined)
        assert "skew=true" in plan, plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_runtime_bloom_filter_reduces_fact_scan(spark):
    """A selective dim filter on the build side of a shuffle join
    injects a runtime Bloom filter into the fact side (bloom_filter_agg
    + might_contain in the executed plan) — the 100 TB semi-join
    reduction that keeps non-joining fact rows out of the shuffle.
    Thresholds are lowered because the toy tables are under the 10 GB
    production default."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").filter(
            F.col("o_totalprice") > 400000
        )
        j = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
            "l_orderkey", "l_quantity", "o_totalprice"
        )
        j.collect()
        plan = _executed(j)
        assert "bloom_filter_agg" in plan, plan
        assert "might_contain" in plan, plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_dynamic_partition_overwrite_backfill(spark):
    """Backfill semantics: overwriting in DYNAMIC partition mode
    replaces only the partitions present in the new data — the other
    partitions' files stay untouched. This is the idempotent-backfill
    contract every partitioned export pipeline leans on (re-run one
    day, keep the rest)."""
    saved = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
    try:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        with tempfile.TemporaryDirectory() as d:
            path = f"{d}/docs"
            full = spark.createDataFrame(
                [(i, ["en", "de", "fr"][i % 3], 1) for i in range(90)],
                "doc_id long, lang string, ver int",
            )
            full.write.partitionBy("lang").parquet(path)
            # backfill ONLY en with new content (ver=2, fewer rows)
            fix = spark.createDataFrame(
                [(1000 + i, "en", 2) for i in range(5)],
                "doc_id long, lang string, ver int",
            )
            fix.write.mode("overwrite").partitionBy("lang").parquet(path)
            back = spark.read.parquet(path)
            by_lang = {
                r["lang"]: (r["n"], r["vmax"])
                for r in back.groupBy("lang")
                .agg(F.count(F.lit(1)).alias("n"), F.max("ver").alias("vmax"))
                .collect()
            }
            assert by_lang["en"] == (5, 2)  # replaced
            assert by_lang["de"] == (30, 1)  # untouched
            assert by_lang["fr"] == (30, 1)  # untouched
    finally:
        if saved is None:
            spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        else:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", saved)
