"""Bucketed co-located joins: the write-once-shuffle-never layout for
fact-to-fact joins at 100 TB. The plan gates here ARE the feature —
a bucketed join that silently re-shuffles is a regression."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bytewax_spark.io import bucketed_table, read_parquet, write_bucketed


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    orders = read_parquet(spark, f"{sf_dir}/orders.parquet")
    lineitem = read_parquet(spark, f"{sf_dir}/lineitem.parquet")
    write_bucketed(orders.select("o_orderkey", "o_totalprice"), "b_orders", "o_orderkey", 8)
    write_bucketed(
        lineitem.select(F.col("l_orderkey"), "l_quantity"),
        "b_lineitem",
        "l_orderkey",
        8,
    )
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def _final_plan(df):
    return df._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]


def test_bucketed_join_has_no_exchange(spark, bucketed):
    """Same key, same bucket count → the join pairs buckets file-to-
    file: zero Exchange operators anywhere in the plan."""
    t1, t2 = bucketed
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_table(spark, t1).join(
            bucketed_table(spark, t2),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        plan = _final_plan(joined)
        assert "Exchange" not in plan
        assert "SortMergeJoin" in plan
        # correctness too, not just the plan
        n = joined.count()
        orders = read_parquet(spark, "/root/testdata/sf0.001/orders.parquet")
        lineitem = read_parquet(spark, "/root/testdata/sf0.001/lineitem.parquet")
        expected = orders.join(
            lineitem, orders["o_orderkey"] == lineitem["l_orderkey"]
        ).count()
        assert n == expected
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_aggregation_has_no_exchange(spark, bucketed):
    """groupBy on the bucket key reuses the bucketing as its
    partitioning — no exchange before the aggregate."""
    t2 = bucketed[1]
    agg = bucketed_table(spark, t2).groupBy("l_orderkey").agg(
        F.sum("l_quantity").alias("qty")
    )
    plan = _final_plan(agg)
    assert "Exchange" not in plan
    assert "HashAggregate" in plan


def test_unbucketed_same_join_does_exchange(spark, sf_dir, bucketed):
    """Control: the identical join over plain parquet MUST exchange —
    proving the bucketed plan's absence of exchanges comes from the
    layout, not from some session setting."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = read_parquet(spark, f"{sf_dir}/orders.parquet").select(
            "o_orderkey", "o_totalprice"
        )
        lineitem = read_parquet(spark, f"{sf_dir}/lineitem.parquet").select(
            "l_orderkey", "l_quantity"
        )
        joined = orders.join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        assert "Exchange" in _final_plan(joined)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
