"""Sequence packing / distributed prefix sum (functions/packing.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bytewax_spark.functions import packing as pk


def test_prefix_sum_matches_serial(spark):
    rows = [(i, (i * 37) % 11 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, v long")
    got = {
        r["id"]: r["cum"]
        for r in pk.prefix_sum(df, "id", "v", num_partitions=7).collect()
    }
    acc = 0
    for i, v in rows:
        acc += v
        assert got[i] == acc


def test_prefix_sum_partition_invariance(spark):
    df = spark.createDataFrame([(i, i % 5 + 1) for i in range(100)], "id long, v long")
    a = sorted(pk.prefix_sum(df, "id", "v", num_partitions=2).collect())
    b = sorted(pk.prefix_sum(df, "id", "v", num_partitions=13).collect())
    assert a == b


def test_pack_sequences_hand_example(spark):
    # seq_len=10, sep=0: doc lengths 4, 4, 5 -> cuts at token 10
    df = spark.createDataFrame([(1, 4), (2, 4), (3, 5)], "id long, n long")
    got = sorted(
        (r["id"], r["seq_id"], r["begin"], r["end"], r["seq_offset"])
        for r in pk.pack_sequences(df, "id", "n", seq_len=10).collect()
    )
    # doc3 occupies global [8,13): split as [0,2) at offset 8 and [2,5) at 0
    assert got == [(1, 0, 0, 4, 0), (2, 0, 0, 4, 4), (3, 0, 0, 2, 8), (3, 1, 2, 5, 0)]


def test_pack_sequences_invariants(spark, sf_dir):
    from bytewax_spark.functions import text as tx
    from tests.conftest import load

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", tx.token_count("text").alias("n")
    )
    packed = pk.pack_sequences(docs, "doc_id", "n", seq_len=128, sep_tokens=1)
    rows = packed.collect()
    lens = {r["doc_id"]: r["n"] for r in docs.collect() if r["n"] > 0}
    # every doc's slices tile [0, n) exactly, in consecutive seq_ids
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(lens)
    for doc_id, slices in by_doc.items():
        slices.sort(key=lambda r: r["seq_id"])
        assert slices[0]["begin"] == 0 and slices[-1]["end"] == lens[doc_id]
        for a, b in zip(slices, slices[1:]):
            assert b["seq_id"] == a["seq_id"] + 1 and b["begin"] == a["end"]
            assert b["seq_offset"] == 0
    # every sequence holds <= seq_len payload tokens; full for non-final
    per_seq = (
        packed.groupBy("seq_id")
        .agg(F.sum(F.col("end") - F.col("begin")).alias("payload"), F.count("*").alias("docs"))
        .collect()
    )
    last = max(r["seq_id"] for r in per_seq)
    for r in per_seq:
        payload_plus_seps = r["payload"] + r["docs"]  # each doc gets 1 sep
        assert r["payload"] <= 128
        if r["seq_id"] != last:
            # payload + separators covers the window (seps may straddle)
            assert payload_plus_seps >= 128


def test_pack_sequences_rejects_bad_seq_len(spark):
    df = spark.createDataFrame([(1, 4)], "id long, n long")
    with pytest.raises(ValueError, match="seq_len"):
        pk.pack_sequences(df, "id", "n", seq_len=0)


def test_prefix_sum_no_checkpoint_value_derived_pid(spark):
    """The bucket id must derive from VALUES (quantile-boundary
    comparison), never from physical partition ids pinned by
    localCheckpoint — the checkpoint was a full extra materialization
    AND a reliability cliff (blocks outside lineage: any executor loss
    kills the job). Plan must contain no checkpoint scan and no
    spark_partition_id."""
    df = spark.createDataFrame([(i, i % 7 + 1) for i in range(500)], "id long, v long")
    out = pk.prefix_sum(df, "id", "v", num_partitions=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Checkpoint" not in plan
    assert "SPARK_PARTITION_ID" not in plan.upper().replace(" ", "_")
    analyzed = out._jdf.queryExecution().analyzed().toString()
    assert "spark_partition_id" not in analyzed


def test_prefix_sum_reexecution_deterministic(spark):
    """Re-executing the SAME result DataFrame (fresh jobs over the full
    lineage, as a recovered executor would) must reproduce identical
    cumulative sums — the property localCheckpoint existed to protect,
    now guaranteed by value-derived bucketing."""
    df = spark.createDataFrame(
        [(i, (i * 13) % 23 + 1) for i in range(400)], "id long, v long"
    )
    out = pk.prefix_sum(df, "id", "v", num_partitions=6)
    first = sorted((r["id"], r["cum"]) for r in out.collect())
    second = sorted((r["id"], r["cum"]) for r in out.collect())
    assert first == second


def test_prefix_sum_physical_layout_independent(spark):
    """Bucketing by value means the result can't depend on the input's
    physical partitioning — shuffle the input arbitrarily, same sums."""
    rows = [(i, (i * 7) % 13 + 1) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, v long")
    scrambled = df.repartition(11)
    a = sorted(pk.prefix_sum(df, "id", "v", num_partitions=5).collect())
    b = sorted(pk.prefix_sum(scrambled, "id", "v", num_partitions=5).collect())
    assert a == b


def test_prefix_sum_desc_and_string_orders(spark):
    """(col, 'desc') tuple spec and a string leading order column (byte
    -prefix proxy bucketing) both match the serial scan."""
    rows = [(f"doc{i:04d}", (i * 31) % 17 + 1, float((i * 11) % 29)) for i in range(200)]
    df = spark.createDataFrame(rows, "name string, v long, q double")
    # descending quality, name tiebreak
    got = {
        r["name"]: r["cum"]
        for r in pk.prefix_sum(
            df, [(F.col("q"), "desc"), F.col("name")], "v", num_partitions=6
        ).collect()
    }
    acc = 0
    for name, v, _q in sorted(rows, key=lambda t: (-t[2], t[0])):
        acc += v
        assert got[name] == acc
    # string leading column
    got2 = {
        r["name"]: r["cum"]
        for r in pk.prefix_sum(df, "name", "v", num_partitions=6).collect()
    }
    acc = 0
    for name, v, _q in sorted(rows, key=lambda t: t[0]):
        acc += v
        assert got2[name] == acc


def test_prefix_sum_rejects_desc_column_object(spark):
    df = spark.createDataFrame([(1, 1)], "id long, v long")
    with pytest.raises(ValueError, match="desc"):
        pk.prefix_sum(df, [F.col("id").desc()], "v")
