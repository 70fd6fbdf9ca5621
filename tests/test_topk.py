"""Per-group top-k / caps (functions/topk.py) and quantile band."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bytewax_spark.functions import sampling, topk


def _docs(spark, parts=4):
    rows = [
        (i, f"grp{i % 3}", f"text {i}") for i in range(90)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    ).repartition(parts)


def test_cap_per_group_caps_and_passes_small_groups(spark):
    df = _docs(spark)
    out = topk.cap_per_group(df, "source", "doc_id", cap=10).collect()
    by_grp = {}
    for r in out:
        by_grp.setdefault(r["source"], []).append(r["doc_id"])
    assert all(len(v) == 10 for v in by_grp.values())
    # a cap above the group size passes the whole group through
    full = topk.cap_per_group(df, "source", "doc_id", cap=1000)
    assert full.count() == 90


def test_cap_per_group_is_partition_invariant_and_matches_naive(spark):
    from pyspark.sql import Window

    a = topk.cap_per_group(_docs(spark, 2), "source", "doc_id", cap=7)
    b = topk.cap_per_group(_docs(spark, 17), "source", "doc_id", cap=7, fanout=3)
    ka = sorted((r["source"], r["doc_id"]) for r in a.collect())
    kb = sorted((r["source"], r["doc_id"]) for r in b.collect())
    assert ka == kb
    # naive single-window reference
    from bytewax_spark.functions.text import hash64

    df = _docs(spark)
    h = hash64(F.concat(F.lit(""), F.col("doc_id").cast("string")))
    w = Window.partitionBy("source").orderBy(h.asc(), F.col("doc_id").asc())
    naive = (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= 7)
        .drop("_rk")
    )
    kn = sorted((r["source"], r["doc_id"]) for r in naive.collect())
    assert ka == kn


def test_heavy_hitters_exact(spark):
    rows = []
    # grpA: item counts 5,4,3,2,1; grpB: tie on count 2 for items 1..4
    for item, cnt in [(1, 5), (2, 4), (3, 3), (4, 2), (5, 1)]:
        rows += [("A", item)] * cnt
    for item in (1, 2, 3, 4):
        rows += [("B", item)] * 2
    df = spark.createDataFrame(rows, "grp string, item long").repartition(5)
    out = topk.heavy_hitters(df, "grp", "item", k=3).collect()
    got = {(r["grp"], r["item"]): r["cnt"] for r in out}
    assert got == {
        ("A", 1): 5,
        ("A", 2): 4,
        ("A", 3): 3,
        # count ties break toward the smaller item
        ("B", 1): 2,
        ("B", 2): 2,
        ("B", 3): 2,
    }


def test_topk_validation(spark):
    df = _docs(spark)
    with pytest.raises(ValueError, match="k must be positive"):
        topk.top_k_per_group(df, "source", [F.col("doc_id").asc()], "doc_id", 0)
    with pytest.raises(ValueError, match="fanout must be positive"):
        topk.cap_per_group(df, "source", "doc_id", cap=5, fanout=0)


def test_quantile_band_keeps_band_fraction(spark):
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1000)], "id long, score double"
    ).repartition(8)
    kept = sampling.quantile_band(df, "score", 0.25, 0.75)
    n = kept.count()
    assert abs(n - 500) <= 20
    scores = [r["score"] for r in kept.collect()]
    assert min(scores) >= 200 and max(scores) <= 800


def test_quantile_band_validation(spark):
    df = spark.createDataFrame([(1, 1.0)], "id long, score double")
    with pytest.raises(ValueError, match="lo <= hi"):
        sampling.quantile_band(df, "score", 0.8, 0.2)
