"""Benchmark decontamination (functions/decontaminate.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bytewax_spark.functions import decontaminate as dc


def _frames(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "pack my box with five dozen liquor jugs today"),
            (3, "quick brown fox stew is a delicacy somewhere"),
            (4, "hi"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "we ask about the quick brown fox in question three")],
        "doc_id long, text string",
    )
    return docs, bench


def test_contamination_report(spark):
    docs, bench = _frames(spark)
    rows = {
        r["doc_id"]: r
        for r in dc.contamination_report(docs, bench, "text", "doc_id", n=3).collect()
    }
    assert len(rows) == 4  # zero-hit docs included
    # doc 1 shares 'the quick brown' and 'quick brown fox'
    assert rows[1]["bench_hits"] == 2 and rows[1]["n_shingles"] == 7
    assert rows[1]["hit_frac"] == round(2 / 7, 4)
    assert rows[2]["bench_hits"] == 0 and rows[2]["hit_frac"] == 0.0
    assert rows[3]["bench_hits"] == 1  # 'quick brown fox'
    # shorter than n words -> no shingles, defined zeros
    assert rows[4]["n_shingles"] == 0 and rows[4]["hit_frac"] == 0.0


def test_decontaminate_min_hits(spark):
    docs, bench = _frames(spark)
    clean1 = dc.decontaminate(docs, bench, "text", "doc_id", n=3)
    assert sorted(r["doc_id"] for r in clean1.collect()) == [2, 4]
    # raising the threshold keeps the single-hit doc
    clean2 = dc.decontaminate(docs, bench, "text", "doc_id", n=3, min_hits=2)
    assert sorted(r["doc_id"] for r in clean2.collect()) == [2, 3, 4]
    # original columns intact
    assert clean1.columns == docs.columns


def test_membership_join_is_broadcast(spark):
    docs, bench = _frames(spark)
    report = dc.contamination_report(docs, bench, "text", "doc_id", n=3)
    plan = report._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
