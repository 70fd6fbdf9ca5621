"""Corpus export layout (functions/export.py)."""

from __future__ import annotations

import pytest

from bytewax_spark.functions import export


def _docs(spark, parts=4):
    rows = [(i, f"text {i}") for i in range(200)]
    return spark.createDataFrame(rows, "doc_id long, text string").repartition(parts)


def test_corpus_shuffle_is_deterministic_and_a_permutation(spark):
    a = [r["doc_id"] for r in export.corpus_shuffle(_docs(spark, 3), "doc_id").collect()]
    b = [r["doc_id"] for r in export.corpus_shuffle(_docs(spark, 13), "doc_id").collect()]
    assert a == b
    assert sorted(a) == list(range(200))
    assert a != list(range(200))  # actually permuted


def test_corpus_shuffle_salt_gives_independent_epochs(spark):
    df = _docs(spark)
    e0 = [r["doc_id"] for r in export.corpus_shuffle(df, "doc_id", "ep0").collect()]
    e1 = [r["doc_id"] for r in export.corpus_shuffle(df, "doc_id", "ep1").collect()]
    assert e0 != e1
    assert sorted(e0) == sorted(e1)


def test_shard_by_hash_stable_and_complete(spark):
    df = _docs(spark)
    a = export.shard_by_hash(df, "doc_id", 8).select("doc_id", "shard").collect()
    b = export.shard_by_hash(_docs(spark, 17), "doc_id", 8).select("doc_id", "shard").collect()
    ma = {r["doc_id"]: r["shard"] for r in a}
    mb = {r["doc_id"]: r["shard"] for r in b}
    assert ma == mb
    assert len(ma) == 200
    assert set(ma.values()) <= set(range(8))
    with pytest.raises(ValueError, match="n_shards must be positive"):
        export.shard_by_hash(df, "doc_id", 0)


def test_write_shards_roundtrip(spark, tmp_path):
    df = _docs(spark)
    path = str(tmp_path / "shards")
    export.write_shards(df, path, "doc_id", n_shards=4)
    back = spark.read.parquet(path)
    assert back.count() == 200
    # partition column survives and matches the map-local assignment
    shards = {r["doc_id"]: int(r["shard"]) for r in back.collect()}
    direct = {
        r["doc_id"]: r["shard"]
        for r in export.shard_by_hash(df, "doc_id", 4).select("doc_id", "shard").collect()
    }
    assert shards == direct
