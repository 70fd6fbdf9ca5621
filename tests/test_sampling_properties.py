"""Property tests for deterministic sampling (functions/sampling.py).

The invariants that make hash sampling trustworthy at scale — split
disjointness for arbitrary weight vectors, nested samples for growing
rates, and the md5 hash convention itself — pinned against randomized
inputs and a direct Python model."""

from __future__ import annotations

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st

from bytewax_spark.functions import sampling
from bytewax_spark.functions.text import hash64


def _docs(spark, n=200):
    return spark.createDataFrame([(i,) for i in range(n)], "doc_id long")


@settings(max_examples=8, deadline=None)
@given(
    ws=st.lists(
        st.floats(min_value=0.05, max_value=0.5, allow_nan=False), min_size=2, max_size=4
    ).filter(lambda w: sum(w) <= 1.0)
)
def test_split_labels_partition_keyspace(spark, ws):
    """For any weight vector: every key gets exactly one label (or
    NULL), labels are the declared names, and each split is non-empty
    in expectation-sized samples only when its weight says so."""
    weights = {f"s{i}": w for i, w in enumerate(ws)}
    out = sampling.split_train_test(_docs(spark), "doc_id", weights)
    rows = out.collect()
    assert len(rows) == 200
    labels = {r["split"] for r in rows}
    assert labels <= set(weights) | {None}
    per_key = {}
    for r in rows:
        assert r["doc_id"] not in per_key  # one row, one label
        per_key[r["doc_id"]] = r["split"]
    # labeled fraction tracks sum(weights) within a loose envelope
    frac = sum(v is not None for v in per_key.values()) / 200
    assert abs(frac - sum(ws)) < 0.25


@settings(max_examples=8, deadline=None)
@given(
    r1=st.floats(min_value=0.05, max_value=0.45),
    r2=st.floats(min_value=0.5, max_value=0.95),
)
def test_samples_nest_as_rate_grows(spark, r1, r2):
    """sample_by_hash(rate=r1) ⊆ sample_by_hash(rate=r2) for r1 < r2
    with the same salt — growing a sample never evicts prior rows."""
    docs = _docs(spark)
    small = {r["doc_id"] for r in sampling.sample_by_hash(docs, "doc_id", r1).collect()}
    big = {r["doc_id"] for r in sampling.sample_by_hash(docs, "doc_id", r2).collect()}
    assert small <= big


@settings(max_examples=10, deadline=None)
@given(st.lists(st.text(min_size=0, max_size=40), min_size=1, max_size=20, unique=True))
def test_hash64_matches_md5_model(spark, strings):
    """The engine-wide hash convention (first 15 hex digits of md5 as
    int64) matches a direct hashlib model for arbitrary unicode — the
    contract every DuckDB oracle relies on."""
    df = spark.createDataFrame([(s,) for s in strings], "s string")
    got = {r["s"]: r["h"] for r in df.select("s", hash64("s").alias("h")).collect()}
    for s in strings:
        want = int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)
        assert got[s] == want, repr(s)


def test_balanced_downsample_equal_class_sizes(spark):
    from bytewax_spark.functions.sampling import balanced_downsample

    rows = [(i, "big") for i in range(50)] + [(100 + i, "small") for i in range(7)]
    df = spark.createDataFrame(rows, "id long, cls string")
    out = balanced_downsample(df, "cls", "id")
    sizes = {r["cls"]: r["n"] for r in out.groupBy("cls").agg(
        __import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("n")
    ).collect()}
    assert sizes == {"big": 7, "small": 7}


def test_balanced_downsample_deterministic_and_partition_invariant(spark):
    from bytewax_spark.functions.sampling import balanced_downsample

    rows = [(i, "a" if i % 3 else "b") for i in range(60)]
    df = spark.createDataFrame(rows, "id long, cls string")
    a = {r["id"] for r in balanced_downsample(df, "cls", "id").collect()}
    b = {r["id"] for r in balanced_downsample(df.repartition(13), "cls", "id").collect()}
    assert a == b and len(a) > 0


def test_balanced_downsample_salt_changes_draw(spark):
    from bytewax_spark.functions.sampling import balanced_downsample

    rows = [(i, "a") for i in range(100)] + [(1000 + i, "b") for i in range(10)]
    df = spark.createDataFrame(rows, "id long, cls string")
    a = {r["id"] for r in balanced_downsample(df, "cls", "id").collect()}
    b = {r["id"] for r in balanced_downsample(df, "cls", "id", salt="v2").collect()}
    assert a != b  # 10-of-100 draw colliding across salts is ~impossible


def test_stratified_split_exact_ratio_per_stratum(spark):
    from bytewax_spark.functions.sampling import stratified_split

    rows = [(i, "a") for i in range(100)] + [(1000 + i, "b") for i in range(13)]
    df = spark.createDataFrame(rows, "id long, cls string")
    out = stratified_split(df, ["cls"], "id").collect()
    train = {"a": 0, "b": 0}
    for r in out:
        train[r.cls] += int(r.is_train)
    assert train == {"a": 80, "b": 10}  # floor(0.8*100), floor(0.8*13)


def test_stratified_split_deterministic(spark):
    from bytewax_spark.functions.sampling import stratified_split

    rows = [(i, "a" if i % 2 else "b") for i in range(40)]
    df = spark.createDataFrame(rows, "id long, cls string")
    a = {(r.id, r.is_train) for r in stratified_split(df, ["cls"], "id").collect()}
    b = {(r.id, r.is_train) for r in stratified_split(df.repartition(7), ["cls"], "id").collect()}
    assert a == b
