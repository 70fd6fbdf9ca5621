"""Per-operator e2e tests, shaped like the reference's
``pytests/operators/`` suite: tiny in-memory flow → operator → exact
assert (SURVEY §5)."""

from __future__ import annotations

from pyspark.sql import functions as F

import bytewax_spark.operators as op
from bytewax_spark.dataflow import Dataflow, KeyedStream
from bytewax_spark.sinks import MemorySink
from bytewax_spark.sources import TestingSource
from bytewax_spark.run import run_main


def rows(stream):
    return [r.asDict() for r in stream.df.collect()]


def test_map_columnar(spark):
    flow = Dataflow("map")
    s = op.input("in", flow, TestingSource([(1,), (2,), (3,)], schema="x long"))
    out = op.map("double", s, {"x": "x", "y": F.col("x") * 2})
    assert sorted(rows(out), key=lambda r: r["x"]) == [
        {"x": 1, "y": 2},
        {"x": 2, "y": 4},
        {"x": 3, "y": 6},
    ]


def test_map_opaque_pandas(spark):
    flow = Dataflow("map_pd")
    s = op.input("in", flow, TestingSource([(1,), (2,)], schema="x long"))
    out = op.map("inc", s, lambda pdf: pdf.assign(x=pdf.x + 1), schema="x long")
    assert sorted(r["x"] for r in rows(out)) == [2, 3]


def test_filter(spark):
    flow = Dataflow("filter")
    s = op.input("in", flow, TestingSource([(i,) for i in range(10)], schema="x long"))
    out = op.filter("evens", s, F.col("x") % 2 == 0)
    assert sorted(r["x"] for r in rows(out)) == [0, 2, 4, 6, 8]


def test_filter_map(spark):
    flow = Dataflow("filter_map")
    s = op.input("in", flow, TestingSource([("1",), ("a",), ("3",)], schema="raw string"))
    out = op.filter_map("parse", s, {"n": F.col("raw").try_cast("long")})
    assert sorted(r["n"] for r in rows(out)) == [1, 3]


def test_flat_map_explode(spark):
    flow = Dataflow("flat_map")
    s = op.input("in", flow, TestingSource([("a b",), ("c",)], schema="line string"))
    out = op.flat_map("tokens", s, F.split("line", " "), alias="word")
    assert sorted(r["word"] for r in rows(out)) == ["a", "b", "c"]


def test_flatten(spark):
    flow = Dataflow("flatten")
    s = op.input("in", flow, TestingSource([([1, 2],), ([3],)], schema="xs array<long>"))
    out = op.flatten("flat", s, "xs")
    assert sorted(r["item"] for r in rows(out)) == [1, 2, 3]


def test_branch(spark):
    flow = Dataflow("branch")
    s = op.input("in", flow, TestingSource([(i,) for i in range(6)], schema="x long"))
    b = op.branch("split", s, F.col("x") < 3)
    assert sorted(r["x"] for r in rows(b.trues)) == [0, 1, 2]
    assert sorted(r["x"] for r in rows(b.falses)) == [3, 4, 5]


def test_merge(spark):
    flow = Dataflow("merge")
    a = op.input("a", flow, TestingSource([(1,)], schema="x long"))
    b = op.input("b", flow, TestingSource([(2,), (3,)], schema="x long"))
    out = op.merge("union", a, b)
    assert sorted(r["x"] for r in rows(out)) == [1, 2, 3]


def test_key_on_key_rm(spark):
    flow = Dataflow("keys")
    s = op.input("in", flow, TestingSource([(1, "a"), (2, "b")], schema="x long, s string"))
    ks = op.key_on("key", s, "s")
    assert isinstance(ks, KeyedStream)
    assert set(ks.df.columns) == {"x", "s", "key"}
    back = op.key_rm("unkey", ks)
    assert set(back.df.columns) == {"x", "s"}


def test_step_id_uniqueness(spark):
    flow = Dataflow("dups")
    s = op.input("in", flow, TestingSource([(1,)], schema="x long"))
    op.map("m", s, {"x": "x"})
    try:
        op.map("m", s, {"x": "x"})
        raise AssertionError("expected duplicate step id error")
    except ValueError as e:
        assert "already exists" in str(e)


def test_redistribute(spark):
    flow = Dataflow("redist")
    s = op.input("in", flow, TestingSource([(i,) for i in range(100)], schema="x long"))
    out = op.redistribute("shuffle", s, 8)
    assert out.df.rdd.getNumPartitions() == 8
    assert sorted(r["x"] for r in rows(out)) == list(range(100))


def test_output_and_run_main(spark):
    flow = Dataflow("sinks")
    s = op.input("in", flow, TestingSource([(1,), (2,)], schema="x long"))
    sink = MemorySink()
    op.output("out", s, sink)
    run_main(flow)
    assert sorted(r["x"] for r in sink.rows) == [1, 2]


def test_raises(spark):
    flow = Dataflow("raises")
    s = op.input("in", flow, TestingSource([(1,)], schema="x long"))
    op.raises("boom", s)
    try:
        run_main(flow)
        raise AssertionError("expected raise")
    except RuntimeError as e:
        assert "got an item" in str(e)


def test_enrich_cached(spark):
    flow = Dataflow("enrich")
    s = op.input("in", flow, TestingSource([(1,), (2,), (1,)], schema="x long"))
    out = op.enrich_cached("lookup", s, lambda k: k * 10, key="x", out_col="v", out_type="long")
    got = sorted((r["x"], r["v"]) for r in rows(out))
    assert got == [(1, 10), (1, 10), (2, 20)]


def test_inspect_passthrough(spark):
    flow = Dataflow("inspect")
    s = op.input("in", flow, TestingSource([(1,), (2,)], schema="x long"))
    out = op.inspect("peek", s, inspector=lambda sid, pdf: None)
    assert sorted(r["x"] for r in rows(out)) == [1, 2]


def test_wordcount_e2e(spark):
    """The reference's flagship example (examples/wordcount.py):
    flat_map → count_final."""
    flow = Dataflow("wordcount")
    lines = op.input(
        "in",
        flow,
        TestingSource(
            [("to be or not to be",), ("that is the question",)], schema="line string"
        ),
    )
    words = op.flat_map("split", lines, F.split("line", " "), alias="word")
    counts = op.count_final("count", words, key="word")
    got = {r["key"]: r["count"] for r in rows(counts)}
    assert got["to"] == 2 and got["be"] == 2 and got["question"] == 1
