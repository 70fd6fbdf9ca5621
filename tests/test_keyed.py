"""Keyed EOF aggregations + join modes (reference pytests/operators/
test_fold_final.py, test_reduce_final.py, test_join.py shapes)."""

from __future__ import annotations

from pyspark.sql import functions as F

import bytewax_spark.operators as op
from bytewax_spark.dataflow import Dataflow
from bytewax_spark.sources import TestingSource


def rows(stream):
    return [r.asDict() for r in stream.df.collect()]


def keyed(flow, name, data, schema, key="k"):
    s = op.input(name, flow, TestingSource(data, schema=schema))
    return op.key_on(f"{name}.key", s, key)


def test_fold_final_columnar(spark):
    flow = Dataflow("fold")
    ks = keyed(flow, "in", [("a", 1), ("a", 2), ("b", 5)], "k string, v long")
    out = op.fold_final("sum", ks, aggs={"total": F.sum("v"), "n": F.count(F.lit(1))})
    got = {r["key"]: (r["total"], r["n"]) for r in rows(out)}
    assert got == {"a": (3, 2), "b": (5, 1)}


def test_fold_final_opaque(spark):
    flow = Dataflow("fold_py")
    ks = keyed(flow, "in", [("a", 1), ("a", 2), ("b", 5)], "k string, v long")

    def fold(pdf):
        import pandas as pd

        return pd.DataFrame({"key": [pdf["key"].iloc[0]], "total": [int(pdf["v"].sum())]})

    out = op.fold_final("sum", ks, fold=fold, schema="key string, total long")
    got = {r["key"]: r["total"] for r in rows(out)}
    assert got == {"a": 3, "b": 5}


def test_count_final(spark):
    flow = Dataflow("count")
    s = op.input("in", flow, TestingSource([("x",), ("x",), ("y",)], schema="k string"))
    out = op.count_final("count", s, key="k")
    got = {r["key"]: r["count"] for r in rows(out)}
    assert got == {"x": 2, "y": 1}


def test_max_min_final(spark):
    flow = Dataflow("extreme")
    ks = keyed(flow, "in", [("a", 1, 10.0), ("a", 2, 5.0), ("b", 3, 7.0)], "k string, i long, score double")
    mx = op.max_final("max", ks, by="score")
    mn = op.min_final("min", ks, by="score")
    assert {r["key"]: r["i"] for r in rows(mx)} == {"a": 1, "b": 3}
    assert {r["key"]: r["i"] for r in rows(mn)} == {"a": 2, "b": 3}


def test_collect(spark):
    flow = Dataflow("collect")
    ks = keyed(flow, "in", [("a", 3), ("a", 1), ("b", 2)], "k string, v long")
    out = op.collect("lists", ks, "v", into="list")
    got = {r["key"]: r["values"] for r in rows(out)}
    assert got == {"a": [1, 3], "b": [2]}


def test_stateful_map_running(spark):
    flow = Dataflow("smap")
    ks = keyed(
        flow, "in", [("a", 1, 10), ("a", 2, 20), ("b", 1, 5), ("a", 3, 30)], "k string, t long, v long"
    )
    out = op.stateful_map("running", ks, order_by="t", running={"running_sum": F.sum("v")})
    got = sorted((r["key"], r["t"], r["running_sum"]) for r in rows(out))
    assert got == [("a", 1, 10), ("a", 2, 30), ("a", 3, 60), ("b", 1, 5)]


def test_stateful_map_opaque(spark):
    flow = Dataflow("smap_py")
    ks = keyed(flow, "in", [("a", 1, 10), ("a", 2, 20)], "k string, t long, v long")

    def mapper(key, pdf):
        pdf = pdf.copy()
        pdf["cum"] = pdf["v"].cumsum()
        return pdf[["key", "t", "cum"]]

    out = op.stateful_map("cum", ks, order_by="t", mapper=mapper, schema="key string, t long, cum long")
    got = sorted((r["key"], r["t"], r["cum"]) for r in rows(out))
    assert got == [("a", 1, 10), ("a", 2, 30)]


def test_join_complete_last(spark):
    """insert_mode='last' keeps the per-key latest value of each side
    (by the shared order column); emit 'complete' = inner join."""
    flow = Dataflow("join")
    left = keyed(flow, "l", [("a", 1, 10.0), ("a", 2, 20.0), ("b", 1, 5.0)], "k string, t long, lv double")
    right = keyed(flow, "r", [("a", 1, 100.0), ("c", 1, 7.0)], "k string, t long, rv double")
    out = op.join("j", left, right, insert_mode="last", emit_mode="complete", order_by="t")
    got = rows(out)
    assert len(got) == 1 and got[0]["key"] == "a" and got[0]["lv"] == 20.0 and got[0]["rv"] == 100.0


def test_asof_join_backward_with_tolerance(spark):
    """Backward as-of: latest right row at-or-before each left ts;
    tolerance nulls matches staler than the interval."""
    from datetime import datetime

    t = lambda m: datetime(2024, 1, 1, 0, m)  # noqa: E731
    flow = Dataflow("asof")
    left = keyed(flow, "l", [("a", t(5), 100), ("a", t(20), 200), ("b", t(1), 300)],
                 "k string, ts timestamp, lv long")
    right = keyed(flow, "r", [("a", t(3), 1.0), ("a", t(5), 2.0), ("a", t(10), 3.0)],
                  "k string, ts timestamp, rv double")
    left = op.map_value("lp", left, {"ts": "ts", "lv": "lv"})
    right = op.map_value("rp", right, {"ts": "ts", "rv": "rv"})
    out = op.asof_join("j", left, right, ts_col="ts")
    got = sorted((r["key"], r["lv"], r["rv"]) for r in rows(out))
    # a@5 matches r@5 (equal ts included); a@20 matches r@10; b has none
    assert got == [("a", 100, 2.0), ("a", 200, 3.0), ("b", 300, None)]

    flow2 = Dataflow("asof_tol")
    left2 = keyed(flow2, "l", [("a", t(5), 100), ("a", t(20), 200)], "k string, ts timestamp, lv long")
    right2 = keyed(flow2, "r", [("a", t(3), 1.0), ("a", t(10), 3.0)], "k string, ts timestamp, rv double")
    left2 = op.map_value("lp", left2, {"ts": "ts", "lv": "lv"})
    right2 = op.map_value("rp", right2, {"ts": "ts", "rv": "rv"})
    out2 = op.asof_join("j", left2, right2, ts_col="ts", tolerance=F.expr("INTERVAL 5 MINUTES"))
    got2 = sorted((r["key"], r["lv"], r["rv"]) for r in rows(out2))
    # a@20's match r@10 is 10 min stale > 5 min tolerance -> nulled
    assert got2 == [("a", 100, 1.0), ("a", 200, None)]


def test_interval_join_bucketed_is_equi(spark):
    """Bucketed range join: correct containment matches (boundary
    inclusive start / exclusive end, cross-bucket intervals) and a
    hash-join plan — no nested-loop join."""
    from datetime import datetime, timedelta

    t = lambda m: datetime(2024, 1, 1, 0, 0) + timedelta(minutes=m)  # noqa: E731
    flow = Dataflow("ivj")
    pts = keyed(flow, "p", [("a", t(5), 1), ("a", t(59), 2), ("a", t(61), 3), ("b", t(5), 9)],
                "k string, ts timestamp, pid long")
    pts = op.map_value("pp", pts, {"ts": "ts", "pid": "pid"})
    iv = keyed(flow, "i", [("a", t(0), t(60), 100), ("a", t(58), t(62), 200)],
               "k string, s timestamp, e timestamp, iid long")
    iv = op.map_value("ip", iv, {"s": "s", "e": "e", "iid": "iid"})
    out = op.interval_join("j", pts, iv, ts_col="ts", start_col="s", end_col="e",
                           bucket=timedelta(minutes=30))
    got = sorted((r["pid"], r["iid"]) for r in rows(out))
    # t(5)->iv100; t(59)->both; t(61)->iv200 only (60 exclusive in iv100)
    assert got == [(1, 100), (2, 100), (2, 200), (3, 200)]
    plan = out.df._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_join_three_way(spark):
    """N-way join (reference join takes *sides): three sides, final
    emit — full outer with NULLs for absent sides."""
    flow = Dataflow("join3")
    a = keyed(flow, "a", [("k1", 1)], "k string, av long")
    b = keyed(flow, "b", [("k1", 2), ("k2", 20)], "k string, bv long")
    c = keyed(flow, "c", [("k2", 3)], "k string, cv long")
    out = op.join("j", a, b, c, insert_mode="product", emit_mode="final")
    got = sorted((r["key"], r["av"], r["bv"], r["cv"]) for r in rows(out))
    assert got == [("k1", 1, 2, None), ("k2", None, 20, 3)]


def test_collect_salted_matches_plain(spark):
    """salt=N two-stage collect (skewed-key path) produces identical
    sorted output to the single-stage plan."""
    data = [("hot", i) for i in range(200)] + [("cold", 1), ("cold", 2)]
    flow = Dataflow("csalt")
    ks = keyed(flow, "in", data, "k string, v long")
    plain = op.collect("plain", ks, "v")
    flow2 = Dataflow("csalt2")
    ks2 = keyed(flow2, "in", data, "k string, v long")
    salted = op.collect("salted", ks2, "v", salt=8)
    a = {r["key"]: list(r["values"]) for r in rows(plain)}
    b = {r["key"]: list(r["values"]) for r in rows(salted)}
    assert a == b
    # the salted plan has two aggregation exchanges (key,_salt then key)
    plan = salted.df._jdf.queryExecution().executedPlan().toString()
    assert plan.split("== Initial Plan ==")[0].count("Exchange hashpartitioning") >= 2


def test_join_unique_side_skips_dedup(spark):
    """unique_sides declares a side one-row-per-key: same result,
    no aggregation of that side (its Exchange disappears)."""
    flow = Dataflow("joinu")
    left = keyed(flow, "l", [("a", 1, 10.0), ("b", 1, 5.0)], "k string, t long, lv double")
    right = keyed(flow, "r", [("a", 1, 1.0), ("a", 2, 2.0), ("b", 9, 9.0)], "k string, t long, rv double")
    out = op.join(
        "j", left, right, insert_mode="last", emit_mode="complete", order_by="t",
        unique_sides=(0,),
    )
    got = sorted((r["key"], r["lv"], r["rv"]) for r in rows(out))
    assert got == [("a", 10.0, 2.0), ("b", 5.0, 9.0)]
    # exactly one aggregate (right side); the unique side has none
    plan = out.df._jdf.queryExecution().executedPlan().toString()
    final_plan = plan.split("== Initial Plan ==")[0]
    assert final_plan.count("partial_max") == 1


def test_join_product_final(spark):
    flow = Dataflow("joinp")
    left = keyed(flow, "l", [("a", 1), ("a", 2)], "k string, lv long")
    right = keyed(flow, "r", [("a", 10), ("b", 20)], "k string, rv long")
    out = op.join("j", left, right, insert_mode="product", emit_mode="final")
    got = sorted((r["key"], r["lv"], r["rv"]) for r in rows(out))
    assert got == [("a", 1, 10), ("a", 2, 10), ("b", None, 20)]


def test_running_join(spark):
    flow = Dataflow("joinr")
    left = keyed(flow, "l", [("a", 1, 10.0)], "k string, t long, lv double")
    right = keyed(flow, "r", [("a", 2, 99.0)], "k string, t long, rv double")
    left = op.map_value("lproj", left, {"t": "t", "lv": "lv"})
    right = op.map_value("rproj", right, {"t": "t", "rv": "rv"})
    out = op.running_join("j", left, right, order_by="t")
    got = sorted((r["key"], r["t"], r["lv"], r["rv"]) for r in rows(out))
    assert got == [("a", 1, 10.0, None), ("a", 2, 10.0, 99.0)]
