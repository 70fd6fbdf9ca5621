"""Observability: per-step metrics (reference's Prometheus counters,
src/operators.rs:154-170) and DAG rendering (visualize.py)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from bytewax_spark import operators as op
from bytewax_spark.dataflow import Dataflow
from bytewax_spark.sources import TestingSource


def test_observe_batch_metrics(spark):
    flow = Dataflow("obs")
    s = op.input("in", flow, TestingSource([(1,), (2,), (3,)], schema="v long"))
    observed = op.observe("m", s, item_count=F.count(F.lit(1)), v_sum=F.sum("v"))
    out = op.filter("f", observed, F.col("v") > 1)
    assert out.df.count() == 2
    got = flow.observations["m"].get
    assert got == {"item_count": 3, "v_sum": 6}


def test_observe_keeps_plan_jvm_side(spark):
    flow = Dataflow("obs2")
    s = op.input("in", flow, TestingSource([(1,)], schema="v long"))
    observed = op.observe("m", s)
    plan = observed.df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan  # no Python workers for metrics


def test_observe_streaming_listener(spark, tmp_path):
    flow = Dataflow("obs3")
    src = TestingSource([("a", 1), ("b", 2)], schema="k string, v long", streaming=True)
    s = op.input("in", flow, src)
    observed = op.observe("m", s, n=F.count(F.lit(1)))
    listener = op.MetricsListener()
    spark.streams.addListener(listener)
    try:
        q = (
            observed.df.writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        import time

        for _ in range(50):  # progress events are delivered async
            if "m" in listener.latest:
                break
            time.sleep(0.2)
        assert listener.latest["m"]["n"] == 2
    finally:
        spark.streams.removeListener(listener)


def test_dag_renderings(spark):
    flow = Dataflow("viz")
    s = op.input("in", flow, TestingSource([(1,)], schema="v long"))
    out = op.filter("keep", s, F.col("v") > 0)
    op.count_final("cnt", out, key=F.lit("all"))

    j = json.loads(flow.to_json())
    ids = [st["step_id"] for st in j["steps"]]
    assert "in" in ids and "keep" in ids and "cnt" in ids
    assert any(st["upstreams"] == ["in"] for st in j["steps"])

    uml = flow.to_plantuml()
    assert uml.startswith("@startuml") and "keep" in uml and "-->" in uml

    mm = flow.to_mermaid()
    assert mm.startswith("flowchart") and "-->" in mm
