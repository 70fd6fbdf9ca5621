"""CLI runner behavior (reference ``pysrc/bytewax/run.py`` entry
points): flow location, mermaid render, error paths, and the demo
sources' streaming plumbing."""

from __future__ import annotations

import sys

import pytest

from bytewax_spark import operators as op
from bytewax_spark.dataflow import Dataflow
from bytewax_spark.run import _locate_flow, run_main
from bytewax_spark.sources import RandomMetricSource, SimplePollingSource


def test_locate_flow_module_attr(tmp_path, monkeypatch):
    mod = tmp_path / "someflow.py"
    mod.write_text(
        "from bytewax_spark.dataflow import Dataflow\n"
        "flow = Dataflow('located')\n"
        "def make(): return Dataflow('factory')\n"
    )
    monkeypatch.syspath_prepend(str(tmp_path))
    assert _locate_flow("someflow:flow").flow_id == "located"
    assert _locate_flow("someflow").flow_id == "located"  # default attr
    assert _locate_flow("someflow:make").flow_id == "factory"  # factory fn
    sys.modules.pop("someflow", None)


def test_locate_flow_bad_attr(tmp_path, monkeypatch):
    mod = tmp_path / "badflow.py"
    mod.write_text("not_a_flow = 42\n")
    monkeypatch.syspath_prepend(str(tmp_path))
    with pytest.raises(TypeError, match="did not resolve"):
        _locate_flow("badflow:not_a_flow")
    sys.modules.pop("badflow", None)


def test_run_main_requires_sinks(spark):
    flow = Dataflow("nosink")
    with pytest.raises(ValueError, match="sink"):
        run_main(flow)


def test_random_metric_source_schema(spark):
    flow = Dataflow("rnd")
    s = op.input("in", flow, RandomMetricSource("cpu", rows_per_second=5))
    assert s.df.isStreaming
    assert [f.name for f in s.df.schema.fields] == ["metric_name", "ts", "value"]


def test_simple_polling_source_fetches(spark, tmp_path):
    """Ticks drive the getter; rows appear with the declared schema."""
    import time

    calls = {"n": 0}

    def getter():
        calls["n"] += 1
        return {"metric": "up", "v": 1}

    flow = Dataflow("poll")
    s = op.input("in", flow, SimplePollingSource(getter, 1, "metric string, v long"))
    q = (
        s.df.writeStream.format("memory")
        .queryName("poll_out")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 30
        rows = []
        while time.time() < deadline:
            rows = spark.sql("SELECT * FROM poll_out").collect()
            if rows:
                break
            time.sleep(1)
    finally:
        q.stop()
    assert rows and rows[0]["metric"] == "up" and rows[0]["v"] == 1


def test_locate_flow_module_callbacks_ship_by_value(tmp_path, monkeypatch, spark):
    """Module-level callbacks in a flow module must pickle by VALUE:
    pickle-by-reference would make executors re-import the module,
    re-running eager flow construction on a worker (SPARK-5063)."""
    mod = tmp_path / "cbflow.py"
    mod.write_text(
        "import bytewax_spark.operators as op\n"
        "from bytewax_spark.dataflow import Dataflow\n"
        "from bytewax_spark.sinks import MemorySink\n"
        "from bytewax_spark.sources import TestingSource\n"
        "from bytewax_spark.streaming import stateful_map_stream\n"
        "flow = Dataflow('cb')\n"
        "s = op.input('in', flow, TestingSource(\n"
        "    [('a', 1, 1), ('a', 2, 2)],\n"
        "    schema='k string, seq long, v long', streaming=True, files=2))\n"
        "ks = op.key_on('key', s, 'k')\n"
        "def running_sum(state, v):\n"
        "    s = (state or 0) + v\n"
        "    return s, s\n"
        "out = stateful_map_stream('sum', ks, running_sum, value_col='v',\n"
        "                          out_col='total', out_type='long', order_by='seq')\n"
        "op.output('out', out, MemorySink('cbflow_out'))\n"
    )
    monkeypatch.syspath_prepend(str(tmp_path))
    try:
        flow = _locate_flow("cbflow:flow")
        run_main(flow)
        rows = spark.sql("SELECT * FROM cbflow_out").collect()
    finally:
        sys.modules.pop("cbflow", None)
    assert sorted((r["seq"], r["total"]) for r in rows) == [(1, 1), (2, 3)]


def test_cli_explain_prints_plan_without_executing(tmp_path, monkeypatch, capsys, spark):
    from bytewax_spark.run import cli_main

    mod = tmp_path / "explflow.py"
    mod.write_text(
        "import bytewax_spark.operators as op\n"
        "from bytewax_spark.dataflow import Dataflow\n"
        "from bytewax_spark.sinks import StdOutSink\n"
        "from bytewax_spark.sources import ParquetSource\n"
        "flow = Dataflow('expl')\n"
        "s = op.input('in', flow, ParquetSource('/root/testdata/sf0.001/lineitem.parquet'))\n"
        "op.output('out', op.count_final('cnt', s, key='l_returnflag'), StdOutSink())\n"
    )
    monkeypatch.syspath_prepend(str(tmp_path))
    cli_main(["explflow:flow", "--explain"])
    out = capsys.readouterr().out
    assert "== sink out ==" in out
    assert "Physical Plan" in out
    # plan printed, nothing executed: no result rows in stdout
    assert "l_returnflag" not in out.split("Physical Plan")[0]
    sys.modules.pop("explflow", None)


def test_cli_explain_requires_sinks(tmp_path, monkeypatch, spark):
    from bytewax_spark.run import cli_main

    mod = tmp_path / "nosinkflow.py"
    mod.write_text(
        "from bytewax_spark.dataflow import Dataflow\nflow = Dataflow('ns')\n"
    )
    monkeypatch.syspath_prepend(str(tmp_path))
    with pytest.raises(SystemExit, match="no sinks"):
        cli_main(["nosinkflow:flow", "--explain"])
    sys.modules.pop("nosinkflow", None)
