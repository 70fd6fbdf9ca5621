"""Dataflow API webserver (bytewax_spark/webserver.py) — the
reference's runtime introspection surface (src/webserver/mod.rs:19-42):
GET /dataflow serves the operator graph JSON, GET /metrics the
observed step metrics in Prometheus text format, gated by
BYTEWAX_DATAFLOW_API_ENABLED with port from BYTEWAX_DATAFLOW_API_PORT
and a dataflow.json cache file."""

from __future__ import annotations

import json
import urllib.error
import urllib.request

from pyspark.sql import functions as F

import bytewax_spark.operators as op
from bytewax_spark.dataflow import Dataflow
from bytewax_spark.sources import ParquetSource
from bytewax_spark.webserver import DataflowApiServer, maybe_serve_dataflow_api

SF_DIR = "/root/testdata/sf0.001"


def _get(port: int, path: str):
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}{path}", timeout=10
        ) as r:
            return r.status, r.headers.get("content-type", ""), r.read().decode()
    except urllib.error.HTTPError as err:
        return err.code, err.headers.get("content-type", ""), ""


def _flow(spark, tmp_path):
    flow = Dataflow("wsflow")
    s = op.input("in", flow, ParquetSource(f"{SF_DIR}/lineitem.parquet"))
    s = op.observe("obs", s, item_count=F.count(F.lit(1)))
    return flow, s


def test_dataflow_and_index_endpoints(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("BYTEWAX_DATAFLOW_API_CACHE_PATH", str(tmp_path))
    flow, _ = _flow(spark, tmp_path)
    server = DataflowApiServer(flow, port=0)
    try:
        status, ctype, body = _get(server.port, "/dataflow")
        assert status == 200 and ctype == "application/json"
        graph = json.loads(body)
        assert graph["flow_id"] == "wsflow"
        assert {s["step_id"] for s in graph["steps"]} >= {"in", "obs"}
        # graph JSON cached to disk once, at server start
        cached = json.loads((tmp_path / "dataflow.json").read_text())
        assert cached == graph
        status, ctype, body = _get(server.port, "/")
        assert status == 200 and "mermaid" in body and "wsflow" in body
        status, _, _ = _get(server.port, "/dataflow")
        assert status == 200  # server survives multiple requests
    finally:
        server.shutdown()


def test_metrics_endpoint_before_and_after_action(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("BYTEWAX_DATAFLOW_API_CACHE_PATH", str(tmp_path))
    flow, s = _flow(spark, tmp_path)
    server = DataflowApiServer(flow, port=0)
    try:
        # BEFORE any action: the batch Observation has no value yet —
        # the endpoint must serve an empty gauge set, not block
        status, ctype, body = _get(server.port, "/metrics")
        assert status == 200 and ctype.startswith("text/plain")
        assert "bytewax_spark_step_metric{" not in body
        n = s.df.count()  # action populates the Observation
        status, _, body = _get(server.port, "/metrics")
        assert (
            f'bytewax_spark_step_metric{{step_id="obs",metric="item_count"}} {n}'
            in body
        )
    finally:
        server.shutdown()


def test_env_gate_and_port(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("BYTEWAX_DATAFLOW_API_CACHE_PATH", str(tmp_path))
    monkeypatch.delenv("BYTEWAX_DATAFLOW_API_ENABLED", raising=False)
    flow, _ = _flow(spark, tmp_path)
    assert maybe_serve_dataflow_api(flow) is None  # off unless enabled
    monkeypatch.setenv("BYTEWAX_DATAFLOW_API_ENABLED", "1")
    monkeypatch.setenv("BYTEWAX_DATAFLOW_API_PORT", "0")  # ephemeral
    server = maybe_serve_dataflow_api(flow)
    try:
        assert server is not None
        status, _, _ = _get(server.port, "/dataflow")
        assert status == 200
        status, _, _ = _get(server.port, "/nope")
        assert status == 404
    finally:
        server.shutdown()
