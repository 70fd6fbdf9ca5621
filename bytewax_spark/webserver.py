"""Dataflow API webserver — the reference's runtime introspection
surface (``src/webserver/mod.rs:19-42``, ``src/run.rs:36-70``):
when ``BYTEWAX_DATAFLOW_API_ENABLED`` is set, the runner serves

- ``GET /dataflow`` — the operator graph as JSON (``Dataflow.to_json``)
- ``GET /metrics``  — step metrics in Prometheus text exposition
  format (the reference exports per-step ``item_inp_count``/
  ``item_out_count`` counters; here the :func:`operators.observe`
  Observations and any registered ``MetricsListener.latest`` values
  are rendered)
- ``GET /``         — a minimal HTML page inlining the mermaid render

on ``BYTEWAX_DATAFLOW_API_PORT`` (default 3030, reference default),
and writes ``dataflow.json`` once to
``BYTEWAX_DATAFLOW_API_CACHE_PATH`` (default ``.``) — the dataflow
cannot change at runtime, so the JSON is encoded exactly once, when
the server starts (same contract as the reference).

Spark-first notes: the server is a stdlib ``http.server`` on a daemon
thread — pure driver-side introspection, it never touches executors
or the query plan; metric VALUES are computed JVM-side by
``df.observe`` and only read here.
"""

from __future__ import annotations

import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    from bytewax_spark.dataflow import Dataflow

__all__ = ["DataflowApiServer", "maybe_serve_dataflow_api", "prometheus_text"]

_INDEX_HTML = """<!DOCTYPE html>
<html><head><title>dataflow: {flow_id}</title></head>
<body>
<h1>dataflow: {flow_id}</h1>
<p><a href="/dataflow">/dataflow</a> (JSON) &middot;
   <a href="/metrics">/metrics</a> (Prometheus)</p>
<h2>mermaid</h2>
<pre>{mermaid}</pre>
</body></html>
"""


def _sanitize(label: str) -> str:
    return label.replace("\\", "\\\\").replace('"', '\\"').replace("\n", " ")


def prometheus_text(flow: "Dataflow", listener=None) -> str:
    """Render the flow's observed step metrics in the Prometheus text
    exposition format. Batch Observations expose values only after an
    action ran (``Observation.get`` BLOCKS before one — probed via the
    non-blocking internal future so an idle flow serves an empty set
    instead of hanging the request); streaming metrics come from a
    ``MetricsListener``'s ``.latest``."""
    lines = [
        "# HELP bytewax_spark_step_metric Observed per-step metric "
        "(operators.observe)",
        "# TYPE bytewax_spark_step_metric gauge",
    ]

    def emit(step: str, vals: dict) -> None:
        for name, val in vals.items():
            if isinstance(val, bool) or not isinstance(val, (int, float)):
                continue
            lines.append(
                'bytewax_spark_step_metric{step_id="%s",metric="%s"} %s'
                % (_sanitize(step), _sanitize(name), val)
            )

    for step, obs in flow.observations.items():
        vals: dict = {}
        try:
            # pyspark Observation: `get` blocks until an action ran;
            # probe the underlying jvm observation non-blockingly
            jo = getattr(obs, "_jo", None)
            if jo is not None:
                ro = jo.getOrEmpty()
                if not ro.isEmpty():
                    vals = obs.get
            elif getattr(obs, "_result", None) is not None:
                vals = obs.get
        except Exception:
            vals = {}
        if vals:
            emit(step, vals)
    if listener is not None:
        for step, vals in getattr(listener, "latest", {}).items():
            emit(step, vals)
    return "\n".join(lines) + "\n"


class DataflowApiServer:
    """Serve ``/dataflow`` + ``/metrics`` + ``/`` for one flow on a
    daemon thread. ``port=0`` binds an ephemeral port (tests)."""

    def __init__(self, flow: "Dataflow", port: int | None = None, listener=None):
        self.flow = flow
        self.listener = listener
        if port is None:
            port = int(os.environ.get("BYTEWAX_DATAFLOW_API_PORT", "3030"))
        # encode once, at server start: the dataflow cannot change at
        # runtime (reference contract) — and cache it to disk so a
        # crashed flow leaves the graph inspectable
        self.dataflow_json = flow.to_json()
        cache_dir = os.environ.get("BYTEWAX_DATAFLOW_API_CACHE_PATH", ".")
        try:
            with open(os.path.join(cache_dir, "dataflow.json"), "w") as f:
                f.write(self.dataflow_json)
        except OSError:
            pass  # read-only cwd: the HTTP surface still serves it
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # silence per-request stderr spam
                pass

            def _send(self, code: int, ctype: str, body: str) -> None:
                data = body.encode()
                self.send_response(code)
                self.send_header("content-type", ctype)
                self.send_header("content-length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_GET(self) -> None:  # noqa: N802 (http.server API)
                if self.path == "/dataflow":
                    self._send(200, "application/json", server.dataflow_json)
                elif self.path == "/metrics":
                    self._send(
                        200,
                        "text/plain; version=0.0.4",
                        prometheus_text(server.flow, server.listener),
                    )
                elif self.path in ("/", "/index.html"):
                    self._send(
                        200,
                        "text/html",
                        _INDEX_HTML.format(
                            flow_id=server.flow.flow_id,
                            mermaid=server.flow.to_mermaid(),
                        ),
                    )
                else:
                    self._send(404, "text/plain", "not found")

        self._httpd = ThreadingHTTPServer(("0.0.0.0", port), Handler)
        self.port = self._httpd.server_address[1]
        self._thread = threading.Thread(
            target=self._httpd.serve_forever,
            name="dataflow-api-server",
            daemon=True,
        )
        self._thread.start()

    def shutdown(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()


def maybe_serve_dataflow_api(flow: "Dataflow", listener=None):
    """Start the API server iff ``BYTEWAX_DATAFLOW_API_ENABLED`` is set
    (reference gate, ``src/run.rs:371``); returns the server or None."""
    if not os.environ.get("BYTEWAX_DATAFLOW_API_ENABLED"):
        return None
    return DataflowApiServer(flow, listener=listener)
