"""Logging and tracing configuration.

API parity with the reference's ``bytewax.tracing`` (re-export surface
at ``pysrc/bytewax/tracing.py:1-15``, config/arg shapes documented in
``pysrc/bytewax/_bytewax.pyi:55-330``): ``TracingConfig`` subclasses
pick an exporter, ``setup_tracing`` activates it and returns a guard
you must keep alive.

Spark-first semantics: the engine's spans are Spark's own (the Spark
UI / event log / ``spark.eventLog.dir`` already carry per-stage,
per-task timing), so this module does NOT invent a parallel tracer for
JVM work. What it configures:

- driver-side log level: ``setup_tracing(log_level=...)`` maps to
  ``SparkContext.setLogLevel`` on the active session (and the
  ``py4j``/``pyspark`` Python loggers). On guard drop/``close()`` the
  PYTHON logger levels are restored; the JVM log4j level set via
  ``setLogLevel`` stays (Spark exposes no getter to capture it);
- an OpenTelemetry exporter IF the ``opentelemetry`` packages are
  importable (not shipped in this container): a tracer provider with
  an OTLP/gRPC exporter for ``OtlpTracingConfig``. Jaeger's dedicated
  exporter protocol is deprecated upstream (Jaeger speaks OTLP since
  v1.35), so ``JaegerConfig`` maps to the same OTLP path with the
  agent-host env vars honored. Without the packages the configs are
  validated and recorded; ``setup_tracing`` still manages log levels.
"""

from __future__ import annotations

import logging
import os

__all__ = [
    "TracingConfig",
    "JaegerConfig",
    "OtlpTracingConfig",
    "setup_tracing",
]


class TracingConfig:
    """Base class for tracing/logging configuration; subclass picks
    the exporter."""

    service_name: str | None = None


class JaegerConfig(TracingConfig):
    """Send traces to a Jaeger instance.

    Endpoint from ``endpoint`` or the standard agent env vars
    (``OTEL_EXPORTER_JAEGER_AGENT_HOST`` / ``..._PORT``); Jaeger >=
    1.35 ingests OTLP natively, which is the protocol used here.

    :arg service_name: identifies this dataflow.
    :arg endpoint: optional ``host:port`` override.
    :arg sampling_ratio: fraction of traces sampled in [0, 1].
    """

    def __init__(
        self,
        service_name: str,
        endpoint: str | None = None,
        sampling_ratio: float = 1.0,
    ):
        if not 0.0 <= sampling_ratio <= 1.0:
            raise ValueError(f"sampling_ratio must be in [0, 1], got {sampling_ratio}")
        self.service_name = service_name
        host = os.environ.get("OTEL_EXPORTER_JAEGER_AGENT_HOST", "127.0.0.1")
        port = os.environ.get("OTEL_EXPORTER_JAEGER_AGENT_PORT", "6831")
        self.endpoint = endpoint or f"{host}:{port}"
        self.sampling_ratio = sampling_ratio


class OtlpTracingConfig(TracingConfig):
    """Send traces to an OpenTelemetry collector over OTLP/gRPC.

    :arg service_name: identifies this dataflow.
    :arg url: collector endpoint (default grpc://127.0.0.1:4317).
    :arg sampling_ratio: fraction of traces sampled in [0, 1].
    """

    def __init__(
        self,
        service_name: str,
        url: str | None = None,
        sampling_ratio: float = 1.0,
    ):
        if not 0.0 <= sampling_ratio <= 1.0:
            raise ValueError(f"sampling_ratio must be in [0, 1], got {sampling_ratio}")
        self.service_name = service_name
        self.url = url or "grpc://127.0.0.1:4317"
        self.sampling_ratio = sampling_ratio


class _TracingGuard:
    """Keep a reference to this for tracing/log config to stay active;
    dropping it (or calling ``close()``) restores the previous Python
    logger levels and shuts the exporter down (the JVM log4j level is
    not restorable — Spark has no getter for it)."""

    def __init__(self, config: TracingConfig | None, log_level: str | None):
        self.config = config
        self._prev_py_levels: dict[str, int] = {}
        self._spark_level_set = False
        self._closed = False
        self._provider = None
        if log_level is not None:
            level = getattr(logging, log_level.upper(), None)
            if level is None:
                raise ValueError(f"unknown log level {log_level!r}")
            for name in ("py4j", "pyspark"):
                lg = logging.getLogger(name)
                self._prev_py_levels[name] = lg.level
                lg.setLevel(level)
            self._set_spark_level(log_level.upper())
        if config is not None:
            self._provider = _try_start_otel(config)

    def _set_spark_level(self, level: str) -> None:
        from pyspark.sql import SparkSession

        active = SparkSession.getActiveSession()
        if active is not None:
            # Spark accepts ALL/DEBUG/ERROR/FATAL/INFO/OFF/TRACE/WARN
            spark_level = {"WARNING": "WARN", "CRITICAL": "FATAL"}.get(level, level)
            active.sparkContext.setLogLevel(spark_level)
            self._spark_level_set = True

    def close(self) -> None:
        if self._closed:
            return
        self._closed = True
        for name, lvl in self._prev_py_levels.items():
            logging.getLogger(name).setLevel(lvl)
        if self._provider is not None:  # pragma: no cover - needs otel
            self._provider.shutdown()

    def __del__(self):  # pragma: no cover - GC timing
        try:
            self.close()
        except Exception:
            pass


def _try_start_otel(config: TracingConfig):
    """Start an OTel tracer provider if the packages exist; else record
    the config and return None (log-level management still applies)."""
    try:  # pragma: no cover - otel not shipped in this container
        from opentelemetry import trace
        from opentelemetry.exporter.otlp.proto.grpc.trace_exporter import (
            OTLPSpanExporter,
        )
        from opentelemetry.sdk.resources import Resource
        from opentelemetry.sdk.trace import TracerProvider
        from opentelemetry.sdk.trace.export import BatchSpanProcessor
        from opentelemetry.sdk.trace.sampling import TraceIdRatioBased
    except ImportError:
        logging.getLogger(__name__).info(
            "opentelemetry not installed; tracing config %r recorded, "
            "log-level management active, no spans exported",
            type(config).__name__,
        )
        return None
    endpoint = getattr(config, "url", None) or getattr(config, "endpoint", None)
    provider = TracerProvider(  # pragma: no cover
        resource=Resource.create({"service.name": config.service_name or "bytewax"}),
        sampler=TraceIdRatioBased(getattr(config, "sampling_ratio", 1.0)),
    )
    provider.add_span_processor(  # pragma: no cover
        BatchSpanProcessor(OTLPSpanExporter(endpoint=endpoint))
    )
    trace.set_tracer_provider(provider)  # pragma: no cover
    return provider  # pragma: no cover


def setup_tracing(
    tracing_config: TracingConfig | None = None, log_level: str | None = None
) -> _TracingGuard:
    """Set up tracing and logging; keep a reference to the returned
    guard (dropping it restores previous PYTHON log levels and shuts
    the exporter down — the JVM level persists, see module docs).
    Default behavior without arguments: ERROR-level logging only,
    matching the reference."""
    if tracing_config is None and log_level is None:
        log_level = "ERROR"
    return _TracingGuard(tracing_config, log_level)
