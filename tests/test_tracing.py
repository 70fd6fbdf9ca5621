"""Tracing/logging config surface (bytewax_spark/tracing.py; reference
parity with pysrc/bytewax/tracing.py re-exports)."""

from __future__ import annotations

import logging

import pytest

from bytewax_spark import tracing as tr


def test_config_shapes():
    j = tr.JaegerConfig("svc", endpoint="agent:6831", sampling_ratio=0.5)
    assert j.service_name == "svc" and j.endpoint == "agent:6831"
    o = tr.OtlpTracingConfig("svc2")
    assert o.url.startswith("grpc://")
    assert isinstance(j, tr.TracingConfig) and isinstance(o, tr.TracingConfig)
    with pytest.raises(ValueError, match="sampling_ratio"):
        tr.JaegerConfig("svc", sampling_ratio=1.5)


def test_jaeger_endpoint_from_env(monkeypatch):
    monkeypatch.setenv("OTEL_EXPORTER_JAEGER_AGENT_HOST", "10.0.0.9")
    monkeypatch.setenv("OTEL_EXPORTER_JAEGER_AGENT_PORT", "7777")
    assert tr.JaegerConfig("svc").endpoint == "10.0.0.9:7777"


def test_setup_tracing_guard_restores_levels(spark):
    lg = logging.getLogger("py4j")
    before = lg.level
    guard = tr.setup_tracing(log_level="warning")
    assert lg.level == logging.WARNING
    guard.close()
    assert lg.level == before
    # default: ERROR logging, config recorded as None
    g2 = tr.setup_tracing()
    assert lg.level == logging.ERROR and g2.config is None
    g2.close()
    assert lg.level == before
    # close is idempotent
    g2.close()


def test_setup_tracing_without_otel_still_guards(spark):
    guard = tr.setup_tracing(tr.OtlpTracingConfig("flow"), log_level="error")
    assert guard.config.service_name == "flow"
    guard.close()


def test_setup_tracing_rejects_bad_level():
    with pytest.raises(ValueError, match="log level"):
        tr.setup_tracing(log_level="loud")
