"""Connector serde layer: JSON ok/err split (reference
``connectors/kafka/operators.py`` ``deserialize_value`` + ``oks``/``errs``)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bytewax_spark import operators as op
from bytewax_spark.connectors import serde
from bytewax_spark.dataflow import Dataflow
from bytewax_spark.sources import TestingSource


def _stream_of(spark, flow, rows, schema):
    return op.input("in", flow, TestingSource(rows, schema=schema))


def test_deserialize_json_ok_err_split(spark):
    flow = Dataflow("serde")
    rows = [
        ("k1", '{"a": 1, "b": "x"}'),
        ("k2", "not json at all"),
        ("k3", '{"a": 3, "b": "z"}'),
        ("k4", None),
    ]
    up = _stream_of(spark, flow, rows, "key string, value string")
    out = serde.deserialize_json("de", up, "value", "a INT, b STRING")

    oks = {r["key"]: (r["a"], r["b"]) for r in out.oks.df.collect()}
    errs = sorted(r["key"] for r in out.errs.df.collect())
    assert oks == {"k1": (1, "x"), "k3": (3, "z")}
    # corrupt + null payloads both land on the err side with the raw value kept
    assert errs == ["k2", "k4"]
    assert "value" in out.errs.df.columns


def test_serialize_json_roundtrip(spark):
    flow = Dataflow("serde_rt")
    rows = [("k1", 1, "x"), ("k2", 2, "y")]
    up = _stream_of(spark, flow, rows, "key string, a int, b string")
    ser = serde.serialize_json("ser", up, ["a", "b"], out_col="value")
    assert set(ser.df.columns) == {"key", "value"}

    back = serde.deserialize_json("de", ser, "value", "a INT, b STRING")
    got = {r["key"]: (r["a"], r["b"]) for r in back.oks.df.collect()}
    assert got == {"k1": (1, "x"), "k2": (2, "y")}
    assert back.errs.df.count() == 0


def test_deserialize_json_plan_stays_codegen(spark):
    """from_json must run JVM-side — no Python workers in the plan."""
    flow = Dataflow("serde_plan")
    up = _stream_of(spark, flow, [("k", '{"a":1}')], "key string, value string")
    out = serde.deserialize_json("de", up, "value", "a INT")
    plan = out.oks.df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_kafka_shaped_stream_serde_to_stateful(spark, tmp_path):
    """End-to-end kafka-shaped pipeline without the kafka jar: binary
    key/value frames (the kafka source schema) → deserialize_json oks/
    errs split → keyed windowless count, streaming. The errs stream is
    sunk separately — the reference's oks/errs operator contract."""
    frames = [
        (b"u1", b'{"v": 1}'),
        (b"u1", b'{"v": 2}'),
        (b"u2", b"corrupt!"),
        (b"u2", b'{"v": 5}'),
    ]
    flow = Dataflow("kshape")
    src = TestingSource(frames, schema="key binary, value binary", streaming=True)
    raw = op.input("in", flow, src)
    out = serde.deserialize_json("de", raw, "value", "v INT")
    keyed = op.key_on("k", out.oks, F.col("key").cast("string"), key_col="user")
    counts = keyed.df.groupBy("user").agg(F.sum("v").alias("total"))
    q = (
        counts.writeStream.format("memory")
        .queryName("kshape_out")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .trigger(availableNow=True)
        .start()
    )
    q2 = (
        out.errs.df.writeStream.format("memory")
        .queryName("kshape_errs")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q2.awaitTermination(120)
    got = {r["user"]: r["total"] for r in spark.sql("SELECT * FROM kshape_out").collect()}
    errs = [bytes(r["value"]) for r in spark.sql("SELECT * FROM kshape_errs").collect()]
    assert got == {"u1": 3, "u2": 5}
    assert errs == [b"corrupt!"]


def test_avro_gated_import():
    import pytest

    # spark-avro jar is not on the classpath in this container: the
    # operator must raise a clear ImportError, not fail deep in py4j.
    flow = Dataflow("avro")
    try:
        from pyspark.sql.avro.functions import from_avro  # noqa: F401

        has_avro_fns = True
    except Exception:
        has_avro_fns = False
    if has_avro_fns:
        pytest.skip("avro functions importable here; gate not exercisable")
    with pytest.raises(ImportError):
        serde._require_avro()
