"""Real Avro on the wire, stdlib only: the pure-Python binary codec
(spec-conformant encode/decode + writer→reader resolution), the serde
fallback path, registry-framed Avro payloads, and Confluent-style
per-message writer-schema resolution."""

from __future__ import annotations

import json
import struct

import pytest
from pyspark.sql import functions as F

from bytewax_spark import operators as op
from bytewax_spark.connectors import avro_codec as ac
from bytewax_spark.connectors import registry as reg
from bytewax_spark.connectors import serde
from bytewax_spark.dataflow import Dataflow
from bytewax_spark.sources import TestingSource

V1 = json.dumps(
    {
        "type": "record",
        "name": "Ev",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "name", "type": "string"},
            {"name": "score", "type": ["null", "double"], "default": None},
            {"name": "tags", "type": {"type": "array", "items": "string"}},
            {"name": "kind", "type": {"type": "enum", "name": "K", "symbols": ["A", "B"]}},
        ],
    }
)

# evolution: drops `tags`, promotes id long->double, adds a defaulted field
V2 = json.dumps(
    {
        "type": "record",
        "name": "Ev",
        "fields": [
            {"name": "id", "type": "double"},
            {"name": "name", "type": "string"},
            {"name": "score", "type": ["null", "double"], "default": None},
            {"name": "kind", "type": {"type": "enum", "name": "K", "symbols": ["A", "B", "C"]}},
            {"name": "region", "type": "string", "default": "eu"},
        ],
    }
)

REC = {"id": 7, "name": "héllo", "score": 2.5, "tags": ["x", "y"], "kind": "B"}


def test_codec_roundtrip_all_types():
    schema = json.dumps(
        {
            "type": "record",
            "name": "All",
            "fields": [
                {"name": "b", "type": "boolean"},
                {"name": "i", "type": "int"},
                {"name": "l", "type": "long"},
                {"name": "f", "type": "float"},
                {"name": "d", "type": "double"},
                {"name": "s", "type": "string"},
                {"name": "by", "type": "bytes"},
                {"name": "fx", "type": {"type": "fixed", "name": "F8", "size": 3}},
                {"name": "arr", "type": {"type": "array", "items": "long"}},
                {"name": "m", "type": {"type": "map", "values": "int"}},
                {"name": "u", "type": ["null", "string"]},
                {"name": "nested", "type": {"type": "record", "name": "N", "fields": [{"name": "x", "type": "int"}]}},
            ],
        }
    )
    rec = {
        "b": True, "i": -42, "l": 2**61, "f": 1.5, "d": -3.25,
        "s": "ünïcode", "by": b"\x00\xff", "fx": b"abc",
        "arr": [1, -2, 3], "m": {"k1": 1, "k2": -9},
        "u": None, "nested": {"x": 5},
    }
    assert ac.decode(schema, ac.encode(schema, rec)) == rec
    rec["u"] = "set"
    assert ac.decode(schema, ac.encode(schema, rec)) == rec


def test_codec_zigzag_varint_edges():
    s = '"long"'
    for v in (0, -1, 1, 63, -64, 64, 127, -128, 2**62, -(2**62)):
        assert ac.decode(s, ac.encode(s, v)) == v


def test_codec_negative_block_count_arrays():
    """Spec: a negative array block count means |count| items preceded
    by the block's byte size — writers like the Java impl emit this;
    the decoder must accept it even though ours never writes it."""
    schema = json.dumps({"type": "array", "items": "long"})
    items = b"".join(ac.encode('"long"', v) for v in (10, -20))
    buf = ac.encode('"long"', -2) + ac.encode('"long"', len(items)) + items + ac.encode('"long"', 0)
    assert ac.decode(schema, buf) == [10, -20]


def test_codec_writer_reader_resolution():
    b = ac.encode(V1, REC)
    out = ac.decode(V1, b, V2)
    assert out == {"id": 7.0, "name": "héllo", "score": 2.5, "kind": "B", "region": "eu"}
    # missing reader default -> loud error
    bad_reader = json.dumps(
        {"type": "record", "name": "Ev", "fields": [{"name": "nope", "type": "string"}]}
    )
    with pytest.raises(ac.SchemaResolutionError, match="default"):
        ac.decode(V1, b, bad_reader)
    with pytest.raises(ac.SchemaResolutionError):
        ac.decode(V1, b[:4])
    with pytest.raises(ac.SchemaResolutionError, match="trailing"):
        ac.decode(V1, b + b"\x00")


def test_to_spark_schema_mapping():
    st = ac.to_spark_schema(V1)
    assert [f.name for f in st.fields] == ["id", "name", "score", "tags", "kind"]
    assert st["id"].dataType.typeName() == "long"
    assert st["score"].dataType.typeName() == "double" and st["score"].nullable
    assert st["tags"].dataType.typeName() == "array"
    assert st["kind"].dataType.typeName() == "string"


@pytest.mark.slow
def test_serde_avro_python_path_roundtrip_and_errs(spark):
    """serialize_avro -> deserialize_avro through the pure-Python codec
    (no jar in this container): values roundtrip, corrupt bytes split
    to errs with raw payload preserved."""
    flow = Dataflow("avro_rt")
    rows = [("k1", 1, "x"), ("k2", 2, "y")]
    up = op.input("in", flow, TestingSource(rows, schema="key string, a long, b string"))
    schema = json.dumps(
        {
            "type": "record",
            "name": "R",
            "fields": [{"name": "a", "type": "long"}, {"name": "b", "type": "string"}],
        }
    )
    ser = serde.serialize_avro("ser", up, ["a", "b"], avro_schema=schema)
    assert set(ser.df.columns) == {"key", "value"}
    # splice in one corrupt record
    corrupt = spark.createDataFrame([("bad", bytearray(b"\x09\x09"))], "key string, value binary")
    from bytewax_spark.dataflow import Stream

    spliced = Stream(flow, "spliced", ser.df.unionByName(corrupt))
    back = serde.deserialize_avro("de", spliced, "value", schema)
    oks = {r["key"]: (r["a"], r["b"]) for r in back.oks.df.collect()}
    assert oks == {"k1": (1, "x"), "k2": (2, "y")}
    errs = back.errs.df.collect()
    assert [r["key"] for r in errs] == ["bad"] and bytes(errs[0]["value"]) == b"\x09\x09"


def test_serialize_avro_python_requires_schema(spark):
    flow = Dataflow("avro_req")
    up = op.input("in", flow, TestingSource([(1,)], schema="a long"))
    with pytest.raises((ValueError, ImportError)):
        serde.serialize_avro("ser", up, ["a"])  # no schema, no jar


@pytest.mark.slow
def test_registry_avro_payload_roundtrip(spark, tmp_path):
    """Framed REAL Avro bytes through the registry serde: magic + BE32
    id + avro-binary payload; wrong-id frames -> errs."""
    r = reg.InMemorySchemaRegistry(str(tmp_path / "reg.json"))
    sid = r.register("ev-value", V1)
    flow = Dataflow("reg_avro")
    rows = [("k1", 1, "a", 0.5, ["t"], "A"), ("k2", 2, "b", None, [], "B")]
    up = op.input(
        "in",
        flow,
        TestingSource(
            rows,
            schema="key string, id long, name string, score double, tags array<string>, kind string",
        ),
    )
    ser = reg.serialize_registry(
        "ser", up, ["id", "name", "score", "tags", "kind"], r, "ev-value", payload_format="avro"
    )
    first = ser.df.first()
    raw = bytes(first["value"])
    assert raw[0] == 0 and struct.unpack(">I", raw[1:5])[0] == sid
    # the payload really is spec avro: the stdlib codec reads it back
    decoded = ac.decode(V1, raw[5:])
    assert decoded["name"] in ("a", "b")

    back = reg.deserialize_registry("de", ser, "value", r, subject="ev-value", payload_format="avro")
    oks = {r_["key"]: (r_["id"], r_["name"], r_["score"], r_["kind"]) for r_ in back.oks.df.collect()}
    assert oks == {"k1": (1, "a", 0.5, "A"), "k2": (2, "b", None, "B")}
    assert back.errs.df.count() == 0


def test_registry_per_message_writer_resolution(spark, tmp_path):
    """Confluent consumer semantics: one topic carrying v1 AND v2
    frames; the resolving deserializer decodes each with its writer
    schema and resolves into the v2 reader (defaults, promotions);
    unknown ids and garbage land on errs."""
    r = reg.InMemorySchemaRegistry(str(tmp_path / "reg.json"))
    id1 = r.register("ev-value", V1)
    id2 = r.register("ev-value", V2)

    def frame(sid: int, payload: bytes) -> bytearray:
        return bytearray(b"\x00" + struct.pack(">I", sid) + payload)

    v1_rec = REC
    v2_rec = {"id": 9.5, "name": "new", "score": None, "kind": "C", "region": "us"}
    rows = [
        ("m1", frame(id1, ac.encode(V1, v1_rec))),
        ("m2", frame(id2, ac.encode(V2, v2_rec))),
        ("m3", frame(999, b"\x00\x00")),  # unknown schema id
        ("m4", bytearray(b"nonsense")),  # wrong magic
    ]
    flow = Dataflow("reg_resolve")
    up = op.input("in", flow, TestingSource(rows, schema="key string, value binary"))
    out = reg.deserialize_registry_resolving("de", up, "value", r, subject="ev-value")
    oks = {row["key"]: row.asDict() for row in out.oks.df.collect()}
    assert set(oks) == {"m1", "m2"}
    # v1 frame resolved INTO the v2 reader: id promoted long->double,
    # writer-only `tags` dropped, reader-only `region` defaulted
    assert oks["m1"]["id"] == 7.0 and oks["m1"]["region"] == "eu"
    assert oks["m1"]["writer_schema_id"] == id1 and "tags" not in oks["m1"]
    assert oks["m2"]["id"] == 9.5 and oks["m2"]["region"] == "us"
    assert oks["m2"]["writer_schema_id"] == id2 and oks["m2"]["kind"] == "C"
    errs = sorted(row["key"] for row in out.errs.df.collect())
    assert errs == ["m3", "m4"]
