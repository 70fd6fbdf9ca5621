"""Property-based hardening of the pure-Python Avro binary codec:
roundtrip identity over generated values, varint edges, and
writer→reader resolution invariants. No Spark session needed."""

from __future__ import annotations

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from bytewax_spark.connectors import avro_codec as ac

SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "P",
        "fields": [
            {"name": "l", "type": "long"},
            {"name": "i", "type": "int"},
            {"name": "d", "type": "double"},
            {"name": "s", "type": "string"},
            {"name": "by", "type": "bytes"},
            {"name": "flag", "type": "boolean"},
            {"name": "opt", "type": ["null", "string"], "default": None},
            {"name": "arr", "type": {"type": "array", "items": "long"}},
            {"name": "m", "type": {"type": "map", "values": "long"}},
        ],
    }
)
TREE = ac.parse_schema(SCHEMA)

# Avro long is signed 64-bit; doubles must roundtrip bit-exactly, so
# exclude NaN (NaN != NaN breaks the equality oracle, not the codec)
longs = st.integers(min_value=-(2**63), max_value=2**63 - 1)
ints = st.integers(min_value=-(2**31), max_value=2**31 - 1)
doubles = st.floats(allow_nan=False)
texts = st.text(max_size=64)

records = st.fixed_dictionaries(
    {
        "l": longs,
        "i": ints,
        "d": doubles,
        "s": texts,
        "by": st.binary(max_size=64),
        "flag": st.booleans(),
        "opt": st.none() | texts,
        "arr": st.lists(longs, max_size=8),
        "m": st.dictionaries(texts, longs, max_size=8),
    }
)


@settings(max_examples=200, deadline=None)
@given(records)
def test_codec_roundtrip_identity(rec):
    assert ac.decode(TREE, ac.encode(TREE, rec)) == rec


@settings(max_examples=300, deadline=None)
@given(longs)
def test_zigzag_varint_roundtrip_full_range(v):
    assert ac.decode('"long"', ac.encode('"long"', v)) == v


@settings(max_examples=100, deadline=None)
@given(records)
def test_resolution_adds_default_and_drops_field(rec):
    """Reader that drops `by`, adds a defaulted field, and promotes
    l:long→double — resolution must hold for EVERY writer value."""
    reader = json.dumps(
        {
            "type": "record",
            "name": "P",
            "fields": [
                {"name": "l", "type": "double"},
                {"name": "i", "type": "int"},
                {"name": "d", "type": "double"},
                {"name": "s", "type": "string"},
                {"name": "flag", "type": "boolean"},
                {"name": "opt", "type": ["null", "string"], "default": None},
                {"name": "arr", "type": {"type": "array", "items": "long"}},
                {"name": "m", "type": {"type": "map", "values": "long"}},
                {"name": "extra", "type": "string", "default": "x"},
            ],
        }
    )
    out = ac.decode(TREE, ac.encode(TREE, rec), reader)
    assert out["extra"] == "x" and "by" not in out
    assert out["l"] == float(rec["l"])
    for k in ("i", "d", "s", "flag", "opt", "arr", "m"):
        assert out[k] == rec[k]


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=40))
def test_garbage_never_crashes_only_raises(b):
    """Arbitrary bytes must produce a value or SchemaResolutionError —
    never an unhandled IndexError/KeyError/struct.error."""
    try:
        ac.decode(TREE, b)
    except ac.SchemaResolutionError:
        pass
