"""Pure-Python Avro BINARY codec (Apache Avro 1.x spec — public:
https://avro.apache.org/docs/current/specification/).

Why this exists: the reference ships real Avro on the wire through
``confluent_kafka``'s (de)serializers — per-message Python — while
this container lacks both that package and the spark-avro jar. This
module implements the Avro binary encoding from the spec with stdlib
only, so :mod:`serde` / :mod:`registry` can put REAL Avro bytes on the
wire. Execution shape mirrors the reference exactly (per-record Python
inside an Arrow-batched kernel); when the spark-avro jar IS present,
``serde`` prefers the JVM ``from_avro``/``to_avro`` fast path and this
codec is only the fallback.

Supported: null, boolean, int, long (zigzag varint), float, double,
bytes, string, fixed, enum, array, map, union, record (recursive), and
WRITER→READER schema resolution per the spec: field matching by name,
reader defaults for missing fields, writer-only fields skipped, the
numeric/string-bytes promotion lattice, enum symbol matching, union
branch re-resolution.

Reference parity citation: ``pysrc/bytewax/connectors/kafka/serde.py``
(PlainAvro + Confluent wire serde) — behavior, not implementation.
"""

from __future__ import annotations

import io
import json
import struct
from typing import Any

__all__ = ["parse_schema", "encode", "decode", "SchemaResolutionError"]

_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double", "bytes", "string"}


class SchemaResolutionError(ValueError):
    """Writer and reader schemas cannot be reconciled per the spec."""


def parse_schema(schema: str | dict | list) -> Any:
    """Parse a schema (JSON string or already-loaded) and resolve named
    references, returning the plain dict/list/str tree the codec walks."""
    if isinstance(schema, str):
        s = schema.strip()
        schema = json.loads(s) if s and s[0] in "[{\"" else s
    named: dict[str, Any] = {}

    def walk(node: Any) -> Any:
        if isinstance(node, str):
            return named.get(node, node)
        if isinstance(node, list):
            return [walk(b) for b in node]
        t = node.get("type")
        if t in ("record", "enum", "fixed"):
            name = node.get("name")
            if name:
                named[name] = node
                ns = node.get("namespace")
                if ns:
                    named[f"{ns}.{name}"] = node
        if t == "record":
            for f in node.get("fields", []):
                f["type"] = walk(f["type"])
        elif t == "array":
            node["items"] = walk(node["items"])
        elif t == "map":
            node["values"] = walk(node["values"])
        return node

    return walk(schema)


def _type_name(schema: Any) -> str:
    if isinstance(schema, str):
        return schema
    if isinstance(schema, list):
        return "union"
    return schema["type"]


# --- encoding -----------------------------------------------------------


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _write_long(out: io.BytesIO, n: int) -> None:
    n = _zigzag(n) & 0xFFFFFFFFFFFFFFFF
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            return


def _union_index(schema: list, value: Any) -> int:
    """First union branch that can carry ``value`` (spec: branch chosen
    by the writer; we pick structurally)."""
    for i, branch in enumerate(schema):
        t = _type_name(branch)
        if value is None and t == "null":
            return i
        if value is None:
            continue
        if t == "boolean" and isinstance(value, bool):
            return i
        if t in ("int", "long") and isinstance(value, int) and not isinstance(value, bool):
            return i
        if t in ("float", "double") and isinstance(value, (int, float)) and not isinstance(value, bool):
            return i
        if t == "string" and isinstance(value, str):
            return i
        if t in ("bytes", "fixed") and isinstance(value, (bytes, bytearray)):
            return i
        if t == "array" and isinstance(value, list):
            return i
        if t == "map" and isinstance(value, dict):
            return i
        if t == "record" and isinstance(value, dict):
            return i
        if t == "enum" and isinstance(value, str):
            return i
    raise SchemaResolutionError(f"no union branch for {type(value).__name__}")


def _encode_into(out: io.BytesIO, schema: Any, value: Any) -> None:
    t = _type_name(schema)
    if t == "union":
        idx = _union_index(schema, value)
        _write_long(out, idx)
        _encode_into(out, schema[idx], value)
    elif t == "null":
        if value is not None:
            raise SchemaResolutionError("non-null value for null schema")
    elif t == "boolean":
        out.write(b"\x01" if value else b"\x00")
    elif t in ("int", "long"):
        _write_long(out, int(value))
    elif t == "float":
        out.write(struct.pack("<f", float(value)))
    elif t == "double":
        out.write(struct.pack("<d", float(value)))
    elif t == "bytes":
        b = bytes(value)
        _write_long(out, len(b))
        out.write(b)
    elif t == "string":
        b = str(value).encode("utf-8")
        _write_long(out, len(b))
        out.write(b)
    elif t == "fixed":
        b = bytes(value)
        if len(b) != schema["size"]:
            raise SchemaResolutionError(f"fixed size {schema['size']} != {len(b)}")
        out.write(b)
    elif t == "enum":
        _write_long(out, schema["symbols"].index(value))
    elif t == "array":
        if value:
            _write_long(out, len(value))
            for item in value:
                _encode_into(out, schema["items"], item)
        _write_long(out, 0)
    elif t == "map":
        if value:
            _write_long(out, len(value))
            for k, v in value.items():
                _encode_into(out, "string", k)
                _encode_into(out, schema["values"], v)
        _write_long(out, 0)
    elif t == "record":
        for f in schema["fields"]:
            try:
                missing = f["name"] not in value
                fv = f.get("default") if missing else value[f["name"]]
            except TypeError:
                missing, fv = False, getattr(value, f["name"])
            if missing and "default" not in f and _type_name(f["type"]) != "null":
                raise SchemaResolutionError(
                    f"record field {f['name']!r} missing and schema has no default"
                )
            _encode_into(out, f["type"], fv)
    else:
        raise SchemaResolutionError(f"unknown schema type {t!r}")


def encode(schema: Any, value: Any) -> bytes:
    """Avro-binary-encode ``value`` with ``schema`` (JSON string or
    pre-parsed tree — pre-parse with :func:`parse_schema` in loops)."""
    if isinstance(schema, str):
        schema = parse_schema(schema)
    out = io.BytesIO()
    _encode_into(out, schema, value)
    return out.getvalue()


# --- decoding with writer->reader resolution ----------------------------


class _Reader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0

    def read(self, n: int) -> bytes:
        # n < 0 (a corrupt varint length) would slice backwards and
        # walk pos off the buffer — treat as corruption, loudly
        if n < 0 or self.pos + n > len(self.data):
            raise SchemaResolutionError("truncated or corrupt avro payload")
        b = self.data[self.pos : self.pos + n]
        self.pos += n
        return b

    def check_block(self, n: int) -> int:
        """Validate an array/map block count against the bytes left:
        every block item costs >= 1 byte (items of type "null" are
        the lone zero-byte exception; rejecting pathological counts
        there too is documented strictness), so a count beyond the
        remaining buffer is corruption — without this, garbage like a
        2^60 count would loop/allocate unboundedly."""
        if n > len(self.data) - self.pos:
            raise SchemaResolutionError(f"block count {n} exceeds remaining bytes")
        return n

    def read_long(self) -> int:
        shift, acc = 0, 0
        while True:
            b = self.read(1)[0]
            acc |= (b & 0x7F) << shift
            if not (b & 0x80):
                break
            shift += 7
            if shift > 70:
                raise SchemaResolutionError("varint too long")
        return (acc >> 1) ^ -(acc & 1)


# reader types each writer type may promote to (spec promotion lattice)
_PROMOTIONS = {
    "int": {"int", "long", "float", "double"},
    "long": {"long", "float", "double"},
    "float": {"float", "double"},
    "double": {"double"},
    "string": {"string", "bytes"},
    "bytes": {"bytes", "string"},
}


def _skip(r: _Reader, schema: Any) -> None:
    t = _type_name(schema)
    if t == "null":
        return
    if t == "boolean":
        r.read(1)
    elif t in ("int", "long"):
        r.read_long()
    elif t == "float":
        r.read(4)
    elif t == "double":
        r.read(8)
    elif t in ("bytes", "string"):
        r.read(r.read_long())
    elif t == "fixed":
        r.read(schema["size"])
    elif t == "enum":
        r.read_long()
    elif t == "union":
        _skip(r, schema[_union_branch_index(r, schema)])
    elif t == "array":
        while True:
            n = r.read_long()
            if n == 0:
                break
            if n < 0:
                r.read(r.read_long())  # block size given: skip wholesale
                continue
            for _ in range(r.check_block(n)):
                _skip(r, schema["items"])
    elif t == "map":
        while True:
            n = r.read_long()
            if n == 0:
                break
            if n < 0:
                r.read(r.read_long())
                continue
            for _ in range(r.check_block(n)):
                r.read(r.read_long())  # key
                _skip(r, schema["values"])
    elif t == "record":
        for f in schema["fields"]:
            _skip(r, f["type"])
    else:
        raise SchemaResolutionError(f"unknown schema type {t!r}")


def _utf8(b: bytes) -> str:
    try:
        return b.decode("utf-8")
    except UnicodeDecodeError as e:
        raise SchemaResolutionError(f"invalid utf-8 in avro string: {e}") from e


def _union_branch_index(r: _Reader, union: list) -> int:
    idx = r.read_long()
    if not 0 <= idx < len(union):
        raise SchemaResolutionError(f"union index {idx} out of range ({len(union)})")
    return idx


def _first_match(reader_union: list, writer: Any) -> Any:
    wt = _type_name(writer)
    for branch in reader_union:
        bt = _type_name(branch)
        if bt == wt or bt in _PROMOTIONS.get(wt, ()):
            return branch
        if wt in ("record", "enum", "fixed") and bt == wt:
            return branch
    raise SchemaResolutionError(f"no reader union branch accepts writer {wt}")


def _decode(r: _Reader, writer: Any, reader: Any) -> Any:
    wt = _type_name(writer)
    rt = _type_name(reader)
    if wt == "union":
        branch = writer[_union_branch_index(r, writer)]
        return _decode(r, branch, reader)
    if rt == "union":
        return _decode(r, writer, _first_match(reader, writer))
    if rt != wt and rt not in _PROMOTIONS.get(wt, ()):
        raise SchemaResolutionError(f"writer {wt} unreadable as reader {rt}")
    if wt == "null":
        return None
    if wt == "boolean":
        return r.read(1) == b"\x01"
    if wt in ("int", "long"):
        v = r.read_long()
        return float(v) if rt in ("float", "double") else v
    if wt == "float":
        return struct.unpack("<f", r.read(4))[0]
    if wt == "double":
        return struct.unpack("<d", r.read(8))[0]
    if wt == "bytes":
        b = r.read(r.read_long())
        return _utf8(b) if rt == "string" else b
    if wt == "string":
        b = r.read(r.read_long())
        return b if rt == "bytes" else _utf8(b)
    if wt == "fixed":
        return r.read(writer["size"])
    if wt == "enum":
        sidx = r.read_long()
        if not 0 <= sidx < len(writer["symbols"]):
            raise SchemaResolutionError(f"enum index {sidx} out of range")
        sym = writer["symbols"][sidx]
        if sym not in reader["symbols"]:
            default = reader.get("default")
            if default is None:
                raise SchemaResolutionError(f"enum symbol {sym!r} not in reader")
            return default
        return sym
    if wt == "array":
        out = []
        while True:
            n = r.read_long()
            if n == 0:
                return out
            if n < 0:
                n = -n
                r.read_long()  # block byte size, unused when decoding
            for _ in range(r.check_block(n)):
                out.append(_decode(r, writer["items"], reader["items"]))
    if wt == "map":
        out = {}
        while True:
            n = r.read_long()
            if n == 0:
                return out
            if n < 0:
                n = -n
                r.read_long()
            for _ in range(r.check_block(n)):
                k = _utf8(r.read(r.read_long()))
                out[k] = _decode(r, writer["values"], reader["values"])
    if wt == "record":
        reader_fields = {f["name"]: f for f in reader["fields"]}
        out = {}
        seen = set()
        for wf in writer["fields"]:
            rf = reader_fields.get(wf["name"])
            if rf is None:
                _skip(r, wf["type"])  # writer-only field: decode past it
            else:
                out[wf["name"]] = _decode(r, wf["type"], rf["type"])
                seen.add(wf["name"])
        for rf in reader["fields"]:
            if rf["name"] not in seen:
                if "default" not in rf:
                    raise SchemaResolutionError(
                        f"reader field {rf['name']!r} missing and has no default"
                    )
                out[rf["name"]] = rf["default"]
        return out
    raise SchemaResolutionError(f"unknown schema type {wt!r}")


def to_spark_schema(schema: Any):
    """Avro record schema → PySpark ``StructType`` (UDF return types;
    [null, X] unions become nullable X — multi-branch unions are not
    representable in a static column type and raise)."""
    from pyspark.sql import types as T

    s = parse_schema(schema) if isinstance(schema, str) else schema

    prim = {
        "null": T.NullType(),
        "boolean": T.BooleanType(),
        "int": T.IntegerType(),
        "long": T.LongType(),
        "float": T.FloatType(),
        "double": T.DoubleType(),
        "bytes": T.BinaryType(),
        "string": T.StringType(),
        "enum": T.StringType(),
        "fixed": T.BinaryType(),
    }

    def conv(node: Any) -> tuple[Any, bool]:
        t = _type_name(node)
        if t == "union":
            branches = [b for b in node if _type_name(b) != "null"]
            if len(branches) != 1:
                raise SchemaResolutionError(
                    "only [null, X] unions map to a Spark column type"
                )
            inner, _ = conv(branches[0])
            return inner, True
        if t in prim:
            return prim[t], False
        if t == "array":
            inner, n = conv(node["items"])
            return T.ArrayType(inner, n), False
        if t == "map":
            inner, n = conv(node["values"])
            return T.MapType(T.StringType(), inner, n), False
        if t == "record":
            fields = []
            for f in node["fields"]:
                ft, nullable = conv(f["type"])
                fields.append(T.StructField(f["name"], ft, nullable))
            return T.StructType(fields), False
        raise SchemaResolutionError(f"unknown schema type {t!r}")

    st, _ = conv(s)
    return st


def decode(writer_schema: Any, data: bytes, reader_schema: Any | None = None) -> Any:
    """Decode Avro binary ``data`` written with ``writer_schema``,
    resolved into ``reader_schema`` (defaults to the writer's)."""
    w = parse_schema(writer_schema) if isinstance(writer_schema, str) else writer_schema
    rd = (
        w
        if reader_schema is None
        else (parse_schema(reader_schema) if isinstance(reader_schema, str) else reader_schema)
    )
    r = _Reader(bytes(data))
    out = _decode(r, w, rd)
    if r.pos != len(r.data):
        raise SchemaResolutionError(f"{len(r.data) - r.pos} trailing bytes after decode")
    return out
