"""Serde operators with ok/err split (reference
``connectors/kafka/operators.py:60-434``: ``deserialize_value``,
``serialize_value``, ``oks``/``errs`` streams; Avro serde in
``connectors/kafka/serde.py``).

Spark-first: JSON via ``from_json``/``to_json`` (codegen'd); corrupt
records surface as NULL parse results and are split into an ``errs``
stream carrying the raw payload — the reference's ``KafkaError`` side
channel. Avro needs the spark-avro package (not in this container):
gated behind a runtime check, same API shape.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from pyspark.sql import functions as F

from bytewax_spark.dataflow import Stream

__all__ = ["SerdeOut", "deserialize_json", "serialize_json", "deserialize_avro", "serialize_avro"]


@dataclass(frozen=True)
class SerdeOut:
    """(oks, errs) pair (reference ``KafkaOpOut``-style split)."""

    oks: Stream
    errs: Stream


_CORRUPT = "_corrupt_record"


def deserialize_json(step_id: str, up: Stream, value_col: str, schema: Any) -> SerdeOut:
    """Parse ``value_col`` (string/binary JSON) into typed columns.

    Corrupt/NULL payloads go to ``errs`` with the raw payload preserved
    — Spark drops corrupt rows silently otherwise. Detection uses a
    ``columnNameOfCorruptRecord`` field (PERMISSIVE ``from_json``
    returns an all-null struct, not a NULL struct, for bad input, so a
    plain ``isNull`` check misses corruption)."""
    from pyspark.sql.types import StringType, StructField, StructType

    flow = up.flow
    fq = flow.register(step_id, "deserialize_json", (up.step_id,))
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    field_names = [f.name for f in schema.fields]
    # Fresh StructType — StructType.add mutates the caller's schema in
    # place, which would leak _corrupt_record into reused schemas.
    schema = StructType(list(schema.fields) + [StructField(_CORRUPT, StringType())])
    raw = F.col(value_col).cast("string")
    parsed = up.df.withColumn(
        "_parsed",
        F.from_json(raw, schema, {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": _CORRUPT}),
    )
    bad = F.col(value_col).isNull() | F.col(f"_parsed.{_CORRUPT}").isNotNull()
    keep = [c for c in up.df.columns if c != value_col]
    ok_df = parsed.filter(~bad).select(*keep, *[F.col(f"_parsed.{f}") for f in field_names])
    err_df = parsed.filter(bad).drop("_parsed")
    return SerdeOut(
        oks=Stream(flow, f"{fq}.oks", ok_df),
        errs=Stream(flow, f"{fq}.errs", err_df),
    )


def serialize_json(step_id: str, up: Stream, cols: list[str], out_col: str = "value") -> Stream:
    """Pack columns into a JSON string column (``to_json``)."""
    flow = up.flow
    fq = flow.register(step_id, "serialize_json", (up.step_id,))
    keep = [c for c in up.df.columns if c not in cols]
    out = up.df.select(*keep, F.to_json(F.struct(*cols)).alias(out_col))
    return Stream(flow, fq, out)


def _require_avro():
    try:
        from pyspark.sql.avro.functions import from_avro, to_avro  # noqa: F401

        return from_avro, to_avro
    except Exception as e:  # pragma: no cover - jar-dependent
        raise ImportError(
            "avro serde needs the spark-avro package on the classpath "
            "(--packages org.apache.spark:spark-avro_2.13:<spark-version>)"
        ) from e


def deserialize_avro(step_id: str, up: Stream, value_col: str, avro_schema: str) -> SerdeOut:
    """Avro variant (reference PlainAvro serde). Requires spark-avro;
    mode=PERMISSIVE surfaces corrupt rows as NULL → errs split."""
    from_avro, _ = _require_avro()
    flow = up.flow
    fq = flow.register(step_id, "deserialize_avro", (up.step_id,))
    parsed = up.df.withColumn("_parsed", from_avro(F.col(value_col), avro_schema, {"mode": "PERMISSIVE"}))
    ok_df = parsed.filter(F.col("_parsed").isNotNull()).select(
        *[c for c in up.df.columns if c != value_col], F.col("_parsed.*")
    )
    err_df = parsed.filter(F.col("_parsed").isNull()).drop("_parsed")
    return SerdeOut(oks=Stream(flow, f"{fq}.oks", ok_df), errs=Stream(flow, f"{fq}.errs", err_df))


def serialize_avro(step_id: str, up: Stream, cols: list[str], out_col: str = "value") -> Stream:
    _, to_avro = _require_avro()
    flow = up.flow
    fq = flow.register(step_id, "serialize_avro", (up.step_id,))
    keep = [c for c in up.df.columns if c not in cols]
    out = up.df.select(*keep, to_avro(F.struct(*cols)).alias(out_col))
    return Stream(flow, fq, out)
