"""Serde operators with ok/err split (reference
``connectors/kafka/operators.py:60-434``: ``deserialize_value``,
``serialize_value``, ``oks``/``errs`` streams; Avro serde in
``connectors/kafka/serde.py``).

Spark-first: JSON via ``from_json``/``to_json`` (codegen'd); corrupt
records surface as NULL parse results and are split into an ``errs``
stream carrying the raw payload — the reference's ``KafkaError`` side
channel.

Avro is REAL either way: with the spark-avro jar on the classpath the
JVM ``from_avro``/``to_avro`` fast path runs; without it the serde
falls back to the pure-Python binary codec
(:mod:`bytewax_spark.connectors.avro_codec`) inside Arrow-batched
pandas UDFs — the same per-record-Python execution shape as the
reference's confluent-kafka serializers, so the fallback is at
reference parity, just not at JVM parity.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import pandas as pd
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
    """spark-avro's JVM entry points, or ImportError when unusable.

    The Python wrappers import fine without the jar and only explode
    at ANALYSIS time, so importability alone is a false positive — we
    also probe the jar's class through the active session's JVM."""
    try:
        from pyspark.sql.avro.functions import from_avro, to_avro  # noqa: F401
    except Exception as e:  # pragma: no cover - jar-dependent
        raise ImportError(
            "avro serde needs the spark-avro package on the classpath "
            "(--packages org.apache.spark:spark-avro_2.13:<spark-version>)"
        ) from e
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is not None:
        try:
            # analysis (no job) raises AVRO_NOT_LOADED_* when the data
            # source isn't registered, even though the classes resolve
            spark.range(1).select(to_avro(F.struct(F.lit(1).alias("x")))).schema
        except Exception as e:
            raise ImportError(
                "spark-avro functions unusable in this session (wrapper "
                "importable, data source not loaded) — falling back "
                "callers use the pure-Python codec"
            ) from e
    return from_avro, to_avro


_OK = "_avro_ok"


def avro_decode_col(value_col: str, writer_schema: str, reader_schema: str | None = None):
    """Arrow-batched pure-Python Avro decode: binary column → struct
    column of the READER schema's fields plus an ``_avro_ok`` flag
    (False = frameless decode error; callers split on it). Per-record
    Python — the reference's serde execution shape — used when the
    spark-avro jar is absent."""
    from pyspark.sql import types as T

    from bytewax_spark.connectors import avro_codec as ac

    writer_tree = ac.parse_schema(writer_schema)
    reader_tree = ac.parse_schema(reader_schema) if reader_schema else writer_tree
    out_schema = ac.to_spark_schema(reader_tree)
    names = [f.name for f in out_schema.fields]
    # all-nullable: error rows carry nulls in every decoded field
    full = T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in out_schema.fields]
        + [T.StructField(_OK, T.BooleanType())]
    )

    @F.pandas_udf(returnType=full)
    def dec(vals: pd.Series) -> pd.DataFrame:
        rows = []
        for v in vals:
            try:
                d = ac.decode(writer_tree, bytes(v), reader_tree)
                d[_OK] = True
            except Exception:
                d = dict.fromkeys(names)
                d[_OK] = False
            rows.append(d)
        return pd.DataFrame(rows, columns=names + [_OK])

    return dec(F.col(value_col))


def avro_encode_col(cols: list[str], schema: str):
    """Arrow-batched pure-Python Avro encode: columns → binary column."""
    from bytewax_spark.connectors import avro_codec as ac

    tree = ac.parse_schema(schema)

    # annotated Series -> Series for the signature check; a struct
    # input column is delivered as a pd.DataFrame at runtime
    @F.pandas_udf(returnType="binary")
    def enc(pdf: pd.Series) -> pd.Series:
        recs = pdf.to_dict("records") if isinstance(pdf, pd.DataFrame) else [
            dict(r) for r in pdf
        ]
        return pd.Series([ac.encode(tree, _pythonize(rec)) for rec in recs])

    return enc(F.struct(*cols))


def _pythonize(v):
    """Arrow/pandas cell values → plain Python for the Avro encoder."""
    import numpy as np

    if isinstance(v, dict):
        return {k: _pythonize(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)) or isinstance(v, np.ndarray):
        return [_pythonize(x) for x in v]
    if isinstance(v, np.generic):
        return v.item()
    if isinstance(v, bytearray):
        return bytes(v)
    return v


def deserialize_avro(
    step_id: str, up: Stream, value_col: str, avro_schema: str
) -> SerdeOut:
    """Avro deserialize (reference PlainAvro serde,
    ``connectors/kafka/serde.py:63-105``): spark-avro's JVM
    ``from_avro`` when the jar is present, else the pure-Python codec
    in an Arrow-batched UDF. Corrupt rows → ``errs`` either way."""
    flow = up.flow
    fq = flow.register(step_id, "deserialize_avro", (up.step_id,))
    keep = [c for c in up.df.columns if c != value_col]
    try:
        from_avro, _ = _require_avro()

        parsed = up.df.withColumn(
            "_parsed", from_avro(F.col(value_col), avro_schema, {"mode": "PERMISSIVE"})
        )
        ok_df = parsed.filter(F.col("_parsed").isNotNull()).select(*keep, F.col("_parsed.*"))
        err_df = parsed.filter(F.col("_parsed").isNull()).drop("_parsed")
    except ImportError:
        parsed = up.df.withColumn("_parsed", avro_decode_col(value_col, avro_schema))
        ok = F.col(f"_parsed.{_OK}")
        field_names = [f.name for f in parsed.schema["_parsed"].dataType.fields if f.name != _OK]
        ok_df = parsed.filter(ok).select(*keep, *[F.col(f"_parsed.{n}") for n in field_names])
        err_df = parsed.filter(~F.coalesce(ok, F.lit(False))).drop("_parsed")
    return SerdeOut(oks=Stream(flow, f"{fq}.oks", ok_df), errs=Stream(flow, f"{fq}.errs", err_df))


def serialize_avro(
    step_id: str, up: Stream, cols: list[str], out_col: str = "value", avro_schema: str | None = None
) -> Stream:
    """Avro serialize: JVM ``to_avro`` with the jar, else the
    pure-Python codec (which REQUIRES ``avro_schema`` — Python can't
    infer the Avro schema from Catalyst types the way the jar does)."""
    flow = up.flow
    fq = flow.register(step_id, "serialize_avro", (up.step_id,))
    keep = [c for c in up.df.columns if c not in cols]
    try:
        _, to_avro = _require_avro()

        packed = to_avro(F.struct(*cols)) if avro_schema is None else to_avro(F.struct(*cols), avro_schema)
    except ImportError:
        if avro_schema is None:
            raise ValueError(
                "serialize_avro without the spark-avro jar needs avro_schema="
            ) from None
        packed = avro_encode_col(cols, avro_schema)
    out = up.df.select(*keep, packed.alias(out_col))
    return Stream(flow, fq, out)
