"""Confluent-style Schema-Registry serde.

The reference integrates ``confluent_kafka.schema_registry`` two ways
(``pysrc/bytewax/connectors/kafka/serde.py:8-105``): *plain* unframed
Avro (our ``serde.deserialize_avro``) and the registry-framed wire
format — a 0x00 magic byte, a 4-byte big-endian schema id, then the
payload. This module implements the framed variant Spark-first:

- :class:`InMemorySchemaRegistry` — the registry client surface
  (``register`` / ``schema_str`` / ``latest_id``), file-persistable so
  tests can share one registry across sessions. No network client:
  the container has no registry service, and schema resolution is a
  **driver-side plan-build step** in Spark anyway (Catalyst needs the
  schema before the first row flows).
- :func:`serialize_registry` — frame + payload as pure column
  expressions (header is a plan-time literal; payload is
  ``to_json``, JVM codegen).
- :func:`deserialize_registry` — validates magic/id and parses the
  payload; frame mismatches and corrupt payloads BOTH land on the
  ``errs`` stream with the raw bytes preserved (the reference raises
  on unknown ids; routing to ``errs`` is the streaming-safe
  equivalent and keeps the oks/errs operator contract).

Divergence, documented: Confluent deserializers resolve the *writer*
schema per message. A Spark plan has one static schema, so we resolve
the expected id at plan time and route other ids to ``errs`` instead
of re-fetching — at 100 TB you want the schema pinned per query, not
a per-row registry lookup.

Payloads are JSON here (spark-avro jar absent in this container);
``payload_format="avro"`` switches to ``from_avro``/``to_avro`` when
the jar is on the classpath — same framing either way.
"""

from __future__ import annotations

import json
import os
import struct
from typing import Any

from pyspark.sql import functions as F

from bytewax_spark.connectors.serde import SerdeOut, _require_avro
from bytewax_spark.dataflow import Stream

__all__ = ["InMemorySchemaRegistry", "serialize_registry", "deserialize_registry"]

_MAGIC = b"\x00"


class InMemorySchemaRegistry:
    """Subject → versioned schema ids, Confluent-shaped surface.

    ``path`` persists the registry as one JSON file so a producer
    process and a consumer process can share ids (the moral
    equivalent of the registry service's REST state)."""

    def __init__(self, path: str | None = None) -> None:
        self.path = path
        self._by_id: dict[int, str] = {}
        self._subjects: dict[str, list[int]] = {}
        if path and os.path.exists(path):
            with open(path) as f:
                raw = json.load(f)
            self._by_id = {int(k): v for k, v in raw["by_id"].items()}
            self._subjects = raw["subjects"]

    def _save(self) -> None:
        if self.path:
            with open(self.path, "w") as f:
                json.dump({"by_id": self._by_id, "subjects": self._subjects}, f)

    def register(self, subject: str, schema_str: str) -> int:
        """Register a schema under a subject; returns its id
        (idempotent for an identical schema, like the real registry)."""
        for sid in self._subjects.get(subject, []):
            if self._by_id[sid] == schema_str:
                return sid
        sid = max(self._by_id, default=0) + 1
        self._by_id[sid] = schema_str
        self._subjects.setdefault(subject, []).append(sid)
        self._save()
        return sid

    def schema_str(self, schema_id: int) -> str:
        return self._by_id[schema_id]

    def latest_id(self, subject: str) -> int:
        versions = self._subjects.get(subject)
        if not versions:
            raise KeyError(f"no schema registered for subject {subject!r}")
        return versions[-1]


def _header(schema_id: int) -> bytes:
    return _MAGIC + struct.pack(">I", schema_id)


def serialize_registry(
    step_id: str,
    up: Stream,
    cols: list[str],
    registry: InMemorySchemaRegistry,
    subject: str,
    schema_id: int | None = None,
    out_col: str = "value",
    payload_format: str = "json",
) -> Stream:
    """Pack columns into a registry-framed binary ``out_col``."""
    flow = up.flow
    fq = flow.register(step_id, "serialize_registry", (up.step_id,))
    sid = schema_id if schema_id is not None else registry.latest_id(subject)
    registry.schema_str(sid)  # fail fast on unknown id
    if payload_format == "json":
        payload = F.to_json(F.struct(*cols)).cast("binary")
    elif payload_format == "avro":
        _, to_avro = _require_avro()
        payload = to_avro(F.struct(*cols), registry.schema_str(sid))
    else:
        raise ValueError(f"payload_format must be json|avro, got {payload_format!r}")
    keep = [c for c in up.df.columns if c not in cols]
    out = up.df.select(*keep, F.concat(F.lit(_header(sid)), payload).alias(out_col))
    return Stream(flow, fq, out)


def deserialize_registry(
    step_id: str,
    up: Stream,
    value_col: str,
    registry: InMemorySchemaRegistry,
    subject: str | None = None,
    schema_id: int | None = None,
    spark_schema: Any | None = None,
) -> SerdeOut:
    """Unframe + parse ``value_col``; frame mismatches (wrong magic,
    unknown/other schema id, truncated) and corrupt payloads go to
    ``errs`` with the raw bytes preserved.

    ``spark_schema`` (DDL or StructType) gives the payload's Spark
    schema; when omitted it is derived from the registered JSON-schema
    string, which for ``payload_format="json"`` producers is stored as
    a Spark DDL string."""
    from pyspark.sql.types import StringType, StructField, StructType

    flow = up.flow
    fq = flow.register(step_id, "deserialize_registry", (up.step_id,))
    if schema_id is None:
        if subject is None:
            raise ValueError("deserialize_registry needs subject= or schema_id=")
        schema_id = registry.latest_id(subject)
    ddl = registry.schema_str(schema_id)
    schema = spark_schema if spark_schema is not None else ddl
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    field_names = [f.name for f in schema.fields]
    corrupt = "_corrupt_record"
    parse_schema = StructType(list(schema.fields) + [StructField(corrupt, StringType())])

    v = F.col(value_col)
    frame_ok = (F.length(v) > 5) & (
        F.expr(f"substring({value_col}, 1, 5)") == F.lit(_header(schema_id))
    )
    payload = F.expr(f"substring({value_col}, 6, length({value_col}) - 5)").cast("string")
    parsed = up.df.withColumn("_frame_ok", F.coalesce(frame_ok, F.lit(False))).withColumn(
        "_parsed",
        F.from_json(
            F.when(F.col("_frame_ok"), payload),
            parse_schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": corrupt},
        ),
    )
    bad = (~F.col("_frame_ok")) | F.col(f"_parsed.{corrupt}").isNotNull()
    keep = [c for c in up.df.columns if c != value_col]
    ok_df = parsed.filter(~bad).select(*keep, *[F.col(f"_parsed.{f}") for f in field_names])
    err_df = parsed.filter(bad).drop("_parsed", "_frame_ok")
    return SerdeOut(
        oks=Stream(flow, f"{fq}.oks", ok_df),
        errs=Stream(flow, f"{fq}.errs", err_df),
    )
