"""Embedded file-backed Kafka stand-in.

The container has no Kafka broker and no spark-sql-kafka jar, so
``KafkaSource``/``KafkaSink`` accept a **local log directory** in
place of ``host:port`` brokers and run the exact same downstream code
path — the frame schema here is byte-for-byte Spark's kafka source
schema (``key/value binary, topic, partition, offset, timestamp,
timestampType``), so a dataflow developed against the embedded log
runs unchanged against ``format("kafka")`` on a real cluster.

Semantics mirrored from the reference consumer/producer
(``pysrc/bytewax/connectors/kafka/__init__.py:306-424`` consume with
offset resume, ``:425-553`` produce):

- **partitioning**: records are routed ``crc32(key) % n_partitions``
  (keyless: round-robin), the reference/Kafka default contract that
  equal keys land in one partition (ordering per key).
- **offsets**: strictly increasing per (topic, partition), persisted
  in the topic's ``_meta.json``; a produce is one new parquet file —
  an append-only segment, like a broker log segment.
- **offset resume**: consuming goes through Spark's file-stream
  source, whose checkpointed file log IS the committed-offset store —
  restart with the same checkpoint and only unseen segments are read,
  exactly the reference's resume-from-committed-offset behavior.

This is a single-writer test/dev double (the producer serializes
appends through ``_meta.json``); the 100 TB path is the real broker.
"""

from __future__ import annotations

import json
import os
import uuid
import zlib
from datetime import datetime, timezone

__all__ = ["KAFKA_FRAME_DDL", "KafkaLog", "is_log_path"]

# Spark's kafka source schema (see Spark docs "Structured Streaming +
# Kafka Integration"): timestampType 0=NoTimestampType 1=CreateTime
# 2=LogAppendTime. We stamp CreateTime.
KAFKA_FRAME_DDL = (
    "key binary, value binary, topic string, partition int, "
    "offset long, timestamp timestamp, timestampType int"
)


def is_log_path(brokers: list[str] | str) -> bool:
    """True when the 'brokers' spec is a local directory path —
    selects the embedded log instead of ``format("kafka")``."""
    if isinstance(brokers, str):
        brokers = [brokers]
    return len(brokers) == 1 and (
        brokers[0].startswith("/") or brokers[0].startswith("file:")
    )


class KafkaLog:
    """One root directory holding per-topic append-only parquet logs."""

    def __init__(self, root: str, n_partitions: int = 4) -> None:
        self.root = root[len("file:"):] if root.startswith("file:") else root
        self.n_partitions = n_partitions
        os.makedirs(self.root, exist_ok=True)

    # -- layout -----------------------------------------------------
    def topic_dir(self, topic: str) -> str:
        return os.path.join(self.root, topic)

    def _meta_path(self, topic: str) -> str:
        return os.path.join(self.topic_dir(topic), "_meta.json")

    def _load_meta(self, topic: str) -> dict:
        try:
            with open(self._meta_path(topic)) as f:
                return json.load(f)
        except FileNotFoundError:
            return {"n_partitions": self.n_partitions, "next_offset": {}, "rr": 0}

    def _save_meta(self, topic: str, meta: dict) -> None:
        with open(self._meta_path(topic), "w") as f:
            json.dump(meta, f)

    def end_offsets(self, topic: str) -> dict[int, int]:
        """Next offset per partition (== Kafka's end offsets)."""
        meta = self._load_meta(topic)
        return {int(p): o for p, o in meta["next_offset"].items()}

    # -- producer ---------------------------------------------------
    def produce(
        self,
        topic: str,
        records: list[tuple[bytes | str | None, bytes | str]],
        timestamp: datetime | None = None,
    ) -> int:
        """Append (key, value) records as one log segment; returns the
        number of records written. Key routing: crc32(key) %
        n_partitions, round-robin for None keys."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        os.makedirs(self.topic_dir(topic), exist_ok=True)
        meta = self._load_meta(topic)
        n = int(meta["n_partitions"])
        nxt = {int(p): o for p, o in meta["next_offset"].items()}
        rr = int(meta.get("rr", 0))
        ts = timestamp or datetime.now(timezone.utc).replace(tzinfo=None)

        keys, vals, parts, offs = [], [], [], []
        for key, value in records:
            kb = key.encode() if isinstance(key, str) else key
            vb = value.encode() if isinstance(value, str) else value
            if kb is None:
                part = rr % n
                rr += 1
            else:
                part = zlib.crc32(kb) % n
            off = nxt.get(part, 0)
            nxt[part] = off + 1
            keys.append(kb)
            vals.append(vb)
            parts.append(part)
            offs.append(off)

        table = pa.table(
            {
                "key": pa.array(keys, pa.binary()),
                "value": pa.array(vals, pa.binary()),
                "topic": pa.array([topic] * len(records), pa.string()),
                "partition": pa.array(parts, pa.int32()),
                "offset": pa.array(offs, pa.int64()),
                "timestamp": pa.array([ts] * len(records), pa.timestamp("us")),
                "timestampType": pa.array([1] * len(records), pa.int32()),
            }
        )
        seg = os.path.join(self.topic_dir(topic), f"segment-{uuid.uuid4().hex}.parquet")
        pq.write_table(table, seg)
        meta["next_offset"] = {str(p): o for p, o in nxt.items()}
        meta["rr"] = rr
        self._save_meta(topic, meta)
        return len(records)
