"""Sinks (reference ``pysrc/bytewax/outputs.py``, ``connectors/*``).

Batch sinks implement ``write_batch(df)``; streaming sinks
``write_stream(df) -> StreamingQuery``. Exactly-once for file sinks is
Spark's file-sink commit log; the reference's adler32 key→partition
routing maps to ``partitionBy``/``repartition(key)``.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame

__all__ = [
    "Sink",
    "MemorySink",
    "TestingSink",
    "ParquetSink",
    "OrcSink",
    "CSVSink",
    "FileSink",
    "DirSink",
    "StdOutSink",
    "KafkaSink",
]


class Sink:
    streaming_format: str | None = None

    def write_batch(self, df: DataFrame) -> None:
        raise NotImplementedError

    def write_stream(self, df: DataFrame, checkpoint: str | None = None, **trigger: Any):
        raise NotImplementedError


class MemorySink(Sink):
    """Collect results driver-side (reference ``TestingSink``).

    Batch: ``collect()`` into ``self.rows``. Streaming: memory-format
    table named ``self.name``. Test/debug only — never at scale.
    """

    def __init__(self, name: str = "out") -> None:
        self.name = name
        self.rows: list[Any] = []

    def write_batch(self, df: DataFrame) -> None:
        self.rows.extend(df.collect())

    def write_stream(self, df: DataFrame, checkpoint: str | None = None, **trigger: Any):
        writer = df.writeStream.format("memory").queryName(self.name).outputMode(trigger.pop("output_mode", "append"))
        if checkpoint:
            writer = writer.option("checkpointLocation", checkpoint)
        return writer.trigger(**(trigger or {"availableNow": True})).start()


TestingSink = MemorySink


class ParquetSink(Sink):
    def __init__(self, path: str, mode: str = "overwrite", partition_by: list[str] | None = None) -> None:
        self.path, self.mode, self.partition_by = path, mode, partition_by

    def write_batch(self, df: DataFrame) -> None:
        w = df.write.mode(self.mode)
        if self.partition_by:
            w = w.partitionBy(*self.partition_by)
        w.parquet(self.path)

    def write_stream(self, df: DataFrame, checkpoint: str | None = None, **trigger: Any):
        w = df.writeStream.format("parquet").option("path", self.path)
        if checkpoint:
            w = w.option("checkpointLocation", checkpoint)
        if self.partition_by:
            w = w.partitionBy(*self.partition_by)
        return w.trigger(**(trigger or {"availableNow": True})).start()


class OrcSink(Sink):
    """ORC columnar writer — mirrors ParquetSink (batch modes +
    streaming file-sink log exactly-once)."""

    def __init__(self, path: str, mode: str = "overwrite", partition_by: list[str] | None = None) -> None:
        self.path, self.mode, self.partition_by = path, mode, partition_by

    def write_batch(self, df: DataFrame) -> None:
        w = df.write.mode(self.mode)
        if self.partition_by:
            w = w.partitionBy(*self.partition_by)
        w.orc(self.path)

    def write_stream(self, df: DataFrame, checkpoint: str | None = None, **trigger: Any):
        w = df.writeStream.format("orc").option("path", self.path)
        if checkpoint:
            w = w.option("checkpointLocation", checkpoint)
        if self.partition_by:
            w = w.partitionBy(*self.partition_by)
        return w.trigger(**(trigger or {"availableNow": True})).start()


class CSVSink(Sink):
    def __init__(self, path: str, mode: str = "overwrite", header: bool = True) -> None:
        self.path, self.mode, self.header = path, mode, header

    def write_batch(self, df: DataFrame) -> None:
        df.write.mode(self.mode).option("header", self.header).csv(self.path)


class FileSink(CSVSink):
    """Line-per-item text/CSV append (reference ``connectors/files.py:325-463``);
    exactly-once via Spark's file-sink log in streaming mode."""


class DirSink(Sink):
    """Key-routed files (reference adler32 ``part_fn`` → hash
    ``repartition(key)`` so one task owns each key's output file)."""

    def __init__(self, path: str, key_col: str, num_files: int, mode: str = "overwrite") -> None:
        self.path, self.key_col, self.num_files, self.mode = path, key_col, num_files, mode

    def write_batch(self, df: DataFrame) -> None:
        df.repartition(self.num_files, self.key_col).write.mode(self.mode).csv(self.path, header=True)


class StdOutSink(Sink):
    """Print each batch (reference ``connectors/stdio.py:20-37``)."""

    def __init__(self, limit: int = 20) -> None:
        self.limit = limit

    def write_batch(self, df: DataFrame) -> None:
        df.show(self.limit, truncate=False)

    def write_stream(self, df: DataFrame, checkpoint: str | None = None, **trigger: Any):
        return df.writeStream.format("console").trigger(**(trigger or {"availableNow": True})).start()


class KafkaSink(Sink):
    """Produce to Kafka (reference ``connectors/kafka/__init__.py:425-553``).

    ``host:port`` brokers → ``format("kafka")`` (needs the connector
    jar). A single directory path → the embedded file-backed log
    (:mod:`bytewax_spark.connectors.kafka_log`): key-routed
    partitions, monotonic offsets, the same ``key``/``value`` input
    contract. The embedded append funnels the batch through the
    driver (the log is single-writer by design — it stands in for a
    broker in tests/dev, never the scale path), but it streams
    partition-at-a-time (``toLocalIterator`` + bounded chunks) so
    driver memory holds one chunk, never the whole batch."""

    #: records buffered per embedded-log append; bounds driver memory
    #: on the jar-absent fallback path.
    EMBEDDED_CHUNK = 10_000

    def __init__(self, brokers: list[str], topic: str) -> None:
        self.brokers, self.topic = brokers, topic

    def _is_embedded(self) -> bool:
        from bytewax_spark.connectors.kafka_log import is_log_path

        return is_log_path(self.brokers)

    def _append_embedded(self, df: DataFrame) -> None:
        from bytewax_spark.connectors.kafka_log import KafkaLog

        has_key = "key" in df.columns
        sel = df.select(
            *([df["key"].cast("binary").alias("key")] if has_key else []),
            df["value"].cast("binary").alias("value"),
        )
        log = KafkaLog(self.brokers[0])
        buf: list[tuple[bytes | None, bytes]] = []
        # toLocalIterator pulls one partition at a time; chunked
        # produce keeps offsets monotonic while the driver never holds
        # more than EMBEDDED_CHUNK records.
        for row in sel.toLocalIterator(prefetchPartitions=True):
            k = bytes(row["key"]) if has_key and row["key"] is not None else None
            buf.append((k, bytes(row["value"])))
            if len(buf) >= self.EMBEDDED_CHUNK:
                log.produce(self.topic, buf)
                buf = []
        if buf:
            log.produce(self.topic, buf)

    def _writer(self, df: DataFrame):
        return (
            df.write.format("kafka")
            .option("kafka.bootstrap.servers", ",".join(self.brokers))
            .option("topic", self.topic)
        )

    def write_batch(self, df: DataFrame) -> None:
        if self._is_embedded():
            self._append_embedded(df)
            return
        self._writer(df).save()

    def write_stream(self, df: DataFrame, checkpoint: str | None = None, **trigger: Any):
        if self._is_embedded():
            w = df.writeStream.foreachBatch(lambda batch, _id: self._append_embedded(batch))
            if checkpoint:
                w = w.option("checkpointLocation", checkpoint)
            return w.trigger(**(trigger or {"availableNow": True})).start()
        w = (
            df.writeStream.format("kafka")
            .option("kafka.bootstrap.servers", ",".join(self.brokers))
            .option("topic", self.topic)
        )
        if checkpoint:
            w = w.option("checkpointLocation", checkpoint)
        return w.trigger(**(trigger or {"availableNow": True})).start()
