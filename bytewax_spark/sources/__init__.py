"""Sources — partitioned inputs (reference §2.6, ``pysrc/bytewax/inputs.py``,
``connectors/files.py``, ``connectors/kafka/``).

Each source compiles to ``spark.read`` (batch) or ``spark.readStream``
(``streaming=True``); per-partition resume state is Spark's
checkpointed source offsets — we never implement recovery ourselves
(SURVEY §3 entry point 3).
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from bytewax_spark.session import get_spark

__all__ = [
    "Source",
    "ParquetSource",
    "CSVSource",
    "JSONSource",
    "FileSource",
    "DirSource",
    "TestingSource",
    "KafkaSource",
    "RandomMetricSource",
    "SimplePollingSource",
]


class Source:
    """Base source. ``to_df()`` yields the DataFrame scan."""

    streaming: bool = False

    def to_df(self) -> DataFrame:
        raise NotImplementedError

    def _spark(self) -> SparkSession:
        return get_spark()


class ParquetSource(Source):
    """Columnar scan with pushdown/pruning — the default table source."""

    def __init__(self, path: str, streaming: bool = False, schema: Any | None = None) -> None:
        self.path, self.streaming, self.schema = path, streaming, schema

    def to_df(self) -> DataFrame:
        spark = self._spark()
        if self.streaming:
            reader = spark.readStream
            if self.schema is None:
                # streaming file sources require a schema; infer from a batch peek
                self.schema = spark.read.parquet(self.path).schema
            return reader.schema(self.schema).parquet(self.path)
        reader = spark.read
        if self.schema is not None:
            reader = reader.schema(self.schema)
        return reader.parquet(self.path)


class CSVSource(Source):
    """CSV rows as typed columns (reference ``connectors/files.py:202-322``
    yields DictReader dicts; we go schema-full)."""

    def __init__(self, path: str, schema: Any | None = None, header: bool = True, streaming: bool = False, **options: Any) -> None:
        self.path, self.schema, self.header, self.streaming, self.options = path, schema, header, streaming, options

    def to_df(self) -> DataFrame:
        spark = self._spark()
        reader = spark.readStream if self.streaming else spark.read
        if self.schema is not None:
            reader = reader.schema(self.schema)
        elif not self.streaming:
            reader = reader.option("inferSchema", "true")
        return reader.options(**self.options).csv(self.path, header=self.header)


class JSONSource(Source):
    def __init__(self, path: str, schema: Any | None = None, streaming: bool = False) -> None:
        self.path, self.schema, self.streaming = path, schema, streaming

    def to_df(self) -> DataFrame:
        spark = self._spark()
        reader = spark.readStream if self.streaming else spark.read
        if self.schema is not None:
            reader = reader.schema(self.schema)
        return reader.json(self.path)


class FileSource(Source):
    """One text file, line-per-row as column ``line`` (reference
    ``connectors/files.py:136-199``; offset-resume ≙ file-source
    checkpoint)."""

    def __init__(self, path: str, streaming: bool = False) -> None:
        self.path, self.streaming = path, streaming

    def to_df(self) -> DataFrame:
        spark = self._spark()
        reader = spark.readStream if self.streaming else spark.read
        return reader.text(self.path).withColumnRenamed("value", "line")


class DirSource(FileSource):
    """Glob a directory of text files; Spark's file listing partitions
    per file like the reference's partition-per-file
    (``connectors/files.py:58-133``)."""

    def __init__(self, dir_path: str, glob: str = "*", streaming: bool = False) -> None:
        super().__init__(f"{dir_path.rstrip('/')}/{glob}", streaming)


class TestingSource(Source):
    """In-memory rows (reference ``pysrc/bytewax/testing.py:148-260``).

    Batch: ``createDataFrame``. Streaming: written to a temp parquet
    dir and re-read with ``readStream`` so availableNow-triggered tests
    exercise the real micro-batch path.
    """

    def __init__(
        self,
        items: Iterable[Any],
        schema: Any | None = None,
        streaming: bool = False,
        files: int = 1,
    ) -> None:
        self.items, self.schema, self.streaming, self.files = list(items), schema, streaming, files

    def to_df(self) -> DataFrame:
        spark = self._spark()
        import pandas as pd

        data = self.items
        if data and isinstance(data[0], dict):
            pdf = pd.DataFrame(data)
            batch = spark.createDataFrame(pdf, schema=self.schema)
        else:
            batch = spark.createDataFrame(data, schema=self.schema)
        if not self.streaming:
            return batch
        import os
        import tempfile

        tmp = tempfile.mkdtemp(prefix="bwspark_testing_src_")
        if self.files <= 1:
            batch.write.mode("overwrite").parquet(tmp)
        else:
            # one file per chunk, written in order -> with
            # maxFilesPerTrigger=1 each chunk becomes one micro-batch
            per = max(1, (len(data) + self.files - 1) // self.files)
            for i in range(self.files):
                chunk = data[i * per : (i + 1) * per]
                if not chunk:
                    break
                cdf = spark.createDataFrame(chunk, schema=batch.schema)
                cdf.coalesce(1).write.mode("overwrite").parquet(os.path.join(tmp, f"_b{i}"))
            import glob
            import shutil

            n = 0
            for i in range(self.files):
                for f in sorted(glob.glob(os.path.join(tmp, f"_b{i}", "part-*.parquet"))):
                    shutil.move(f, os.path.join(tmp, f"batch-{n:05d}.parquet"))
                    n += 1
                shutil.rmtree(os.path.join(tmp, f"_b{i}"), ignore_errors=True)
        reader = spark.readStream.schema(batch.schema)
        if self.files > 1:
            reader = reader.option("maxFilesPerTrigger", 1)
        return reader.parquet(tmp)


class KafkaSource(Source):
    """Kafka consumer (reference ``connectors/kafka/__init__.py:306-424``).

    Compiles to Spark's kafka source: partition-per-topic-partition and
    offset resume are native. Requires the spark-sql-kafka package on
    the classpath (not present in this container — construction works,
    ``to_df`` will raise at analysis without the jar)."""

    def __init__(self, brokers: list[str], topics: list[str], starting_offsets: str = "earliest", streaming: bool = True) -> None:
        self.brokers, self.topics, self.starting_offsets, self.streaming = brokers, topics, starting_offsets, streaming

    def to_df(self) -> DataFrame:
        spark = self._spark()
        reader = spark.readStream if self.streaming else spark.read
        return (
            reader.format("kafka")
            .option("kafka.bootstrap.servers", ",".join(self.brokers))
            .option("subscribe", ",".join(self.topics))
            .option("startingOffsets", self.starting_offsets)
            .load()
        )


class RandomMetricSource(Source):
    """Synthetic ``(metric_name, value)`` ticker (reference
    ``connectors/demo.py:52-102``): the ``rate`` source + projection."""

    def __init__(self, metric_name: str, rows_per_second: int = 10) -> None:
        self.metric_name, self.rps = metric_name, rows_per_second
        self.streaming = True

    def to_df(self) -> DataFrame:
        from pyspark.sql import functions as F

        spark = self._spark()
        return (
            spark.readStream.format("rate")
            .option("rowsPerSecond", self.rps)
            .load()
            .select(
                F.lit(self.metric_name).alias("metric_name"),
                F.col("timestamp").alias("ts"),
                (F.pmod(F.col("value"), F.lit(100)).cast("double")).alias("value"),
            )
        )


class SimplePollingSource(Source):
    """Poll a Python function on a fixed interval (reference
    ``pysrc/bytewax/inputs.py:285-452``): rate-source ticks drive a
    ``mapInPandas`` fetch; the trigger interval is the poll interval."""

    def __init__(self, getter: Any, interval_sec: int, schema: str) -> None:
        self.getter, self.interval_sec, self.schema = getter, interval_sec, schema
        self.streaming = True

    def to_df(self) -> DataFrame:
        import pandas as pd

        from pyspark.sql import functions as F

        spark = self._spark()
        if self.interval_sec >= 1:
            # One 1 Hz tick stream, keep every interval_sec-th tick —
            # exactly one fetch per interval (rate can't go below 1 Hz).
            ticks = spark.readStream.format("rate").option("rowsPerSecond", 1).load()
            ticks = ticks.filter(F.pmod(F.col("value"), F.lit(int(self.interval_sec))) == 0)
        else:
            # Sub-second interval: scale the tick rate up.
            rps = max(1, round(1.0 / float(self.interval_sec)))
            ticks = spark.readStream.format("rate").option("rowsPerSecond", rps).load()
        getter = self.getter

        def fetch(batches):
            for pdf in batches:
                for _ in range(len(pdf)):
                    yield pd.DataFrame([getter()])

        return ticks.mapInPandas(fetch, schema=self.schema)
