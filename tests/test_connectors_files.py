"""File-family connector round-trips (reference
``pytests/connectors/test_files.py`` shapes: csv rows, blank lines,
dir-of-files partitions, key-routed dir output)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bytewax_spark import operators as op
from bytewax_spark.dataflow import Dataflow
from bytewax_spark.sinks import CSVSink, DirSink, ParquetSink
from bytewax_spark.sources import CSVSource, DirSource, FileSource, JSONSource


def test_csv_roundtrip(spark, tmp_path):
    src = tmp_path / "in.csv"
    src.write_text("name,score\nalice,3\nbob,7\n")
    flow = Dataflow("csv")
    s = op.input("in", flow, CSVSource(str(src), schema="name string, score long"))
    high = op.filter("hi", s, F.col("score") > 4)
    got = [(r["name"], r["score"]) for r in high.df.collect()]
    assert got == [("bob", 7)]

    out_dir = str(tmp_path / "out")
    CSVSink(out_dir).write_batch(high.df)
    back = spark.read.schema("name string, score long").csv(out_dir, header=True)
    assert [(r["name"], r["score"]) for r in back.collect()] == [("bob", 7)]


def test_file_source_blank_lines(spark, tmp_path):
    """Reference fixture blank-lines.txt: blank lines are rows too
    (the reference yields them; filtering is the user's call)."""
    src = tmp_path / "lines.txt"
    src.write_text("alpha\n\nbeta\n")
    flow = Dataflow("file")
    s = op.input("in", flow, FileSource(str(src)))
    lines = [r["line"] for r in s.df.collect()]
    assert sorted(lines) == ["", "alpha", "beta"]


def test_dir_source_partition_per_file(spark, tmp_path):
    d = tmp_path / "logs"
    d.mkdir()
    (d / "a.txt").write_text("one\ntwo\n")
    (d / "b.txt").write_text("three\n")
    flow = Dataflow("dir")
    s = op.input("in", flow, DirSource(str(d), glob="*.txt"))
    assert sorted(r["line"] for r in s.df.collect()) == ["one", "three", "two"]


def test_json_source(spark, tmp_path):
    src = tmp_path / "in.jsonl"
    src.write_text('{"k": "a", "v": 1}\n{"k": "b", "v": 2}\n')
    flow = Dataflow("json")
    s = op.input("in", flow, JSONSource(str(src), schema="k string, v long"))
    assert sorted((r["k"], r["v"]) for r in s.df.collect()) == [("a", 1), ("b", 2)]


def test_dir_sink_key_routing(spark, tmp_path):
    """DirSink hash-routes each key's rows to one file (reference
    adler32 part_fn: a key's output is never split across files)."""
    import csv
    import glob

    flow = Dataflow("dsink")
    from bytewax_spark.sources import TestingSource

    s = op.input("in", flow, TestingSource([("a", 1), ("b", 2), ("a", 3)], schema="k string, v long"))
    out_dir = str(tmp_path / "routed")
    DirSink(out_dir, "k", num_files=2).write_batch(s.df)
    back = spark.read.schema("k string, v long").csv(out_dir, header=True)
    assert sorted((r["k"], r["v"]) for r in back.collect()) == [("a", 1), ("a", 3), ("b", 2)]
    # consistent routing: each key appears in exactly one part file
    seen: dict[str, set] = {}
    for part in glob.glob(f"{out_dir}/part-*.csv"):
        with open(part) as fh:
            for row in csv.DictReader(fh):
                seen.setdefault(row["k"], set()).add(part)
    assert all(len(files) == 1 for files in seen.values())


def test_parquet_sink_roundtrip(spark, tmp_path):
    flow = Dataflow("psink")
    from bytewax_spark.sources import TestingSource

    s = op.input("in", flow, TestingSource([(1, "x")], schema="i long, s string"))
    out_dir = str(tmp_path / "pq")
    ParquetSink(out_dir).write_batch(s.df)
    assert [(r["i"], r["s"]) for r in spark.read.parquet(out_dir).collect()] == [(1, "x")]


def test_orc_sink_source_roundtrip(spark, tmp_path):
    from bytewax_spark.sinks import OrcSink
    from bytewax_spark.sources import OrcSource

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], "id long, s string, v double"
    )
    path = str(tmp_path / "orc_t")
    OrcSink(path).write_batch(df)
    got = sorted(
        (r.id, r.s, r.v) for r in OrcSource(path).to_df().collect()
    )
    assert got == [(1, "a", 1.5), (2, "b", 2.5)]


def test_orc_source_prunes_columns(spark, tmp_path):
    from bytewax_spark.sinks import OrcSink
    from bytewax_spark.sources import OrcSource

    df = spark.createDataFrame([(i, "x" * 10, float(i)) for i in range(100)],
                               "id long, s string, v double")
    path = str(tmp_path / "orc_p")
    OrcSink(path).write_batch(df)
    plan = (
        OrcSource(path).to_df().select("id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ReadSchema: struct<id:bigint>" in plan


def test_orc_streaming_roundtrip(spark, tmp_path):
    from bytewax_spark.sinks import OrcSink
    from bytewax_spark.sources import OrcSource

    df = spark.createDataFrame([(1, "a")], "id long, s string")
    path = str(tmp_path / "orc_s")
    OrcSink(path).write_batch(df)
    sdf = OrcSource(path, streaming=True).to_df()
    assert sdf.isStreaming
    out_path = str(tmp_path / "orc_out")
    q = OrcSink(out_path).write_stream(
        sdf, checkpoint=str(tmp_path / "ckpt")
    )
    q.awaitTermination()
    got = [(r.id, r.s) for r in spark.read.orc(out_path).collect()]
    assert got == [(1, "a")]
