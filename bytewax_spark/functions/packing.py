"""Sequence packing — concatenate documents into fixed-length training
sequences (the standard LLM pretraining layout: docs joined end to end
in a deterministic order, the token stream cut every ``seq_len``
tokens, documents spanning a cut split across sequences).

The core primitive is a **distributed prefix sum**. A naive
``Window.orderBy(id)`` with no partition key collapses the whole table
into ONE task — the classic Spark scale trap. Instead:

1. range-repartition by id (ascending partition ranges) and sort
   within partitions;
2. per-partition running sum via a window PARTITIONED by
   ``spark_partition_id()`` (parallel);
3. per-partition totals (one row per partition) come to the driver —
   thousands of values, not rows — are prefix-summed there, and the
   offsets broadcast-join back on partition id.

The result — each doc's global token offset in id order — is
independent of the partition count or boundaries, so output is
deterministic and oracle-checkable while every heavy step stays
parallel at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["prefix_sum", "pack_sequences", "chunk_documents"]


def prefix_sum(
    df: DataFrame,
    order_col: str | list,
    val_col,
    out_col: str = "cum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``out_col`` = running sum of ``val_col`` in ``order_col``
    order (inclusive), computed with the two-phase parallel scheme
    above. ``order_col`` is one column name or a list of columns
    (names or Column expressions, ``.desc()`` allowed); the combination
    must be unique — it defines the total order.

    The only driver-side materialization is one row per partition.
    """
    val = F.col(val_col) if isinstance(val_col, str) else val_col
    order_cols = order_col if isinstance(order_col, list) else [order_col]
    order_cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    d = (
        df.withColumn("_v", val.cast("long"))
        .repartitionByRange(parts, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
    )
    d = d.localCheckpoint(eager=True)  # pin partitioning: _pid must not recompute
    w = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    d = d.withColumn("_local_cum", F.sum("_v").over(w))
    totals = sorted(
        (r["_pid"], r["_t"])
        for r in d.groupBy("_pid").agg(F.sum("_v").alias("_t")).collect()
    )
    offsets, acc = [], 0
    for pid, tot in totals:
        offsets.append((pid, acc))
        acc += tot or 0
    off_df = d.sparkSession.createDataFrame(offsets, "_pid int, _off long")
    return (
        d.join(F.broadcast(off_df), "_pid")
        .withColumn(out_col, F.col("_off") + F.col("_local_cum"))
        .drop("_pid", "_v", "_local_cum", "_off")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    len_col,
    seq_len: int,
    sep_tokens: int = 0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign every document a slice of fixed-length training
    sequences: ``(id, seq_id, begin, end, seq_offset)`` where
    ``[begin, end)`` is the token span of the doc placed in sequence
    ``seq_id`` at position ``seq_offset``. Docs longer than ``seq_len``
    span several sequences; zero-length docs are dropped.

    ``sep_tokens`` reserves separator tokens (e.g. one EOS) after each
    document in the stream. Deterministic in ``id_col`` order."""
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    val = F.col(len_col) if isinstance(len_col, str) else len_col
    base = df.select(F.col(id_col), val.cast("long").alias("_len")).filter(
        F.col("_len") > 0
    )
    cum = prefix_sum(
        base, id_col, F.col("_len") + sep_tokens, "_cum", num_partitions
    )
    # doc payload occupies global tokens [_cum - _len - sep, _cum - sep)
    start = F.col("_cum") - F.col("_len") - F.lit(sep_tokens)
    end = F.col("_cum") - F.lit(sep_tokens)
    spanned = cum.select(
        id_col,
        "_len",
        start.alias("_start"),
        F.explode(
            F.sequence(
                F.floor(start / seq_len).cast("long"),
                F.floor((end - 1) / seq_len).cast("long"),
            )
        ).alias("seq_id"),
    )
    seq_lo = F.col("seq_id") * seq_len
    begin = F.greatest(F.lit(0).cast("long"), seq_lo - F.col("_start"))
    fin = F.least(F.col("_len"), seq_lo + seq_len - F.col("_start"))
    return spanned.select(
        id_col,
        "seq_id",
        begin.alias("begin"),
        fin.alias("end"),
        F.greatest(F.lit(0).cast("long"), F.col("_start") - seq_lo).alias("seq_offset"),
    )


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_tokens: int,
    stride: int | None = None,
) -> DataFrame:
    """Split each document into token windows of at most ``max_tokens``
    tokens, starting every ``stride`` tokens (``stride < max_tokens``
    ⇒ overlapping windows, the RAG-embedding layout; default
    ``stride = max_tokens`` ⇒ disjoint chunks, the context-length
    layout). Returns ``(id, chunk_id, chunk_text, n_tokens)``; docs
    with zero tokens produce no chunks.

    Unlike ``pack_sequences`` (which lays docs into a GLOBAL token
    stream and needs a distributed prefix sum), chunking is per-row:
    tokenize → ``sequence`` of window starts → ``posexplode`` + slice,
    all inside one codegen stage — embarrassingly parallel, no
    shuffle, runs at scan rate on 100 TB."""
    if max_tokens <= 0:
        raise ValueError(f"max_tokens must be positive, got {max_tokens}")
    stride = max_tokens if stride is None else stride
    if stride <= 0:
        raise ValueError(f"stride must be positive, got {stride}")
    from bytewax_spark.functions.text import tokenize

    base = df.select(F.col(id_col), tokenize(text_col).alias("_toks"))
    n = F.size(F.col("_toks"))
    starts = F.when(
        n > 0, F.sequence(F.lit(0), n - 1, F.lit(stride))
    ).otherwise(F.array().cast("array<int>"))
    chunk = F.slice(F.col("_toks"), F.col("_start") + 1, max_tokens)
    return (
        base.select(
            F.col(id_col),
            F.col("_toks"),
            F.posexplode(starts).alias("chunk_id", "_start"),
        )
        .select(
            id_col,
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.array_join(chunk, " ").alias("chunk_text"),
            F.size(chunk).cast("long").alias("n_tokens"),
        )
    )
