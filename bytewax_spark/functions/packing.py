"""Sequence packing — concatenate documents into fixed-length training
sequences (the standard LLM pretraining layout: docs joined end to end
in a deterministic order, the token stream cut every ``seq_len``
tokens, documents spanning a cut split across sequences).

The core primitive is a **distributed prefix sum**. A naive
``Window.orderBy(id)`` with no partition key collapses the whole table
into ONE task — the classic Spark scale trap. Instead:

1. derive a range-bucket id ``_pid`` from the VALUES of the leading
   order column: quantile boundaries (one bounded stats pass, frozen
   into plan literals) split the order domain into ``num_partitions``
   ascending ranges, and each row's bucket is a pure comparison
   against those literals — NO ``spark_partition_id()``, NO
   checkpoint. A recomputed row always lands in the same bucket, so
   the plan survives executor loss and speculative re-execution (the
   previous ``localCheckpoint(eager=True)`` pinned physical partition
   ids instead: a full extra materialization, and blocks living
   outside lineage meant ANY executor loss killed the job);
2. per-bucket running sum via a window PARTITIONED by ``_pid``
   (parallel);
3. per-bucket totals (one row per bucket) come to the driver —
   thousands of values, not rows — are prefix-summed there, and the
   offsets broadcast-join back on ``_pid``.

The result — each doc's global token offset in id order — is
independent of the bucket count or boundaries, so output is
deterministic and oracle-checkable while every heavy step stays
parallel at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["prefix_sum", "pack_sequences", "chunk_documents"]

_NUMERIC_PREFIXES = (
    "tinyint", "smallint", "int", "bigint", "float", "double", "decimal",
    "boolean", "date", "timestamp",
)


def _order_spec(item) -> tuple[Column | str, bool]:
    """Normalize one order-spec item to ``(column, is_desc)``.

    Accepted: a column name, a plain Column (ascending), or a
    ``(name_or_Column, "asc"|"desc")`` tuple. ``Column.desc()`` objects
    are rejected with a pointer to the tuple form — a SortOrder can't
    be re-used as a value expression for the range-bucket comparison."""
    if isinstance(item, tuple):
        col, direction = item
        if direction not in ("asc", "desc"):
            raise ValueError(f"direction must be 'asc' or 'desc', got {direction!r}")
        return col, direction == "desc"
    if isinstance(item, Column) and " DESC" in repr(item):
        raise ValueError(
            "pass descending order columns as (col, 'desc') tuples, not .desc()"
        )
    return item, False


def _range_bucket(pk: Column, dtype: str, boundaries: list, desc: bool) -> Column:
    """Bucket id from comparison against frozen boundary literals.

    Monotone in the order direction: every row of bucket p sorts
    before every row of bucket p+1 (ties with a boundary value group
    into one bucket — balance cost only, never order). Nulls take the
    edge bucket matching Spark's sort default (asc NULLS FIRST → 0,
    desc NULLS LAST → last)."""
    if not boundaries:
        return F.lit(0)
    arr = F.array(*[F.lit(b) for b in boundaries])
    if desc:
        cnt = F.size(F.filter(arr, lambda b: pk < b))
        null_bucket = len(boundaries)
    else:
        cnt = F.size(F.filter(arr, lambda b: pk > b))
        null_bucket = 0
    return F.when(pk.isNull(), F.lit(null_bucket)).otherwise(cnt)


def prefix_sum(
    df: DataFrame,
    order_col: str | list,
    val_col,
    out_col: str = "cum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``out_col`` = running sum of ``val_col`` in ``order_col``
    order (inclusive), computed with the two-phase parallel scheme
    above. ``order_col`` is one column name or a list of items — names,
    plain Columns, or ``(col, "asc"|"desc")`` tuples; the combination
    must be unique — it defines the total order.

    Driver-side materialization is bounded: ``num_partitions - 1``
    quantile boundaries of the LEADING order column (one stats pass,
    frozen into the plan as literals) plus one total row per bucket.
    Bucketing uses only the leading column, so rows tying on it stay in
    one bucket — the within-bucket window still sorts by the full
    spec, and cross-bucket order only needs the leading column.

    REQUIRES a DETERMINISTIC input DataFrame: the lineage executes
    more than once (quantile pass, per-bucket totals, final job), so
    an upstream ``rand()``/unseeded ``sample()``/
    ``monotonically_increasing_id()`` can move rows between buckets
    across jobs and silently corrupt the cumulative sums. Persist or
    checkpoint such an input before calling (this function stays
    checkpoint-free on purpose — the boundaries ride the plan as
    literals and survive executor loss)."""
    val = F.col(val_col) if isinstance(val_col, str) else val_col
    items = order_col if isinstance(order_col, list) else [order_col]
    spec = [_order_spec(i) for i in items]
    sort_cols = [
        (F.col(c) if isinstance(c, str) else c).desc()
        if is_desc
        else (F.col(c) if isinstance(c, str) else c)
        for c, is_desc in spec
    ]
    lead, lead_desc = spec[0]
    lead = F.col(lead) if isinstance(lead, str) else lead
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism

    # leading-column proxy: orderable double for the quantile pass.
    # numeric/temporal types cast monotonically; strings map to their
    # first-7-bytes big-endian value (order-homomorphic on UTF-8 binary
    # order; prefix ties group into one bucket — balance, not order).
    probe = df.select(lead.alias("_pk_raw"))
    dtype = probe.schema[0].dataType.simpleString()
    if dtype.startswith(_NUMERIC_PREFIXES):
        pk_expr = lead.cast("timestamp").cast("double") if dtype == "date" else lead.cast("double")
    elif dtype in ("string", "binary"):
        blob = lead if dtype == "binary" else F.encode(lead, "UTF-8")
        pk_expr = F.conv(F.hex(F.rpad(blob, 7, bytes([0]))), 16, 10).cast("double")
    else:
        raise ValueError(
            f"prefix_sum: unsupported leading order column type {dtype}"
        )
    if parts > 1:
        probs = [i / parts for i in range(1, parts)]
        boundaries = df.select(pk_expr.alias("_pk")).approxQuantile(
            "_pk", probs, 0.001
        )
    else:
        boundaries = []

    d = df.withColumn("_v", val.cast("long")).withColumn(
        "_pid", _range_bucket(pk_expr, dtype, boundaries, lead_desc)
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(*sort_cols)
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
