"""Time-series regularization — gap-fill to a fixed grid with
forward-fill. The standard prep step before windowed feature
extraction or charting: real event streams have holes; models and
joins want one row per (key, bucket).

Pure DataFrame ops: per-key min/max bucket (one aggregation),
``sequence`` explodes the dense grid (bounded by the key's own time
span — no cross join against a global calendar), left join re-attaches
observations, and forward-fill is ``last(ignorenulls)`` over a per-key
ordered window. At 100 TB the window partitions by key — millions of
small partitions, never a global sort; grid rows are (key, ts) pairs.

Parity note: the reference has no time-series regularization surface;
this module is part of the beyond-reference layer (SURVEY.md §2.7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["gapfill_ffill", "trailing_agg"]


def trailing_agg(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    val_col,
    span,
    out_col: str = "trailing",
    agg: str = "sum",
    decimals: int = 6,
) -> DataFrame:
    """Per-row trailing event-time aggregate: for every row, ``agg`` of
    the key's values in the window ``[ts - span, ts]`` (inclusive both
    ends, RANGE semantics — simultaneous events all count). The rolling
    feature shape: '7-day trailing spend per user', 'requests in the
    last hour per client'.

    ``span`` is a ``datetime.timedelta``. Implemented as a RANGE-frame
    window over ``unix_micros(ts)`` partitioned by key — per-key
    partitions (millions of small sorts, never a global one), and the
    range frame means Spark keeps a sliding buffer of just the span's
    rows per key. ``agg``: ``sum`` | ``count`` | ``min`` | ``max``
    (``sum`` rounds to ``decimals`` — trailing double sums are frame
    evaluations whose internal order differs across engines; min/max/
    count are exact)."""
    from datetime import timedelta

    if not isinstance(span, timedelta) or span <= timedelta(0):
        raise ValueError(f"span must be a positive timedelta, got {span!r}")
    val = F.col(val_col) if isinstance(val_col, str) else val_col
    span_us = int(span.total_seconds() * 1_000_000)
    base = df.withColumn("_us", F.unix_micros(F.col(ts_col).cast("timestamp")))
    w = (
        Window.partitionBy(key_col)
        .orderBy("_us")
        .rangeBetween(-span_us, 0)
    )
    aggs = {
        "sum": lambda: F.round(F.sum(val).over(w), decimals),
        "count": lambda: F.count(F.lit(1)).over(w),
        "min": lambda: F.min(val).over(w),
        "max": lambda: F.max(val).over(w),
    }
    if agg not in aggs:
        raise ValueError(f"agg must be one of {sorted(aggs)}, got {agg!r}")
    return base.withColumn(out_col, aggs[agg]()).drop("_us")


def gapfill_ffill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    val_col,
    bucket: str = "hour",
    out_col: str = "value",
) -> DataFrame:
    """One row per (key, time bucket) from the key's first to last
    observation; missing buckets carry the last seen value forward.

    ``val_col`` is aggregated per bucket with ``sum`` and rounded to 4
    decimals BEFORE filling, so filled values are bit-stable across
    engines and partitionings. Buckets ahead of a key's first
    observation cannot exist (the grid starts at the key's min), so
    the fill never fabricates leading values."""
    val = F.col(val_col) if isinstance(val_col, str) else val_col
    per_bucket = (
        df.select(
            F.col(key_col), F.date_trunc(bucket, F.col(ts_col)).alias("_h"), val.alias("_v")
        )
        .groupBy(key_col, "_h")
        .agg(F.round(F.sum("_v"), 4).alias("_v"))
    )
    grid = (
        per_bucket.groupBy(key_col)
        .agg(F.min("_h").alias("_lo"), F.max("_h").alias("_hi"))
        .select(
            key_col,
            F.explode(
                F.sequence(F.col("_lo"), F.col("_hi"), F.expr(f"interval 1 {bucket}"))
            ).alias("_h"),
        )
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy("_h")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        grid.join(per_bucket, [key_col, "_h"], "left")
        .select(
            key_col,
            F.col("_h").alias(bucket),
            F.last("_v", ignorenulls=True).over(w).alias(out_col),
        )
    )
