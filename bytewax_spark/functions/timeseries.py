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

__all__ = ["gapfill_ffill"]


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
