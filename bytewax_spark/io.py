"""Table loading helpers.

``read_parquet`` handles parquet TIMESTAMP(NANOS) columns, which Spark
(4.x) cannot scan natively: it inspects the footer schema driver-side
(pyarrow — cheap, metadata only), enables
``spark.sql.legacy.parquet.nanosAsLong`` for the scan, and rewrites
each nano column to ``TIMESTAMP_NTZ`` via integer microsecond math
(``ts div 1000`` — long division, no double precision loss at 1e18
nanos). Pure column expressions: stays in codegen, pushdown on other
columns is unaffected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["read_parquet"]


def _nano_cols(path: str) -> list[str]:
    try:
        import pyarrow.dataset as ds

        schema = ds.dataset(path, format="parquet").schema
    except Exception:
        return []
    out = []
    for field in schema:
        t = field.type
        if str(t).startswith("timestamp[ns"):
            out.append(field.name)
    return out


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """``spark.read.parquet`` that tolerates nanosecond timestamps."""
    nanos = _nano_cols(path)
    if not nanos:
        return spark.read.parquet(path)
    key = "spark.sql.legacy.parquet.nanosAsLong"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "true")
    try:
        # Schema resolution happens here; the flag is only needed while
        # the relation is analyzed, so restore it before returning.
        df = spark.read.parquet(path)
        for c in nanos:
            df = df.withColumn(
                c, F.expr(f"CAST(timestamp_micros(`{c}` div 1000) AS TIMESTAMP_NTZ)")
            )
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    return df
