#!/usr/bin/env python
"""Synthesize a scaled benchmark dataset (default 10x of sf0.1 ~= sf1)
by key-shifted unions of the driver testdata — BASELINE.md's "10x
scale check", made reproducible and cached.

Facts (lineitem/orders/customer/events/documents/embeddings) get
``copies`` key-shifted replicas: every key column is offset by
``i * (max_key + 1)`` per replica, so key cardinality scales with the
data (grouped aggs/joins see 10x keys, not 10x-deeper groups — the
honest scale-up for shuffle-bound plans). Dimensions (nation/region/
supplier/part) are copied as-is, exactly like a real TPC-H scale-up
keeps dims tiny relative to facts.

Output is written once (parquet, Spark-partitioned) and cached behind
a _BENCHDATA_OK marker; bench.py calls ``ensure(spark)`` lazily.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".benchdata", "sf1")

# table -> columns to key-shift per replica
_FACT_SHIFTS = {
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey"],
    "customer": ["c_custkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
_DIMS = ["nation", "region", "supplier", "part"]


def _scaled(df: DataFrame, shift_cols: list[str], copies: int) -> DataFrame:
    """Union ``copies`` replicas, offsetting each key column by
    i * (max+1) — one tiny agg to find the offsets, then a pure
    narrow-map union (no shuffle)."""
    offsets = df.agg(*[(F.max(c) + 1).alias(c) for c in shift_cols]).first()
    out = None
    for i in range(copies):
        rep = df
        for c in shift_cols:
            rep = rep.withColumn(c, F.col(c) + F.lit(i * int(offsets[c])))
        out = rep if out is None else out.unionByName(rep)
    return out


def ensure(spark: SparkSession, src_dir: str = "/root/testdata/sf0.1",
           out_dir: str = DEFAULT_OUT, copies: int = 10) -> str:
    """Build the scaled dataset if absent; return its directory."""
    marker = os.path.join(out_dir, "_BENCHDATA_OK")
    if os.path.exists(marker):
        return out_dir
    from bytewax_spark.io import read_parquet

    os.makedirs(out_dir, exist_ok=True)
    for table, shift_cols in _FACT_SHIFTS.items():
        src = f"{src_dir}/{table}.parquet"
        if not os.path.exists(src):
            continue
        df = read_parquet(spark, src)
        _scaled(df, shift_cols, copies).write.mode("overwrite").parquet(
            f"{out_dir}/{table}.parquet"
        )
    for table in _DIMS:
        src = f"{src_dir}/{table}.parquet"
        if not os.path.exists(src):
            continue
        read_parquet(spark, src).write.mode("overwrite").parquet(f"{out_dir}/{table}.parquet")
    with open(marker, "w") as f:
        f.write(f"src={src_dir} copies={copies}\n")
    return out_dir


if __name__ == "__main__":
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bytewax_spark.session import get_spark

    out = ensure(get_spark("benchdata"))
    print(out)
