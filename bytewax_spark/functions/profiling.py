"""Table profiling — the data-quality census run before a corpus is
trusted: per-column null counts, exact distinct cardinalities, and
string-length statistics, in ONE aggregation pass over the table.

Scale posture: a single global aggregation; the multi-column exact
``count_distinct`` compiles to Spark's expand+aggregate (rows × a
small per-column expand factor, map-side partial aggregation — the
same plan SQL ``COUNT(DISTINCT a), COUNT(DISTINCT b)`` gets). For
100 TB-wide profiling swap exact distinct for the HLL register tables
in functions/sketches.py; this operator is the exact-answer form.
The average length is integer micro-units via int division — the
result is engine/order independent (float averages are not).

Parity note: the reference has no profiling surface; beyond-reference
layer per SURVEY.md §2.7.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pareto_report", "profile_table", "skew_report"]


def profile_table(df: DataFrame, columns: Sequence[str] | None = None) -> DataFrame:
    """Long-form profile: one row per column with
    ``(column, n_rows, n_nulls, n_distinct, min_len, max_len,
    avg_len_micro)``. Length metrics apply to string columns (NULL for
    other types); ``n_distinct`` counts non-null distinct values;
    ``avg_len_micro`` is ``(sum_len · 10⁶) div count_non_null`` — an
    exact integer.

    Everything is computed in one ``agg`` so the table is scanned
    once regardless of column count."""
    cols = list(columns) if columns is not None else list(df.columns)
    if not cols:
        raise ValueError("profile_table needs at least one column")
    types = dict(df.dtypes)
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        col = F.col(c)
        aggs.append(F.sum(col.isNull().cast("long")).alias(f"_nulls_{c}"))
        aggs.append(F.count_distinct(col).alias(f"_dist_{c}"))
        if types.get(c) == "string":
            aggs.append(F.min(F.length(col)).alias(f"_minl_{c}"))
            aggs.append(F.max(F.length(col)).alias(f"_maxl_{c}"))
            aggs.append(F.sum(F.length(col).cast("long")).alias(f"_suml_{c}"))
            aggs.append(F.sum(col.isNotNull().cast("long")).alias(f"_nn_{c}"))
    wide = df.agg(*aggs)
    parts = []
    for c in cols:
        if types.get(c) == "string":
            lens = (
                f"cast(_minl_{c} as int), cast(_maxl_{c} as int), "
                f"case when _nn_{c} > 0 then (_suml_{c} * 1000000L) div _nn_{c} end"
            )
        else:
            lens = "cast(null as int), cast(null as int), cast(null as bigint)"
        parts.append(f"'{c}', _n, _nulls_{c}, _dist_{c}, {lens}")
    stack = ", ".join(parts)
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack}) AS "
            "(column, n_rows, n_nulls, n_distinct, min_len, max_len, avg_len_micro)"
        )
    )


def skew_report(
    df: DataFrame, key_col: str | Sequence[str], top: int = 10
) -> DataFrame:
    """Shuffle-key skew diagnosis — run BEFORE a big join/groupBy to
    know whether the key needs salting: the ``top`` heaviest keys with
    ``(rank, <key cols>, cnt, share_micro, skew_micro)``.
    ``share_micro`` = key's row share in ppm; ``skew_micro`` =
    ``cnt * n_keys / n_rows`` in micro-units — 1e6 means perfectly
    uniform, 50e6 means this key carries 50x its fair share (the
    partition that stalls the stage). Scale: one map-side-combined
    count per key, one broadcast one-row total, TakeOrdered(top) — no
    global sort."""
    from pyspark.sql import functions as F

    keys = [key_col] if isinstance(key_col, str) else list(key_col)
    if top < 1:
        raise ValueError(f"top must be >= 1, got {top}")
    cnt = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("cnt"))
    tot = cnt.agg(
        F.sum("cnt").alias("_rows"), F.count(F.lit(1)).alias("_keys")
    )
    ranked = (
        cnt.orderBy(F.desc("cnt"), *[F.asc(k) for k in keys])
        .limit(top)
        .join(F.broadcast(tot))
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("cnt"), *[F.asc(k) for k in keys])
    # integer floor division (`div`) — a double divide + cast would
    # round on one engine and truncate on the other
    return ranked.select(
        F.row_number().over(w).alias("rank"),
        *keys,
        "cnt",
        F.expr("(cnt * 1000000L) div _rows").alias("share_micro"),
        F.expr("(cnt * 1000000L * _keys) div _rows").alias("skew_micro"),
    )


def pareto_report(
    df: "DataFrame",
    key_col,
    val_col: str,
    coverage_micro: int = 800_000,
) -> "DataFrame":
    """Pareto / contribution analysis: the smallest set of keys (by
    descending total of ``val_col``, an int64 measure — quantize floats
    to micros upstream) whose cumulative share reaches
    ``coverage_micro`` ppm of the grand total — "which 20% of suppliers
    carry 80% of revenue". Returns the covering prefix as
    ``(rank, <keys>, total, share_micro, cum_share_micro)``; the last
    row is the one that crosses the threshold.

    Scale: one map-side-combined sum per key (the only full-data
    shuffle), then the cumulative window runs over the KEY table —
    bounded by distinct-key count, not row count. Ordering is total
    ``(sum desc, key asc)`` so the report is deterministic under ties;
    all shares are integer ``div`` so both engines agree bitwise."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    keys = [key_col] if isinstance(key_col, str) else list(key_col)
    if not 0 < coverage_micro <= 1_000_000:
        raise ValueError(f"coverage_micro must be in (0, 1e6], got {coverage_micro}")
    sums = df.groupBy(*keys).agg(F.sum(F.col(val_col)).alias("total"))
    tot = sums.agg(F.sum("total").alias("_g"))
    w = Window.orderBy(F.desc("total"), *[F.asc(k) for k in keys])
    order = "order by total desc, " + ", ".join(f"{k} asc" for k in keys)
    # totals are int64 micros, so total*1e6 overflows int64 — widen to
    # DECIMAL(38,0) for the share numerators (exact, engine-portable)
    ranked = sums.join(F.broadcast(tot)).select(
        F.row_number().over(w).alias("rank"),
        *keys,
        "total",
        F.expr(
            "CAST((CAST(total AS DECIMAL(38,0)) * 1000000) div _g AS LONG)"
        ).alias("share_micro"),
        F.expr(
            f"CAST((CAST(sum(total) over ({order}) AS DECIMAL(38,0))"
            " * 1000000) div _g AS LONG)"
        ).alias("cum_share_micro"),
    )
    # keep rows whose PRECEDING cumulative is still below the target —
    # the crossing row is included, everything after it is not
    return ranked.filter(
        F.col("cum_share_micro") - F.col("share_micro") < coverage_micro
    )
