"""Per-group top-k selection that survives skewed groups.

The naive per-group top-k — ``row_number() OVER (PARTITION BY group
ORDER BY ...) <= k`` — shuffles every row of a group to one reducer
and sorts it there. At 100 TB a hot group (one web domain with a
billion pages) pins a single task for hours. These operators rank in
two phases instead:

1. rank within ``(group, subbucket)`` where ``subbucket = hash % fanout``
   and keep ≤ k per subbucket — any group is now bounded to
   ``fanout * k`` surviving rows, however large it was;
2. final rank within ``group`` over those survivors.

Both phases order by the same total order (the caller's sort spec,
ties broken by a unique tie column), so the result is EXACTLY the k
first rows per group under that order — the composition is lossless
because each of a group's true top-k rows is also within the top-k of
its own subbucket. Cost: two shuffles, but the second one moves at
most ``fanout * k`` rows per group instead of the whole group.

Uses (curation at scale):

- ``cap_per_group`` — RefinedWeb-style per-domain document caps,
  decided by deterministic hash priority so re-runs keep the same
  documents (composes with ``sampling.sample_by_hash`` decisions).
- ``heavy_hitters`` — exact per-group most-frequent items (the
  aggregate-then-rank shape; the rank input is already one row per
  (group, item), the two-phase rank bounds hot groups with millions
  of distinct items).

Parity note: the reference has no ranking operators (SURVEY.md §2.7);
this module is part of the beyond-reference LLM-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import hash64

__all__ = ["top_k_per_group", "cap_per_group", "heavy_hitters"]


def top_k_per_group(
    df: DataFrame,
    group_col: str,
    order_by: list[Column],
    tie_col: str,
    k: int,
    fanout: int = 64,
) -> DataFrame:
    """Keep the first ``k`` rows of each group under ``order_by`` (ties
    broken by ``tie_col`` ascending — pass a unique column so the
    result is deterministic). Two-phase rank; see module docstring.

    ``fanout`` bounds phase 2's per-group input to ``fanout * k`` rows;
    raise it only if a single subbucket of a hot group (≈ group_size /
    fanout rows) is still too big to sort in one task."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    if fanout <= 0:
        raise ValueError(f"fanout must be positive, got {fanout}")
    order = [*order_by, F.col(tie_col).asc()]
    sub = hash64(F.col(tie_col).cast("string")) % fanout
    w1 = Window.partitionBy(F.col(group_col), sub).orderBy(*order)
    w2 = Window.partitionBy(F.col(group_col)).orderBy(*order)
    return (
        df.withColumn("_rk1", F.row_number().over(w1))
        .filter(F.col("_rk1") <= k)
        .withColumn("_rk2", F.row_number().over(w2))
        .filter(F.col("_rk2") <= k)
        .drop("_rk1", "_rk2")
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    key_col: str,
    cap: int,
    salt: str = "",
    fanout: int = 64,
) -> DataFrame:
    """Keep at most ``cap`` rows per group — the ``cap`` rows with the
    smallest ``hash64(salt || key)`` (a deterministic priority, so
    re-runs and backfills keep the same rows; different ``salt`` values
    decorrelate independent caps on the same keys).

    This is the per-domain document cap of web-corpus curation: a
    domain with 10 M pages contributes exactly ``cap`` of them, chosen
    stably, while domains under the cap pass through whole."""
    h = hash64(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    return top_k_per_group(
        df, group_col, order_by=[h.asc()], tie_col=key_col, k=cap, fanout=fanout
    )


def heavy_hitters(
    df: DataFrame,
    group_col: str,
    item_col: str,
    k: int,
    fanout: int = 64,
) -> DataFrame:
    """Exact top-``k`` most frequent ``item_col`` values per group →
    ``(group, item, cnt)``. Aggregate first (partial map-side combine:
    the shuffle carries one row per (group, item) per partition, never
    raw rows), then two-phase rank the counts. Ties on count break
    toward the lexicographically smaller item, so output is total-order
    deterministic and oracle-checkable."""
    counts = df.groupBy(
        F.col(group_col), F.col(item_col)
    ).agg(F.count(F.lit(1)).alias("cnt"))
    return top_k_per_group(
        counts,
        group_col,
        order_by=[F.col("cnt").desc()],
        tie_col=item_col,
        k=k,
        fanout=fanout,
    )
