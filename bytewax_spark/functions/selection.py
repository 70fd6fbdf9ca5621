"""Quality-ranked selection under a global token budget.

"Give me the best N-billion tokens" is the curation step after
filtering/dedup: rank documents by a quality score and keep the top of
the ranking until the token budget is spent. The running total over
the quality ordering reuses :func:`packing.prefix_sum` — the two-phase
distributed scan — so there is no single-partition global window; the
range partitioner parallelizes the quality sort exactly like any
``ORDER BY`` at scale.

Determinism: ties in the score break on the id, so the selected set is
unique and reproducible — an oracle reproduces it with one SQL window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bytewax_spark.functions.packing import prefix_sum

__all__ = ["select_token_budget", "waterfill_budget"]


def select_token_budget(
    df: DataFrame,
    id_col: str,
    len_col,
    quality_col,
    budget: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """Highest-quality documents whose cumulative token count fits in
    ``budget``: ``(id, quality, n_tokens, cum_tokens)`` sorted-set
    semantics (descending quality, ascending id tiebreak; a doc is kept
    only if it fits entirely).

    ``len_col`` / ``quality_col`` may be column names or expressions
    (e.g. ``text.token_count(...)`` / ``text.quality_score(...)``)."""
    if budget < 0:
        raise ValueError(f"budget must be non-negative, got {budget}")
    lv = F.col(len_col) if isinstance(len_col, str) else len_col
    qv = F.col(quality_col) if isinstance(quality_col, str) else quality_col
    base = df.select(
        F.col(id_col),
        qv.cast("double").alias("quality"),
        lv.cast("long").alias("n_tokens"),
    )
    cum = prefix_sum(
        base,
        [(F.col("quality"), "desc"), F.col(id_col)],
        "n_tokens",
        "cum_tokens",
        num_partitions,
    )
    return cum.filter(F.col("cum_tokens") <= budget).select(
        id_col, "quality", "n_tokens", "cum_tokens"
    )


def waterfill_budget(
    df: DataFrame,
    group_col: str,
    size_col,
    budget: int,
) -> DataFrame:
    """Max-min fair (water-filling) token-budget allocation across
    groups: every group gets ``min(size, waterline)`` tokens, with the
    integer waterline chosen as large as possible while the total stays
    within ``budget`` — small domains pass through whole, large domains
    are capped at a COMMON ceiling instead of pro-rata (which would
    starve small domains). The standard fair-allocation rule for
    per-source token budgets in mixture construction.

    Returns ``(group, size, alloc, waterline)``; ``size`` is the
    group's summed ``size_col``. Exact integer semantics: waterline =
    max {w : Σ min(size_i, w) <= budget}; the sub-waterline remainder
    (< number of uncapped groups) stays unallocated — deterministic,
    oracle-checkable, no fractional tokens.

    Scale shape: one map-side-combined aggregation to ONE ROW PER
    GROUP, then a window prefix-scan over those G rows (G = domain
    count — thousands at most, bounded the same way domain_mixture's
    driver collect is), and a single collected row fixes the waterline
    as a plan literal. The corpus itself is never re-shuffled."""
    if budget < 0:
        raise ValueError(f"budget must be non-negative, got {budget}")
    from pyspark.sql import Window

    sv = F.col(size_col) if isinstance(size_col, str) else size_col
    g = df.groupBy(F.col(group_col)).agg(
        F.sum(sv.cast("long")).alias("size")
    )
    # G-row window scan (bounded: one row per group)
    w = Window.orderBy("size", group_col).rowsBetween(Window.unboundedPreceding, 0)
    wk = Window.orderBy("size", group_col)
    ranked = (
        g.withColumn("_p", F.sum("size").over(w))
        .withColumn("_k", F.row_number().over(wk))
        .withColumn("_g", F.count(F.lit(1)).over(Window.partitionBy()))
    )
    # filling every group up to the k-th size uses _p + (G-k)*size_k
    ranked = ranked.withColumn(
        "_used", F.col("_p") + (F.col("_g") - F.col("_k")) * F.col("size")
    )
    feasible = (
        ranked.filter(F.col("_used") <= budget)
        .orderBy(F.col("_k").desc())
        .select("_k", "_g", "size", "_used")
        .limit(1)
        .collect()
    )
    if not feasible:
        n_groups = ranked.select(F.max("_g")).collect()[0][0] or 0
        waterline = budget // n_groups if n_groups else 0
    else:
        r = feasible[0]
        if r["_k"] == r["_g"]:
            waterline = r["size"]  # whole corpus fits: cap at max size
        else:
            waterline = r["size"] + (budget - r["_used"]) // (r["_g"] - r["_k"])
    return g.select(
        F.col(group_col),
        "size",
        F.least(F.col("size"), F.lit(int(waterline)).cast("long")).alias("alloc"),
        F.lit(int(waterline)).cast("long").alias("waterline"),
    )
