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

__all__ = ["select_token_budget"]


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
