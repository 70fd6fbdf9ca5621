"""Frequent-itemset mining (pairs) and association rules — the
market-basket layer: which items co-occur in the same basket more than
``min_support`` times, and which co-occurrences are predictive
(confidence / lift). In a training-data pipeline the same shape finds
correlated tags, co-cited documents, or template phrases that travel
together.

Scale shape: baskets dedup to distinct (basket, item) rows first (one
count per co-PRESENCE, not per row); the pair generation is a
self-equi-join ON THE BASKET KEY, so work is Σ|basket|² — bounded by
basket size, never corpus size (a pathological mega-basket is a data
bug; cap upstream with ``topk.cap_rows_per_group``). Support counts
then aggregate with map-side combine on (a, b) pairs, and the support
threshold prunes before rules are scored. Rule scoring joins the tiny
frequent-pair table against per-item counts — broadcast-sized by
construction (it passed ``min_support``). Lift's float division is
IEEE-exact (same op order on any engine); only rounding for repr.

Parity note: no reference counterpart (SURVEY.md §2.7) — part of the
beyond-reference analytics layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["frequent_pairs", "association_rules"]


def _presence(df: DataFrame, basket_col: str, item_col: str) -> DataFrame:
    return df.select(
        F.col(basket_col).alias("_bk"), F.col(item_col).alias("_it")
    ).distinct()


def frequent_pairs(
    df: DataFrame, basket_col: str, item_col: str, min_support: int = 2
) -> DataFrame:
    """(item_a, item_b, support) — unordered item pairs (a < b) that
    co-occur in at least ``min_support`` distinct baskets."""
    if min_support < 1:
        raise ValueError(f"min_support must be >= 1, got {min_support}")
    p = _presence(df, basket_col, item_col)
    a = p.select("_bk", F.col("_it").alias("item_a"))
    b = p.select("_bk", F.col("_it").alias("item_b"))
    return (
        a.join(b, "_bk")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= min_support)
    )


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    min_confidence: float = 0.0,
) -> DataFrame:
    """(antecedent, consequent, support, confidence, lift) — both
    directions of every frequent pair:

        confidence(a → b) = support(a, b) / support(a)
        lift(a → b)       = confidence / (support(b) / n_baskets)

    lift > 1 means the pair co-occurs more than independence predicts.
    Confidence/lift are exact-int ratios evaluated once in IEEE double
    (engine-portable), rounded to 9 for repr."""
    if not 0.0 <= min_confidence <= 1.0:
        raise ValueError(f"min_confidence must be in [0, 1], got {min_confidence}")
    p = _presence(df, basket_col, item_col)
    item_n = p.groupBy(F.col("_it")).agg(F.count(F.lit(1)).alias("_n"))
    n_baskets = p.agg(F.count_distinct("_bk").alias("_nb"))
    pairs = frequent_pairs(df, basket_col, item_col, min_support)
    # emit both directions, then attach antecedent/consequent counts
    both = pairs.select(
        F.col("item_a").alias("antecedent"),
        F.col("item_b").alias("consequent"),
        "support",
    ).unionByName(
        pairs.select(
            F.col("item_b").alias("antecedent"),
            F.col("item_a").alias("consequent"),
            "support",
        )
    )
    na = item_n.select(F.col("_it").alias("antecedent"), F.col("_n").alias("_na"))
    nc = item_n.select(F.col("_it").alias("consequent"), F.col("_n").alias("_nc"))
    conf = F.col("support").cast("double") / F.col("_na").cast("double")
    lift = conf / (F.col("_nc").cast("double") / F.col("_nb").cast("double"))
    return (
        both.join(na, "antecedent")
        .join(nc, "consequent")
        .join(F.broadcast(n_baskets))
        .select(
            "antecedent",
            "consequent",
            "support",
            F.round(conf, 9).alias("confidence"),
            F.round(lift, 9).alias("lift"),
        )
        .filter(F.col("confidence") >= min_confidence)
    )
