"""Hashed-feature text classification, trained and scored in SQL.

The CCNet / fastText-style corpus filter (Wenzek et al. 2020; Joulin
et al. 2017 — both public): a linear model over hashed token features
separates a TARGET distribution (Wikipedia, a trusted corpus, one
language) from the rest, and the per-document score becomes the
quality / domain signal that drives keep/drop and sampling decisions.

Spark-first shape — both phases are plain aggregations and one
broadcast join, no Python in the hot path:

- TRAIN (:func:`nb_train`): explode tokens → bucket by the hashing
  trick (``hash64(token) % 2^bits`` — the model size is CAPPED at
  ``2^bits`` rows no matter the vocabulary, Weinberger et al. 2009,
  public) → one groupBy counts each bucket's occurrences per class →
  per-bucket naive-Bayes log-odds weight. One shuffle of at most
  ``2^bits`` rows; 100 TB of text trains in a single
  map-side-combined pass.
- SCORE (:func:`nb_score`): explode tokens → bucket → broadcast-join
  the model (≤ ``2^bits`` rows — always broadcastable) → sum weights
  per document. The only shuffle is the per-document sum.

Exactness: weights are log-odds QUANTIZED TO INT64 MICRO before
summation — int sums are associative, so scores are bit-identical on
any engine/partitioning (a float Σ log p drifts with order), and a
SQL oracle reproduces every score. ``ln`` runs once per BUCKET (not
per token) on identically-constructed doubles.

The reference has no classification operators (SURVEY.md §2.7); this
module is part of the beyond-reference LLM-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..io import ensure_min_partitions as _spread

from .text import hash64, tokenize

__all__ = ["eval_confusion", "hashed_buckets", "nb_train", "nb_score"]


def hashed_buckets(c: Column | str, bits: int = 18) -> Column:
    """Token occurrences of ``c`` mapped to hashed feature buckets →
    ``array<bigint>`` in ``[0, 2^bits)``. ``hash64`` is md5-derived
    and non-negative, so plain modulo is engine-portable."""
    return F.transform(tokenize(c), lambda t: hash64(t) % F.lit(1 << bits))


def nb_train(
    df: DataFrame,
    text_col: str,
    label_col: Column | str,
    bits: int = 18,
    min_count: int = 1,
) -> DataFrame:
    """Train a binary naive-Bayes log-odds model over hashed token
    buckets → ``(bucket, c1, c0, w_micro)``, at most ``2^bits`` rows.

    ``label_col`` must evaluate to 0/1 (the target class is 1).
    ``w_micro = round(1e6 * ln(((c1+1) * (N0+V)) / ((c0+1) * (N1+V))))``
    — Laplace-smoothed class-conditional log-odds with ``V = 2^bits``,
    quantized to int64 so downstream sums are exact. Buckets with
    fewer than ``min_count`` total occurrences drop (noise floor and
    model-size control)."""
    y = (F.col(label_col) if isinstance(label_col, str) else label_col).cast(
        "bigint"
    )
    v = 1 << bits
    toks = _spread(df).select(
        y.alias("_y"), F.explode(hashed_buckets(text_col, bits)).alias("bucket")
    )
    per = toks.groupBy("bucket").agg(
        F.sum("_y").alias("c1"),
        F.sum(F.lit(1) - F.col("_y")).alias("c0"),
    )
    tot = per.agg(
        F.sum("c1").alias("_n1"), F.sum("c0").alias("_n0")
    ).withColumn("_k", F.lit(1))
    w = F.round(
        F.lit(1_000_000.0)
        * F.log(
            ((F.col("c1") + F.lit(1)).cast("double") * (F.col("_n0") + F.lit(v)))
            / ((F.col("c0") + F.lit(1)).cast("double") * (F.col("_n1") + F.lit(v)))
        )
    ).cast("bigint")
    return (
        per.filter(F.col("c1") + F.col("c0") >= min_count)
        .withColumn("_k", F.lit(1))
        .join(F.broadcast(tot), "_k")
        .select("bucket", "c1", "c0", w.alias("w_micro"))
    )


def nb_score(
    df: DataFrame,
    model: DataFrame,
    text_col: str,
    id_col: str,
    bits: int = 18,
    prior_micro: int = 0,
) -> DataFrame:
    """Score every document against a trained model →
    ``(id_col, score_micro, pred)`` with
    ``score_micro = prior_micro + Σ w_micro(bucket(token))`` over
    token OCCURRENCES (repeats count — the multinomial NB likelihood)
    and ``pred = score_micro > 0``. Unseen buckets contribute 0.

    The model join is an explicit broadcast (≤ ``2^bits`` rows by
    construction); documents with no tokens keep the bare prior via
    the left join back onto the id set."""
    toks = _spread(df).select(
        F.col(id_col), F.explode(hashed_buckets(text_col, bits)).alias("bucket")
    )
    scored = (
        toks.join(F.broadcast(model.select("bucket", "w_micro")), "bucket", "left")
        .groupBy(id_col)
        .agg(F.sum(F.coalesce(F.col("w_micro"), F.lit(0))).alias("_s"))
    )
    return df.select(id_col).join(scored, id_col, "left").select(
        id_col,
        (F.coalesce(F.col("_s"), F.lit(0)) + F.lit(prior_micro)).alias(
            "score_micro"
        ),
        (F.coalesce(F.col("_s"), F.lit(0)) + F.lit(prior_micro) > 0).alias("pred"),
    )


def eval_confusion(
    df: DataFrame,
    true_col: str,
    pred_col: str,
) -> DataFrame:
    """Per-class classifier evaluation from a (truth, prediction)
    frame: one row per class seen in either column with ``(label,
    n_true, n_pred, tp, precision_ppm, recall_ppm, f1_ppm)`` — every
    rate an exact integer ppm (F1 = 2PR/(P+R) computed on the ppm
    integers, one div). The eval layer for the NB scorer or any
    labeling operator; macro/micro-average downstream.

    One (truth, prediction) pair count (map-side combined) — the
    confusion matrix is |classes|² rows — then three tiny
    re-aggregations of that matrix. The corpus shuffles once."""
    pairs = df.groupBy(
        F.col(true_col).alias("_t"), F.col(pred_col).alias("_p")
    ).agg(F.count(F.lit(1)).alias("_c"))
    n_true = pairs.groupBy(F.col("_t").alias("label")).agg(
        F.sum("_c").alias("n_true")
    )
    n_pred = pairs.groupBy(F.col("_p").alias("label")).agg(
        F.sum("_c").alias("n_pred")
    )
    tp = (
        pairs.filter(F.col("_t") == F.col("_p"))
        .select(F.col("_t").alias("label"), F.col("_c").alias("tp"))
    )
    out = (
        n_true.join(n_pred, "label", "full_outer")
        .join(tp, "label", "left")
        .select(
            "label",
            F.coalesce("n_true", F.lit(0)).alias("n_true"),
            F.coalesce("n_pred", F.lit(0)).alias("n_pred"),
            F.coalesce("tp", F.lit(0)).alias("tp"),
        )
    )
    prec = F.when(
        F.col("n_pred") > 0, F.expr("(tp * 1000000L) div n_pred")
    ).otherwise(F.lit(0).cast("long"))
    rec = F.when(
        F.col("n_true") > 0, F.expr("(tp * 1000000L) div n_true")
    ).otherwise(F.lit(0).cast("long"))
    out = out.withColumn("precision_ppm", prec).withColumn("recall_ppm", rec)
    f1 = F.when(
        F.col("precision_ppm") + F.col("recall_ppm") > 0,
        F.expr(
            "(2 * precision_ppm * recall_ppm)"
            " div (precision_ppm + recall_ppm)"
        ),
    ).otherwise(F.lit(0).cast("long"))
    return out.withColumn("f1_ppm", f1)
