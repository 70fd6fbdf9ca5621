"""Benchmark decontamination — remove training documents that overlap
an evaluation/benchmark set.

The standard contamination check (public method: GPT-3 appendix C /
Llama 2 §A.6 style) is word-n-gram overlap: a training doc is
contaminated when it shares at least one (or ``min_hits``) n-gram with
any benchmark document.

Scale posture (100 TB training corpus, benchmark sets are small —
thousands of documents):

- The benchmark shingle set is aggregated once and **broadcast**; the
  training table never shuffles for the membership test.
- Training-doc shingles are hashed to int64 *before* the explode, so
  the exploded rows are 16 bytes; the explode is map-side and feeds a
  broadcast semi-join, so only **matched** shingles (rare by
  construction) reach the per-doc aggregation shuffle.
- Per-doc shingle totals come from a per-row ``size(array_distinct)``
  expression — no second pass over the exploded rows.

All hashing is md5-derived (``text.hash64``) so a SQL oracle
reproduces hit counts exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bytewax_spark.functions.text import hash64, word_shingles

__all__ = ["benchmark_shingles", "contamination_report", "decontaminate"]


def benchmark_shingles(bench: DataFrame, text_col: str, n: int = 8) -> DataFrame:
    """Distinct int64 shingle hashes of the benchmark set — the small
    side to broadcast. One column ``shingle``."""
    return (
        bench.select(F.explode(word_shingles(text_col, n)).alias("_sh"))
        .select(hash64(F.col("_sh")).alias("shingle"))
        .distinct()
    )


def contamination_report(
    docs: DataFrame,
    bench: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 8,
) -> DataFrame:
    """Per-document contamination: ``(id, n_shingles, bench_hits,
    hit_frac)`` for EVERY training doc (zero-hit docs included).

    ``bench_hits`` counts the doc's distinct n-grams that appear
    anywhere in the benchmark set; ``hit_frac`` normalizes by the doc's
    distinct n-gram count (0.0 when the doc is shorter than ``n``
    words)."""
    bset = F.broadcast(benchmark_shingles(bench, text_col, n))
    grams = F.array_distinct(word_shingles(text_col, n))
    base = docs.select(
        F.col(id_col), F.size(grams).cast("long").alias("n_shingles"), grams.alias("_g")
    )
    hits = (
        base.select(F.col(id_col), F.explode("_g").alias("_sh"))
        .select(id_col, hash64(F.col("_sh")).alias("shingle"))
        .join(bset, "shingle", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("bench_hits"))
    )
    return (
        base.drop("_g")
        .join(hits, id_col, "left")
        .select(
            id_col,
            "n_shingles",
            F.coalesce("bench_hits", F.lit(0)).cast("long").alias("bench_hits"),
            F.when(
                F.col("n_shingles") > 0,
                F.round(F.coalesce("bench_hits", F.lit(0)) / F.col("n_shingles"), 4),
            )
            .otherwise(F.lit(0.0))
            .alias("hit_frac"),
        )
    )


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 8,
    min_hits: int = 1,
) -> DataFrame:
    """Training docs with fewer than ``min_hits`` benchmark n-gram
    overlaps — the clean corpus, original columns intact.

    Anti-join on the contaminated id set: the full rows only move in
    the final (id-keyed, skew-free) join; the contamination test itself
    touches hashes only."""
    dirty = (
        contamination_report(docs, bench, text_col, id_col, n)
        .filter(F.col("bench_hits") >= min_hits)
        .select(id_col)
    )
    return docs.join(dirty, id_col, "left_anti")
