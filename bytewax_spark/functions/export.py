"""Training-corpus export layout: deterministic shuffle + sharding.

The last stage of a data pipeline is writing the corpus in the order
and layout the trainer consumes. Two properties matter at 100 TB:

- **Deterministic global shuffle.** Training wants documents in a
  "random" order, but the order must be reproducible (resume a crashed
  export, compare two pipeline versions row for row). Sorting by an
  md5-derived hash of the document id gives a uniform pseudo-random
  permutation that is a plain range-partitioned sort — Spark samples
  the hash range, every partition sorts locally, no single-task
  bottleneck (the terasort shape), and the same data always lands in
  the same order.
- **Stable sharding.** Trainers read fixed shard files; a document
  must stay in the same shard across re-runs and incremental rebuilds
  so caches and resumable loaders keep working. ``shard = hash % n``
  is decided per row at scan time (map-local); the write then
  clusters by shard so each output file is exactly one shard.

Within a shard, files are written in hash order, so (shard, hash) is a
total, reproducible read order for the whole corpus.

Parity note: the reference writes streams item-at-a-time and has no
corpus-layout surface (SURVEY.md §2.7); this module is part of the
beyond-reference LLM-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import hash64

__all__ = ["shuffle_hash", "corpus_shuffle", "shard_by_hash", "write_shards"]


def shuffle_hash(key: Column | str, salt: str = "") -> Column:
    """The shuffle/shard priority: ``hash64(salt || key)``. One md5 per
    row in codegen; ``salt`` selects among independent permutations of
    the same corpus (epoch 0, epoch 1, ...)."""
    key = F.col(key) if isinstance(key, str) else key
    return hash64(F.concat(F.lit(salt), key.cast("string")))


def corpus_shuffle(df: DataFrame, key_col: str, salt: str = "") -> DataFrame:
    """Rows in deterministic pseudo-random order: sorted by
    ``shuffle_hash`` (key breaks md5-collision ties, making the order
    total). A range-partitioned sort — scales like terasort, no
    driver-side anything."""
    return df.orderBy(shuffle_hash(key_col, salt).asc(), F.col(key_col).asc())


def shard_by_hash(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    salt: str = "",
    shard_col: str = "shard",
) -> DataFrame:
    """Attach a stable shard id in [0, n_shards) and cluster rows so
    each task holds whole shards (``repartition`` on the shard column),
    sorted by the shuffle hash within each shard. Equal keys always
    land in the same shard, on any cluster layout, forever."""
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    h = shuffle_hash(key_col, salt)
    out = df.withColumn(shard_col, (h % n_shards).cast("int"))
    return out.repartition(n_shards, F.col(shard_col)).sortWithinPartitions(
        F.col(shard_col), h.asc(), F.col(key_col).asc()
    )


def write_shards(
    df: DataFrame,
    path: str,
    key_col: str,
    n_shards: int,
    salt: str = "",
    fmt: str = "parquet",
) -> None:
    """Write the corpus as ``shard=N/`` partition directories, rows in
    shuffle-hash order within each shard — the resumable, reproducible
    trainer layout. One file per shard (the repartition in
    ``shard_by_hash`` clusters a shard into one task)."""
    sharded = shard_by_hash(df, key_col, n_shards, salt)
    sharded.write.partitionBy("shard").format(fmt).mode("overwrite").save(path)
