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

__all__ = [
    "shuffle_hash",
    "corpus_shuffle",
    "curriculum_order",
    "shard_by_hash",
    "write_shards",
    "write_tar_shards",
    "zorder_key",
    "zorder_layout",
]


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


def zorder_key(cols: list[Column | str], bits: int = 16) -> Column:
    """Morton (Z-order) interleave of up to 4 non-negative integer
    columns into one bigint sort key — multi-dimensional data
    clustering for export layout (the same idea as Delta's OPTIMIZE
    ZORDER, public: Morton 1966).

    Why at 100 TB: range-sorting by the interleaved key co-locates
    rows that are close in EVERY listed dimension, so downstream
    range/point queries on any prefix-free combination of those
    columns (reader shards filtering by source AND length band, say)
    skip most files via min/max statistics — one layout serves many
    filters, where a lexicographic sort serves only its leading
    column.

    Columns must already be quantized to ``[0, 2^bits)`` (bucket ids,
    quantile ranks, truncated values); values outside are masked to
    the low ``bits``. Pure bitwise expressions — whole-stage codegen,
    no shuffle until the caller's range sort."""
    if not 1 <= len(cols) <= 4:
        raise ValueError(f"zorder_key takes 1-4 columns, got {len(cols)}")
    if bits * len(cols) > 63:
        raise ValueError(f"{len(cols)} cols x {bits} bits exceeds a signed bigint")
    n = len(cols)
    key: Column = F.lit(0).cast("bigint")
    for ci, c in enumerate(cols):
        c = (F.col(c) if isinstance(c, str) else c).cast("bigint")
        c = c.bitwiseAND(F.lit((1 << bits) - 1))
        # spread bit b of column ci to output bit b*n + ci
        for b in range(bits):
            key = key.bitwiseOR(
                F.shiftleft(
                    F.shiftright(c, b).bitwiseAND(F.lit(1)), b * n + ci
                ).cast("bigint")
            )
    return key


def zorder_layout(
    df: DataFrame, cols: list[str], bits: int = 16, key_col: str = "zkey"
) -> DataFrame:
    """Rows range-sorted by their Morton key (plus the first column as
    a total-order tiebreak): the terasort-shape sort that makes
    min/max file skipping work on every z-ordered dimension."""
    return df.withColumn(key_col, zorder_key(cols, bits)).orderBy(
        F.col(key_col).asc(), F.col(cols[0]).asc()
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


def write_tar_shards(
    df: DataFrame,
    path: str,
    key_col: str,
    n_shards: int,
    payload_cols: list[str],
    salt: str = "",
) -> DataFrame:
    """WebDataset-style export (public convention: github.com/webdataset
    — "a corpus is a set of tar files; a sample is adjacent members
    sharing a basename"): shard ``shard-%05d.tar`` holds one member
    ``{key}.{col}`` per payload column per row, in shuffle-hash order.
    Sequential-read tars are what large-scale loaders stream; the
    layout here is byte-real (POSIX ustar via stdlib tarfile, mtime
    pinned to 0) and deterministic end to end: same data + salt ->
    same shards, same member order, same bytes.

    Returns the manifest DataFrame ``(shard, path, n_samples,
    n_bytes)`` — an ACTION IS REQUIRED to materialize the files
    (``.collect()`` the manifest; it is also the natural thing to
    persist next to the export). Each Spark task writes whole shards
    (rows arrive clustered by shard and hash-sorted from
    ``shard_by_hash``; a task seeing several shards closes one tar and
    opens the next as the shard id changes). Writes are idempotent —
    a retried task rewrites the same bytes to the same file.

    Payload encoding: binary columns pass through; strings are UTF-8;
    anything else is ``str()``-encoded. ``path`` must be a directory
    reachable from executors (local/NFS/fuse mount; for object stores
    put a fuse mount or write parquet shards via ``write_shards``)."""
    import os

    os.makedirs(path, exist_ok=True)
    sharded = shard_by_hash(
        df.select(key_col, *payload_cols), key_col, n_shards, salt
    )
    schema = "shard int, path string, n_samples long, n_bytes long"

    def _write(batches):
        import io
        import os
        import tarfile

        import pandas as pd

        state = {"shard": None, "tf": None, "n": 0}
        manifest: list[tuple] = []

        def tar_path(shard: int) -> str:
            return os.path.join(path, f"shard-{shard:05d}.tar")

        def close_current() -> None:
            if state["tf"] is not None:
                state["tf"].close()
                p = tar_path(state["shard"])
                manifest.append(
                    (state["shard"], p, state["n"], os.path.getsize(p))
                )
                state["tf"] = None

        def to_bytes(v) -> bytes:
            if isinstance(v, (bytes, bytearray)):
                return bytes(v)
            if isinstance(v, str):
                return v.encode("utf-8")
            return str(v).encode("utf-8")

        for pdf in batches:
            for row in pdf.itertuples(index=False):
                shard = int(getattr(row, "shard"))
                if shard != state["shard"]:
                    close_current()
                    state.update(
                        shard=shard,
                        tf=tarfile.open(tar_path(shard), "w", format=tarfile.USTAR_FORMAT),
                        n=0,
                    )
                key = getattr(row, key_col)
                for col in payload_cols:
                    data = to_bytes(getattr(row, col))
                    ti = tarfile.TarInfo(name=f"{key}.{col}")
                    ti.size = len(data)
                    ti.mtime = 0
                    state["tf"].addfile(ti, io.BytesIO(data))
                state["n"] += 1
        close_current()
        yield pd.DataFrame(
            manifest, columns=["shard", "path", "n_samples", "n_bytes"]
        )

    return sharded.mapInPandas(_write, schema)


def curriculum_order(
    df: DataFrame,
    key_col: str,
    score_col: str,
    n_bands: int = 10,
    salt: str = "",
    band_col: str = "band",
) -> DataFrame:
    """Curriculum export order (Bengio et al. 2009 curriculum
    learning, public): rows banded into ``n_bands`` difficulty tiers
    by score quantile, deterministically shuffled WITHIN each band —
    the trainer reads easy bands first but sees each band in unbiased
    pseudo-random order. Returns the rows + ``band_col`` (1 = lowest
    scores), sorted by (band, shuffle_hash, key).

    Band edges are exact percentiles computed in ONE aggregation and
    broadcast back as an array literal via a single-row cross join —
    no driver collect; band assignment is a map-side array fold. The
    final sort is the terasort shape (range partition on a composite
    key), same as ``corpus_shuffle``. Exact global percentiles sort
    the score column once; at extreme scale swap the edge computation
    for the histogram sketch (functions/sketches.py) — band EDGES
    tolerate approximation, membership stays deterministic either
    way."""
    if n_bands < 1:
        raise ValueError(f"n_bands must be >= 1, got {n_bands}")
    fracs = [i / n_bands for i in range(1, n_bands)]
    edges = df.agg(
        F.percentile(F.col(score_col), F.array(*[F.lit(f) for f in fracs])).alias(
            "_edges"
        )
    )
    banded = df.crossJoin(F.broadcast(edges)).withColumn(
        band_col,
        (
            F.lit(1)
            + F.aggregate(
                F.col("_edges"),
                F.lit(0),
                lambda acc, t: acc
                + F.when(F.col(score_col) > t, F.lit(1)).otherwise(F.lit(0)),
            )
        ).cast("int"),
    ).drop("_edges")
    return banded.orderBy(
        F.col(band_col).asc(),
        shuffle_hash(key_col, salt).asc(),
        F.col(key_col).asc(),
    )
