"""Distributed k-means — centroid training for IVF similarity search.

``similarity.ivf_topk`` probes a cell column that must come from
somewhere; this module trains it. Lloyd's algorithm, Spark-first:

- **assign** is a map-side plan-literal expression: the k centroids are
  embedded in the plan as an ``array<struct<cell,vec>>`` literal and
  each row takes an ``array_min`` over per-centroid squared-L2
  distances — whole-stage codegen, no join, no shuffle, no Python.
  (Plan size bounds k: thousands of centroids are fine, millions are
  a broadcast-join problem instead.)
- **update** is one ``posexplode`` + groupBy(cell, pos) aggregation —
  a (k × dims)-row shuffle regardless of table size — collected to the
  driver (k × dims values, tiny) to build the next iteration's
  literals. This driver loop is inherent to Lloyd's fixpoint; each
  iteration is one Spark job over the full table.
- **determinism**: component sums are aggregated as ``decimal`` —
  exact, therefore independent of partition count and add order,
  unlike float sums. Same data + same params → bit-identical centroids
  on any cluster layout. Initialization is farthest-first (Gonzalez)
  over a deterministic hash-sample: the ``init_sample`` rows with the
  smallest md5-hash of the id are pulled to the driver (one TakeOrdered
  job — bounded, never a full sort) and seeds are chosen greedily to
  maximize min-distance, hash order breaking ties. Farthest-first
  guarantees well-separated seeds (no two seeds in one tight cluster),
  and running it driver-side over a bounded sample keeps init at one
  Spark job regardless of k.

K-means is iterative and float-valued, so there is no SQL oracle; the
entry query is rows-only checked and the invariants (recovery of
planted clusters, partition-count invariance, argmin consistency) are
pinned in ``tests/test_clustering.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bytewax_spark.functions.similarity import as_double
from bytewax_spark.functions.text import hash64

__all__ = ["kmeans_fit", "assign_cells", "kmeans_topk"]

_SUM_DEC = "decimal(28,10)"


def _dist2(v: Column, centroid: list[float]) -> Column:
    c = F.array([F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(v, c, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def assign_cells(
    df: DataFrame, vec_col: str, centroids: list[list[float]], cell_col: str = "cell"
) -> DataFrame:
    """Attach ``cell_col`` = index of the nearest centroid (squared L2,
    lowest index wins ties). Map-side literal expression — safe to use
    on a 100 TB table; cost is O(k·dims) per row in codegen."""
    if not centroids:
        raise ValueError("centroids must be non-empty")
    v = as_double(vec_col)
    scored = F.array(
        [
            F.struct(_dist2(v, c).alias("d"), F.lit(i).alias("i"))
            for i, c in enumerate(centroids)
        ]
    )
    return df.withColumn(cell_col, F.array_min(scored).getField("i"))


def _farthest_first(points: list[list[float]], k: int) -> list[list[float]]:
    """Gonzalez farthest-first seeds over driver-held sample points
    (already in deterministic hash order — index 0 is the first seed,
    ties on distance break toward the earlier index)."""
    seeds = [points[0]]
    # min squared distance from each point to the chosen seed set
    d2 = [sum((a - b) ** 2 for a, b in zip(p, seeds[0])) for p in points]
    while len(seeds) < k:
        far = max(range(len(points)), key=lambda i: (d2[i], -i))
        seeds.append(points[far])
        for i, p in enumerate(points):
            nd = sum((a - b) ** 2 for a, b in zip(p, points[far]))
            if nd < d2[i]:
                d2[i] = nd
    return seeds


def kmeans_fit(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 8,
    max_iter: int = 10,
    init_sample: int = 4096,
) -> list[list[float]]:
    """Train k centroids with Lloyd's algorithm; returns them as plain
    lists (k × dims doubles — driver-sized by construction).

    Stops early when an iteration leaves every centroid unchanged
    (exact comparison — sums are decimal-exact, so 'unchanged' is
    well-defined). Empty cells keep their previous centroid."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    if init_sample < k:
        init_sample = k
    init_rows = (
        df.select(as_double(vec_col).alias("_v"), hash64(F.col(id_col).cast("string")).alias("_h"))
        .orderBy("_h", "_v")
        .limit(init_sample)
        .collect()
    )
    points = [list(r["_v"]) for r in init_rows]
    if len(points) < k:
        raise ValueError(f"k={k} exceeds the {len(points)} available rows")
    centroids = _farthest_first(points, k)
    base = df.select(as_double(vec_col).alias("_v"))
    for _ in range(max_iter):
        assigned = assign_cells(base, "_v", centroids, "_cell")
        comp = (
            assigned.select("_cell", F.posexplode("_v").alias("_pos", "_x"))
            .groupBy("_cell", "_pos")
            .agg(
                F.sum(F.col("_x").cast(_SUM_DEC)).alias("_s"),
                F.count(F.lit(1)).alias("_n"),
            )
            .collect()
        )
        new_centroids = [list(c) for c in centroids]
        dims: dict[int, dict[int, float]] = {}
        for r in comp:
            dims.setdefault(r["_cell"], {})[r["_pos"]] = float(r["_s"] / r["_n"])
        for cell, by_pos in dims.items():
            new_centroids[cell] = [by_pos[p] for p in sorted(by_pos)]
        if new_centroids == centroids:
            break
        centroids = new_centroids
    return centroids


def kmeans_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_vec: list[float],
    k: int = 10,
    n_cells: int = 8,
    nprobe: int = 2,
    max_iter: int = 5,
) -> DataFrame:
    """End-to-end trained-IVF search: k-means the table into
    ``n_cells``, then :func:`similarity.ivf_topk` over the learned
    cells — the full 'build the index, probe it' path with no
    pre-existing label column."""
    from bytewax_spark.functions.similarity import ivf_topk

    centroids = kmeans_fit(df, vec_col, id_col, n_cells, max_iter)
    cells = assign_cells(df, vec_col, centroids, "_kcell")
    return ivf_topk(cells, vec_col, id_col, "_kcell", query_vec, k, nprobe)
