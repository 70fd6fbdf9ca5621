"""Distributed k-means (functions/clustering.py)."""

from __future__ import annotations

import pytest

from bytewax_spark.functions import clustering, similarity


def _blobs(spark, parts=4):
    # three well-separated planted clusters in 3-d
    centers = [(0.0, 0.0, 0.0), (10.0, 10.0, 0.0), (-10.0, 5.0, 8.0)]
    rows = []
    i = 0
    for ci, (cx, cy, cz) in enumerate(centers):
        for j in range(40):
            dx = ((i * 7) % 5 - 2) * 0.1
            dy = ((i * 11) % 5 - 2) * 0.1
            dz = ((i * 13) % 5 - 2) * 0.1
            rows.append((i, [cx + dx, cy + dy, cz + dz]))
            i += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>").repartition(parts), centers


def test_kmeans_recovers_planted_clusters(spark):
    df, centers = _blobs(spark)
    cents = clustering.kmeans_fit(df, "embedding", "vec_id", k=3, max_iter=10)
    # each learned centroid lands within 0.3 of a distinct planted center
    matched = set()
    for c in cents:
        best = min(
            range(3),
            key=lambda ci: sum((a - b) ** 2 for a, b in zip(c, centers[ci])),
        )
        d2 = sum((a - b) ** 2 for a, b in zip(c, centers[best]))
        assert d2 < 0.3**2, (c, centers[best])
        matched.add(best)
    assert matched == {0, 1, 2}


def test_kmeans_partition_invariance(spark):
    dfa, _ = _blobs(spark, parts=2)
    dfb, _ = _blobs(spark, parts=17)
    a = clustering.kmeans_fit(dfa, "embedding", "vec_id", k=3, max_iter=4)
    b = clustering.kmeans_fit(dfb, "embedding", "vec_id", k=3, max_iter=4)
    assert a == b  # decimal-exact sums: bit-identical on any layout


def test_assign_cells_is_argmin(spark):
    df, _ = _blobs(spark)
    cents = clustering.kmeans_fit(df, "embedding", "vec_id", k=3, max_iter=5)
    rows = clustering.assign_cells(df, "embedding", cents).collect()
    for r in rows:
        dists = [
            sum((x - c) ** 2 for x, c in zip(r["embedding"], cent)) for cent in cents
        ]
        assert dists[r["cell"]] == pytest.approx(min(dists))


def test_kmeans_topk_matches_bruteforce_on_blobs(spark):
    df, centers = _blobs(spark)
    q = list(centers[1])
    ivf = clustering.kmeans_topk(
        df, "embedding", "vec_id", q, k=5, n_cells=3, nprobe=1, max_iter=5
    )
    brute = similarity.cosine_topk(df, "embedding", "vec_id", q, k=5)
    assert [r["vec_id"] for r in ivf.collect()] == [r["vec_id"] for r in brute.collect()]


def test_kmeans_validation(spark):
    df, _ = _blobs(spark)
    with pytest.raises(ValueError, match="k must be positive"):
        clustering.kmeans_fit(df, "embedding", "vec_id", k=0)
    with pytest.raises(ValueError, match="exceeds"):
        clustering.kmeans_fit(df.limit(2), "embedding", "vec_id", k=5)
    with pytest.raises(ValueError, match="non-empty"):
        clustering.assign_cells(df, "embedding", [])


def test_ivf_index_lifecycle_prunes_partitions(spark, sf_dir):
    """Build-once/search-many: the persisted index's search reads only
    the probed cell directories (PartitionFilters on _cell) and agrees
    with brute-force cosine top-k when probing every cell."""
    import tempfile

    from bytewax_spark.functions import similarity as sim

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qv = [float(x) for x in emb.orderBy("vec_id").first()["embedding"]]
    with tempfile.TemporaryDirectory() as d:
        cents = sim.ivf_write_index(emb, "embedding", "vec_id", d, cells=4, max_iter=3)
        assert len(cents) == 4
        out = sim.ivf_search_index(
            spark, d, "embedding", "vec_id", qv, k=5, nprobe=2
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "_cell" in plan.split("PartitionFilters")[1][:120], plan
        rows = out.collect()
        assert len(rows) == 5
        # probing ALL cells must reproduce exact brute-force top-k
        full = sim.ivf_search_index(
            spark, d, "embedding", "vec_id", qv, k=5, nprobe=4
        ).select("vec_id", "cosine")
        brute = sim.cosine_topk(emb, "embedding", "vec_id", qv, k=5)
        assert sorted(map(tuple, full.collect())) == sorted(
            map(tuple, brute.collect())
        )


def test_pq_roundtrip_on_clustered_data(spark):
    """PQ on separable data: 4 well-separated 8-dim clusters; ADC
    search from a cluster member must retrieve that cluster."""
    from bytewax_spark.functions import similarity as sim

    import itertools
    rows = []
    rid = 0
    centers = [
        [0.0] * 8,
        [10.0] * 8,
        [0.0] * 4 + [10.0] * 4,
        [10.0] * 4 + [0.0] * 4,
    ]
    for ci, c in enumerate(centers):
        for j in range(25):
            vec = [x + ((rid * 7 + d * 3) % 5) * 0.1 for d, x in enumerate(c)]
            rows.append((rid, ci, vec))
            rid += 1
    df = spark.createDataFrame(rows, "vec_id long, cl int, embedding array<double>")
    books = sim.pq_train(df, "embedding", "vec_id", m=2, k=4, max_iter=4)
    assert len(books) == 2 and all(len(b) == 4 for b in books)
    codes = sim.pq_encode(df, "embedding", "vec_id", books)
    got = codes.collect()
    assert all(0 <= c < 4 for r in got for c in r["codes"])
    q = rows[0][2]  # a member of cluster 0
    top = sim.pq_adc_topk(codes, books, q, k=25)
    top_ids = [r["vec_id"] for r in top.collect()]
    same_cluster = {r[0] for r in rows if r[1] == 0}
    recall = len(set(top_ids) & same_cluster) / 25
    assert recall >= 0.9, (recall, top_ids[:10])
    assert top_ids[0] == 0  # the query itself is nearest


def test_pq_train_validates_dims(spark):
    from bytewax_spark.functions import similarity as sim

    df = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0])], "vec_id long, embedding array<double>"
    )
    import pytest
    with pytest.raises(ValueError):
        sim.pq_train(df, "embedding", "vec_id", m=2, k=2)


def test_pq_adc_query_dim_check(spark):
    from bytewax_spark.functions import similarity as sim

    df = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0, 4.0])], "vec_id long, embedding array<double>"
    )
    books = sim.pq_train(df, "embedding", "vec_id", m=2, k=1, max_iter=1)
    codes = sim.pq_encode(df, "embedding", "vec_id", books)
    import pytest
    with pytest.raises(ValueError):
        sim.pq_adc_topk(codes, books, [1.0, 2.0])
