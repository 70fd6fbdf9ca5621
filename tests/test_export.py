"""Corpus export layout (functions/export.py)."""

from __future__ import annotations

import pytest

from bytewax_spark.functions import export


def _docs(spark, parts=4):
    rows = [(i, f"text {i}") for i in range(200)]
    return spark.createDataFrame(rows, "doc_id long, text string").repartition(parts)


def test_corpus_shuffle_is_deterministic_and_a_permutation(spark):
    a = [r["doc_id"] for r in export.corpus_shuffle(_docs(spark, 3), "doc_id").collect()]
    b = [r["doc_id"] for r in export.corpus_shuffle(_docs(spark, 13), "doc_id").collect()]
    assert a == b
    assert sorted(a) == list(range(200))
    assert a != list(range(200))  # actually permuted


def test_corpus_shuffle_salt_gives_independent_epochs(spark):
    df = _docs(spark)
    e0 = [r["doc_id"] for r in export.corpus_shuffle(df, "doc_id", "ep0").collect()]
    e1 = [r["doc_id"] for r in export.corpus_shuffle(df, "doc_id", "ep1").collect()]
    assert e0 != e1
    assert sorted(e0) == sorted(e1)


def test_shard_by_hash_stable_and_complete(spark):
    df = _docs(spark)
    a = export.shard_by_hash(df, "doc_id", 8).select("doc_id", "shard").collect()
    b = export.shard_by_hash(_docs(spark, 17), "doc_id", 8).select("doc_id", "shard").collect()
    ma = {r["doc_id"]: r["shard"] for r in a}
    mb = {r["doc_id"]: r["shard"] for r in b}
    assert ma == mb
    assert len(ma) == 200
    assert set(ma.values()) <= set(range(8))
    with pytest.raises(ValueError, match="n_shards must be positive"):
        export.shard_by_hash(df, "doc_id", 0)


def test_write_shards_roundtrip(spark, tmp_path):
    df = _docs(spark)
    path = str(tmp_path / "shards")
    export.write_shards(df, path, "doc_id", n_shards=4)
    back = spark.read.parquet(path)
    assert back.count() == 200
    # partition column survives and matches the map-local assignment
    shards = {r["doc_id"]: int(r["shard"]) for r in back.collect()}
    direct = {
        r["doc_id"]: r["shard"]
        for r in export.shard_by_hash(df, "doc_id", 4).select("doc_id", "shard").collect()
    }
    assert shards == direct


def test_zorder_key_interleaves_bits(spark):
    """Known Morton values: interleave(x, y) with x bits at even
    positions, y at odd; masking keeps out-of-range values sane;
    arity/width validation is loud."""
    import pytest
    from pyspark.sql import functions as F

    def morton2(x, y, bits=8):
        out = 0
        for b in range(bits):
            out |= ((x >> b) & 1) << (2 * b)
            out |= ((y >> b) & 1) << (2 * b + 1)
        return out

    df = spark.createDataFrame(
        [(0b1010, 0b0110), (0, 0), (255, 255), (256 + 5, 3)], "x long, y long"
    )
    got = [
        r["z"]
        for r in df.select(export.zorder_key(["x", "y"], bits=8).alias("z")).collect()
    ]
    assert got == [
        morton2(0b1010, 0b0110),
        0,
        morton2(255, 255),
        morton2(5, 3),  # 261 masked to low 8 bits
    ]
    with pytest.raises(ValueError, match="1-4"):
        export.zorder_key([], bits=8)
    with pytest.raises(ValueError, match="bigint"):
        export.zorder_key(["x", "y"], bits=32)


def test_zorder_layout_balances_file_extents(spark):
    """The property min/max skipping buys: cut the sorted sequence
    into 16-row 'files' and measure each file's bounding box. Z-order
    files span 4x4 in (x, y) — selective for filters on EITHER
    dimension — while lexicographic files span the full y range
    (1x16), useless for y filters."""
    rows = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(rows, "x long, y long")
    z = export.zorder_layout(df, ["x", "y"], bits=4, key_col="zk").collect()
    seq = [(r["x"], r["y"]) for r in z]
    assert sorted(seq) == rows  # a permutation

    def worst_extent(order):
        worst = 0
        for i in range(0, len(order), 16):
            chunk = order[i : i + 16]
            xs, ys = [p[0] for p in chunk], [p[1] for p in chunk]
            worst = max(worst, max(max(xs) - min(xs), max(ys) - min(ys)))
        return worst

    assert worst_extent(seq) == 3  # every z file is a 4x4 tile
    assert worst_extent(sorted(rows)) == 15  # lex files span all of y


# ---------------------------------------------------------------------------
# write_tar_shards (WebDataset-style layout)
# ---------------------------------------------------------------------------


def test_tar_shards_roundtrip_and_determinism(spark, tmp_path):
    import tarfile

    from bytewax_spark.functions import export

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    out1 = str(tmp_path / "t1")
    m1 = export.write_tar_shards(docs, out1, "doc_id", 3, ["text", "lang"]).collect()
    assert sorted(r["shard"] for r in m1) == [0, 1, 2]
    total = sum(r["n_samples"] for r in m1)
    assert total == docs.count()

    # member layout: adjacent {key}.text / {key}.lang pairs; readable tar
    with tarfile.open(f"{out1}/shard-00000.tar") as tf:
        names = tf.getnames()
        assert all(n.endswith((".text", ".lang")) for n in names)
        assert names[0].rsplit(".", 1)[0] == names[1].rsplit(".", 1)[0]
        first = tf.extractfile(names[0]).read()
        assert len(first) > 0

    # byte-determinism: a second export of the same data is identical
    out2 = str(tmp_path / "t2")
    export.write_tar_shards(docs, out2, "doc_id", 3, ["text", "lang"]).collect()
    for i in range(3):
        b1 = open(f"{out1}/shard-{i:05d}.tar", "rb").read()
        b2 = open(f"{out2}/shard-{i:05d}.tar", "rb").read()
        assert b1 == b2


def test_tar_shards_stable_assignment(spark, tmp_path):
    """A key's shard never changes when the corpus grows (stable
    hash % n, not row position)."""
    import tarfile

    from bytewax_spark.functions import export

    small = spark.createDataFrame(
        [(1, "a"), (2, "b")], "doc_id bigint, text string"
    )
    big = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], "doc_id bigint, text string"
    )

    def shard_of(root, key):
        for i in range(4):
            p = f"{root}/shard-{i:05d}.tar"
            import os

            if os.path.exists(p):
                with tarfile.open(p) as tf:
                    if f"{key}.text" in tf.getnames():
                        return i
        raise AssertionError(f"{key} not found")

    r1 = str(tmp_path / "small")
    r2 = str(tmp_path / "big")
    export.write_tar_shards(small, r1, "doc_id", 4, ["text"]).collect()
    export.write_tar_shards(big, r2, "doc_id", 4, ["text"]).collect()
    assert shard_of(r1, 1) == shard_of(r2, 1)
    assert shard_of(r1, 2) == shard_of(r2, 2)


def test_curriculum_order_bands_and_shuffle(spark):
    from bytewax_spark.functions import export

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(100)], "doc_id bigint, score double"
    )
    rows = export.curriculum_order(df, "doc_id", "score", n_bands=4).collect()
    # bands partition the score range into quartile tiers
    bands = {}
    for r in rows:
        bands.setdefault(r["band"], []).append(r["score"])
    assert set(bands) == {1, 2, 3, 4}
    assert max(bands[1]) < min(bands[2]) or abs(max(bands[1]) - min(bands[2])) < 1e-9
    assert all(len(v) in (24, 25, 26) for v in bands.values())
    # ordered by band first
    seq = [r["band"] for r in rows]
    assert seq == sorted(seq)
    # within a band the order is NOT score order (it's the hash shuffle)
    assert bands[1] != sorted(bands[1])


def test_curriculum_order_deterministic(spark):
    from bytewax_spark.functions import export

    df = spark.createDataFrame(
        [(i, float(i % 7)) for i in range(50)], "doc_id bigint, score double"
    )
    a = [r["doc_id"] for r in export.curriculum_order(df, "doc_id", "score", 3).collect()]
    b = [r["doc_id"] for r in export.curriculum_order(df, "doc_id", "score", 3).collect()]
    c = [r["doc_id"] for r in export.curriculum_order(df, "doc_id", "score", 3, salt="x").collect()]
    assert a == b
    assert a != c
