"""Deduplication — exact and near-duplicate, designed for 100 TB.

Scale posture per method:

- **exact**: one hash shuffle on the dedup key (map-side partial
  ``min_by``). Never ``dropDuplicates()`` over all columns at scale —
  hash the payload first so the shuffle carries 8 bytes, not the doc.
- **n-gram Jaccard (exact)**: explode shingles → self-join on shingle
  → count intersections. The shingle join is the scale hazard: hot
  shingles (boilerplate) explode quadratically — ``max_doc_freq``
  drops the head of the distribution (standard prefix filtering), AQE
  skew-join splits the rest.
- **MinHash+LSH**: fixed-size signature (K int32s) per doc regardless
  of length → band buckets → equi-join on (band, bucket). The join key
  is uniform by construction; candidate verification re-checks exact
  Jaccard only on the (tiny) candidate set. This is THE 100 TB path.
- **SimHash**: one 16-bit fingerprint per doc; near-dups collide
  exactly → a groupBy, no pairwise join at all.
- **embedding cosine**: blocked self-join (block = label/IVF cell),
  cosine inside the block only.

All hashes are md5-derived (see ``text.hash64``) so the DuckDB oracle
reproduces every signature bit-for-bit.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bytewax_spark.functions.text import hash64, tokenize, word_shingles

__all__ = [
    "hamming_neighbor_pairs",
    "MINHASH_K",
    "MINHASH_P",
    "MINHASH_BANDS",
    "dedup_exact",
    "dedup_incremental",
    "dedup_bloom_incremental",
    "dedup_report",
    "bloom_build",
    "bloom_might_contain",
    "dedup_keep_best",
    "dedup_lines_global",
    "dedup_spans_global",
    "shingle_docs",
    "ngram_jaccard_pairs",
    "containment_pairs",
    "simhash_neighbor_pairs",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "minhash_lsh_recall",
    "minhash_lsh_verified_pairs",
    "minhash_lsh_pairs_incremental",
    "release_signature_caches",
    "simhash",
    "embedding_cosine_pairs",
    "lsh_cosine_pairs",
    "lsh_cosine_recall",
    "semdedup",
]

MINHASH_K = 32          # signature length
MINHASH_P = 2147483647  # 2^31-1 (Mersenne); a*h+b stays < 2^62
MINHASH_BANDS = 8       # 8 bands x 4 rows
_MINHASH_A_MUL = 2654435761  # Knuth multiplicative constants — any
_MINHASH_B_MUL = 40503       # fixed odd constants work; shared with oracle


def dedup_exact(df: DataFrame, text_col: str, id_col: str, key: Column | None = None) -> DataFrame:
    """Exact dedup: keep the min-id row per content hash.

    ``key`` overrides the dedup key (e.g. ``text.fingerprint(...)`` for
    exact-after-canonicalization dedup). Shuffles (hash, id) only — at
    100 TB the doc bodies never move; survivors are recovered by a
    self-semi-join on the id."""
    h = (key if key is not None else hash64(text_col)).alias("_h")
    keep = (
        df.select(h, F.col(id_col))
        .groupBy("_h")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return df.join(keep, on=id_col, how="left_semi")


def dedup_report(
    before: DataFrame,
    after: DataFrame,
    group_col: str,
    weight_col: str | None = None,
) -> DataFrame:
    """Per-group impact report of a dedup (or any filtering) pass —
    the observability leg of the dedup suite next to the recall/
    precision audits: one row per ``group_col`` value (source, domain,
    language, shard) with ``(n_before, n_after, n_removed,
    removed_ppm)`` plus ``(w_before, w_after)`` sums of ``weight_col``
    (chars, tokens, bytes) when given — "which sources did the dedup
    actually eat" is the first question after any corpus-scale pass.
    Groups absent from ``after`` report 0 survivors (fully deduped);
    groups that appear only in ``after`` are a pipeline bug and
    surface as NULL ``n_before`` rather than being silently dropped.

    Scale shape: two independent map-side-combined groupBy
    aggregations (group-key shuffles carry one row per group per
    partition, never documents) + one tiny group-key outer join —
    nothing pairwise, nothing driver-side."""
    def aggs(side: str):
        out = [F.count(F.lit(1)).alias(f"n_{side}")]
        if weight_col is not None:
            out.append(F.sum(weight_col).alias(f"w_{side}"))
        return out

    b = before.groupBy(group_col).agg(*aggs("before"))
    a = after.groupBy(group_col).agg(*aggs("after"))
    joined = b.join(a, group_col, "full_outer")
    cols = [
        group_col,
        "n_before",
        F.coalesce("n_after", F.lit(0)).alias("n_after"),
        (F.col("n_before") - F.coalesce("n_after", F.lit(0))).alias("n_removed"),
        F.expr(
            "(1000000L * (n_before - coalesce(n_after, 0L))) div n_before"
        ).alias("removed_ppm"),
    ]
    if weight_col is not None:
        cols += ["w_before", F.coalesce("w_after", F.lit(0)).alias("w_after")]
    return joined.select(*cols)


def dedup_incremental(
    new_df: DataFrame,
    seen_df: DataFrame,
    text_col: str,
    id_col: str,
    key: Column | None = None,
) -> DataFrame:
    """Incremental exact dedup: rows of ``new_df`` that survive both
    (a) dedup within the batch (min-id per hash wins) and (b) an
    anti-join against the already-ingested corpus ``seen_df`` — the
    daily-crawl shape, where the seen side is orders of magnitude
    larger than the batch.

    Only 16-byte hashes (plus the batch ids) ever shuffle: the seen
    corpus reduces to its hash column before the anti-join, and the
    anti-join's build side is the (smaller) batch when Spark plans it
    broadcast. ``key`` overrides the dedup key on BOTH sides (e.g.
    ``text.fingerprint`` for canonicalized dedup)."""
    h = (key if key is not None else hash64(text_col)).alias("_h")
    batch = dedup_exact(new_df, text_col, id_col, key).withColumn("_h", h)
    seen = seen_df.select(h)
    return batch.join(seen, "_h", "left_anti").drop("_h")


# powers of two as a plan literal (bit 63 is int64's sign bit) — lets
# build and probe select a bit mask by a COLUMN index, which
# shiftleft() can't do (its shift count is a Python int)
_POW2 = [1 << i for i in range(63)] + [-(1 << 63)]


def _bloom_positions(key: Column, m_bits: int, n_hashes: int) -> list[Column]:
    """``n_hashes`` bit positions from as few md5 evaluations as
    possible: each 128-bit digest yields four independent 32-bit
    chunks (digest splitting — the standard cheap Bloom hash family),
    so 4 hashes cost ONE md5 per row instead of four."""
    out: list[Column] = []
    for d in range((n_hashes + 3) // 4):
        salt = F.lit(f"bf{d}:") if d else F.lit("")
        digest = F.md5(F.concat(salt, key.cast("string")))
        for c in range(min(4, n_hashes - 4 * d)):
            chunk = F.conv(F.substring(digest, 1 + 8 * c, 8), 16, 10).cast("bigint")
            out.append(F.pmod(chunk, F.lit(m_bits)))
    return out


def bloom_build(
    df: DataFrame, key: Column | str, m_bits: int, n_hashes: int = 4
) -> list[int]:
    """Build a Bloom filter over ``key`` as a dense list of ``m_bits/64``
    int64 words — pure expressions end to end (k seeded md5 positions
    per row → (word, bit) → one ``bit_or`` aggregation).

    The driver materialization is bounded by the CHOSEN ``m_bits``
    (m/64 rows), never by the corpus: a 2^27-bit filter is 16 MB
    regardless of whether it summarizes 1 GB or 100 TB of keys. Size
    ``m_bits`` ≈ 10 bits/key for ~1% false positives (classic Bloom
    sizing); false positives only cost extra rows in the caller's exact
    confirm step, never wrong answers."""
    assert m_bits % 64 == 0, "m_bits must be a multiple of 64"
    key = F.col(key) if isinstance(key, str) else key
    pos = F.array(_bloom_positions(key, m_bits, n_hashes))
    pow2 = F.lit(_POW2)
    rows = (
        df.select(F.explode(pos).alias("_p"))
        .select(
            (F.col("_p") / 64).cast("int").alias("_w"),
            F.element_at(pow2, F.pmod(F.col("_p"), F.lit(64)).cast("int") + 1).alias("_m"),
        )
        .groupBy("_w")
        .agg(F.bit_or("_m").alias("_bits"))
        .collect()
    )
    words = [0] * (m_bits // 64)
    for r in rows:
        words[r["_w"]] = r["_bits"]
    return words


def bloom_might_contain(
    words: list[int], key: Column | str, m_bits: int, n_hashes: int = 4
) -> Column:
    """Membership probe against a ``bloom_build`` filter: the bit array
    rides the PLAN as an array literal (broadcast with the task binary,
    no shuffle, no join), the k bit tests are map-side bitwise
    expressions. False positives possible; false negatives never."""
    key = F.col(key) if isinstance(key, str) else key
    arr = F.lit(words)
    pow2 = F.lit(_POW2)
    cond = None
    for p in _bloom_positions(key, m_bits, n_hashes):
        word = F.element_at(arr, (p / 64).cast("int") + 1)
        mask = F.element_at(pow2, F.pmod(p, F.lit(64)).cast("int") + 1)
        hit = word.bitwiseAND(mask) != 0
        cond = hit if cond is None else cond & hit
    return cond


def dedup_bloom_incremental(
    new_df: DataFrame,
    seen_df: DataFrame,
    text_col: str,
    id_col: str,
    key: Column | None = None,
    m_bits: int = 1 << 20,
    n_hashes: int = 4,
) -> DataFrame:
    """``dedup_incremental`` with a Bloom pre-filter on the seen corpus
    — same answer, different data movement. The seen side compresses to
    an ``m_bits`` Bloom filter (one bounded aggregation, built once per
    corpus in production and reused across daily batches); batch rows
    the filter rejects are PROVABLY novel and skip the anti-join
    entirely, so only Bloom-positives (true dupes + the ~1% false
    positives) shuffle against the seen hashes for exact confirmation.
    On a mostly-novel crawl batch that removes ~99% of the anti-join's
    probe side; result is bit-identical to ``dedup_incremental``."""
    h = (key if key is not None else hash64(text_col)).alias("_h")
    batch = dedup_exact(new_df, text_col, id_col, key).withColumn("_h", h)
    words = bloom_build(seen_df.select(h), "_h", m_bits, n_hashes)
    probe = bloom_might_contain(words, F.col("_h"), m_bits, n_hashes)
    novel = batch.filter(~probe)
    maybe = batch.filter(probe).join(seen_df.select(h), "_h", "left_anti")
    return novel.unionByName(maybe).drop("_h")


def dedup_exact_stream(
    df: DataFrame, text_col: str, watermark_col: str, delay: str, key: Column | None = None
) -> DataFrame:
    """Streaming exact dedup: first-seen row per content hash wins,
    with state bounded by the watermark
    (``dropDuplicatesWithinWatermark`` — duplicates arriving within
    ``delay`` of each other are suppressed; state for hashes older
    than the watermark is evicted, so this runs forever at 100 TB/day
    instead of accreting an unbounded seen-set)."""
    h = (key if key is not None else hash64(text_col)).alias("_h")
    return (
        df.withColumn("_h", h)
        .withWatermark(watermark_col, delay)
        .dropDuplicatesWithinWatermark(["_h"])
        .drop("_h")
    )


def dedup_lines_global(
    df: DataFrame, text_col: str, id_col: str, out_col: str | None = None
) -> DataFrame:
    """CORPUS-WIDE exact line dedup, C4-style (Raffel et al. 2020
    §2.2 — public): every line that appears anywhere in the corpus
    survives only in its first occurrence (min (doc_id, line_no));
    documents are reassembled from their surviving lines in order.
    Documents whose lines all lose come back with empty text — row
    count is preserved.

    Scale shape: explode to (id, line_no, line) → one shuffle
    partitioned by (line-hash, line) for the first-occurrence rank
    (hashing first keeps partition routing cheap; the line rides the
    row either way) → one shuffle back on id to rebuild. Boilerplate
    lines (nav bars, cookie banners) are exactly the hot keys here —
    rank-1-of-group is skew-tolerant because only the winner row
    survives the aggregation's map side... but the rank itself must
    see all copies; AQE skew splitting handles the hot line groups."""
    from pyspark.sql import Window

    out_col = out_col or text_col
    lines = df.select(
        F.col(id_col), F.posexplode(F.split(text_col, "\n")).alias("_ln", "_line")
    )
    h = hash64(F.col("_line"))
    w = Window.partitionBy(h, F.col("_line")).orderBy(F.col(id_col), F.col("_ln"))
    keep = lines.withColumn("_rk", F.row_number().over(w)).filter(F.col("_rk") == 1)
    rebuilt = keep.groupBy(id_col).agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("_ln", "_line"))),
                lambda s: s.getField("_line"),
            ),
        ).alias("_rebuilt")
    )
    return (
        df.join(rebuilt, id_col, "left")
        .withColumn(out_col, F.coalesce(F.col("_rebuilt"), F.lit("")))
        .drop("_rebuilt")
    )


def shingle_docs(df: DataFrame, text_col: str, id_col: str, n: int = 3) -> DataFrame:
    """(id, shingle_hash) distinct rows — the exploded form shared by
    Jaccard and MinHash. Hashing the shingle BEFORE the explode keeps
    the shuffled rows at 16 bytes."""
    return (
        _spread(df.select(F.col(id_col), F.col(text_col)))
        .select(F.col(id_col), F.explode(word_shingles(text_col, n)).alias("_sh"))
        .select(id_col, hash64(F.col("_sh")).alias("shingle"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (id_a < id_b, jaccard ≥ t)
    via prefix filtering (PPJoin family: Xiao et al., WWW'08 — public
    algorithm).

    A naive shingle self-join detonates on high-document-frequency
    shingles (one shingle shared by 25k docs → 625M candidate rows; it
    OOMs at sf0.1 already). Prefix filtering is EXACT for a given
    threshold: order each doc's shingles globally by rarity; two sets
    with J ≥ t must share at least one shingle inside each one's first
    ``|s| - ceil(t·|s|) + 1`` shingles. Candidates come only from
    those prefixes (hot shingles land in almost no prefix), plus the
    length filter ``t·|a| ≤ |b| ≤ |a|/t``; each surviving pair is then
    verified with one ``array_intersect`` over the full sets — no
    quadratic key ever shuffles.
    """
    # sh feeds the frequency agg AND the ordering join; docs feeds the
    # prefix explode and both verify joins — cache each sliver once
    # (signature-table lifecycle) instead of re-running the shingle
    # explode + groupBy-collect pipeline per consumer subtree
    sh = _cache_signature_table(shingle_docs(df, text_col, id_col, n))
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_freq"))
    # per doc: shingle array ordered rarest-first (global (freq, shingle)
    # order makes prefixes consistent across docs), plus set size
    docs = _cache_signature_table(
        sh.join(freq, "shingle")
        .groupBy(id_col)
        .agg(
            F.array_sort(F.collect_list(F.struct("_freq", "shingle"))).alias("_ord"),
            F.count(F.lit(1)).alias("_size"),
        )
        .select(
            F.col(id_col).alias("_id"),
            F.transform("_ord", lambda s: s["shingle"]).alias("_toks"),
            "_size",
        )
    )
    prefix_len = (F.col("_size") - F.ceil(F.lit(threshold) * F.col("_size")) + 1).cast("int")
    prefix = docs.select(
        "_id", "_size", F.explode(F.slice("_toks", F.lit(1), prefix_len)).alias("_tok")
    )
    pa = prefix.select(F.col("_id").alias("id_a"), F.col("_size").alias("_sa"), "_tok")
    pb = prefix.select(F.col("_id").alias("id_b"), F.col("_size").alias("_sb"), "_tok")
    cand = (
        pa.join(pb, "_tok")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.col("_sb") * threshold <= F.col("_sa"))
            & (F.col("_sa") * threshold <= F.col("_sb"))
        )
        .select("id_a", "id_b")
        .distinct()
    )
    da = docs.select(F.col("_id").alias("id_a"), F.col("_toks").alias("_ta"), F.col("_size").alias("_sa"))
    db = docs.select(F.col("_id").alias("id_b"), F.col("_toks").alias("_tb"), F.col("_size").alias("_sb"))
    inter = F.size(F.array_intersect("_ta", "_tb"))
    return (
        cand.join(da, "id_a")
        .join(db, "id_b")
        .withColumn("jaccard", F.round(inter / (F.col("_sa") + F.col("_sb") - inter), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def _minhash_wide(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int,
    k: int,
    extra_cols: tuple[str, ...] = (),
    shingler=None,
) -> DataFrame:
    """(id, mh1..mhK) — K permutation minima as WIDE COLUMNS.

    h_i(x) = (a_i * (x mod P) + b_i) mod P with a_i, b_i derived from
    fixed multiplicative constants (i in 1..K); a_i·x < 2^62, no
    overflow. One shingle explode, then a single groupBy(id) whose K
    ``min`` aggregates each apply their permutation map-side — all
    whole-stage codegen. This shape was chosen over two slower ones:
    exploding (shingle × K) rows into a groupBy(id, i) pushes K× the
    rows through the aggregate, and per-row array_min/transform
    formulations run interpreted (higher-order lambdas don't codegen).
    No distinct on shingles — duplicates can't change a minimum.
    Docs with zero shingles produce no group, hence no row.
    ``extra_cols`` ride along through the aggregation (e.g. a side
    marker for incremental dedup). ``shingler`` overrides the shingle
    expression (default: word n-grams) — e.g. ``text.bag_shingles``
    for term-frequency-weighted MinHash."""
    shingles = (
        shingler(F.col(text_col)) if shingler else word_shingles(text_col, n)
    )
    sh = _spread(df.select(F.col(id_col), F.col(text_col), *extra_cols)).select(
        F.col(id_col), *extra_cols, F.explode(shingles).alias("_s")
    ).select(
        id_col, *extra_cols, F.pmod(hash64(F.col("_s")), F.lit(MINHASH_P)).alias("_h")
    )
    mins = [
        F.min(
            F.pmod(
                F.lit((i * _MINHASH_A_MUL) % MINHASH_P) * F.col("_h")
                + F.lit((i * _MINHASH_B_MUL + 17) % MINHASH_P),
                F.lit(MINHASH_P),
            )
        ).alias(f"_mh{i}")
        for i in range(1, k + 1)
    ]
    return sh.groupBy(id_col, *extra_cols).agg(*mins)


def minhash_signatures(
    df: DataFrame, text_col: str, id_col: str, n: int = 3, k: int = MINHASH_K
) -> DataFrame:
    """(id, i, minhash) — K permutation minima per doc (the exploded
    row shape; see ``_minhash_wide`` for the computation)."""
    wide = _minhash_wide(df, text_col, id_col, n, k)
    return wide.select(
        F.col(id_col),
        F.posexplode(F.array([F.col(f"_mh{i}") for i in range(1, k + 1)])).alias(
            "_i0", "minhash"
        ),
    ).select(id_col, (F.col("_i0") + 1).alias("i"), "minhash")


# persisted signature tables from minhash_lsh_pairs runs; see the
# lifecycle comment inside minhash_lsh_pairs.
_SIGNATURE_CACHES: list[DataFrame] = []


def release_signature_caches() -> None:
    """Unpersist any signature table cached by the MinHash pair
    builders. Call after the pairs DataFrame has been fully
    materialized (or at pipeline teardown). Safe at any time: an
    unpersisted table that is still being read simply recomputes from
    lineage."""
    while _SIGNATURE_CACHES:
        _SIGNATURE_CACHES.pop().unpersist()


_SIGNATURE_CACHE_SLOTS = 3

# Persist a sliver only when its SOURCE input is small enough that the
# exploded table (shingles/bands blow up ~100-1000x over compressed
# parquet) sits comfortably inside the storage pool. Above the cap the
# sliver is left to recompute per consumer subtree: measured r7 on
# containment_pairs at sf1 (5.8 MB input, 12 g heap), warm noop reps
# are a stable 22-27 s WITHOUT the persist vs 35-172 s WITH it — a
# resident multi-GB cache squeezes execution memory for every
# downstream join and churns pages the whole rep (guide §5: caching is
# only worth it when recomputing costs more than the memory pressure
# the cache creates). At 100 TB an unconditional persist of a corpus
# sliver is wrong for the same reason; the cap makes the policy
# scale-adaptive rather than tuned to either test scale.
_SLIVER_CACHE_DEFAULT_MAX = 3 << 20


def _sliver_cache_max_bytes() -> int:
    # read per call (it's called once per consumer build), so a
    # runtime override in a long-lived session takes effect — the
    # import-time read silently ignored late env changes
    return int(
        os.environ.get(
            "BYTEWAX_SPARK_SLIVER_CACHE_MAX_INPUT", str(_SLIVER_CACHE_DEFAULT_MAX)
        )
    )


def _input_bytes(df: DataFrame) -> int | None:
    """Total on-disk bytes of the plan's file-source leaves; falls back
    to Catalyst's optimized-plan size estimate when any leaf is not a
    local file (hdfs://, s3://, …) so the size gate still works on
    real clusters instead of silently never persisting there."""
    try:
        files = df.inputFiles()
    except Exception:
        files = None
    if files:
        total = 0
        for f in files:
            p = f[7:] if f.startswith("file://") else f
            if not os.path.exists(p):
                total = -1
                break
            total += os.path.getsize(p)
        if total >= 0:
            return total
    try:
        return int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:
        return None


def _cache_signature_table(banded: DataFrame, force: bool = False) -> DataFrame:
    """Lifecycle for persisted signature tables: at most
    ``_SIGNATURE_CACHE_SLOTS`` stay cached (LRU by registration). A
    repeated run over the same inputs produces a canonically-identical
    plan — reuse the still-cached table (exactly what Spark's
    CacheManager does for any identical cached plan; same staleness
    semantics as ``df.cache()``). A different table beyond the slot
    cap evicts the OLDEST entry BEFORE persisting: CacheManager keys
    on canonicalized plans, so unpersisting an old handle after a new
    persist of the same plan would tear down the shared entry and
    leave its read diamond uncached.

    Why more than one slot (r7): a composed query can hold several
    hot diamonds at once — e.g. the LSH recall audit builds the
    PPJoin doc-set table AND the banded signature table, and
    verified-pairs caches the banded table plus the shingle-set
    table. One slot made the second registration evict the first
    mid-build; each cached sliver is a docs x (id, hash/array) table,
    so the bounded handful is the same executor-memory posture the
    single slot had."""
    for i, prev in enumerate(_SIGNATURE_CACHES):
        if prev._jdf.queryExecution().analyzed().sameResult(
            banded._jdf.queryExecution().analyzed()
        ):
            # refresh LRU position
            _SIGNATURE_CACHES.append(_SIGNATURE_CACHES.pop(i))
            return prev
    # ``force`` is for tables that COLLAPSE their input (e.g. the
    # signature-class table: one row per distinct signature, O(docs)
    # ids total) — the input-size gate below models EXPLODING slivers
    # (shingles/bands, 100-1000x over input) and wrongly refuses
    # these; recomputing them pays a full corpus scan per consumer.
    if not force:
        size = _input_bytes(banded)
        if size is None or size > _sliver_cache_max_bytes():
            # big (or unmeasurable) source: the exploded sliver would
            # not sit comfortably in storage memory — recompute per
            # consumer instead of thrashing the pool (policy note above)
            return banded
    while len(_SIGNATURE_CACHES) >= _SIGNATURE_CACHE_SLOTS:
        _SIGNATURE_CACHES.pop(0).unpersist()
    banded = banded.persist()
    _SIGNATURE_CACHES.append(banded)
    return banded


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    k: int = MINHASH_K,
    bands: int = MINHASH_BANDS,
    shingler=None,
) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash-LSH (id_a < id_b).

    Signature rows → per-(doc, band) bucket key (md5 of the band's
    minima in i-order) → equi-join on (band, bucket). At 100 TB the
    bucket join replaces the quadratic shingle join; callers verify
    candidates with exact Jaccard on the candidate set only.

    Shape (r8): SIGNATURE-CLASS pairing, distinct-free. The r7
    doc-level self-join + ``distinct`` melted down on dup-heavy
    corpora: on the sf1 bench data (50k docs, of which whole clusters
    are near-identical) the bucket join materialized 549M pair slots
    and the distinct shuffled+hashed ~275M rows — 385 s on the bench
    host, with the hottest (band, bucket) holding 19,910 docs. But
    those 50k docs collapse to 2,646 DISTINCT full signatures, so:

    1. group docs by their full banded signature (one small agg) into
       classes ``(_sig, sorted ids)``;
    2. same-class docs are trivially candidates: generate each
       unordered pair once from the sorted id array (posexplode ×
       stepped-sequence stripes, so a 7k-doc class's ~24M pairs spread
       over the cluster instead of one task);
    3. classes (not docs) bucket-join on (band, bucket) — thousands of
       rows, not hundreds of thousands — oriented by each class's min
       id and de-duplicated across bands by a FIRST-MATCHING-BAND
       filter (codegen comparisons on the carried signature arrays);
       the surviving class pairs then expand to id pairs via one
       explode of the left class's ids plus a join back to the small
       (class, id) table — never by carrying both id arrays through a
       double explode, whose per-row array copies OOM'd a 12 g heap
       at sf1.

    Every unordered candidate pair appears exactly once by
    construction (classes partition the docs; a class pair survives
    only at its first shared band), so no ``distinct`` — the 275M-row
    exchange and its 200M-entry hash maps are gone; the only shuffles
    left are the signature aggregation, the tiny class agg, and the
    class-level join. Value-identical to the r7 shape (same candidate
    set; oracle hash-exact), measured 385 s → ~8 s at sf1."""
    shuffle_parts = int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    rows_per_band = k // bands
    wide = _minhash_wide(df, text_col, id_col, n, k, shingler=shingler)
    bucket_cols = [
        F.md5(
            F.concat_ws(
                ",",
                *[
                    F.col(f"_mh{i}").cast("string")
                    for i in range(
                        j * rows_per_band + 1, (j + 1) * rows_per_band + 1
                    )
                ],
            )
        ).alias(f"_b{j}")
        for j in range(bands)
    ]
    sig = wide.select(F.col(id_col), F.array(*bucket_cols).alias("_sig"))
    cls = (
        sig.groupBy("_sig")
        .agg(F.sort_array(F.collect_list(F.col(id_col))).alias("_ids"))
        .select(
            "_sig",
            "_ids",
            F.element_at("_ids", 1).alias("_min"),
            F.size("_ids").alias("_m"),
        )
    )
    # four consumers (within-pairs, both class-join sides, the
    # expand-back table); forced persist — cls collapses the corpus to
    # one row per distinct signature (O(docs) bytes total), so caching
    # it is strictly cheaper than even one recompute of the full
    # shingle+minhash pipeline (measured sf1: 31 s -> 12 s warm)
    cls = _cache_signature_table(cls, force=True)
    # (a) within-class pairs: ids are sorted, so posexplode × slice
    # emits each unordered pair once. Stripes: index i goes to stripe
    # i % C, one row per (class, stripe) round-robined so a hot class
    # fans out over the cluster; the stepped sequence regenerates the
    # stripe's indices after the shuffle (ships C array copies per
    # class, not one per element).
    C = 32
    stripes = (
        cls.filter(F.col("_m") >= 2)
        .select(
            "_ids",
            "_m",
            F.explode(
                F.sequence(
                    F.lit(0), F.least(F.lit(C - 1), F.col("_m") - 2)
                )
            ).alias("_c"),
        )
        .repartition(shuffle_parts)
        .select(
            "_ids",
            F.explode(
                F.sequence(F.col("_c"), F.col("_m") - 2, F.lit(C))
            ).alias("_i"),
        )
    )
    within = stripes.select(
        F.element_at("_ids", F.col("_i") + 1).alias("id_a"),
        F.explode(
            F.slice("_ids", F.col("_i") + 2, F.size("_ids"))
        ).alias("id_b"),
    )
    # (b) cross-class pairs via the class-level bucket join
    ca = cls.select(
        F.col("_min").alias("_mina"),
        F.col("_ids").alias("_idsa"),
        F.col("_sig").alias("_siga"),
        F.posexplode("_sig").alias("band", "bucket"),
    )
    cb = cls.select(
        F.col("_min").alias("_minb"),
        F.col("_ids").alias("_idsb"),
        F.col("_sig").alias("_sigb"),
        F.posexplode("_sig").alias("band", "bucket"),
    )
    first_band = F.lit(True)
    for e in range(bands - 1):
        first_band = first_band & (
            (F.col("band") <= F.lit(e))
            | (
                F.element_at("_siga", e + 1)
                != F.element_at("_sigb", e + 1)
            )
        )
    cp = (
        ca.join(cb, ["band", "bucket"])
        .filter(F.col("_mina") < F.col("_minb"))
        .filter(first_band)
    )
    # expand class pairs to id pairs: explode the left ids (payload is
    # just the 8-byte right-class key), spread round-robin so one hot
    # class pair's expansion fans out, then join the right ids back
    # from the small (class-min, id) table
    by_class = cls.select(
        F.col("_min").alias("_minb"), F.explode("_ids").alias("_xb")
    )
    cross = (
        cp.select(F.explode("_idsa").alias("_xa"), "_minb")
        .repartition(shuffle_parts)
        .join(by_class, "_minb")
        .select(
            F.least("_xa", "_xb").alias("id_a"),
            F.greatest("_xa", "_xb").alias("id_b"),
        )
    )
    return within.unionByName(cross)


def minhash_lsh_verified_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    k: int = MINHASH_K,
    bands: int = MINHASH_BANDS,
    threshold: float = 0.5,
    shingler=None,
) -> DataFrame:
    """MinHash-LSH candidates VERIFIED with exact Jaccard — the full
    production near-dup product (candidates alone over-report; a real
    pipeline always re-checks). Returns (id_a, id_b, jaccard ≥ t).

    Scale shape: the quadratic work is bounded by the LSH candidate
    set (bucket-join, uniform keys); exact Jaccard then runs ONCE per
    candidate pair via each side's distinct-shingle array —
    ``array_intersect`` inside a projection, no extra shuffle beyond
    the two id equi-joins that re-attach the (id, shingle-array) table.
    The shingle arrays never self-join, and they are built IN-ROW
    (``array_distinct`` over the shingle transform) — the exploded
    (id, shingle) form would pay an explode + groupBy/collect shuffle
    just to reassemble what each row already had."""
    cand = minhash_lsh_pairs(df, text_col, id_col, n, k, bands, shingler=shingler)
    sets = _spread(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col),
        F.array_sort(
            F.array_distinct(
                F.transform(
                    shingler(F.col(text_col)) if shingler else word_shingles(text_col, n),
                    hash64,
                )
            )
        ).alias("_toks"),
    )
    # the set table feeds BOTH verify joins; uncached, each side would
    # re-run the interpreted per-doc shingle+md5 transform over the
    # whole corpus
    sets = _cache_signature_table(sets)
    da = sets.select(F.col(id_col).alias("id_a"), F.col("_toks").alias("_ta"))
    db = sets.select(F.col(id_col).alias("id_b"), F.col("_toks").alias("_tb"))
    inter = F.size(F.array_intersect("_ta", "_tb"))
    union = F.size("_ta") + F.size("_tb") - inter
    return (
        cand.join(da, "id_a")
        .join(db, "id_b")
        .withColumn("jaccard", F.round(inter / union, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def _banded(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int,
    k: int,
    bands: int,
    extra_cols: tuple[str, ...] = (),
    shingler=None,
) -> DataFrame:
    """(id[, extra...], band, bucket) LSH rows — the shared banding step."""
    rows_per_band = k // bands
    wide = _minhash_wide(df, text_col, id_col, n, k, extra_cols, shingler=shingler)
    band_structs = F.array(
        [
            F.struct(
                F.lit(j).cast("int").alias("band"),
                F.md5(
                    F.concat_ws(
                        ",",
                        *[
                            F.col(f"_mh{i}").cast("string")
                            for i in range(
                                j * rows_per_band + 1, (j + 1) * rows_per_band + 1
                            )
                        ],
                    )
                ).alias("bucket"),
            )
            for j in range(bands)
        ]
    )
    return wide.select(
        F.col(id_col), *extra_cols, F.explode(band_structs).alias("_bb")
    ).select(
        id_col,
        *extra_cols,
        F.col("_bb.band").alias("band"),
        F.col("_bb.bucket").alias("bucket"),
    )


def minhash_lsh_recall(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    k: int = MINHASH_K,
    bands: int = MINHASH_BANDS,
    threshold: float = 0.5,
) -> DataFrame:
    """Recall AND precision audit of banded MinHash-LSH against EXACT
    n-gram Jaccard — the parameter-tuning gate before trusting a
    (k, bands) choice on a real corpus. One row
    ``(n_true, n_cand, n_caught, recall_ppm, precision_ppm)``:
    ``n_true`` counts the exact Jaccard >= ``threshold`` pairs
    (:func:`ngram_jaccard_pairs`, PPJoin prefix-filtered — exact, no
    quadratic shingle join), ``n_cand`` the banded LSH candidates
    (:func:`minhash_lsh_pairs`, same shingling), ``n_caught`` their
    intersection. ``recall_ppm = n_caught/n_true`` grades parameter
    SAFETY (missed true dups survive dedup); ``precision_ppm =
    n_caught/n_cand`` grades verification COST (each false candidate
    buys one wasted exact-Jaccard check downstream). Ratios read
    1,000,000 when their denominator is 0 (vacuous). The theoretical
    recall curve is ≈ 1-(1-J^(k/bands))^bands; this measures the real
    thing on the real corpus.

    Scale shape: candidates are the production banded join; truth is
    prefix-filtered exact — the audit's cost driver, so at corpus
    scale run it on a uniform document SAMPLE
    (:func:`bytewax_spark.functions.sampling.sample_fraction`) the
    same way the kNN label audit samples probes; the estimates are
    unbiased because sampling documents subsamples pairs uniformly.
    The caught-join is a pair-key semi-join — linear in the true-pair
    count."""
    truth = ngram_jaccard_pairs(
        df, text_col, id_col, n=n, threshold=threshold
    ).select("id_a", "id_b")
    cand = minhash_lsh_pairs(df, text_col, id_col, n=n, k=k, bands=bands)
    caught = truth.join(cand, ["id_a", "id_b"], "left_semi")
    t = truth.agg(F.count(F.lit(1)).alias("n_true"))
    k_ = cand.agg(F.count(F.lit(1)).alias("n_cand"))
    c = caught.agg(F.count(F.lit(1)).alias("n_caught"))
    vac = F.lit(1_000_000).cast("long")
    return t.crossJoin(k_).crossJoin(c).select(
        "n_true",
        "n_cand",
        "n_caught",
        F.when(F.col("n_true") == 0, vac)
        .otherwise(F.expr("(n_caught * 1000000L) div n_true"))
        .alias("recall_ppm"),
        F.when(F.col("n_cand") == 0, vac)
        .otherwise(F.expr("(n_caught * 1000000L) div n_cand"))
        .alias("precision_ppm"),
    )


def minhash_lsh_pairs_incremental(
    new_df: DataFrame,
    seen_df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    k: int = MINHASH_K,
    bands: int = MINHASH_BANDS,
) -> DataFrame:
    """Near-dup candidates of a NEW batch against the already-ingested
    corpus — the daily-crawl shape (``dedup_incremental``'s exact
    anti-join, upgraded to MinHash). Returns (new_id, seen_id) pairs
    whose LSH band buckets collide; callers drop ``new_id`` matches or
    verify with exact Jaccard on the candidate set.

    Scale: both sides reduce to (id, band, bucket) rows before the
    equi-join — the seen corpus ships 16-byte buckets, never text —
    and the signatures for BOTH sides come from ONE union-tagged
    pass (a side marker rides the aggregation), so the corpus scans
    and shingle-explodes once, not once per side; the tagged table is
    persisted (shared cache lifecycle) because both join sides filter
    it. In production the seen side's signature table is a PERSISTED
    artifact (write ``_banded``'s output once per ingest and append),
    so each daily batch costs one signature pass over the batch plus
    a bucket join, not a rescan of the corpus. No self-join:
    new×seen only, so a batch never pairs with itself here (run
    ``minhash_lsh_pairs`` within the batch for that)."""
    tag = lambda df, side: df.select(  # noqa: E731
        F.col(id_col), F.col(text_col), F.lit(side).alias("_side")
    )
    both = tag(new_df, 0).unionByName(tag(seen_df, 1))
    banded = _banded(both, text_col, id_col, n, k, bands, extra_cols=("_side",))
    banded = _cache_signature_table(banded)
    nb = banded.filter(F.col("_side") == 0).select(
        F.col(id_col).alias("new_id"), "band", "bucket"
    )
    sb = banded.filter(F.col("_side") == 1).select(
        F.col(id_col).alias("seen_id"), "band", "bucket"
    )
    return nb.join(sb, ["band", "bucket"]).select("new_id", "seen_id").distinct()


def simhash(df: DataFrame, text_col: str, id_col: str, bits: int = 16) -> DataFrame:
    """(id, simhash) — per-doc SimHash fingerprint over token hashes.

    Near-dup docs differ in few bits; at scale group directly on the
    fingerprint (or on rotated bands for hamming>0 tolerance) — no
    pairwise join.

    Shape (r7, the ``_minhash_wide`` posture): explode DISTINCT tokens
    to rows, hash each token ONCE in a whole-stage-codegen projection,
    then one ``groupBy(id)`` whose ``bits`` ``sum`` votes all run
    map-side partial aggregation — the shuffle carries one
    (id, votes...) row per doc per partition. The previous array-only
    form (``aggregate`` HOF per bit) evaluated interpreted AND inlined
    the full tokenize+md5 pipeline into every bit's lambda (no
    cross-expression CSE on the CodegenFallback path): 16 bits × the
    whole corpus re-hashed 16× (measured in the r7 plan dump — 16
    ``aggregate(transform(...md5...))`` copies in one projection).
    ``explode_outer`` keeps zero-token docs (null/empty text): their
    ``_h`` is null, votes stay null (the ±1 term guards on non-null),
    and the fp falls to 0 exactly as the array form produced."""
    toks = F.array_distinct(tokenize(text_col))
    rows = _spread(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col), F.explode_outer(toks).alias("_t")
    ).select(
        id_col, F.pmod(hash64(F.col("_t")), F.lit(1 << bits)).alias("_h")
    )
    votes = [
        F.sum(
            F.when(
                F.pmod(F.shiftright(F.col("_h"), i), F.lit(2)) == 1, F.lit(1)
            ).when(F.col("_h").isNotNull(), F.lit(-1))
        ).alias(f"_v{i}")
        for i in range(bits)
    ]
    agg = rows.groupBy(id_col).agg(*votes)
    fp = None
    for i in range(bits):
        bit = F.when(F.col(f"_v{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
        fp = bit if fp is None else fp + bit
    return agg.select(F.col(id_col), fp.cast("long").alias("simhash"))


def _spread(df: DataFrame) -> DataFrame:
    """Parallelism guard for md5-heavy stages that sit directly on a
    scan: single-row-group parquet files give the scan ONE split, so
    the hash/explode projection serializes onto one core. No-op when
    the scan already splits (always true at scale) — see
    :func:`bytewax_spark.io.ensure_min_partitions`. Only call on
    scan+project frames (a frame with upstream exchanges would be
    planned eagerly by the ``.rdd`` probe under AQE)."""
    from ..io import ensure_min_partitions

    return ensure_min_partitions(df)


def _pair_parallelism(df: DataFrame) -> int:
    """The session's shuffle-partition count — the explicit partition
    count that pins comparator-join fan-out against AQE coalescing."""
    return int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200"))


def embedding_cosine_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    block_col: str,
    threshold: float = 0.9,
    n_slices: int = 1,
    impl: str = "arrow",
) -> DataFrame:
    """Embedding near-dup pairs within blocks (id_a < id_b, cos ≥ t).
    Rows with a NULL block key are dropped by BOTH impls (the SQL
    equi self-join can never match them; the arrow path filters them
    before grouping so the two plans agree by construction).

    ``impl="arrow"`` (the default since r7; parity-tested against the
    SQL plan in tests/test_functions.py, 4.0 s → 0.67 s on 8 M pairs)
    replaces the in-block self-join with one ``applyInPandas`` kernel
    per block: the block's vectors arrive once, numpy computes the
    upper-triangle cosine matrix in bounded row blocks (round-6 THEN
    threshold, matching the SQL predicate), and only surviving
    (id_a, id_b, cosine) rows return. Same motivation as
    ``similarity.knn_label_agreement_lsh``: Spark's higher-order array
    functions evaluate interpreted (~17 µs per 64-dim cosine), so the
    join shape pays ~7× more per pair. ``impl="sql"`` keeps the
    pure-JVM expression plan. ``n_slices`` applies only to
    the SQL path; the kernel's unit of work is the block itself.

    Blocked self-join: cosine is only computed inside ``block_col``
    groups (label, IVF cell, LSH bucket) — the 100 TB pattern where the
    all-pairs join is impossible. Dot products via ``zip_with`` +
    ``aggregate``: JVM-side, no UDF. Norms are computed per ROW before
    the join (N sqrt-sums instead of |pairs| — pair count is quadratic
    in block size, so this cuts ~2/3 of per-pair arithmetic);
    value-identical to per-pair evaluation, same ops in the same
    order.

    Parallelism is PINNED, not left to the optimizer: the left side is
    explicitly repartitioned to ``spark.sql.shuffle.partitions`` on
    ``(_slice, block)``.  The shuffled bytes here are tiny (narrow id +
    vector projections) but the downstream cost is per-PAIR — quadratic
    in block size — which AQE cannot see, so without the explicit count
    it coalesces the exchange and the whole comparator pass serializes
    into a handful of tasks (measured 12x degradation under
    contention; same trap fixed in ``linkage.fuzzy_self_pairs``).

    ``n_slices`` > 1 additionally splits each block's pair set across
    slices — the lever when the BLOCK COUNT is small or one block is
    huge: the left side is sliced by a hash of the id, the right side
    replicated to every slice, so a single block's pairs spread over
    ``n_slices`` tasks.  Each unordered pair still lands in exactly one
    (id_a's) slice — the pair set is unchanged, only its distribution.
    Cost: the right-side projection is shuffled ``n_slices`` times."""
    if n_slices < 1:
        raise ValueError(f"n_slices must be >= 1, got {n_slices}")
    if impl == "arrow":
        return _embedding_cosine_pairs_arrow(
            df, vec_col, id_col, block_col, threshold
        )
    if impl != "sql":
        raise ValueError(f"impl must be 'arrow' or 'sql', got {impl!r}")
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    nrm = F.sqrt(
        F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )
    base = df.filter(F.col(block_col).isNotNull()).select(
        F.col(id_col), F.col(block_col).alias("_blk"), v.alias("_v"), nrm.alias("_n")
    )
    a = base.select(
        F.col(id_col).alias("id_a"), "_blk", F.col("_v").alias("_va"), F.col("_n").alias("_na")
    ).withColumn(
        "_slice", F.pmod(F.xxhash64(F.col("id_a")), F.lit(n_slices))
    ).repartition(_pair_parallelism(df), "_slice", "_blk")
    b = base.select(
        F.col(id_col).alias("id_b"), "_blk", F.col("_v").alias("_vb"), F.col("_n").alias("_nb")
    ).withColumn("_slice", F.explode(F.sequence(F.lit(0), F.lit(n_slices - 1))))
    dot = F.aggregate(
        F.zip_with("_va", "_vb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    return (
        a.join(b, ["_blk", "_slice"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", F.round(dot / (F.col("_na") * F.col("_nb")), 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def _embedding_cosine_pairs_arrow(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    block_col: str,
    threshold: float,
) -> DataFrame:
    """Per-block Arrow kernel for :func:`embedding_cosine_pairs`:
    rows sorted by id inside the block so the upper triangle of the
    cosine matrix enumerates exactly the ``id_a < id_b`` pairs; the
    cosine is ``(V·Vᵀ) / outer(norms)`` in float64, rounded HALF-UP to
    6 dp (``similarity.round6_half_up`` — the rule Spark ``F.round``
    and DuckDB ``ROUND`` share) BEFORE the ``>= threshold`` test — the
    same predicate order as the SQL plan, so boundary pairs agree.

    Skew guard: the matrix is computed in ROW BLOCKS sized <= ~64 MB
    of float64 so a degenerate block (mass-duplicate vectors) costs
    quadratic TIME but never materializes a quadratic dense matrix in
    one task. Output pairs are unchanged — block [s:e) emits exactly
    the pairs whose smaller-sorted-index row lands in it."""
    import numpy as np
    import pandas as pd

    from bytewax_spark.functions import similarity as _sim
    from bytewax_spark.functions.similarity import round6_half_up

    id_dt = df.schema[id_col].dataType.simpleString()
    schema = f"id_a {id_dt}, id_b {id_dt}, cosine double"
    block_bytes = _sim._KERNEL_BLOCK_BYTES  # bind by value: ships to executors

    def kernel(pdf: "pd.DataFrame") -> "pd.DataFrame":
        n = len(pdf)
        if n < 2:
            return pd.DataFrame(
                {
                    "id_a": pd.Series(dtype="object"),
                    "id_b": pd.Series(dtype="object"),
                    "cosine": pd.Series(dtype="float64"),
                }
            )
        pdf = pdf.sort_values(id_col, kind="stable")
        ids = pdf[id_col].to_numpy()
        v = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
        norms = np.sqrt((v * v).sum(axis=1))
        blk = max(1, min(n, block_bytes // (n * 8)))
        out_a, out_b, out_c = [], [], []
        for s in range(0, n, blk):
            e = min(s + blk, n)
            cblk = round6_half_up(
                (v[s:e] @ v.T) / np.outer(norms[s:e], norms)
            )
            # strict upper triangle of the FULL matrix restricted to
            # rows [s, e): columns j > global row index i
            ia, ib = np.nonzero(
                (cblk >= threshold)
                & (np.arange(n)[None, :] > (s + np.arange(e - s))[:, None])
            )
            out_a.append(ids[ia + s])
            out_b.append(ids[ib])
            out_c.append(cblk[ia, ib])
        return pd.DataFrame(
            {
                "id_a": np.concatenate(out_a),
                "id_b": np.concatenate(out_b),
                "cosine": np.concatenate(out_c),
            }
        )

    src = df.filter(F.col(block_col).isNotNull()).select(
        F.col(id_col),
        F.col(block_col).alias("_blk"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_v"),
    )
    # pin the kernel stage's fan-out: the bucket shuffle is tiny in
    # BYTES so AQE coalesces it, but per-task cost is per-PAIR
    # (quadratic in block size) — coalescing serializes the kernel
    # pass (same 12x-degradation trap as the SQL path's pinned
    # repartition). An explicit-count HashPartitioning on _blk
    # satisfies applyInPandas' clustering requirement, so no second
    # exchange is added.
    src = src.repartition(_pair_parallelism(df), "_blk")
    return src.groupBy("_blk").applyInPandas(kernel, schema)


def lsh_cosine_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    dims: int,
    n_planes: int | None = None,
    threshold: float = 0.9,
    seed: int = 42,
    target_bucket_rows: int = 4096,
    multiprobe: int = 0,
    n_slices: int | None = None,
    impl: str = "arrow",
) -> DataFrame:
    """Embedding near-dup pairs on an UNblocked table: LSH buckets as
    the blocking key, exact cosine inside each bucket.

    ``impl="arrow"`` (default, r7) runs the pair stage as per-bucket
    numpy kernels — identical rows to ``impl="sql"``'s pure-JVM join
    plans (parity tests in tests/test_functions.py); the rationale is
    the measured ~17 µs/cosine interpreted-HOF tax (BASELINE.md r6).
    ``multiprobe=0`` delegates to :func:`embedding_cosine_pairs`;
    ``multiprobe>0`` uses the dedicated probe×home kernel below
    (isolated sf0.1: 2.2 s SQL → measured in BASELINE.md r7).

    The scale path when no natural block (label, cell) exists: the
    bucket is a map-side expression (plan-time hyperplane literals —
    see ``similarity.lsh_bucket_col``), so the only shuffle is the
    self-join on the ~2^n_planes uniform bucket keys. At 100 TB the
    candidate set is |bucket|-bounded instead of N².

    ``n_planes=None`` (default) sizes the bucket space from the table:
    one ``df.count()`` at plan-construction time (cheap — parquet
    row-group metadata under a trivial scan) feeds
    ``similarity.adaptive_n_planes``, keeping the EXPECTED bucket near
    ``target_bucket_rows`` rows as the corpus grows instead of letting
    a fixed 2^8 bucket space go quadratic. Pass an explicit
    ``n_planes`` for reproducible bucketing independent of table size
    (e.g. to match a SQL oracle).

    ``multiprobe=1`` is the recall knob: each vector ALSO probes the
    ``n_planes`` buckets at hamming distance 1 (the buckets a
    borderline vector could have landed in), recovering most pairs a
    single hard bucket boundary would split. Each qualifying pair
    appears exactly once (a pair's buckets differ in at most one bit,
    so exactly one probe of the lower id matches the higher id's exact
    bucket — no dedup pass needed).

    Multiprobe shuffle shape, deliberately: vectors RIDE the probe
    expansion ((p+1)·N vector rows through one exchange) and cosine
    evaluates inside the join projection with an immediate filter —
    candidates never materialize. The tempting alternative (expand
    ids only, join vectors back per candidate) is strictly worse: the
    candidate stream is (p+1)·bucket_size·N/2 pairs — orders of
    magnitude larger than the vector expansion — and re-attaching
    vectors means shuffling IT twice. Measured 6.9 s → 8.3 s at
    sf0.1; the gap widens with bucket size.

    ``n_slices`` (default auto) splits each bucket's pair set across
    id-hash slices and PINS the pair stage's partition count at
    ``spark.sql.shuffle.partitions`` via an explicit-count repartition
    of the probe side — the shuffled bytes are small so AQE would
    otherwise coalesce the exchange, but the downstream cost is
    per-PAIR (quadratic in bucket size), so coalescing serializes the
    comparator pass into a few tasks (measured 12x degradation under
    contention). Auto sizes slices so ``buckets x slices`` comfortably
    exceeds the shuffle partition count; the pair SET is unchanged
    (each pair lands in exactly one slice — id_a's)."""
    from bytewax_spark.functions.similarity import (
        adaptive_n_planes,
        as_double,
        lsh_bucket_col,
        lsh_probe_buckets,
    )

    if n_planes is None:
        n_planes = adaptive_n_planes(df.count(), target_bucket_rows)
    if n_slices is None:
        # enough slices that buckets x slices >= 2 x shuffle partitions;
        # 1 when the bucket space alone already dwarfs the task count
        n_slices = max(1, -(-2 * _pair_parallelism(df) // (1 << n_planes)))
    bucket = lsh_bucket_col(vec_col, n_planes, dims, seed)
    if multiprobe == 0:
        blocked = df.withColumn("_lsh_bucket", bucket)
        return embedding_cosine_pairs(
            blocked, vec_col, id_col, "_lsh_bucket", threshold,
            n_slices=n_slices, impl=impl,
        )
    if impl == "arrow":
        return _lsh_multiprobe_pairs_arrow(
            df, vec_col, id_col, threshold, n_planes, dims, seed, multiprobe
        )
    if impl != "sql":
        raise ValueError(f"impl must be 'arrow' or 'sql', got {impl!r}")
    if n_slices < 1:
        raise ValueError(f"n_slices must be >= 1, got {n_slices}")
    vv = as_double(vec_col)
    nrm = F.sqrt(
        F.aggregate(F.transform(vv, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )
    base = df.select(F.col(id_col), bucket.alias("_b"), vv.alias("_v"), nrm.alias("_n"))
    a = base.select(
        F.col(id_col).alias("id_a"),
        F.col("_v").alias("_va"),
        F.col("_n").alias("_na"),
        F.explode(lsh_probe_buckets(F.col("_b"), n_planes, multiprobe)).alias("_blk"),
    ).withColumn(
        "_slice", F.pmod(F.xxhash64(F.col("id_a")), F.lit(n_slices))
    ).repartition(_pair_parallelism(df), "_slice", "_blk")
    b = base.select(
        F.col(id_col).alias("id_b"),
        F.col("_v").alias("_vb"),
        F.col("_n").alias("_nb"),
        F.col("_b").alias("_blk"),
    ).withColumn("_slice", F.explode(F.sequence(F.lit(0), F.lit(n_slices - 1))))
    dot = F.aggregate(
        F.zip_with("_va", "_vb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    # norms ride the rows (computed once per vector, not per pair);
    # value-identical to per-pair evaluation
    return (
        a.join(b, ["_blk", "_slice"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", F.round(dot / (F.col("_na") * F.col("_nb")), 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def _lsh_multiprobe_pairs_arrow(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float,
    n_planes: int,
    dims: int,
    seed: int,
    multiprobe: int,
) -> DataFrame:
    """Per-bucket Arrow kernel for :func:`lsh_cosine_pairs` with
    ``multiprobe > 0`` — identical pair set to the SQL join plan.

    Emission rule mirrors the SQL shape exactly: a pair ``(a, b)``
    with ``id_a < id_b`` is emitted in bucket ``home(b)`` iff that
    bucket is in a's probe set (home + hamming-``multiprobe`` flips).
    Hamming is symmetric, so every qualifying pair is probed from its
    LOWER id exactly once — no dedup pass. Each bucket's group holds
    its HOME rows plus incoming PROBE rows (role flag ``_h``); the
    kernel computes the probe×home cosine matrix in <=64 MB row
    blocks (skew guard, same as the other kernels), masks
    ``id_probe < id_home``, rounds HALF-UP to 6 dp, then thresholds —
    the SQL predicate order.

    Shuffle shape vs SQL: (p+1)·N probe vector rows + N home rows
    through ONE pinned exchange — strictly fewer bytes than the SQL
    path, which additionally replicates the home side ``n_slices``
    times."""
    import numpy as np
    import pandas as pd

    from bytewax_spark.functions.similarity import (
        as_double,
        lsh_bucket_col,
        lsh_probe_buckets,
        round6_half_up,
    )
    from bytewax_spark.functions.similarity import _KERNEL_BLOCK_BYTES

    id_dt = df.schema[id_col].dataType.simpleString()
    schema = f"id_a {id_dt}, id_b {id_dt}, cosine double"
    block_bytes = _KERNEL_BLOCK_BYTES  # bind by value: ships to executors

    def kernel(pdf: "pd.DataFrame") -> "pd.DataFrame":
        probe = pdf[pdf["_h"] == 0]
        home = pdf[pdf["_h"] == 1]
        np_, nh = len(probe), len(home)
        if np_ == 0 or nh == 0:
            return pd.DataFrame(
                {
                    "id_a": pd.Series(dtype="object"),
                    "id_b": pd.Series(dtype="object"),
                    "cosine": pd.Series(dtype="float64"),
                }
            )
        pid = probe[id_col].to_numpy()
        hid = home[id_col].to_numpy()
        pv = np.stack(probe["_v"].to_numpy()).astype(np.float64)
        hv = np.stack(home["_v"].to_numpy()).astype(np.float64)
        pn = np.sqrt((pv * pv).sum(axis=1))
        hn = np.sqrt((hv * hv).sum(axis=1))
        blk = max(1, min(np_, block_bytes // (nh * 8)))
        out_a, out_b, out_c = [], [], []
        for s in range(0, np_, blk):
            e = min(s + blk, np_)
            cblk = round6_half_up(
                (pv[s:e] @ hv.T) / np.outer(pn[s:e], hn)
            )
            ia, ib = np.nonzero(
                (cblk >= threshold) & (pid[s:e, None] < hid[None, :])
            )
            out_a.append(pid[ia + s])
            out_b.append(hid[ib])
            out_c.append(cblk[ia, ib])
        return pd.DataFrame(
            {
                "id_a": np.concatenate(out_a),
                "id_b": np.concatenate(out_b),
                "cosine": np.concatenate(out_c),
            }
        )

    bucket = lsh_bucket_col(vec_col, n_planes, dims, seed)
    base = df.select(
        F.col(id_col), bucket.alias("_b"), as_double(vec_col).alias("_v")
    )
    probes = base.select(
        id_col,
        "_v",
        F.explode(
            lsh_probe_buckets(F.col("_b"), n_planes, multiprobe)
        ).alias("_blk"),
        F.lit(0).alias("_h"),
    )
    homes = base.select(
        id_col, "_v", F.col("_b").alias("_blk"), F.lit(1).alias("_h")
    )
    u = probes.unionByName(homes)
    # pinned fan-out, same rationale as _embedding_cosine_pairs_arrow
    u = u.repartition(_pair_parallelism(df), "_blk")
    return u.groupBy("_blk").applyInPandas(kernel, schema)


def lsh_cosine_recall(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    block_col: str,
    dims: int,
    n_planes: int | None = None,
    threshold: float = 0.9,
    seed: int = 42,
    multiprobe: int = 0,
) -> DataFrame:
    """Recall audit of hyperplane-LSH cosine bucketing — the
    vector-side twin of :func:`minhash_lsh_recall`: one row
    ``(n_true, n_caught, recall_ppm)`` where ``n_true`` counts the
    exact cosine >= ``threshold`` pairs within ``block_col`` groups
    (:func:`embedding_cosine_pairs` — the computable truth: a label /
    cluster-cell / sampled block bounds the quadratic exact pass) and
    ``n_caught`` those of them the LSH bucket join
    (:func:`lsh_cosine_pairs` — GLOBAL, no blocks) also finds.
    ``recall_ppm`` is 1,000,000 when there are no true pairs.

    No precision column on purpose: ``lsh_cosine_pairs`` verifies the
    exact cosine inside each bucket, so every candidate it returns IS
    a true pair (precision 1.0 by construction) — the tunables here
    are ``n_planes``/``multiprobe``, which trade bucket size
    (quadratic per-bucket cost) against boundary-split recall, and
    this measures that recall on the real corpus (theory per pair:
    (1 - angle/pi)^n_planes without multiprobe).

    Scale shape: truth is block-bounded exact (run on a blocked
    SAMPLE at corpus scale — unbiased for within-block pairs);
    candidates are the production bucket kernel; the caught-join is a
    pair-key semi-join."""
    truth = embedding_cosine_pairs(
        df, vec_col, id_col, block_col, threshold
    ).select("id_a", "id_b")
    cand = lsh_cosine_pairs(
        df,
        vec_col,
        id_col,
        dims=dims,
        n_planes=n_planes,
        threshold=threshold,
        seed=seed,
        multiprobe=multiprobe,
    ).select("id_a", "id_b")
    caught = truth.join(cand, ["id_a", "id_b"], "left_semi")
    t = truth.agg(F.count(F.lit(1)).alias("n_true"))
    c = caught.agg(F.count(F.lit(1)).alias("n_caught"))
    return t.crossJoin(c).select(
        "n_true",
        "n_caught",
        F.when(F.col("n_true") == 0, F.lit(1_000_000).cast("long"))
        .otherwise(F.expr("(n_caught * 1000000L) div n_true"))
        .alias("recall_ppm"),
    )


def semdedup(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    cell_col: str,
    threshold: float = 0.9,
    n_slices: int = 1,
) -> DataFrame:
    """Semantic dedup over an embedding column, SemDeDup-shaped
    (Abbas et al. 2023, arXiv:2303.09540 — public): cluster the corpus
    (k-means cells via ``clustering.kmeans_fit``/``assign_cells``, or
    any existing block column), then within each cell drop every
    document that sits within ``threshold`` cosine of a KEPT document.

    Representative policy: min-id wins — a row is dropped iff some
    lower-id row in its cell is within threshold. (The paper keeps the
    point farthest from the centroid; the deterministic id rule is the
    oracle-checkable variant, and the policy only picks WHICH member of
    a near-dup neighborhood survives.) Min-id-wins is one
    ``embedding_cosine_pairs`` call (cell-blocked self-join — never
    all-pairs) plus an anti-join on the loser ids: at 100 TB the
    quadratic term is bounded by the largest cell, which the k-means k
    controls directly (k ~ N/target_cell_size, same sizing rule as IVF).
    """
    pairs = embedding_cosine_pairs(
        df, vec_col, id_col, cell_col, threshold, n_slices=n_slices
    )
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, id_col, "left_anti")


def dedup_spans_global(
    df: DataFrame,
    text_col: str,
    id_col: str,
    span_len: int = 8,
    out_col: str | None = None,
) -> DataFrame:
    """CORPUS-WIDE exact-substring span dedup (the ExactSubstr step of
    Lee et al. 2021, arXiv:2107.06499 — public): every ``span_len``-token
    window that occurs anywhere else in the corpus survives only in its
    first occurrence; later occurrences have the window's token range
    REMOVED from their document (overlapping removed ranges merge), and
    documents reassemble from the kept tokens. Row count is preserved;
    fully-deduplicated docs come back empty.

    Occurrence order is (doc_id, position) — deterministic and
    partition-independent. Where ``dedup_lines_global`` needs duplicate
    LINE boundaries, this catches copied passages at any offset — the
    boilerplate/mirror case line dedup misses.

    Scale shape (all linear in token count, never quadratic):
    1. one explode to (id, pos, span-hash) rows — the hash is computed
       inside the row before exploding, so shuffled rows are 24 bytes
       regardless of span text;
    2. per-hash first occurrence via ``min(struct(id, pos))`` — a
       PARTIALLY aggregable min, so hot boilerplate spans combine
       map-side and never pile a skewed key onto one reducer (the
       row_number-window formulation this replaced gave each span hash
       to exactly one task AND re-evaluated an O(ranges²) interval
       fold once per token after projection collapse — 52 s at sf1
       where this shape is ~5 s);
    3. later occurrences explode to their covered token indices and
       collect_set to ONE sorted int array per doc (one id shuffle,
       map-side partial) — the covered set crosses the join as a real
       column, so nothing upstream can be inlined into the per-token
       rebuild;
    4. reassembly is ``array_except(all-indices, covered)`` (hash-set
       lookup, O(tokens)) + ``element_at`` gather — per-row, no
       shuffle, no per-token re-evaluation of anything aggregated.
    """
    out_col = out_col or text_col
    toks = tokenize(text_col)
    # base feeds the span explode AND the final reassembly join; spans
    # feeds the first-occurrence agg AND the covered join. Cache both
    # slivers (signature-table lifecycle) so the tokenize and the
    # per-span md5 pipeline each run once, spread off the scan first
    # (single-row-group inputs would serialize them onto one core).
    base = _cache_signature_table(
        _spread(df.select(F.col(id_col), F.col(text_col))).select(
            F.col(id_col), toks.alias("_toks")
        )
    )
    npos = F.size("_toks") - F.lit(span_len - 1)
    spans = _cache_signature_table(
        base.filter(npos > 0).select(
            id_col,
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), npos - 1),
                    lambda p: hash64(
                        F.array_join(F.slice("_toks", p + 1, span_len), " ")
                    ),
                )
            ).alias("_pos", "_h"),
        )
    )
    first = spans.groupBy("_h").agg(
        F.min(F.struct(F.col(id_col).alias("i"), F.col("_pos").alias("p"))).alias(
            "_first"
        ),
        F.count(F.lit(1)).alias("_c"),
    )
    covered = (
        spans.join(first.filter(F.col("_c") > 1).select("_h", "_first"), "_h")
        .filter(
            F.struct(F.col(id_col).alias("i"), F.col("_pos").alias("p"))
            != F.col("_first")
        )
        .select(
            id_col,
            F.explode(
                F.sequence(F.col("_pos"), F.col("_pos") + F.lit(span_len - 1))
            ).alias("_i"),
        )
        .groupBy(id_col)
        .agg(F.array_sort(F.collect_set("_i")).alias("_cov"))
    )
    kept_idx = F.array_except(
        F.when(
            F.size("_toks") > 0, F.sequence(F.lit(0), F.size("_toks") - 1)
        ).otherwise(F.array().cast("array<int>")),
        F.coalesce(F.col("_cov"), F.array().cast("array<int>")),
    )
    return (
        base.join(covered, id_col, "left")
        .withColumn(
            out_col,
            F.array_join(
                F.transform(kept_idx, lambda i: F.element_at("_toks", i + 1)), " "
            ),
        )
        .select(id_col, out_col)
    )


def containment_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.8,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """DIRECTED containment pairs: (id_a, id_b, containment) where
    ``|A ∩ B| / |A| >= threshold`` — "a is mostly contained in b", the
    sub-document/quotation/boilerplate-inclusion detector that
    symmetric Jaccard misses (a 50-word quote inside a 5000-word doc
    has tiny Jaccard but containment ~1). Both directions are distinct
    pairs; exact for the given threshold.

    Prefix filter (containment form of PPJoin): only the CONTAINED
    side prunes to its first ``|A| - ceil(t·|A|) + 1`` rarest
    shingles; the containing side must be indexed in full (any of b's
    shingles can witness), so the hot-shingle hazard concentrates
    there — ``max_doc_freq`` optionally drops shingles in more than
    that many docs from the index, an explicit recall trade documented
    at the call site (None = exact). Size filter: round(|B|/|A|, 6) >=
    t — the SAME rounding convention as the final predicate
    round(c/|A|, 6) >= t, so a boundary pair (c/|A| within 5e-7 below
    t, reachable only at ~2M+ shingles/doc) that the final predicate
    accepts is never dropped by the size filter; the prefix is widened
    by the same epsilon. Verification is one array_intersect per
    candidate."""
    if not 0 < threshold <= 1:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    # sh feeds the freq agg, the ordering join AND the full index;
    # docs feeds the prefix explode, the size join and both verify
    # joins — cache each sliver once (signature-table lifecycle)
    sh = _cache_signature_table(shingle_docs(df, text_col, id_col, n))
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_freq"))
    docs = _cache_signature_table(
        sh.join(freq, "shingle")
        .groupBy(id_col)
        .agg(
            F.array_sort(F.collect_list(F.struct("_freq", "shingle"))).alias("_ord"),
            F.count(F.lit(1)).alias("_size"),
        )
        .select(
            F.col(id_col).alias("_id"),
            F.transform("_ord", lambda s: s["shingle"]).alias("_toks"),
            "_size",
        )
    )
    # rounded acceptance admits c >= |A|*(t - 5e-7); the prefix must
    # still hold a witness for those boundary pairs
    prefix_len = (
        F.col("_size")
        - F.ceil(F.lit(threshold - 5e-7) * F.col("_size"))
        + 1
    ).cast("int")
    pa = docs.select(
        F.col("_id").alias("id_a"),
        F.col("_size").alias("_sa"),
        F.explode(F.slice("_toks", F.lit(1), prefix_len)).alias("_tok"),
    )
    full = sh.select(F.col(id_col).alias("id_b"), F.col("shingle").alias("_tok"))
    if max_doc_freq is not None:
        keep = freq.filter(F.col("_freq") <= max_doc_freq).select(
            F.col("shingle").alias("_tok")
        )
        full = full.join(keep, "_tok", "left_semi")
    sizes_b = docs.select(F.col("_id").alias("id_b"), F.col("_size").alias("_sb"))
    cand = (
        pa.join(full, "_tok")
        .filter(F.col("id_a") != F.col("id_b"))
        .select("id_a", "id_b", "_sa")
        .distinct()
        .join(sizes_b, "id_b")
        .filter(F.round(F.col("_sb") / F.col("_sa"), 6) >= threshold)
    )
    da = docs.select(F.col("_id").alias("id_a"), F.col("_toks").alias("_ta"))
    db = docs.select(F.col("_id").alias("id_b"), F.col("_toks").alias("_tb"))
    inter = F.size(F.array_intersect("_ta", "_tb"))
    return (
        cand.join(da, "id_a")
        .join(db, "id_b")
        .withColumn("containment", F.round(inter / F.col("_sa"), 6))
        .filter(F.col("containment") >= threshold)
        .select("id_a", "id_b", "containment")
    )


def dedup_keep_best(
    df: DataFrame,
    text_col: str,
    id_col: str,
    score_col: str | Column,
    n: int = 3,
    k: int | None = None,
    bands: int | None = None,
) -> DataFrame:
    """Quality-aware near-dup dedup: one survivor per MinHash-LSH
    cluster, chosen as the HIGHEST ``score_col`` (ties → smallest id)
    instead of the arbitrary minimum id — "keep the best copy", the
    curation rule real pipelines want (the canonical page, the longest
    extraction, the highest quality score; cf. the dedup guidance in
    Rae et al. 2021 / Lee et al. 2021, public). Returns
    ``(id_col, cluster_id)`` for the survivors only.

    Composition: :func:`~bytewax_spark.functions.graph.neardup_clusters`
    (banded LSH → star edges → connected components, O(N·bands)) +
    one score join + a per-cluster ``row_number`` — the argmax window
    partitions by cluster, so the added cost over min-id dedup is one
    id-and-score shuffle, nothing quadratic."""
    from pyspark.sql import Window

    from .graph import neardup_clusters

    score = F.col(score_col) if isinstance(score_col, str) else score_col
    clusters = neardup_clusters(df, text_col, id_col, n=n, k=k, bands=bands)
    joined = clusters.join(
        df.select(F.col(id_col), score.alias("_score")), id_col
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("_score"), F.asc(id_col)
    )
    return (
        joined.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(id_col, "cluster_id")
    )


def hamming_neighbor_pairs(
    df: DataFrame,
    fp_col: str,
    id_col: str,
    bits: int = 64,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-duplicate pairs over ANY int64 fingerprint column (SimHash
    text prints, aHash image prints, ...) by Hamming distance — the
    Manku 2007 pigeonhole machinery factored out of
    :func:`simhash_neighbor_pairs`: split into ``max_hamming + 1``
    blocks (two prints within distance d agree exactly on >= 1 block),
    candidates from block-equality self-joins over DISTINCT
    fingerprints, ``bit_count(xor)`` verification, expansion through
    the fingerprint→id membership table at the end (duplicate-heavy
    inputs collapse onto few distinct prints — output-bound). Block
    extraction uses LOGICAL right shifts so bit 63 (signed int64
    fingerprints) blocks correctly. Returns ``(id_a, id_b, hamming)``.
    """
    if max_hamming < 0:
        raise ValueError(f"max_hamming must be >= 0, got {max_hamming}")
    n_blocks = max_hamming + 1
    if n_blocks > bits:
        raise ValueError(
            f"max_hamming+1={n_blocks} blocks exceed bits={bits}"
        )
    # block widths need not be equal — the pigeonhole argument only
    # needs max_hamming+1 disjoint blocks covering the fingerprint
    base, rem = divmod(bits, n_blocks)
    widths = [base + 1] * rem + [base] * (n_blocks - rem)
    offsets = [sum(widths[:i]) for i in range(n_blocks)]
    members = df.select(F.col(fp_col).alias("_fp"), F.col(id_col).alias("_id"))
    # the membership table feeds FOUR subtrees below (distinct fps,
    # both sides of the cross expansion, the hamming-0 cliques).
    # Left as lineage each one re-executes the whole fingerprint
    # pipeline (alias renames break exchange reuse) — for SimHash that
    # was 4x re-tokenizing the corpus, for aHash 4x re-decoding every
    # image. Persist the (fp, id) sliver once, same lifecycle as the
    # MinHash signature tables (at most one cached; see
    # _cache_signature_table / release_signature_caches).
    members = _cache_signature_table(members)
    fps = members.select("_fp").distinct()
    blocks = fps.select(
        "_fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("blk"),
                        F.shiftrightunsigned("_fp", offsets[b])
                        .bitwiseAND(F.lit((1 << widths[b]) - 1))
                        .alias("val"),
                    )
                    for b in range(n_blocks)
                ]
            )
        ).alias("_b"),
    ).select("_fp", "_b.blk", "_b.val")
    fa = blocks.select("blk", "val", F.col("_fp").alias("_fa"))
    fb = blocks.select("blk", "val", F.col("_fp").alias("_fb"))
    ham = F.bit_count(F.col("_fa").bitwiseXOR(F.col("_fb"))).cast("int")
    fpairs = (
        fa.join(fb, ["blk", "val"])
        .filter(F.col("_fa") < F.col("_fb"))
        .select("_fa", "_fb", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
    # cross-fingerprint doc pairs: expand both sides through the
    # membership table, normalize id order (fingerprint order and id
    # order need not agree)
    ma = members.select(F.col("_fp").alias("_fa"), F.col("_id").alias("_ia"))
    mb = members.select(F.col("_fp").alias("_fb"), F.col("_id").alias("_ib"))
    cross = (
        fpairs.join(ma, "_fa")
        .join(mb, "_fb")
        .select(
            F.least("_ia", "_ib").alias("id_a"),
            F.greatest("_ia", "_ib").alias("id_b"),
            "hamming",
        )
    )
    # same-fingerprint doc pairs: each fingerprint's member clique at
    # hamming 0
    same = (
        ma.join(
            members.select(F.col("_fp").alias("_fa"), F.col("_id").alias("_ib")),
            "_fa",
        )
        .filter(F.col("_ia") < F.col("_ib"))
        .select(
            F.col("_ia").alias("id_a"),
            F.col("_ib").alias("id_b"),
            F.lit(0).cast("int").alias("hamming"),
        )
    )
    return cross.unionByName(same)


def simhash_neighbor_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    bits: int = 16,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-duplicate pairs by SimHash Hamming distance (Manku,
    Jain & Das Sarma 2007, public — Google's web-dedup design):
    ``(id_a, id_b, hamming)`` for every pair of documents whose
    ``bits``-bit SimHash fingerprints differ in at most
    ``max_hamming`` bits. Extends :func:`simhash` (exact-equal
    grouping = hamming 0) to tolerance > 0 WITHOUT an all-pairs join.

    The pigeonhole block trick: split the fingerprint into
    ``max_hamming + 1`` contiguous blocks — two fingerprints within
    distance ``max_hamming`` must agree EXACTLY on at least one block
    (at most ``max_hamming`` blocks can contain a differing bit).
    Candidates therefore come from ``max_hamming + 1`` equality
    self-joins on (block index, block value) — LSH-bucket shape, one
    shuffle each, never N².

    The whole comparison pipeline runs over DISTINCT fingerprints,
    not documents (Manku's design point): duplicate-heavy corpora
    collapse many documents onto one fingerprint, so candidate
    generation + popcount verification cost |distinct fps|-shaped
    work, and document pairs materialize only at the end by expanding
    each surviving fingerprint pair through the fingerprint→ids
    membership table (plus per-fingerprint member cliques at
    hamming 0) — output-bound, which no pair enumeration can beat.

    Everything is integer bit arithmetic on the fingerprints, so a
    SQL oracle reproduces every pair bit-for-bit."""
    members = simhash(df, text_col, id_col, bits=bits)
    return hamming_neighbor_pairs(
        members, "simhash", id_col, bits=bits, max_hamming=max_hamming
    )
