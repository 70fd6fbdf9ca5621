"""Deterministic sampling for training-data pipelines.

Random sampling (``df.sample``) is useless for dataset curation at
scale: re-running the pipeline yields a different subset, so ablations
and holdout splits aren't reproducible, and adding one input file
reshuffles every prior decision. These operators decide membership by
hashing a stable row key instead — the same row lands in the same
sample/split forever, on any cluster layout, with zero coordination:

- ``sample_by_hash``  — keep a deterministic ``rate`` fraction by key.
- ``stratified_sample`` — per-stratum rates (e.g. downsample English,
  keep all low-resource languages) as one plan-time CASE expression.
- ``split_train_test`` — disjoint named splits from one hash, so
  train/val/test can never leak into each other.

All pure Catalyst expressions over ``text.hash64`` (md5-derived —
engine-portable, so DuckDB oracles reproduce results exactly; see
``text.py`` module docstring). A filter on a hash expression is
map-local: no shuffle, runs at scan rate with full pushdown of any
surrounding predicates, and at 100 TB the sample decision costs one
md5 per row inside whole-stage codegen.

Parity note: the reference has no sampling operators (its unit of work
is a stream item); this module is part of the beyond-reference
LLM-pipeline surface (SURVEY.md §2.7).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import hash64

__all__ = [
    "BUCKETS",
    "balanced_downsample",
    "sample_bucket",
    "sample_by_hash",
    "stratified_sample",
    "split_train_test",
    "stratified_split",
    "sample_exact_n",
    "sample_weighted_n",
    "negative_samples",
    "domain_mixture",
    "percentile_normalize",
    "quantile_band",
    "temperature_mixture",
]

# Bucket space for rate quantization. 1e6 buckets give rate resolution
# of 1e-6 while keeping ``rate * BUCKETS`` exactly representable.
BUCKETS = 1_000_000


def sample_bucket(key: Column | str, salt: str = "") -> Column:
    """Stable bucket in [0, BUCKETS) for a row key.

    ``salt`` decorrelates independent sampling decisions made on the
    same key (two different 10% samples); the same (key, salt) pair
    always lands in the same bucket. hash64 is 60-bit non-negative, so
    plain ``%`` is safe."""
    key = F.col(key) if isinstance(key, str) else key
    return (hash64(F.concat(F.lit(salt), key.cast("string"))) % BUCKETS).cast("bigint")


def sample_by_hash(
    df: DataFrame, key_col: str, rate: float, salt: str = ""
) -> DataFrame:
    """Keep a deterministic ``rate`` fraction of rows, decided per key.

    Rows with equal keys are kept or dropped together (sample whole
    documents/users, never half of one). Selectivity is exact in
    expectation: bucket < rate * BUCKETS."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return df.filter(sample_bucket(key_col, salt) < int(rate * BUCKETS))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    rates: Mapping[str, float],
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling in one pass.

    ``rates`` maps stratum value → keep fraction; strata not listed
    fall back to ``default_rate``. The thresholds fold into a single
    CASE expression, so the whole decision is one map-local filter —
    no per-stratum scans, no shuffle, no driver loop."""
    for stratum, rate in rates.items():
        if not 0.0 <= rate <= 1.0:
            raise ValueError(f"rate for stratum {stratum!r} must be in [0, 1], got {rate}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0, 1], got {default_rate}")
    threshold: Column = F.lit(int(default_rate * BUCKETS))
    for stratum, rate in rates.items():
        threshold = F.when(
            F.col(strata_col) == F.lit(stratum), F.lit(int(rate * BUCKETS))
        ).otherwise(threshold)
    return df.filter(sample_bucket(key_col, salt) < threshold)


def split_train_test(
    df: DataFrame,
    key_col: str,
    weights: Mapping[str, float],
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Assign every row a named split label from one hash.

    ``weights`` maps split name → fraction (must sum to ≤ 1; any
    remainder is labeled NULL, i.e. held out entirely). Splits are
    disjoint by construction — consecutive half-open bucket ranges of a
    single hash — so a key can never appear in two splits, across any
    number of re-runs or backfills. Split names are assigned ranges in
    insertion order of ``weights``."""
    total = sum(weights.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"split weights sum to {total}, must be <= 1")
    bucket = sample_bucket(key_col, salt)
    label: Column = F.lit(None).cast("string")
    edge = 0
    # build the CASE bottom-up: later WHENs wrap earlier ones, so emit
    # ranges in reverse to keep first-listed split at the low buckets
    ranges = []
    for name, w in weights.items():
        lo, hi = edge, edge + int(w * BUCKETS)
        ranges.append((name, lo, hi))
        edge = hi
    for name, lo, hi in reversed(ranges):
        label = F.when((bucket >= lo) & (bucket < hi), F.lit(name)).otherwise(label)
    return df.withColumn(split_col, label)


def sample_exact_n(df: DataFrame, key_col: str, n: int, salt: str = "") -> DataFrame:
    """EXACTLY ``n`` rows, uniformly and deterministically: the n rows
    whose salted key hash sorts lowest (key tiebreak). Where
    ``sample_by_hash`` gives an exact RATE but a binomial count, this
    gives an exact count — the eval-subset / debug-slice shape.

    Scale: sort + limit compiles to ``TakeOrderedAndProject`` — each
    partition keeps its local top-n heap and only n rows per partition
    ever leave the scan, no global sort materializes. Membership
    depends only on (key, salt), so the sample is stable across runs
    and cluster layouts as long as the table is; inserting new rows
    can displace old members (rank-based, unlike the bucket filters)."""
    if n < 0:
        raise ValueError(f"n must be >= 0, got {n}")
    h = hash64(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    return df.orderBy(h, F.col(key_col)).limit(n)


def sample_weighted_n(
    df: DataFrame,
    key_col: str,
    weight_col,
    n: int,
    salt: str = "",
    key_out: str = "wkey",
) -> DataFrame:
    """EXACTLY ``n`` rows sampled WITHOUT replacement with probability
    proportional to ``weight_col`` — deterministic Efraimidis-Spirakis
    A-ES: each row draws u = hash-uniform(key, salt) in (0, 1) and is
    ranked by ln(u)/w (the monotone transform of u^(1/w)); the top-n
    ranks win. Length-weighted corpus subsets ("sample 1M docs
    proportional to token count") are this shape. Rows with weight <= 0
    or NULL are excluded.

    Scale: identical to ``sample_exact_n`` — sort + limit compiles to
    ``TakeOrderedAndProject`` (per-partition top-n heaps, n rows per
    partition leave the scan, no global sort, no shuffle of the corpus).
    u is the quantized ``sample_bucket`` hash (+0.5 to stay inside the
    open interval), so membership depends only on (key, salt, weight)
    and the oracle reproduces every rank bit-for-bit; the rank is
    rounded to 9 decimals (same engine-portability convention as the
    cosine oracles) with key tiebreak."""
    if n < 0:
        raise ValueError(f"n must be >= 0, got {n}")
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    u = (sample_bucket(key_col, salt).cast("double") + 0.5) / BUCKETS
    rank = F.round(F.log(u) / w.cast("double"), 9)
    return (
        df.filter(w.isNotNull() & (w > 0))
        .withColumn(key_out, rank)
        .orderBy(F.col(key_out).desc(), F.col(key_col))
        .limit(n)
    )


def quantile_band(
    df: DataFrame,
    score_col: str,
    lo: float,
    hi: float,
    accuracy: int = 10_000,
) -> DataFrame:
    """Keep rows whose ``score_col`` lies inside the [lo, hi] quantile
    band — the 'drop the worst 20% and the suspicious top 1%' shape of
    quality-score filtering.

    The thresholds come from ``approx_percentile`` (Greenwald-Khanna
    sketch): bounded memory, merges in partial aggregation, so the
    100 TB scan reduces to one tiny sketch row — an exact percentile
    would buffer every value per group and cannot scale. The 1-row
    threshold frame joins back by broadcast (nested-loop over one row),
    so the corpus itself never shuffles: scan → filter, map-local.
    Worst-case rank error is ``1/accuracy`` of the row count."""
    if not 0.0 <= lo <= hi <= 1.0:
        raise ValueError(f"need 0 <= lo <= hi <= 1, got lo={lo} hi={hi}")
    thresholds = df.agg(
        F.percentile_approx(score_col, F.array(F.lit(lo), F.lit(hi)), accuracy).alias(
            "_qb_t"
        )
    )
    return (
        df.join(F.broadcast(thresholds))
        .filter(
            (F.col(score_col) >= F.col("_qb_t")[0])
            & (F.col(score_col) <= F.col("_qb_t")[1])
        )
        .drop("_qb_t")
    )


def percentile_normalize(
    df: DataFrame,
    score_col: str,
    group_col: str,
    out_col: str = "pct",
) -> DataFrame:
    """Add ``out_col`` = the row's percentile rank of ``score_col``
    WITHIN its ``group_col`` (0.0 = group minimum, 1.0 = group maximum,
    ties share a rank — SQL ``percent_rank`` semantics). The
    cross-source calibration step before a global quality threshold:
    raw quality scores aren't comparable across domains (boilerplate
    norms differ), per-source percentiles are.

    NOT implemented as ``percent_rank().over(partitionBy(group))`` on
    the corpus: that sorts every row of a group inside one task, and a
    100 TB corpus with a handful of sources means a handful of tasks.
    Instead the corpus reduces to per-(group, DISTINCT score) counts —
    bounded by score cardinality, not row count — the rank arithmetic
    runs as a window over that small table, and the mapping joins back
    on (group, score). The corpus-side cost is one aggregation and one
    equi-join; with quantized scores (the practical case) the mapping
    table is broadcast-sized and AQE plans it as a broadcast join.
    Rounded to 9 decimals (ratio of exact int64 counts — the rounding
    only pins cross-engine repr)."""
    from pyspark.sql import Window

    gs = df.groupBy(group_col, score_col).agg(F.count(F.lit(1)).alias("_c"))
    below_w = (
        Window.partitionBy(group_col)
        .orderBy(score_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    grp_w = Window.partitionBy(group_col)
    mapping = gs.select(
        group_col,
        score_col,
        F.coalesce(F.sum("_c").over(below_w), F.lit(0)).alias("_below"),
        F.sum("_c").over(grp_w).alias("_n"),
    ).select(
        group_col,
        score_col,
        F.when(F.col("_n") > 1, F.round(F.col("_below") / (F.col("_n") - 1), 9))
        .otherwise(F.lit(0.0))
        .alias(out_col),
    )
    return df.join(mapping, [group_col, score_col])


def temperature_mixture(
    df: DataFrame,
    domain_col: str,
    key_col: str,
    alpha: float,
    n_target: int,
    salt: str = "",
) -> DataFrame:
    """Temperature-based domain rebalancing: downsample so the output
    mixture is proportional to count^alpha — the multilingual/
    multi-domain sampling scheme from mBERT/mT5 (alpha=1 keeps the
    natural mixture, alpha=0 forces uniform, alpha≈0.3-0.7 boosts
    low-resource domains without drowning the head). ``n_target`` is
    the requested output size; a domain whose α-share exceeds its
    actual count is kept whole (the usual low-resource case — such
    domains end up UNDER their α-share rather than oversampled, since
    this operator only drops rows).

    Unlike :func:`domain_mixture` (explicit shares for a NAMED domain
    list, one bounded driver collect), this weighs EVERY domain, so it
    must scale to web-corpus domain cardinality (~10⁸): nothing ever
    reaches the driver. Per-domain counts aggregate distributedly;
    α-weights are quantized to integer micro-units (``round(c^α·10⁶)``
    — pins cross-engine pow() ulps); their sum is a one-row aggregate
    joined back by broadcast; per-domain keep thresholds are then pure
    int64 arithmetic, and membership is the usual map-local hash
    filter. Corpus-side cost: one groupBy(domain) count + one equi-join
    of the corpus with the |domains| count table (broadcast when small,
    hash join at 10⁸ — AQE decides)."""
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    if n_target <= 0:
        raise ValueError(f"n_target must be positive, got {n_target}")
    counts = df.groupBy(F.col(domain_col).alias("_dom")).agg(
        F.count(F.lit(1)).alias("_c")
    )
    weights = counts.withColumn(
        "_w",
        F.round(F.pow(F.col("_c").cast("double"), F.lit(float(alpha))) * 1e6)
        .cast("bigint"),
    )
    wsum = weights.agg(F.sum("_w").alias("_wsum"))
    # keep_d = min(c_d, n_target * w_d / Σw)  →  threshold in buckets =
    # floor(BUCKETS * n_target * w_d / (Σw * c_d)), capped at BUCKETS.
    # Evaluated in DOUBLE with a fixed op order: int64 would overflow
    # (BUCKETS·n_target·w ≈ 10²⁶ at web scale) and IEEE mul/div are
    # exactly specified, so any engine reproduces the floor — only
    # transcendentals (the pow above) need quantization.
    thresholds = weights.join(F.broadcast(wsum)).select(
        "_dom",
        F.least(
            F.lit(BUCKETS).cast("bigint"),
            F.floor(
                (
                    F.lit(float(BUCKETS))
                    * F.lit(float(n_target))
                    * F.col("_w").cast("double")
                )
                / (F.col("_wsum").cast("double") * F.col("_c").cast("double"))
            ),
        ).alias("_thr"),
    )
    joined = df.join(
        thresholds, df[domain_col] == thresholds["_dom"], "inner"
    )
    return joined.filter(sample_bucket(key_col, salt) < F.col("_thr")).drop(
        "_dom", "_thr"
    )


def _domain_counts(
    df: DataFrame, domain_col: str, shares: Mapping[str, int]
) -> DataFrame:
    """Per-domain row counts for ONLY the domains named in ``shares``.

    The ``isin`` pre-filter is load-bearing at scale: it pushes to the
    parquet scan and bounds both the aggregation state and the driver
    collect to ``len(shares)`` rows, no matter how many distinct values
    ``domain_col`` has (a web corpus has ~10^7-10^8 registered
    domains). Exposed as a helper so the plan gate can assert the
    filter actually reaches the scan."""
    return (
        df.filter(F.col(domain_col).isin(list(shares)))
        .groupBy(F.col(domain_col).alias("d"))
        .agg(F.count(F.lit(1)).alias("c"))
    )


def domain_mixture(
    df: DataFrame,
    domain_col: str,
    key_col: str,
    shares: Mapping[str, int],
    salt: str = "",
) -> DataFrame:
    """Downsample domains to hit a TARGET MIXTURE (e.g. web:books:code
    = 5:3:2) while keeping as many rows as possible; domains not listed
    get share 0 (dropped).

    ``shares`` are INTEGER ratios, not floats: the per-domain keep
    thresholds are then exact integer arithmetic (floor), so the oracle
    side reproduces every boundary bit-for-bit instead of chasing float
    ulps. The output size is maximal: the binding domain (smallest
    count/share ratio) is kept whole and every other domain is hash-
    downsampled to match, giving expected counts proportional to
    ``shares``.

    Cost at 100 TB: one count over ONLY the listed domains (the scan
    pre-filters to ``shares.keys()``, so a web corpus with 10^8
    distinct registered domains still ships at most ``len(shares)``
    tiny rows to the driver) + one map-local CASE filter — the corpus
    itself never shuffles."""
    if not shares:
        raise ValueError("shares must name at least one domain")
    for d, s in shares.items():
        if not isinstance(s, int) or s < 0:
            raise ValueError(f"share for {d!r} must be a non-negative int, got {s!r}")
    total_share = sum(shares.values())
    if total_share == 0:
        raise ValueError("at least one share must be positive")
    counts = {
        r["d"]: r["c"] for r in _domain_counts(df, domain_col, shares).collect()
    }
    # binding domain: the one that runs out first at the target mix.
    # n_out = min_d floor(count_d * total / share_d); threshold_d =
    # floor(BUCKETS * n_out * share_d / (total * count_d)) — all ints.
    n_out = min(
        (counts[d] * total_share) // s
        for d, s in shares.items()
        if s > 0 and d in counts
    )
    threshold: Column = F.lit(0)
    for d, s in shares.items():
        if d not in counts:
            continue
        t = min(BUCKETS, (BUCKETS * n_out * s) // (total_share * counts[d]))
        threshold = F.when(F.col(domain_col) == F.lit(d), F.lit(t)).otherwise(threshold)
    return df.filter(sample_bucket(key_col, salt) < threshold)


def negative_samples(
    interactions: DataFrame,
    user_col: str,
    item_col: str,
    n_items: int,
    k: int,
    salt: str = "",
    oversample: int = 4,
) -> DataFrame:
    """Deterministic negative sampling for implicit-feedback training
    (the BPR / word2vec negative-sampling prep step, public): for each
    user, ``k`` pseudo-random item ids from ``[0, n_items)`` the user
    has NOT interacted with. Returns ``(user, item, neg_rank)`` with
    ``neg_rank`` 1..k.

    Candidates are ``hash(salt, user, i)`` for i in [0, k·oversample)
    — reproducible across runs/engines (md5-derived, same family as
    the sampling module); interactions are removed with an anti-join
    on (user, item); the first ``k`` survivors IN CANDIDATE ORDER are
    kept (row_number over i — deterministic, not arbitrary). With
    oversample·k candidates, a user interacting with fraction p of the
    item space has P(shortfall) ≈ tail of Binomial(k·o, 1-p) — raise
    ``oversample`` for dense users (callers can detect shortfall by
    counting rows per user < k).

    Scale shape: candidate fan-out is k·oversample rows per USER
    (map-side explode, no shuffle), the anti-join shuffles on the
    (user, item) pair, the rank window partitions per user. No
    item-table scan at all — the item space is an integer range."""
    if n_items <= 0 or k <= 0:
        raise ValueError(f"n_items and k must be positive, got {n_items}, {k}")
    from pyspark.sql import Window

    u = F.col(user_col)
    # interactions is read twice (user-distinct for candidates, pair-
    # distinct for the anti-join) — when it is the output of an
    # upstream join, persist/checkpoint it in the caller so the join
    # doesn't re-execute per branch (column pruning makes the two
    # branches non-identical, so ReuseExchange cannot collapse them)
    pos = interactions.select(u, F.col(item_col)).distinct()
    cand = (
        interactions.select(u).distinct()
        .select(
            u,
            F.explode(F.sequence(F.lit(0), F.lit(k * oversample - 1))).alias("_i"),
        )
        .select(
            u,
            "_i",
            F.pmod(
                hash64(F.concat(F.lit(salt), u.cast("string"), F.lit("#"), F.col("_i"))),
                F.lit(n_items),
            ).alias(item_col),
        )
        # one candidate per (user, item): keep the earliest index so
        # hash collisions inside a user's candidate list can't yield
        # duplicate negatives
        .groupBy(user_col, item_col)
        .agg(F.min("_i").alias("_i"))
    )
    neg = cand.join(pos, [user_col, item_col], "left_anti")
    w = Window.partitionBy(user_col).orderBy("_i")
    return (
        neg.withColumn("neg_rank", F.row_number().over(w))
        .filter(F.col("neg_rank") <= k)
        .select(user_col, item_col, "neg_rank")
    )


def balanced_downsample(
    df: DataFrame,
    class_col: str,
    id_col: str,
    salt: str = "",
) -> DataFrame:
    """Class-balance by deterministic downsampling: every class keeps
    exactly ``min(class size)`` rows — the ones whose salted md5 hash
    ranks lowest — so the output is invariant to partitioning, rerun,
    and row order (a ``fraction``-based sample is none of those). The
    classic prep step before training on skewed labels.

    Two-phase: class sizes from one map-side-combined count (G rows,
    broadcast back), then a per-class window rank over (hash, id) —
    per-group sorts, never global. Returns the surviving rows; swap
    ``salt`` for a fresh draw."""
    from pyspark.sql import Window

    from bytewax_spark.functions.text import hash64

    sizes = df.groupBy(F.col(class_col)).agg(F.count(F.lit(1)).alias("_n"))
    floor_n = sizes.agg(F.min("_n").alias("_keep"))
    h = hash64(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    w = Window.partitionBy(class_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.join(F.broadcast(floor_n))
        .withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= F.col("_keep"))
        .drop("_r", "_keep")
    )


def stratified_split(
    df: DataFrame,
    strata_cols,
    id_col: str,
    train_num: int = 4,
    train_den: int = 5,
    salt: str = "",
) -> DataFrame:
    """Train/test split with EXACT per-stratum proportions: within
    each stratum, rows rank by salted hash and the first
    ``floor(n · train_num/train_den)`` go to train — unlike the global
    hash split (:func:`split_train_test`), every stratum lands the
    ratio exactly (±0 rows), which is what class-balanced eval sets
    need. Deterministic, rerun/partitioning invariant; membership
    changes only with ``salt``. Returns the input + ``is_train``.

    One stratum-count broadcast + one per-stratum window rank over
    (hash, id) — per-group sorts, never global."""
    from pyspark.sql import Window

    from bytewax_spark.functions.text import hash64

    if not (0 < train_num < train_den):
        raise ValueError(f"need 0 < num < den, got {train_num}/{train_den}")
    g = list(strata_cols)
    sizes = df.groupBy(*g).agg(F.count(F.lit(1)).alias("_n"))
    h = hash64(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    w = Window.partitionBy(*g).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.join(sizes, g)
        .withColumn("_r", F.row_number().over(w))
        .withColumn(
            "is_train",
            F.expr(f"_r * {train_den} <= _n * {train_num}"),
        )
        .drop("_r", "_n")
    )
