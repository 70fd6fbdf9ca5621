"""Robust grouped statistics — exact medians/quartiles and summary
frames. Exact ``percentile`` (sort-based within each group, linear
interpolation — the same definition DuckDB's ``quantile_cont`` and
NumPy's default use) rather than the t-digest approximation, for the
cases where the answer feeds a correctness-sensitive decision
(clipping thresholds, outlier fences). For sketch-sized approximate
quantiles at extreme scale use functions/sketches.py histogram_build/
histogram_quantile instead.

Scale posture: exact grouped percentiles sort within each group's
partition — fine when groups are many and each fits an executor
(the normal grouped case). A single giant group degenerates to a
one-partition sort; that is inherent to exact order statistics —
use the histogram sketch there.

Results are rounded to a fixed decimal count so values are bit-stable
across engines and partition orders (interpolation is computed on
sorted data, so it is deterministic; rounding guards the final
float formatting only).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "benford",
    "calibration_bins",
    "equi_depth_bins",
    "exact_corr",
    "group_auc",
    "ks_stat",
    "mad_outliers",
    "mutual_information",
    "outlier_counts",
    "psi",
    "qq_table",
    "robust_stats",
    "seasonal_outlier_counts",
    "shannon_entropy",
    "standardize",
    "target_encode",
    "winsorize",
]


def robust_stats(
    df: DataFrame,
    group_cols: Sequence[str],
    val_col: str,
    decimals: int = 6,
) -> DataFrame:
    """Per-group robust location/spread: exact p25 / median / p75,
    IQR, and Tukey outlier fences (1.5·IQR). One aggregation, one
    shuffle on the group key; the three quantiles come from a single
    sort per group (one ``percentile`` call with an array argument).

    Returns group cols + ``(p25, median, p75, iqr, lo_fence,
    hi_fence)``, all rounded to ``decimals``."""
    q = F.percentile(F.col(val_col), F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)))
    agg = df.groupBy(*group_cols).agg(q.alias("_q"))
    p25, med, p75 = (F.col("_q")[i] for i in range(3))
    iqr = p75 - p25
    r = lambda c: F.round(c, decimals)  # noqa: E731
    return agg.select(
        *group_cols,
        r(p25).alias("p25"),
        r(med).alias("median"),
        r(p75).alias("p75"),
        r(iqr).alias("iqr"),
        r(p25 - 1.5 * iqr).alias("lo_fence"),
        r(p75 + 1.5 * iqr).alias("hi_fence"),
    )


def outlier_counts(
    df: DataFrame,
    group_cols: Sequence[str],
    val_col: str,
    decimals: int = 6,
) -> DataFrame:
    """Per-group Tukey outlier census: rows outside the 1.5·IQR fences
    of their OWN group, split by side. Returns group cols +
    ``(n, lo_outliers, hi_outliers)``.

    Composition of ``robust_stats`` (one percentile aggregation) with a
    co-partitioned join back on the group key and a counting
    aggregation — both shuffles share the key, so AQE coalesces them.
    Fences are the rounded ones robust_stats reports, making the
    comparison bit-stable across engines (raw values never sit exactly
    on a 6-decimal fence unless the data was authored that way)."""
    fences = robust_stats(df, group_cols, val_col, decimals).select(
        *group_cols, "lo_fence", "hi_fence"
    )
    v = F.col(val_col)
    return (
        df.join(fences, list(group_cols))
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((v < F.col("lo_fence")).cast("long")).alias("lo_outliers"),
            F.sum((v > F.col("hi_fence")).cast("long")).alias("hi_outliers"),
        )
    )


def mad_outliers(
    df: DataFrame,
    group_cols: Sequence[str],
    val_col: str,
    k: float = 3.0,
    decimals: int = 6,
) -> DataFrame:
    """Per-group MAD outlier census — the robust z-score alternative
    to the Tukey fences in ``outlier_counts`` (MAD resists up to 50%
    contamination where the IQR breaks at 25%): rows with
    ``|x − median| > k · 1.4826 · MAD`` of their OWN group, where
    ``MAD = median(|x − median|)`` (1.4826 makes MAD consistent with
    σ under normality; Hampel's rule is ``k = 3``). Returns group cols
    + ``(n, median, mad, threshold, n_outliers)``.

    Two exact-percentile aggregations (median, then MAD of the
    deviations) and two joins back on the group key — every shuffle
    shares the key so AQE coalesces. The median/MAD are rounded to
    ``decimals`` before the comparison so the census is bit-stable
    across engines; a degenerate group (MAD = 0) flags every row off
    the median, the standard Hampel convention."""
    g = list(group_cols)
    v = F.col(val_col)
    med = df.groupBy(*g).agg(
        F.round(F.percentile(v, F.lit(0.5)), decimals).alias("median")
    )
    dev = df.join(med, g).select(
        *g, "median", F.abs(v - F.col("median")).alias("_dev")
    )
    mad = dev.groupBy(*g).agg(
        F.round(F.percentile(F.col("_dev"), F.lit(0.5)), decimals).alias("mad")
    )
    thr = F.round(F.lit(k) * F.lit(1.4826) * F.col("mad"), decimals)
    return (
        dev.join(mad, g)
        .select(*g, "median", "mad", "_dev", thr.alias("threshold"))
        .groupBy(*g, "median", "mad", "threshold")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("_dev") > F.col("threshold")).cast("long")).alias(
                "n_outliers"
            ),
        )
        .select(*g, "n", "median", "mad", "threshold", "n_outliers")
    )


def equi_depth_bins(
    df: DataFrame,
    group_cols: Sequence[str],
    val_col: str,
    tiebreak_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Equal-population binning per group (``ntile`` over a TOTAL
    (value, tiebreak) order — deterministic under any partitioning):
    returns one row per (group, bin) with ``(bin, n, lo, hi)``. The
    feature-engineering quantizer: equal-depth bins are robust to
    skew where equal-width bins collapse.

    One per-group-partitioned window (millions of small sorts, never
    global) + one aggregation. For a single giant group use the
    histogram sketch instead (same caveat as exact percentiles)."""
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    w = Window.partitionBy(*group_cols).orderBy(
        F.col(val_col), F.col(tiebreak_col)
    )
    binned = df.withColumn("bin", F.ntile(n_bins).over(w))
    return binned.groupBy(*group_cols, "bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.min(F.col(val_col)).alias("lo"),
        F.max(F.col(val_col)).alias("hi"),
    )


def exact_corr(
    df: DataFrame,
    group_cols: Sequence[str],
    x_col: str,
    y_col: str,
    decimals: int = 6,
) -> DataFrame:
    """Per-group Pearson correlation with ENGINE-EXACT moments: x and y
    are micro-quantized to integers and the five sums (Σx, Σy, Σxy,
    Σx², Σy²) accumulate as DECIMAL(38,0) — exact and associative, so
    every engine/partitioning produces the same moments. Only the
    final closed-form correlation is floating point, computed from
    identical inputs with the identical expression — bit-stable across
    engines (plain float ``corr`` is not: its running-covariance
    update order varies with partitioning).

    Returns group cols + ``(n, corr)`` with corr rounded to
    ``decimals``. One aggregation, map-side partials. The 10⁻⁶
    quantization bounds the moment error; for |corr| it is noise at
    the 6th decimal for values in ordinary ranges."""
    xm = F.round(F.col(x_col) * 1_000_000).cast("decimal(19,0)")
    ym = F.round(F.col(y_col) * 1_000_000).cast("decimal(19,0)")
    agg = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xm).cast("decimal(38,0)").alias("_sx"),
        F.sum(ym).cast("decimal(38,0)").alias("_sy"),
        F.sum((xm * ym).cast("decimal(38,0)")).alias("_sxy"),
        F.sum((xm * xm).cast("decimal(38,0)")).alias("_sxx"),
        F.sum((ym * ym).cast("decimal(38,0)")).alias("_syy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("_sx").cast("double"), F.col("_sy").cast("double")
    sxy = F.col("_sxy").cast("double")
    sxx, syy = F.col("_sxx").cast("double"), F.col("_syy").cast("double")
    num = n * sxy - sx * sy
    den = F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    return agg.select(
        *group_cols,
        F.col("n"),
        F.round(num / den, decimals).alias("corr"),
    )


def standardize(
    df: DataFrame,
    group_cols: Sequence[str],
    val_col: str,
    out_col: str = "z",
    decimals: int = 6,
) -> DataFrame:
    """Per-group z-score with ENGINE-EXACT moments: group mean and
    variance come from micro-quantized DECIMAL(38,0) sums (the
    ``exact_corr`` technique — associative, order-independent), so the
    fences every row is normalized against are identical on any
    engine/partitioning; only the final per-row ``(x - mean) / std``
    is floating point, computed from identical inputs. Appends
    ``out_col`` (rounded; null for groups with zero variance or a
    single row).

    One aggregation + one co-partitioned join back on the group key —
    the same two-step shape as ``outlier_counts``. Population std
    (divide by n), the ML-normalization convention."""
    xm = F.round(F.col(val_col) * 1_000_000).cast("decimal(19,0)")
    agg = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(xm).cast("decimal(38,0)").alias("_sx"),
        F.sum((xm * xm).cast("decimal(38,0)")).alias("_sxx"),
    )
    n = F.col("_n").cast("double")
    sx, sxx = F.col("_sx").cast("double"), F.col("_sxx").cast("double")
    mean_micro = sx / n
    var_micro2 = (n * sxx - sx * sx) / (n * n)
    moments = agg.select(
        *group_cols,
        mean_micro.alias("_mean"),
        F.when(var_micro2 > 0, F.sqrt(var_micro2)).alias("_std"),
    )
    z = (F.round(F.col(val_col) * 1_000_000) - F.col("_mean")) / F.col("_std")
    return (
        df.join(moments, list(group_cols))
        .withColumn(out_col, F.round(z, decimals))
        .drop("_mean", "_std")
    )


def target_encode(
    df: DataFrame,
    cat_cols: Sequence[str],
    target_col: str,
    smoothing: int = 20,
    out_col: str = "te",
    decimals: int = 6,
) -> DataFrame:
    """Smoothed target (mean) encoding of a categorical key — the
    standard high-cardinality categorical feature (Micci-Barreca 2001,
    public): ``te = (sum_y + m · global_mean) / (n + m)`` with
    ``m = smoothing``, shrinking rare categories toward the global
    mean. Returns one row per category: cat cols +
    ``(n, te)``.

    Moments accumulate as micro-quantized DECIMAL(38,0) (engine-exact;
    the division to a float happens once per category from identical
    inputs). Two aggregations — per-category and global — and the
    global scalar rides the plan as a cross-joined single row
    (broadcast, not a driver collect)."""
    ym = F.round(F.col(target_col) * 1_000_000).cast("decimal(19,0)")
    per_cat = df.groupBy(*cat_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(ym).cast("decimal(38,0)").alias("_sy"),
    )
    glob = df.agg(
        F.count(F.lit(1)).alias("_gn"),
        F.sum(ym).cast("decimal(38,0)").alias("_gs"),
    )
    gmean = F.col("_gs").cast("double") / F.col("_gn").cast("double")
    te = (
        (F.col("_sy").cast("double") + F.lit(smoothing) * gmean)
        / (F.col("n").cast("double") + F.lit(smoothing))
        / 1_000_000.0
    )
    return (
        per_cat.crossJoin(F.broadcast(glob))
        .select(*cat_cols, "n", F.round(te, decimals).alias(out_col))
    )


def winsorize(
    df: DataFrame,
    group_cols: Sequence[str],
    val_col: str,
    lower: float = 0.01,
    upper: float = 0.99,
    out_col: str | None = None,
    decimals: int = 6,
) -> DataFrame:
    """Winsorization: clamp each row's value to its OWN group's
    [p_lower, p_upper] exact percentiles — the standard heavy-tail
    taming before averaging/regression (Tukey/Dixon, public). Returns
    the rows with ``out_col`` (default ``<val_col>_w``) appended.

    Same two-step shape as ``outlier_counts``: one percentile
    aggregation, one co-partitioned join back, a map-side clamp.
    Clamp bounds are rounded to ``decimals`` so the comparison is
    engine-stable."""
    if not 0 <= lower < upper <= 1:
        raise ValueError(f"need 0 <= lower < upper <= 1, got {lower}, {upper}")
    out_col = out_col or f"{val_col}_w"
    q = F.percentile(F.col(val_col), F.array(F.lit(lower), F.lit(upper)))
    bounds = df.groupBy(*group_cols).agg(
        F.round(F.element_at(q, 1), decimals).alias("_lo"),
        F.round(F.element_at(q, 2), decimals).alias("_hi"),
    )
    clamped = F.least(F.greatest(F.col(val_col), F.col("_lo")), F.col("_hi"))
    return (
        df.join(bounds, list(group_cols))
        .withColumn(out_col, clamped)
        .drop("_lo", "_hi")
    )


def group_auc(
    df: DataFrame,
    group_cols: Sequence[str],
    label_col: str,
    score_col: str,
    decimals: int = 6,
) -> DataFrame:
    """Per-group ROC AUC computed EXACTLY as the Mann-Whitney U
    statistic (Hanley & McNeil 1982, public): concordant score pairs
    with ties at half weight, no curve interpolation, no sampling.
    Returns group cols + ``(n_pos, n_neg, auc)``; ``auc`` is null for
    single-class groups.

    Exact-arithmetic shape: per (group, DISTINCT score) count
    positives/negatives (one aggregation), then a per-group running
    sum orders distinct scores — U = Σ_s pos_s · (neg_below_s +
    neg_at_s / 2), accumulated in 2x-scaled integers so the only
    float is the final division. The window runs over DISTINCT scores
    per group (bounded by score cardinality, not row count — same
    discipline as percentile_normalize)."""
    lbl = F.col(label_col).cast("long")
    per_score = df.groupBy(*group_cols, score_col).agg(
        F.sum(lbl).alias("_pos"),
        F.sum(F.lit(1) - lbl).alias("_neg"),
    )
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(F.col(score_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    neg_below = F.coalesce(F.sum("_neg").over(w), F.lit(0))
    # 2x-scaled integer U: pos * (2*neg_below + neg_at)
    u2 = F.col("_pos") * (2 * neg_below + F.col("_neg"))
    agg = (
        per_score.withColumn("_u2", u2)
        .groupBy(*group_cols)
        .agg(
            F.sum("_pos").alias("n_pos"),
            F.sum("_neg").alias("n_neg"),
            F.sum("_u2").alias("_u2"),
        )
    )
    auc = F.col("_u2").cast("double") / (
        2.0 * F.col("n_pos").cast("double") * F.col("n_neg").cast("double")
    )
    return agg.select(
        *group_cols,
        "n_pos",
        "n_neg",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0), F.round(auc, decimals)
        ).alias("auc"),
    )


def calibration_bins(
    df: DataFrame,
    group_cols: Sequence[str],
    score_col: str,
    label_col: str,
    tiebreak_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability-diagram bins per group: rank rows by score
    (equal-population ``ntile`` over a total (score, tiebreak) order),
    then per bin report how CALIBRATED the score is — observed
    positive rate vs mean score. Returns one row per (group, bin):
    ``(bin, n, pos, score_mean_micro, pos_rate_micro)``. AUC
    (:func:`group_auc`) says whether the score RANKS well; this says
    whether its magnitude can be read as a probability — the two
    checks a score column needs before anyone thresholds it.

    Integer-exact: scores micro-quantize before summation and both
    means are int64 floor-divisions — bit-identical across engines
    and partitionings. One per-group window + one aggregation."""
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    w = Window.partitionBy(*group_cols).orderBy(
        F.col(score_col), F.col(tiebreak_col)
    )
    micro = F.round(F.col(score_col) * 1_000_000).cast("long")
    y = F.col(label_col).cast("long")
    binned = df.withColumn("bin", F.ntile(n_bins).over(w)).withColumn(
        "_s", micro
    ).withColumn("_y", y)
    return (
        binned.groupBy(*group_cols, "bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_y").alias("pos"),
            F.sum("_s").alias("_ssum"),
        )
        .select(
            *group_cols,
            "bin",
            "n",
            "pos",
            F.floor(F.col("_ssum") / F.col("n")).cast("long").alias(
                "score_mean_micro"
            ),
            F.floor(F.col("pos") * F.lit(1_000_000) / F.col("n"))
            .cast("long")
            .alias("pos_rate_micro"),
        )
    )


def seasonal_outlier_counts(
    df: DataFrame,
    group_cols: Sequence[str],
    ts_col: str,
    val_col: str,
    k_sigma: int = 3,
) -> DataFrame:
    """Seasonal-baseline anomaly census: the baseline for a row is its
    OWN (group, hour-of-day) bucket — "purchases at 3am" compare to
    other 3am purchases, not to the daily mix — and a row is an
    outlier when ``|v - mean| > k·sigma`` for the bucket (population
    sigma). Returns one row per (group, hour-of-day):
    ``(hod, n, n_outliers)``.

    ENGINE-EXACT despite being a sigma test: values micro-quantize to
    integers, the bucket moments (n, S=Σv, Q=Σv²) accumulate in
    DECIMAL, and the flag evaluates the algebraically cleared form
    ``(v·n - S)² > k²·(Q·n - S²)`` — pure integer arithmetic, no
    float mean/stddev whose partition-order drift could flip a
    borderline row. Two aggregations over one shuffle key (bucket
    moments, then the flag count); the moments table is broadcast
    back."""
    if k_sigma < 1:
        raise ValueError(f"k_sigma must be >= 1, got {k_sigma}")
    hod = F.hour(F.col(ts_col)).alias("hod")
    micro = F.round(F.col(val_col) * 1_000_000).cast("decimal(20,0)")
    base = df.select(*group_cols, hod, micro.alias("_v"))
    mom = base.groupBy(*group_cols, "hod").agg(
        F.count(F.lit(1)).cast("decimal(20,0)").alias("_n"),
        F.sum("_v").alias("_s"),
        F.sum(F.col("_v") * F.col("_v")).alias("_q"),
    )
    joined = base.join(F.broadcast(mom), [*group_cols, "hod"])
    lhs = (F.col("_v") * F.col("_n") - F.col("_s"))
    flag = (lhs * lhs) > (
        F.lit(k_sigma * k_sigma)
        * (F.col("_q") * F.col("_n") - F.col("_s") * F.col("_s"))
    )
    return (
        joined.groupBy(*group_cols, "hod")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(flag.cast("long")).alias("n_outliers"),
        )
    )


def gini(
    df: DataFrame,
    group_cols: Sequence[str],
    val_col: str,
) -> DataFrame:
    """Per-group Gini concentration index in integer micro-units (0 =
    perfectly equal, 1e6 → one member holds everything) over a
    NON-NEGATIVE int64 measure (quantize floats to micros upstream) —
    the inequality complement to :func:`~bytewax_spark.functions.
    profiling.pareto_report`'s coverage view. Uses the exact
    rank formula on the ascending sort,
    ``G = (2·Σ i·x_i − (n+1)·Σx) / (n·Σx)``, all sums widened to
    DECIMAL(38,0) so the index is bit-identical on any engine or
    partition order (equal values commute in Σ i·x_i, so tie order
    can't change the answer). Returns group cols + ``(n, total,
    gini_micro)``; an all-zero group reads 0.

    One per-group window rank (groups sort independently — never a
    global sort) and one aggregation."""
    g = list(group_cols)
    w = Window.partitionBy(*g).orderBy(F.col(val_col))
    ranked = df.select(
        *g,
        F.col(val_col).cast("decimal(38,0)").alias("_x"),
        F.row_number().over(w).cast("long").alias("_i"),
    )
    agg = ranked.groupBy(*g).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_x").alias("_sx"),
        F.sum(F.col("_i").cast("decimal(38,0)") * F.col("_x")).alias("_six"),
    )
    return agg.select(
        *g,
        "n",
        F.col("_sx").cast("long").alias("total"),
        F.when(
            F.col("_sx") > 0,
            F.expr(
                "CAST(((2 * _six - (n + 1) * _sx) * 1000000)"
                " div (CAST(n AS DECIMAL(38,0)) * _sx) AS LONG)"
            ),
        )
        .otherwise(F.lit(0).cast("long"))
        .alias("gini_micro"),
    )


def mutual_information(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Mutual information between two categorical columns in integer
    micro-nats — "how much does knowing X tell you about Y" (0 =
    independent): ``MI = Σ_xy (c_xy/N)·ln(c_xy·N / (c_x·c_y))``. Each
    cell's log term is quantized to int64 micros BEFORE the weighted
    sum (the PMI/DSIR trick), numerators widened to DECIMAL(38,0), so
    the score is engine- and order-exact. Returns one row
    ``(n, n_cells, mi_micro)``.

    One groupBy on the (x, y) pair — the marginals re-aggregate the
    CELL table, never the data — plus two broadcast-sized joins back.
    The mixing audit ("is source predictive of language?") for a
    100 TB corpus costs one keyed shuffle."""
    cxy = df.groupBy(
        F.col(x_col).alias("_x"), F.col(y_col).alias("_y")
    ).agg(F.count(F.lit(1)).alias("_cxy"))
    cx = cxy.groupBy("_x").agg(F.sum("_cxy").alias("_cx"))
    cy = cxy.groupBy("_y").agg(F.sum("_cxy").alias("_cy"))
    tot = cxy.agg(F.sum("_cxy").alias("_n"))
    cells = (
        cxy.join(cx, "_x")
        .join(cy, "_y")
        .join(F.broadcast(tot))
        .select(
            "_cxy",
            F.round(
                F.log(
                    (F.col("_cxy") * F.col("_n")).cast("double")
                    / (F.col("_cx").cast("double") * F.col("_cy"))
                )
                * 1_000_000
            )
            .cast("bigint")
            .alias("_lm"),
            "_n",
        )
    )
    return cells.agg(
        F.first("_n").alias("n"),
        F.count(F.lit(1)).alias("n_cells"),
        F.expr(
            "CAST(SUM(CAST(_cxy AS DECIMAL(38,0)) * _lm)"
            " div FIRST(_n) AS LONG)"
        ).alias("mi_micro"),
    )


def psi(
    ref: DataFrame,
    cur: DataFrame,
    bin_col: str,
) -> DataFrame:
    """Population stability index between a reference and a current
    sample of a pre-binned column — THE drift gate ML monitoring runs
    between training and serving distributions (rule of thumb:
    < 0.1 stable, > 0.25 shifted):
    ``PSI = Σ_bins (p_i − q_i)·ln(p_i/q_i)``. Shares are integer ppm,
    the log ratio is micro-quantized before the product (exact-int
    trick as :func:`mutual_information`), so the index is bit-stable.
    Bins present on only one side make raw PSI infinite — they are
    EXCLUDED from the sum and reported as ``only_ref`` / ``only_cur``
    counts instead (the common practical convention; pre-smooth
    upstream if you want them priced in). Returns one row
    ``(n_bins, psi_micro, only_ref, only_cur)``.

    Two map-side-combined bin counts + a full-outer join of two
    BIN tables — drift-checking a petabyte serving log costs two
    scans and a tiny join."""
    rc = ref.groupBy(F.col(bin_col).alias("_b")).agg(
        F.count(F.lit(1)).alias("_cr")
    )
    cc = cur.groupBy(F.col(bin_col).alias("_b")).agg(
        F.count(F.lit(1)).alias("_cc")
    )
    nr = rc.agg(F.sum("_cr").alias("_nr"))
    nc = cc.agg(F.sum("_cc").alias("_nc"))
    joined = (
        rc.join(cc, "_b", "full_outer")
        .join(F.broadcast(nr))
        .join(F.broadcast(nc))
    )
    both = F.col("_cr").isNotNull() & F.col("_cc").isNotNull()
    p_ppm = F.expr("CAST(_cr AS DECIMAL(38,0)) * 1000000 div _nr")
    q_ppm = F.expr("CAST(_cc AS DECIMAL(38,0)) * 1000000 div _nc")
    # ln(p/q) on the exact count ratio (shares' denominators cancel)
    ln_micro = (
        F.round(
            F.log(
                (F.col("_cr") * F.col("_nc")).cast("double")
                / (F.col("_cc").cast("double") * F.col("_nr"))
            )
            * 1_000_000
        ).cast("bigint")
    )
    cells = joined.select(
        both.alias("_both"),
        F.when(both, (p_ppm - q_ppm) * ln_micro).alias("_term"),
        F.col("_cr").isNotNull().alias("_hr"),
        F.col("_cc").isNotNull().alias("_hc"),
    )
    return cells.agg(
        F.sum(F.col("_both").cast("long")).alias("n_bins"),
        F.expr("CAST(SUM(_term) div 1000000 AS LONG)").alias("psi_micro"),
        F.sum((F.col("_hr") & ~F.col("_hc")).cast("long")).alias("only_ref"),
        F.sum((~F.col("_hr") & F.col("_hc")).cast("long")).alias("only_cur"),
    )


# Benford expected first-digit shares, ppm: floor(log10(1 + 1/d) * 1e6).
# Frozen literals so Spark and any oracle agree bit-for-bit.
BENFORD_PPM = {
    1: 301029, 2: 176091, 3: 124938, 4: 96910,
    5: 79181, 6: 66946, 7: 57991, 8: 51152, 9: 45757,
}


def benford(
    df: DataFrame,
    group_cols: Sequence[str],
    val_col: str,
) -> DataFrame:
    """Benford first-digit audit per group — the classic
    fabricated-numbers screen (Benford 1938; Nigrini's forensic
    variant): observed vs expected leading-digit shares of the
    positive values, in exact ppm. The digit comes from the STRING of
    the cents-quantized int64 (``floor(v·100)``) — float-to-string
    formatting differs across engines, int-to-string does not.
    Expected shares are the frozen ``BENFORD_PPM`` literals. Returns
    one row per (group, digit): ``(digit, n, obs_ppm, exp_ppm,
    dev_ppm)``. Exclusion rule: the filter is ``floor(v·100) >= 1``,
    so values below one cent (v < 0.01) are excluded along with
    non-positives — the digit of a sub-cent double is a float-format
    artifact, not evidence. On double inputs the ×100 scaling decides
    boundary cents by IEEE rounding (identically on both engines).

    One map-side-combined count per (group, digit) — ≤9 rows per group
    emerge — and the totals re-aggregate that digit table."""
    g = list(group_cols)
    v_int = F.floor(F.col(val_col) * 100).cast("long")
    digit = F.substring(v_int.cast("string"), 1, 1).cast("int")
    counts = (
        df.select(*g, v_int.alias("_vi"), digit.alias("digit"))
        .filter(F.col("_vi") >= 1)
        .groupBy(*g, "digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = counts.groupBy(*g).agg(F.sum("n").alias("_tot"))
    exp = F.lit(None).cast("long")
    for d, ppm in sorted(BENFORD_PPM.items()):
        exp = F.when(F.col("digit") == d, F.lit(ppm).cast("long")).otherwise(exp)
    return (
        counts.join(totals, g)
        .select(
            *g,
            "digit",
            "n",
            F.expr("(n * 1000000L) div _tot").alias("obs_ppm"),
            exp.alias("exp_ppm"),
        )
        .withColumn("dev_ppm", F.col("obs_ppm") - F.col("exp_ppm"))
    )


def ks_stat(ref: DataFrame, cur: DataFrame, val_col: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov D statistic, integer-exact: the
    max CDF gap ``D = max_v |F_ref(v) − F_cur(v)|`` reported as
    ``d_ppm = max |c_ref(v)·n_cur − c_cur(v)·n_ref| · 10⁶ div
    (n_ref·n_cur)`` over cumulative counts at each distinct value —
    no floats until never. The classic distribution-shift test; use
    the binned :func:`psi` when you need per-bin attribution or the
    value space is huge. Returns one row ``(n_ref, n_cur, d_ppm)``.

    One per-side count per distinct value (map-side combined), then
    the cumulative window runs over the DISTINCT-VALUE table ordered
    by value — bounded by value cardinality, not row count (the same
    caveat as any exact order statistic: a billion distinct values
    means a big single-axis window; pre-round or bin first at that
    scale)."""
    from pyspark.sql import Window

    rc = ref.groupBy(F.col(val_col).alias("_v")).agg(
        F.count(F.lit(1)).alias("_cr")
    )
    cc = cur.groupBy(F.col(val_col).alias("_v")).agg(
        F.count(F.lit(1)).alias("_cc")
    )
    merged = rc.join(cc, "_v", "full_outer").select(
        "_v",
        F.coalesce("_cr", F.lit(0)).alias("_cr"),
        F.coalesce("_cc", F.lit(0)).alias("_cc"),
    )
    w = Window.orderBy("_v").rowsBetween(Window.unboundedPreceding, 0)
    tot = merged.agg(
        F.sum("_cr").alias("n_ref"), F.sum("_cc").alias("n_cur")
    )
    cum = merged.join(F.broadcast(tot)).select(
        "n_ref",
        "n_cur",
        F.abs(
            F.sum("_cr").over(w).cast("decimal(38,0)") * F.col("n_cur")
            - F.sum("_cc").over(w).cast("decimal(38,0)") * F.col("n_ref")
        ).alias("_gap"),
    )
    return cum.groupBy("n_ref", "n_cur").agg(
        F.max("_gap").alias("_num")
    ).select(
        "n_ref",
        "n_cur",
        F.expr(
            "CAST((_num * 1000000) div (CAST(n_ref AS DECIMAL(38,0)) * n_cur)"
            " AS LONG)"
        ).alias("d_ppm"),
    )


def shannon_entropy(
    df: DataFrame,
    group_cols: Sequence[str],
    cat_col: str,
) -> DataFrame:
    """Shannon entropy of a categorical column per group, integer
    micro-nats — the balance audit ("is this label column degenerate?"
    0 = one value; ln(k) = uniform over k): ``H = Σ −(c/N)·ln(c/N)``
    with each value's log term quantized to int64 micros BEFORE the
    weighted sum (the PMI trick), so the score is engine-exact.
    Returns group cols + ``(n, n_values, entropy_micro,
    max_entropy_micro)`` — compare the two for normalized balance.

    One (group, value) count (map-side combined); group totals
    re-aggregate the value table."""
    g = list(group_cols)
    counts = df.groupBy(*g, F.col(cat_col).alias("_v")).agg(
        F.count(F.lit(1)).alias("_c")
    )
    totals = counts.groupBy(*g).agg(
        F.sum("_c").alias("_n"), F.count(F.lit(1)).alias("n_values")
    )
    cells = counts.join(totals, g).select(
        *g,
        "_n",
        "n_values",
        F.col("_c"),
        # ln(N/c) = -ln(p), micro-quantized per value
        F.round(
            F.log(F.col("_n").cast("double") / F.col("_c")) * 1_000_000
        )
        .cast("bigint")
        .alias("_lm"),
    )
    return cells.groupBy(*g, "_n", "n_values").agg(
        F.expr(
            "CAST(SUM(CAST(_c AS DECIMAL(38,0)) * _lm) div FIRST(_n) AS LONG)"
        ).alias("entropy_micro"),
        F.round(F.log(F.first("n_values").cast("double")) * 1_000_000)
        .cast("bigint")
        .alias("max_entropy_micro"),
    ).select(
        *g,
        F.col("_n").alias("n"),
        "n_values",
        "entropy_micro",
        "max_entropy_micro",
    )


def qq_table(
    ref: DataFrame,
    cur: DataFrame,
    val_col: str,
    percentiles: Sequence[int] = tuple(range(5, 100, 5)),
    decimals: int = 6,
) -> DataFrame:
    """Quantile–quantile comparison table — the drift DIAGNOSTIC that
    says WHERE two distributions diverge (KS/PSI say how much): one
    row per requested percentile with both sides' exact quantiles and
    the gap. Returns ``(pct, ref_q, cur_q, gap)``, quantiles rounded
    to ``decimals``.

    Two exact-percentile aggregations (one array-argument
    ``percentile`` per side — a single sort each) + a 1×1 join;
    the single-partition caveat of exact order statistics applies —
    pre-bin at extreme scale."""
    pcts = sorted(set(int(p) for p in percentiles))
    if not pcts or pcts[0] < 1 or pcts[-1] > 99:
        raise ValueError(f"percentiles must be within [1, 99], got {percentiles}")
    arr = F.array(*[F.lit(p / 100.0) for p in pcts])
    rq = ref.agg(F.percentile(F.col(val_col), arr).alias("_rq"))
    cq = cur.agg(F.percentile(F.col(val_col), arr).alias("_cq"))
    both = rq.join(cq)
    rows = both.select(
        F.explode(
            F.arrays_zip(
                F.array(*[F.lit(p) for p in pcts]).alias("pct"),
                F.col("_rq").alias("ref_q"),
                F.col("_cq").alias("cur_q"),
            )
        ).alias("_z")
    ).select(
        F.col("_z.pct").cast("int").alias("pct"),
        F.round("_z.ref_q", decimals).alias("ref_q"),
        F.round("_z.cur_q", decimals).alias("cur_q"),
    )
    return rows.withColumn(
        "gap", F.round(F.col("cur_q") - F.col("ref_q"), decimals)
    )
