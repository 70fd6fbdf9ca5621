"""Record linkage (functions/linkage.py) and robust grouped stats
(functions/stats.py): semantics pinned on handmade rows, plan gates
proving the joins stay equi-shuffled (never cartesian) and Python-free.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bytewax_spark.functions import linkage, stats


def test_fuzzy_self_pairs_threshold_and_blocking(spark):
    df = spark.createDataFrame(
        [
            (1, "us", "kitten"),
            (2, "us", "sitten"),   # dist 1 from kitten
            (3, "us", "sitting"),  # dist 2 from sitten, 3 from kitten
            (4, "eu", "kitten"),   # exact text match but different block
        ],
        "id bigint, region string, name string",
    )
    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in linkage.fuzzy_self_pairs(df, "id", ["region"], "name", 2).collect()
    }
    # (1,3) dist 3 exceeds threshold; (1,4)/(2,4)/(3,4) cross blocks
    assert got == {(1, 2): 1, (2, 3): 2}


def test_fuzzy_self_pairs_each_pair_once(spark):
    df = spark.createDataFrame(
        [(1, "x", "aa"), (2, "x", "ab"), (3, "x", "ba")],
        "id bigint, b string, t string",
    )
    rows = linkage.fuzzy_self_pairs(df, "id", ["b"], "t", 2).collect()
    assert len(rows) == 3  # 3 unordered pairs, no (b,a) mirrors, no self
    assert all(r["id_a"] < r["id_b"] for r in rows)


def test_blocked_fuzzy_join_cross_table(spark):
    left = spark.createDataFrame(
        [(1, "us", "acme corp"), (2, "eu", "acme corp")],
        "lid bigint, lreg string, lname string",
    )
    right = spark.createDataFrame(
        [(10, "us", "acme corp."), (11, "us", "zzz"), (12, "eu", "acme inc")],
        "rid bigint, rreg string, rname string",
    )
    got = {
        (r["lid"], r["rid"]): r["dist"]
        for r in linkage.blocked_fuzzy_join(
            left, right, [("lreg", "rreg")], ("lname", "rname"), 2
        ).collect()
    }
    # (1,10) dist 1; (1,11) too far; (2,12) dist 4 > 2
    assert got == {(1, 10): 1}


def test_blocked_fuzzy_join_zero_dist_is_exact(spark):
    left = spark.createDataFrame([(1, "b", "same")], "lid bigint, lb string, lt string")
    right = spark.createDataFrame(
        [(2, "b", "same"), (3, "b", "sam")], "rid bigint, rb string, rt string"
    )
    rows = linkage.blocked_fuzzy_join(
        left, right, [("lb", "rb")], ("lt", "rt"), 0
    ).collect()
    assert [(r["lid"], r["rid"], r["dist"]) for r in rows] == [(1, 2, 0)]


def test_blocked_fuzzy_join_sliced_same_pairs(spark):
    # n_slices > 1 must not change the pair set — only the partitioning.
    left = spark.createDataFrame(
        [(i, "b", t) for i, t in enumerate(["kitten", "sitten", "mitten", "zzz"])],
        "lid bigint, lb string, lt string",
    )
    right = spark.createDataFrame(
        [(i + 10, "b", t) for i, t in enumerate(["kitten", "sittin", "mitts"])],
        "rid bigint, rb string, rt string",
    )
    base = {
        (r["lid"], r["rid"], r["dist"])
        for r in linkage.blocked_fuzzy_join(
            left, right, [("lb", "rb")], ("lt", "rt"), 2
        ).collect()
    }
    sliced_df = linkage.blocked_fuzzy_join(
        left, right, [("lb", "rb")], ("lt", "rt"), 2, n_slices=4
    )
    sliced = {(r["lid"], r["rid"], r["dist"]) for r in sliced_df.collect()}
    assert sliced == base
    assert "_slice_l" not in sliced_df.columns and "_slice_r" not in sliced_df.columns
    plan = sliced_df._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan


def test_fuzzy_join_plan_is_equi_not_cartesian(spark, sf_dir):
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    df = linkage.fuzzy_self_pairs(cust, "c_custkey", ["c_nationkey"], "c_name", 2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan
    assert "EvalPython" not in plan


def test_robust_stats_hand_computed(spark):
    # values 1..5: p25=2, median=3, p75=4, iqr=2, fences -1 / 7
    df = spark.createDataFrame(
        [("g", float(v)) for v in range(1, 6)], "k string, v double"
    )
    r = stats.robust_stats(df, ["k"], "v").collect()[0]
    assert (r["p25"], r["median"], r["p75"], r["iqr"]) == (2.0, 3.0, 4.0, 2.0)
    assert (r["lo_fence"], r["hi_fence"]) == (-1.0, 7.0)


def test_robust_stats_interpolates(spark):
    # values 1,2,3,4: p25 = 1.75 (linear interpolation, type-7)
    df = spark.createDataFrame(
        [("g", float(v)) for v in range(1, 5)], "k string, v double"
    )
    r = stats.robust_stats(df, ["k"], "v").collect()[0]
    assert r["p25"] == 1.75 and r["median"] == 2.5 and r["p75"] == 3.25


def test_robust_stats_single_agg_plan(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    df = stats.robust_stats(ev, ["event_type"], "value")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # one logical aggregation -> exactly one pair of (partial, final)
    assert plan.count("Exchange hashpartitioning(event_type") <= 1
    assert "EvalPython" not in plan


def test_equi_depth_bins_equal_population(spark):
    from bytewax_spark.functions import stats

    df = spark.createDataFrame(
        [("g", float(v), v) for v in range(1, 101)], "k string, v double, id bigint"
    )
    rows = stats.equi_depth_bins(df, ["k"], "v", "id", n_bins=4).collect()
    assert len(rows) == 4
    assert all(r["n"] == 25 for r in rows)
    by_bin = {r["bin"]: (r["lo"], r["hi"]) for r in rows}
    assert by_bin[1] == (1.0, 25.0) and by_bin[4] == (76.0, 100.0)


def test_equi_depth_bins_remainder_goes_to_early_bins(spark):
    from bytewax_spark.functions import stats

    df = spark.createDataFrame(
        [("g", float(v), v) for v in range(10)], "k string, v double, id bigint"
    )
    rows = {r["bin"]: r["n"] for r in stats.equi_depth_bins(df, ["k"], "v", "id", n_bins=3).collect()}
    assert rows == {1: 4, 2: 3, 3: 3}  # ntile's standard distribution


def test_exact_corr_perfect_and_inverse(spark):
    from bytewax_spark.functions import stats

    rows = [("p", float(i), float(2 * i + 3)) for i in range(1, 20)] + [
        ("m", float(i), float(-i)) for i in range(1, 20)
    ]
    df = spark.createDataFrame(rows, "k string, x double, y double")
    got = {r["k"]: r["corr"] for r in stats.exact_corr(df, ["k"], "x", "y").collect()}
    assert got == {"p": 1.0, "m": -1.0}


def test_exact_corr_matches_numpy(spark):
    import numpy as np

    from bytewax_spark.functions import stats

    xs = [1.0, 2.0, 4.0, 8.0, 16.0]
    ys = [3.0, 1.0, 7.0, 2.0, 9.0]
    df = spark.createDataFrame(
        [("g", x, y) for x, y in zip(xs, ys)], "k string, x double, y double"
    )
    got = stats.exact_corr(df, ["k"], "x", "y").collect()[0]
    assert got["n"] == 5
    assert abs(got["corr"] - np.corrcoef(xs, ys)[0, 1]) < 1e-5


def test_fuzzy_sliced_join_pins_fanout(spark, sf_dir):
    """n_slices > 1 must produce an explicit-count repartition
    (REPARTITION_BY_NUM) — an implicit one is AQE-coalesced back to a
    single task on small-but-compare-heavy blocks."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    df = linkage.fuzzy_self_pairs(
        cust, "c_custkey", ["c_nationkey"], "c_name", 2, n_slices=8
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "REPARTITION_BY_NUM" in plan
    assert "EvalPython" not in plan

    # slicing never changes the answer, only its distribution
    base = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in linkage.fuzzy_self_pairs(cust, "c_custkey", ["c_nationkey"], "c_name", 2).collect()
    }
    sliced = {(r["id_a"], r["id_b"], r["dist"]) for r in df.collect()}
    assert base == sliced


def test_sorted_neighborhood_catches_cross_block_pair(spark):
    # "ann" and "anna" sort adjacent but sit in DIFFERENT nations —
    # nation-blocked fuzzy_self_pairs misses them, the sorted pass
    # finds them; "zzz" is far in sort order and beyond edit distance
    rows = [
        (1, 10, "ann"),
        (2, 20, "anna"),
        (3, 10, "zzz"),
    ]
    df = spark.createDataFrame(rows, "id long, nation int, name string")
    blocked = {
        (r["id_a"], r["id_b"])
        for r in linkage.fuzzy_self_pairs(df, "id", ["nation"], "name", 2).collect()
    }
    assert (1, 2) not in blocked
    sn = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in linkage.sorted_neighborhood_pairs(
            df, "id", "name", "name", 2, window=10
        ).collect()
    }
    assert sn[(1, 2)] == 1
    assert (1, 3) not in sn and (2, 3) not in sn


def test_sorted_neighborhood_window_bounds_pairs(spark):
    # identical texts, but only rank-neighbors within `window` compare:
    # with window=1 only adjacent ranks pair up
    rows = [(i, f"n{i:02d}", "same") for i in range(1, 6)]
    df = spark.createDataFrame(rows, "id long, key string, t string")
    got = {
        (r["id_a"], r["id_b"])
        for r in linkage.sorted_neighborhood_pairs(
            df, "id", "key", "t", 0, window=1
        ).collect()
    }
    assert got == {(1, 2), (2, 3), (3, 4), (4, 5)}


def test_sorted_neighborhood_partition_invariant(spark):
    rows = [(i, f"name{i:03d}", f"name{i:03d}") for i in range(1, 60)]
    df = spark.createDataFrame(rows, "id long, key string, t string")
    one = linkage.sorted_neighborhood_pairs(df, "id", "key", "t", 1, window=3)
    many = linkage.sorted_neighborhood_pairs(
        df.repartition(13), "id", "key", "t", 1, window=3
    )
    assert sorted(map(tuple, one.collect())) == sorted(map(tuple, many.collect()))


def test_calibration_bins_hand_computed(spark):
    # 4 rows, 2 bins: low-score bin has 0 positives, high bin has 2
    rows = [
        (1, 0.1, 0, 1),
        (1, 0.2, 0, 2),
        (1, 0.8, 1, 3),
        (1, 0.9, 1, 4),
    ]
    df = spark.createDataFrame(rows, "g int, score double, y int, id long")
    out = {
        r["bin"]: r
        for r in stats.calibration_bins(df, ["g"], "score", "y", "id", 2).collect()
    }
    assert out[1]["pos"] == 0 and out[1]["pos_rate_micro"] == 0
    assert out[1]["score_mean_micro"] == 150_000
    assert out[2]["pos"] == 2 and out[2]["pos_rate_micro"] == 1_000_000
    assert out[2]["score_mean_micro"] == 850_000


def test_seasonal_outliers_flags_spike_in_own_hour(spark):
    from datetime import datetime

    # hour 3: ten 10.0s and one 1000.0 — a lone spike among k constants
    # sits at exactly z = sqrt(n-1), so n=11 puts it at sqrt(10) > 3
    # (n=10 would land EXACTLY on 3 sigma and the strict > keeps it);
    # hour 4: uniform, no outliers
    rows = [("a", datetime(2024, 1, 1, 3, i), 10.0) for i in range(10)]
    rows.append(("a", datetime(2024, 1, 1, 3, 30), 1000.0))
    rows += [("a", datetime(2024, 1, 1, 4, i), 10.0) for i in range(5)]
    df = spark.createDataFrame(rows, "t string, ts timestamp, value double")
    out = {
        r["hod"]: r
        for r in stats.seasonal_outlier_counts(
            df, ["t"], "ts", "value", k_sigma=3
        ).collect()
    }
    assert out[3]["n"] == 11 and out[3]["n_outliers"] == 1
    assert out[4]["n"] == 5 and out[4]["n_outliers"] == 0


def test_mad_outliers_hand_computed(spark):
    # group g: values 1..9 plus a wild 100 -> median 5.5, deviations
    # [4.5,3.5,2.5,1.5,0.5,0.5,1.5,2.5,3.5,94.5] -> MAD 2.5,
    # threshold 3*1.4826*2.5 = 11.1195 -> only 100 is flagged
    df = spark.createDataFrame(
        [("g", float(v)) for v in range(1, 10)] + [("g", 100.0)],
        "k string, v double",
    )
    row = stats.mad_outliers(df, ["k"], "v", k=3.0).collect()[0]
    assert row.n == 10
    assert row.median == 5.5
    assert row.mad == 2.5
    assert abs(row.threshold - 11.1195) < 1e-9
    assert row.n_outliers == 1


def test_mad_outliers_zero_mad_flags_off_median(spark):
    # constant group with one deviant: MAD = 0 -> every row off the
    # median is an outlier (Hampel convention)
    df = spark.createDataFrame(
        [("g", 7.0)] * 5 + [("g", 8.0)], "k string, v double"
    )
    row = stats.mad_outliers(df, ["k"], "v").collect()[0]
    assert row.mad == 0.0 and row.n_outliers == 1


def test_mad_outliers_groups_are_independent(spark):
    df = spark.createDataFrame(
        [("a", float(v)) for v in range(1, 10)] + [("a", 100.0)]
        + [("b", 1000.0)] * 4,
        "k string, v double",
    )
    rows = {r.k: r for r in stats.mad_outliers(df, ["k"], "v").collect()}
    assert rows["a"].n_outliers == 1
    assert rows["b"].n_outliers == 0 and rows["b"].mad == 0.0


def test_gini_extremes(spark):
    # perfectly equal -> 0; one-holder (n=4) -> (n-1)/n = 0.75
    df = spark.createDataFrame(
        [("eq", 5), ("eq", 5), ("eq", 5), ("eq", 5),
         ("one", 0), ("one", 0), ("one", 0), ("one", 100)],
        "k string, v long",
    )
    out = {r.k: r.gini_micro for r in stats.gini(df, ["k"], "v").collect()}
    assert out["eq"] == 0
    assert out["one"] == 750_000


def test_gini_known_value(spark):
    # x = [1, 2, 3, 4]: G = (2*(1+4+9+16) - 5*10) / (4*10) = 10/40 = 0.25
    df = spark.createDataFrame([("g", v) for v in [3, 1, 4, 2]], "k string, v long")
    row = stats.gini(df, ["k"], "v").collect()[0]
    assert row.n == 4 and row.total == 10
    assert row.gini_micro == 250_000


def test_gini_zero_total_reads_zero(spark):
    df = spark.createDataFrame([("z", 0), ("z", 0)], "k string, v long")
    assert stats.gini(df, ["k"], "v").collect()[0].gini_micro == 0


def test_mutual_information_independent_is_zero(spark):
    # X and Y independent uniform: every cell c_xy*N == c_x*c_y -> ln 1 = 0
    rows = [(x, y) for x in ("a", "b") for y in ("u", "v") for _ in range(5)]
    df = spark.createDataFrame(rows, "x string, y string")
    row = stats.mutual_information(df, "x", "y").collect()[0]
    assert row.n == 20 and row.n_cells == 4 and row.mi_micro == 0


def test_mutual_information_perfect_dependence_ln2(spark):
    # Y == f(X), two equiprobable values: MI = ln 2 = 0.693147 nats
    rows = [("a", "u")] * 5 + [("b", "v")] * 5
    df = spark.createDataFrame(rows, "x string, y string")
    row = stats.mutual_information(df, "x", "y").collect()[0]
    assert abs(row.mi_micro - 693_147) <= 1


def test_psi_identical_distributions_zero(spark):
    ref = spark.createDataFrame([(b,) for b in [1, 1, 2, 2, 3, 3]], "b long")
    row = stats.psi(ref, ref, "b").collect()[0]
    assert row.psi_micro == 0 and row.only_ref == 0 and row.only_cur == 0
    assert row.n_bins == 3


def test_psi_shift_is_positive_and_one_sided_bins_counted(spark):
    ref = spark.createDataFrame([(1,)] * 8 + [(2,)] * 2, "b long")
    cur = spark.createDataFrame([(1,)] * 2 + [(2,)] * 6 + [(3,)] * 2, "b long")
    row = stats.psi(ref, cur, "b").collect()[0]
    # hand check: p=(0.8,0.2), q=(0.2,0.6) over shared bins
    # 0.6*ln(4) + 0.4*ln(3) = 0.831777 + 0.439445 = 1.271221
    assert abs(row.psi_micro - 1_271_221) <= 5
    assert row.n_bins == 2 and row.only_ref == 0 and row.only_cur == 1


def test_benford_counts_and_constants(spark):
    # values 1.0..9.0 once each -> every digit n=1, obs 111111 ppm
    df = spark.createDataFrame(
        [("g", float(d)) for d in range(1, 10)], "k string, v double"
    )
    rows = {r.digit: r for r in stats.benford(df, ["k"], "v").collect()}
    assert set(rows) == set(range(1, 10))
    assert all(r.n == 1 and r.obs_ppm == 111_111 for r in rows.values())
    assert rows[1].exp_ppm == 301_029 and rows[9].exp_ppm == 45_757
    assert rows[1].dev_ppm == 111_111 - 301_029


def test_benford_digit_from_cents_not_float_format(spark):
    # 0.05 -> floor(5) cents -> digit 5; 0.004 (0 cents) excluded; -3 excluded
    df = spark.createDataFrame(
        [("g", 0.05), ("g", 0.004), ("g", -3.0)], "k string, v double"
    )
    rows = stats.benford(df, ["k"], "v").collect()
    assert len(rows) == 1 and rows[0].digit == 5 and rows[0].obs_ppm == 1_000_000


def test_ks_stat_identical_zero_disjoint_full(spark):
    a = spark.createDataFrame([(float(v),) for v in range(10)], "value double")
    b = spark.createDataFrame([(float(v + 100),) for v in range(10)], "value double")
    same = stats.ks_stat(a, a, "value").collect()[0]
    assert same.d_ppm == 0 and same.n_ref == 10 and same.n_cur == 10
    far = stats.ks_stat(a, b, "value").collect()[0]
    assert far.d_ppm == 1_000_000  # disjoint supports: D = 1


def test_ks_stat_hand_computed(spark):
    # ref {1,2,3,4}, cur {3,4,5,6}: max gap at v=2 -> |2/4 - 0/4| = 0.5
    a = spark.createDataFrame([(float(v),) for v in [1, 2, 3, 4]], "value double")
    b = spark.createDataFrame([(float(v),) for v in [3, 4, 5, 6]], "value double")
    row = stats.ks_stat(a, b, "value").collect()[0]
    assert row.d_ppm == 500_000


def test_ks_stat_matches_scipy_shape(spark):
    # unequal sizes: ref {1,1,2}, cur {2,3}: CDFs at v=1: 2/3 vs 0 -> D=2/3
    a = spark.createDataFrame([(1.0,), (1.0,), (2.0,)], "value double")
    b = spark.createDataFrame([(2.0,), (3.0,)], "value double")
    row = stats.ks_stat(a, b, "value").collect()[0]
    assert row.d_ppm == 666_666  # floor(2/3 * 1e6)


def test_shannon_entropy_degenerate_and_uniform(spark):
    rows = [("one", "x")] * 8 + [("uni", v) for v in "abcd" * 3]
    df = spark.createDataFrame(rows, "k string, v string")
    out = {r.k: r for r in stats.shannon_entropy(df, ["k"], "v").collect()}
    assert out["one"].entropy_micro == 0 and out["one"].n_values == 1
    # uniform over 4: H = ln 4 = max entropy
    assert out["uni"].entropy_micro == out["uni"].max_entropy_micro
    assert abs(out["uni"].entropy_micro - 1_386_294) <= 2


def test_shannon_entropy_skewed_below_max(spark):
    rows = [("g", "a")] * 9 + [("g", "b")]
    df = spark.createDataFrame(rows, "k string, v string")
    r = stats.shannon_entropy(df, ["k"], "v").collect()[0]
    # H = 0.9 ln(10/9) + 0.1 ln(10) = 0.325083
    assert abs(r.entropy_micro - 325_082) <= 2
    assert r.entropy_micro < r.max_entropy_micro


def test_qq_table_identical_distributions_zero_gap(spark):
    df = spark.createDataFrame([(float(v),) for v in range(100)], "value double")
    rows = stats.qq_table(df, df, "value", percentiles=[25, 50, 75]).collect()
    assert [r.pct for r in rows] == [25, 50, 75]
    assert all(r.gap == 0.0 for r in rows)


def test_qq_table_shift_shows_in_every_row(spark):
    a = spark.createDataFrame([(float(v),) for v in range(100)], "value double")
    b = spark.createDataFrame([(float(v + 10),) for v in range(100)], "value double")
    rows = stats.qq_table(a, b, "value", percentiles=[10, 50, 90]).collect()
    assert all(abs(r.gap - 10.0) < 1e-9 for r in rows)


def test_qq_table_validates_percentiles(spark):
    import pytest

    df = spark.createDataFrame([(1.0,)], "value double")
    with pytest.raises(ValueError):
        stats.qq_table(df, df, "value", percentiles=[0])
