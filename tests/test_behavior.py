"""Behavioral analytics (functions/behavior.py): ordered funnels,
cohort retention, event transitions — semantics pinned on handmade
sequences where the expected numbers are computable by eye."""

from __future__ import annotations

import pytest

from datetime import datetime

from pyspark.sql import functions as F

from bytewax_spark.functions import behavior as bh


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_type string, event_id bigint"
    )


def _ts(s):
    return datetime.fromisoformat(s)


def test_funnel_requires_step_order(spark):
    # u1 converts in order; u2 clicked BEFORE viewing (click must not
    # count); u3 only views; u4 never views (excluded from step 1).
    ev = _ev(
        spark,
        [
            (1, _ts("2024-01-01T00:00"), "view", 1),
            (1, _ts("2024-01-01T01:00"), "click", 2),
            (1, _ts("2024-01-01T02:00"), "buy", 3),
            (2, _ts("2024-01-01T01:00"), "click", 4),
            (2, _ts("2024-01-01T02:00"), "view", 5),
            (3, _ts("2024-01-01T00:00"), "view", 6),
            (4, _ts("2024-01-01T00:00"), "click", 7),
        ],
    )
    got = {
        r["step"]: r["users"]
        for r in bh.funnel(ev, "user_id", "ts", "event_type", ["view", "click", "buy"]).collect()
    }
    assert got == {"view": 3, "click": 1, "buy": 1}


def test_funnel_equal_timestamps_count(spark):
    ev = _ev(
        spark,
        [
            (1, _ts("2024-01-01T00:00"), "view", 1),
            (1, _ts("2024-01-01T00:00"), "click", 2),
        ],
    )
    got = {
        r["step"]: r["users"]
        for r in bh.funnel(ev, "user_id", "ts", "event_type", ["view", "click"]).collect()
    }
    assert got == {"view": 1, "click": 1}


def test_funnel_later_step_before_earlier_reset(spark):
    # u1's only click precedes the first view -> click never credited,
    # even though both event types exist for the user.
    ev = _ev(
        spark,
        [
            (1, _ts("2024-01-01T05:00"), "view", 1),
            (1, _ts("2024-01-01T01:00"), "click", 2),
        ],
    )
    got = {
        r["step"]: r["users"]
        for r in bh.funnel(ev, "user_id", "ts", "event_type", ["view", "click"]).collect()
    }
    assert got == {"view": 1, "click": 0}


def test_cohort_retention_offsets(spark):
    # u1 first active week of Jan 1 (Mon), returns 2 weeks later;
    # u2 first active week of Jan 8, active same week only.
    ev = _ev(
        spark,
        [
            (1, _ts("2024-01-02T00:00"), "view", 1),
            (1, _ts("2024-01-16T00:00"), "view", 2),
            (2, _ts("2024-01-09T00:00"), "view", 3),
        ],
    )
    rows = {
        (str(r["cohort"].date()), r["offset"]): r["users"]
        for r in bh.cohort_retention(ev, "user_id", "ts", bucket="week").collect()
    }
    assert rows == {
        ("2024-01-01", 0): 1,
        ("2024-01-01", 2): 1,
        ("2024-01-08", 0): 1,
    }


def test_cohort_retention_max_offset_caps(spark):
    ev = _ev(
        spark,
        [
            (1, _ts("2024-01-01T00:00"), "view", 1),
            (1, _ts("2024-03-01T00:00"), "view", 2),
        ],
    )
    rows = bh.cohort_retention(ev, "user_id", "ts", bucket="week", max_offset=1).collect()
    assert {r["offset"] for r in rows} == {0}


def test_event_transitions_tiebreak_is_total(spark):
    # Two events at the identical timestamp: event_id decides order, so
    # the pair is (a->b), never (b->a).
    ev = _ev(
        spark,
        [
            (1, _ts("2024-01-01T00:00"), "a", 1),
            (1, _ts("2024-01-01T00:00"), "b", 2),
            (1, _ts("2024-01-01T01:00"), "a", 3),
            (2, _ts("2024-01-01T00:00"), "a", 4),
        ],
    )
    got = {
        (r["src"], r["dst"]): r["transitions"]
        for r in bh.event_transitions(ev, "user_id", "ts", "event_type", "event_id").collect()
    }
    # u1: a->b, b->a ; u2 has a single event (no transition)
    assert got == {("a", "b"): 1, ("b", "a"): 1}


def test_funnel_plan_no_python_no_cartesian(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    df = bh.funnel(ev, "user_id", "ts", "event_type", ["view", "click", "purchase"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "Cartesian" not in plan
    # step filters are pushed to the parquet scan
    assert "PushedFilters" in plan and "EqualTo(event_type," in plan


def test_sessionize_gap_splits(spark):
    from datetime import timedelta

    ev = _ev(
        spark,
        [
            (1, _ts("2024-01-01T00:00"), "a", 1),
            (1, _ts("2024-01-01T00:10"), "a", 2),   # 10m gap: same session
            (1, _ts("2024-01-01T01:00"), "a", 3),   # 50m gap: new session
            (1, _ts("2024-01-01T01:05"), "a", 4),
            (2, _ts("2024-01-01T00:00"), "a", 5),
        ],
    )
    got = {
        (r["user_id"], r["event_id"]): r["session_id"]
        for r in bh.sessionize(ev, "user_id", "ts", "event_id", timedelta(minutes=30)).collect()
    }
    assert got == {(1, 1): 1, (1, 2): 1, (1, 3): 2, (1, 4): 2, (2, 5): 1}


def test_sessionize_ties_share_session(spark):
    from datetime import timedelta

    ev = _ev(
        spark,
        [
            (1, _ts("2024-01-01T00:00"), "a", 1),
            (1, _ts("2024-01-01T00:00"), "b", 2),
        ],
    )
    rows = bh.sessionize(ev, "user_id", "ts", "event_id", timedelta(minutes=1)).collect()
    assert {r["session_id"] for r in rows} == {1}


def test_sessionize_validates_gap(spark):
    from datetime import timedelta

    import pytest

    ev = _ev(spark, [(1, _ts("2024-01-01T00:00"), "a", 1)])
    with pytest.raises(ValueError):
        bh.sessionize(ev, "user_id", "ts", "event_id", timedelta(0))


def test_event_ngrams_trigrams_by_hand(spark):
    # u1: a b a b a -> trigrams (a,b,a) x2, (b,a,b) x1
    # u2: a b a     -> (a,b,a) x1; patterns never cross users
    rows = [
        (1, _ts("2024-01-01T00:00:01"), "a", 1),
        (1, _ts("2024-01-01T00:00:02"), "b", 2),
        (1, _ts("2024-01-01T00:00:03"), "a", 3),
        (1, _ts("2024-01-01T00:00:04"), "b", 4),
        (1, _ts("2024-01-01T00:00:05"), "a", 5),
        (2, _ts("2024-01-01T00:00:01"), "a", 6),
        (2, _ts("2024-01-01T00:00:02"), "b", 7),
        (2, _ts("2024-01-01T00:00:03"), "a", 8),
    ]
    out = {
        (r.step_1, r.step_2, r.step_3): r.occurrences
        for r in bh.event_ngrams(
            _ev(spark, rows), "user_id", "ts", "event_type", "event_id", n=3
        ).collect()
    }
    assert out == {("a", "b", "a"): 3, ("b", "a", "b"): 1}


def test_event_ngrams_n2_matches_transitions(spark):
    rows = [
        (1, _ts("2024-01-01T00:00:01"), "x", 1),
        (1, _ts("2024-01-01T00:00:02"), "y", 2),
        (1, _ts("2024-01-01T00:00:03"), "x", 3),
        (2, _ts("2024-01-01T00:00:01"), "y", 4),
        (2, _ts("2024-01-01T00:00:02"), "x", 5),
    ]
    ev = _ev(spark, rows)
    bi = {
        (r.step_1, r.step_2): r.occurrences
        for r in bh.event_ngrams(
            ev, "user_id", "ts", "event_type", "event_id", n=2
        ).collect()
    }
    tr = {
        (r.src, r.dst): r.transitions
        for r in bh.event_transitions(
            ev, "user_id", "ts", "event_type", "event_id"
        ).collect()
    }
    assert bi == tr


def test_event_ngrams_min_count_filters(spark):
    rows = [
        (1, _ts("2024-01-01T00:00:01"), "a", 1),
        (1, _ts("2024-01-01T00:00:02"), "b", 2),
        (1, _ts("2024-01-01T00:00:03"), "c", 3),
    ]
    out = bh.event_ngrams(
        _ev(spark, rows), "user_id", "ts", "event_type", "event_id",
        n=3, min_count=2,
    ).collect()
    assert out == []


def test_funnel_within_bounds_each_hop(spark):
    from datetime import timedelta

    # u1 clicks 30 min after view (inside 1h); u2 clicks 2h after (out)
    rows = [
        (1, _ts("2024-01-01T00:00:00"), "view", 1),
        (1, _ts("2024-01-01T00:30:00"), "click", 2),
        (2, _ts("2024-01-01T00:00:00"), "view", 3),
        (2, _ts("2024-01-01T02:00:00"), "click", 4),
    ]
    out = {
        r.step: r.users
        for r in bh.funnel(
            _ev(spark, rows), "user_id", "ts", "event_type",
            ["view", "click"], within=timedelta(hours=1),
        ).collect()
    }
    assert out == {"view": 2, "click": 1}


def test_funnel_within_is_per_hop_not_whole_journey(spark):
    from datetime import timedelta

    # each hop 50 min apart: total 100 min > 1h but every hop < 1h
    rows = [
        (1, _ts("2024-01-01T00:00:00"), "view", 1),
        (1, _ts("2024-01-01T00:50:00"), "click", 2),
        (1, _ts("2024-01-01T01:40:00"), "purchase", 3),
    ]
    out = {
        r.step: r.users
        for r in bh.funnel(
            _ev(spark, rows), "user_id", "ts", "event_type",
            ["view", "click", "purchase"], within=timedelta(hours=1),
        ).collect()
    }
    assert out == {"view": 1, "click": 1, "purchase": 1}


def test_funnel_without_within_unchanged(spark):
    rows = [
        (1, _ts("2024-01-01T00:00:00"), "view", 1),
        (1, _ts("2024-01-05T00:00:00"), "click", 2),
    ]
    out = {
        r.step: r.users
        for r in bh.funnel(
            _ev(spark, rows), "user_id", "ts", "event_type", ["view", "click"]
        ).collect()
    }
    assert out == {"view": 1, "click": 1}


def test_session_conversion_by_hand(spark):
    from datetime import timedelta

    # u1: two sessions (2h apart), only the second has a purchase
    # u2: one session, no purchase -> 1 of 3 sessions converted
    rows = [
        (1, _ts("2024-01-01T00:00:00"), "view", 1),
        (1, _ts("2024-01-01T00:10:00"), "click", 2),
        (1, _ts("2024-01-01T05:00:00"), "view", 3),
        (1, _ts("2024-01-01T05:05:00"), "purchase", 4),
        (2, _ts("2024-01-01T00:00:00"), "view", 5),
    ]
    row = bh.session_conversion(
        _ev(spark, rows), "user_id", "ts", "event_type", "event_id",
        timedelta(minutes=30), "purchase",
    ).collect()[0]
    assert row.n_sessions == 3
    assert row.converted_sessions == 1
    assert row.conv_ppm == 333_333


def test_rfm_segments_hand_computed(spark):
    from bytewax_spark.functions.behavior import rfm_segments

    # two users, n_tiles=2: u1 recent+frequent+big, u2 stale+thin
    rows = [
        (1, _ts("2024-01-10T00:00:00"), "view", 1),
        (1, _ts("2024-01-10T01:00:00"), "view", 2),
        (1, _ts("2024-01-10T02:00:00"), "view", 3),
        (2, _ts("2024-01-01T00:00:00"), "view", 4),
    ]
    df = _ev(spark, rows).withColumn(
        "value", F.col("event_id").cast("double") * 10
    )
    out = {
        r.user_id: r
        for r in rfm_segments(df, "user_id", "ts", "value", n_tiles=2).collect()
    }
    assert out[1].recency_days == 0 and out[2].recency_days == 9
    assert out[1].frequency == 3 and out[2].frequency == 1
    assert out[1].segment == 222 and out[2].segment == 111


def test_session_paths_by_hand(spark):
    from datetime import timedelta

    from bytewax_spark.functions.behavior import session_paths

    # u1 and u2 both view>click in one session; u1 has a second
    # lone-purchase session 2h later
    rows = [
        (1, _ts("2024-01-01T00:00:00"), "view", 1),
        (1, _ts("2024-01-01T00:05:00"), "click", 2),
        (1, _ts("2024-01-01T03:00:00"), "purchase", 3),
        (2, _ts("2024-01-01T00:00:00"), "view", 4),
        (2, _ts("2024-01-01T00:01:00"), "click", 5),
    ]
    out = {
        r.path: (r.n_steps, r.sessions)
        for r in session_paths(
            _ev(spark, rows), "user_id", "ts", "event_type", "event_id",
            timedelta(minutes=30),
        ).collect()
    }
    assert out == {"view>click": (2, 2), "purchase": (1, 1)}


def test_session_paths_truncates_at_max_len(spark):
    from datetime import timedelta

    from bytewax_spark.functions.behavior import session_paths

    rows = [
        (1, _ts(f"2024-01-01T00:0{i}:00"), f"e{i}", i) for i in range(5)
    ]
    out = session_paths(
        _ev(spark, rows), "user_id", "ts", "event_type", "event_id",
        timedelta(minutes=30), max_len=3,
    ).collect()
    assert [(r.path, r.n_steps) for r in out] == [("e0>e1>e2", 3)]


def test_stickiness_daily_vs_single_visit(spark):
    # u1 active all 3 observed days; u2 once -> DAUs: 2,1,1 over MAU 2
    # stickiness = (4/3)/2 = 2/3
    rows = [
        (1, _ts("2024-01-01T10:00:00"), "view", 1),
        (1, _ts("2024-01-02T10:00:00"), "view", 2),
        (1, _ts("2024-01-03T10:00:00"), "view", 3),
        (2, _ts("2024-01-01T11:00:00"), "view", 4),
    ]
    row = bh.stickiness(_ev(spark, rows), "user_id", "ts").collect()[0]
    assert row.n_days == 3 and row.mau == 2
    assert row.stickiness_ppm == 666_666


@pytest.mark.slow
def test_scalable_ntile_matches_spark_ntile_under_heavy_ties(spark):
    """rfm's distributed ntile must reproduce NTILE(n) OVER (ORDER BY
    key [DESC], user ASC) bit-for-bit — including the big-buckets-first
    remainder rule and tie blocks straddling a tile cut (the 1000-row /
    1-distinct-value case is one giant tie block crossed by every
    cut)."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    random.seed(11)
    for nrows, nvals, n in [(199, 4, 5), (60, 1, 4), (7, 50, 5)]:
        rows = [(i, random.randrange(nvals)) for i in range(nrows)]
        df = spark.createDataFrame(rows, "user_id long, v long")
        for desc in (False, True):
            w = Window.orderBy(
                F.col("v").desc() if desc else F.col("v").asc(),
                F.col("user_id").asc(),
            )
            truth = {
                r["user_id"]: r["t"]
                for r in df.select(
                    "user_id", F.ntile(n).over(w).alias("t")
                ).collect()
            }
            got = {
                r["user_id"]: r["o"]
                for r in bh._scalable_ntile(
                    df, "v", desc, "user_id", n, nrows, "o"
                ).collect()
            }
            assert got == truth, (nrows, nvals, n, desc)


def test_scalable_ntile_null_dimension_values(spark):
    """A NULL dimension value (e.g. recency from a user with no
    timestamped event) is a legitimate tie block: it must receive a
    tile like any other value — matching Spark's NTILE over the same
    ordering (nulls first asc / last desc) — not vanish from the
    output (the old equi-join/isin path) or raise (the old create_map
    path when the null block straddled a tile cut)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    # 5 nulls straddle the n=3 cut of 9 rows (tiles of 3): the null
    # block [ranks 1-5 asc] crosses the rank-3 boundary
    rows = [(i, None if i < 5 else i * 10) for i in range(9)]
    df = spark.createDataFrame(rows, "user_id long, v long")
    for desc in (False, True):
        w = Window.orderBy(
            F.col("v").desc() if desc else F.col("v").asc(),
            F.col("user_id").asc(),
        )
        truth = {
            r["user_id"]: r["t"]
            for r in df.select("user_id", F.ntile(3).over(w).alias("t")).collect()
        }
        got = {
            r["user_id"]: r["o"]
            for r in bh._scalable_ntile(
                df, "v", desc, "user_id", 3, 9, "o"
            ).collect()
        }
        assert got == truth, (desc, got, truth)
