"""profile_table (functions/profiling.py), outlier_counts
(functions/stats.py), decayed_sum (functions/timeseries.py)."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from bytewax_spark.functions import profiling, stats, timeseries


def test_profile_table_metrics(spark):
    df = spark.createDataFrame(
        [(1, "aa"), (2, None), (2, "bbbb")],
        "id bigint, s string",
    )
    rows = {r["column"]: r for r in profiling.profile_table(df).collect()}
    assert rows["id"]["n_rows"] == 3
    assert rows["id"]["n_nulls"] == 0
    assert rows["id"]["n_distinct"] == 2
    assert rows["id"]["min_len"] is None  # non-string: no length metrics
    assert rows["s"]["n_nulls"] == 1
    assert rows["s"]["n_distinct"] == 2
    assert rows["s"]["min_len"] == 2 and rows["s"]["max_len"] == 4
    # avg over non-null: (2+4)*1e6 div 2 = 3_000_000
    assert rows["s"]["avg_len_micro"] == 3_000_000


def test_profile_table_single_scan(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = profiling.profile_table(docs)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") == 1  # one pass, not per-column
    assert "EvalPython" not in plan


def test_profile_table_column_subset_and_empty(spark):
    df = spark.createDataFrame([(1, "x")], "a bigint, b string")
    assert profiling.profile_table(df, ["b"]).count() == 1
    with pytest.raises(ValueError):
        profiling.profile_table(df, [])


def test_outlier_counts_hand_built(spark):
    # group g: 1..9 (fences well inside) plus 100 -> one hi outlier
    rows = [("g", float(v)) for v in range(1, 10)] + [("g", 100.0)]
    df = spark.createDataFrame(rows, "k string, v double")
    r = stats.outlier_counts(df, ["k"], "v").collect()[0]
    assert r["n"] == 10 and r["hi_outliers"] == 1 and r["lo_outliers"] == 0


def test_decayed_sum_halving(spark):
    # anchor so ages are exactly 0, 1, 2 half-lives:
    # 8 + 8>>1 + 8>>2 = 8 + 4 + 2 micro-sums of value 8e-6? use value 8.0
    df = spark.createDataFrame(
        [
            ("k", datetime(2024, 1, 4), 8.0),
            ("k", datetime(2024, 1, 3), 8.0),
            ("k", datetime(2024, 1, 2), 8.0),
        ],
        "k string, ts timestamp, v double",
    )
    r = timeseries.decayed_sum(
        df, "k", "ts", "v", "2024-01-04 00:00:00", timedelta(days=1)
    ).collect()[0]
    assert r["decayed_micro"] == 8_000_000 + 4_000_000 + 2_000_000


def test_decayed_sum_clamps(spark):
    # 100 half-lives old -> shifted to zero; future event counts full
    df = spark.createDataFrame(
        [
            ("k", datetime(2020, 1, 1), 1000.0),
            ("k", datetime(2025, 1, 1), 1.0),
        ],
        "k string, ts timestamp, v double",
    )
    r = timeseries.decayed_sum(
        df, "k", "ts", "v", "2024-01-01 00:00:00", timedelta(days=1)
    ).collect()[0]
    assert r["decayed_micro"] == 1_000_000  # old row fully decayed, future full

    with pytest.raises(ValueError):
        timeseries.decayed_sum(df, "k", "ts", "v", "2024-01-01", timedelta(0))


def test_decayed_sum_partial_agg_plan(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    df = timeseries.decayed_sum(
        ev, "event_type", "ts", "value", "2024-12-31 00:00:00", timedelta(days=30)
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "partial_sum" in plan  # map-side combine before the exchange
    assert "EvalPython" not in plan


def test_ohlc_resample_hand_computed(spark):
    rows = [
        # one hour bucket, two keys; open/close by (ts, id) order
        ("a", datetime(2024, 1, 1, 10, 5), 1, 10.0),
        ("a", datetime(2024, 1, 1, 10, 1), 2, 5.0),   # earliest -> open
        ("a", datetime(2024, 1, 1, 10, 50), 3, 7.0),  # latest -> close
        ("a", datetime(2024, 1, 1, 10, 20), 4, 50.0),  # high
        ("b", datetime(2024, 1, 1, 10, 30), 5, 3.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, id long, v double")
    out = {
        r["k"]: r
        for r in timeseries.ohlc_resample(
            df, "ts", "v", "1 hour", key_cols=["k"], tie_col="id"
        ).collect()
    }
    a = out["a"]
    assert (a["open"], a["high"], a["low"], a["close"]) == (5.0, 50.0, 5.0, 7.0)
    assert a["n_obs"] == 4 and a["sum_val"] == 72.0
    b = out["b"]
    assert (b["open"], b["close"], b["n_obs"]) == (3.0, 3.0, 1)


def test_ohlc_resample_tie_breaks_on_id(spark):
    # identical timestamps: the tie column decides open/close
    ts = datetime(2024, 1, 1, 9, 0)
    df = spark.createDataFrame(
        [("a", ts, 2, 20.0), ("a", ts, 1, 10.0), ("a", ts, 3, 30.0)],
        "k string, ts timestamp, id long, v double",
    )
    r = timeseries.ohlc_resample(
        df, "ts", "v", "1 hour", key_cols=["k"], tie_col="id"
    ).collect()[0]
    assert r["open"] == 10.0 and r["close"] == 30.0


def test_skew_report_uniform_and_hot_key(spark):
    from bytewax_spark.functions.profiling import skew_report

    rows = [("hot",)] * 90 + [(f"k{i}",) for i in range(10)]
    df = spark.createDataFrame(rows, "k string")
    rep = skew_report(df, "k", top=3).collect()
    assert rep[0]["k"] == "hot" and rep[0]["rank"] == 1
    assert rep[0]["cnt"] == 90
    assert rep[0]["share_micro"] == 900_000  # 90/100 rows
    assert rep[0]["skew_micro"] == 9_900_000  # 90 * 11 keys / 100 rows
    assert len(rep) == 3


def test_skew_report_validates(spark):
    import pytest

    from bytewax_spark.functions.profiling import skew_report

    df = spark.createDataFrame([("a",)], "k string")
    with pytest.raises(ValueError):
        skew_report(df, "k", top=0)


def test_pareto_report_hand_computed(spark):
    # totals: a=50, b=30, c=15, d=5 (grand 100). 80% coverage ->
    # a (50%), b (cum 80% -- crossing row included), c/d excluded
    df = spark.createDataFrame(
        [("a", 50), ("b", 30), ("c", 15), ("d", 5)], "k string, v long"
    )
    from bytewax_spark.functions.profiling import pareto_report

    rows = pareto_report(df, "k", "v", coverage_micro=800_000).collect()
    got = [(r.rank, r.k, r.total, r.share_micro, r.cum_share_micro) for r in rows]
    assert got == [
        (1, "a", 50, 500_000, 500_000),
        (2, "b", 30, 300_000, 800_000),
    ]


def test_pareto_report_ties_break_on_key(spark):
    df = spark.createDataFrame(
        [("z", 10), ("a", 10), ("m", 10)], "k string, v long"
    )
    from bytewax_spark.functions.profiling import pareto_report

    rows = pareto_report(df, "k", "v", coverage_micro=1_000_000).collect()
    assert [r.k for r in rows] == ["a", "m", "z"]


def test_pareto_report_big_totals_no_overflow(spark):
    # int64-micro totals near 2^53..2^60: the share numerator needs
    # DECIMAL(38,0) -- a raw int64 multiply would overflow
    big = 4_000_000_000_000_000_000  # 4e18, near the int64 ceiling
    df = spark.createDataFrame(
        [("a", big), ("b", big // 4)], "k string, v long"
    )
    from bytewax_spark.functions.profiling import pareto_report

    rows = pareto_report(df, "k", "v", coverage_micro=900_000).collect()
    assert rows[0].share_micro == 800_000
    assert rows[-1].cum_share_micro == 1_000_000


def test_cumulative_distinct_first_seen_semantics(spark):
    from datetime import datetime

    from bytewax_spark.functions.timeseries import cumulative_distinct

    rows = [
        (1, datetime(2024, 1, 1, 5)),
        (1, datetime(2024, 1, 2, 5)),   # repeat user: must NOT recount
        (2, datetime(2024, 1, 1, 9)),
        (3, datetime(2024, 1, 3, 1)),
        (3, datetime(2024, 1, 3, 2)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {
        str(r.bucket_ts.date()): (r.new_entities, r.cum_entities)
        for r in cumulative_distinct(df, "user_id", "ts").collect()
    }
    assert out == {"2024-01-01": (2, 2), "2024-01-03": (1, 3)}


def test_vwap_hand_computed(spark):
    from bytewax_spark.functions.timeseries import vwap

    # (price, qty): (10, 2), (20, 1) -> pq = 40e6, vol 3 -> 13333333
    df = spark.createDataFrame(
        [("a", 10.0, 2), ("a", 20.0, 1), ("b", 5.0, 4)],
        "k string, p double, q long",
    )
    out = {r.k: (r.volume, r.vwap_micro) for r in vwap(df, ["k"], "p", "q").collect()}
    assert out["a"] == (3, 13_333_333)
    assert out["b"] == (4, 5_000_000)


def test_cusum_changepoint_locates_level_shift(spark):
    from datetime import datetime

    from bytewax_spark.functions.timeseries import cusum_changepoint

    # 5 zeros then 5 tens: CUSUM peaks exactly at the last pre-shift row
    rows = [
        ("g", datetime(2024, 1, 1, h), h, 0 if h < 5 else 10_000_000)
        for h in range(10)
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, i long, x long")
    out = cusum_changepoint(df, ["k"], "x", "ts", "i").collect()[0]
    assert out.n == 10
    assert out.at_ts == datetime(2024, 1, 1, 4)
    # classic statistic: |prefix_5 - 5*mean| = |0 - 25e6| = 25e6
    assert out.cusum_max_micro == 25_000_000


def test_cusum_constant_series_is_zero_at_first_row(spark):
    from datetime import datetime

    from bytewax_spark.functions.timeseries import cusum_changepoint

    rows = [("g", datetime(2024, 1, 1, h), h, 7) for h in range(4)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, i long, x long")
    out = cusum_changepoint(df, ["k"], "x", "ts", "i").collect()[0]
    assert out.cusum_max_micro == 0
    assert out.at_ts == datetime(2024, 1, 1, 0)  # earliest wins ties


def test_holt_linear_tracks_a_pure_trend(spark):
    from datetime import datetime

    from bytewax_spark.functions.timeseries import holt_linear

    # x_k = 100*k: a linear ramp; the trend state must become positive
    # and the level must lag the last value (smoothing), both exact
    rows = [
        ("g", datetime(2024, 1, 1, h), h, 100 * (h + 1)) for h in range(12)
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, i long, x long")
    row = holt_linear(df, ["k"], "x", "ts", "i").collect()[0]
    assert row.n == 12
    assert row.trend_micro > 0
    assert row.level_micro < 1200  # lags the last point

    # replay in exact python ints to pin the recurrence
    def tdiv(a, b):
        q = abs(a) // b
        return q if a >= 0 else -q

    l, b = 100, 0
    for k in range(2, 13):
        x = 100 * k
        nl = tdiv(1 * x + 3 * (l + b), 4)
        b = tdiv(1 * (nl - l) + 3 * b, 4)
        l = nl
    assert (row.level_micro, row.trend_micro) == (l, b)


def test_holt_linear_constant_series_zero_trend(spark):
    from datetime import datetime

    from bytewax_spark.functions.timeseries import holt_linear

    rows = [("g", datetime(2024, 1, 1, h), h, 500) for h in range(6)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, i long, x long")
    row = holt_linear(df, ["k"], "x", "ts", "i").collect()[0]
    assert (row.level_micro, row.trend_micro) == (500, 0)


def test_holt_linear_validates_params(spark):
    import pytest

    from bytewax_spark.functions.timeseries import holt_linear

    df = spark.createDataFrame([("g", None, 1, 1)], "k string, ts timestamp, i long, x long")
    with pytest.raises(ValueError):
        holt_linear(df, ["k"], "x", "ts", "i", alpha=(4, 4))


def test_seasonal_index_flat_series_is_uniform(spark):
    from bytewax_spark.functions.timeseries import seasonal_index

    rows = [("g", h % 4, 100) for h in range(40)]
    df = spark.createDataFrame(rows, "k string, slot int, v long")
    out = {r.slot: r.index_ppm for r in seasonal_index(df, ["k"], "slot", "v").collect()}
    assert all(v == 1_000_000 for v in out.values())


def test_seasonal_index_double_slot(spark):
    from bytewax_spark.functions.timeseries import seasonal_index

    # slot 1 runs at 300, slots 0 and 2 at 100: mean 500/3 per slot-row
    rows = [("g", 0, 100), ("g", 1, 300), ("g", 2, 100)] * 5
    df = spark.createDataFrame(rows, "k string, slot int, v long")
    out = {r.slot: r.index_ppm for r in seasonal_index(df, ["k"], "slot", "v").collect()}
    # index = slot_mean / overall_mean: 100/(500/3) = 0.6, 300/(500/3) = 1.8
    assert out[0] == 600_000 and out[1] == 1_800_000 and out[2] == 600_000


def test_gapfill_interpolate_draws_the_line(spark):
    from datetime import datetime

    from bytewax_spark.functions.timeseries import gapfill_interpolate
    from pyspark.sql import functions as F

    # observations at hours 0 (v=10) and 4 (v=30): hours 1-3 read the
    # straight line 15, 20, 25 (micros), marked interpolated
    rows = [("k", datetime(2024, 1, 1, 0), 10.0), ("k", datetime(2024, 1, 1, 4), 30.0)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = {
        r.hour.hour: (r.value_micro, r.interpolated)
        for r in gapfill_interpolate(df, "k", "ts", F.col("v"), "hour").collect()
    }
    assert out[0] == (10_000_000, False)
    assert out[1] == (15_000_000, True)
    assert out[2] == (20_000_000, True)
    assert out[3] == (25_000_000, True)
    assert out[4] == (30_000_000, False)


def test_gapfill_interpolate_observed_values_exact(spark):
    from datetime import datetime

    from bytewax_spark.functions.timeseries import gapfill_interpolate
    from pyspark.sql import functions as F

    # two observations in one bucket sum before quantization
    rows = [
        ("k", datetime(2024, 1, 1, 0, 5), 1.25),
        ("k", datetime(2024, 1, 1, 0, 6), 2.25),
        ("k", datetime(2024, 1, 1, 1, 0), 7.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = {r.hour.hour: r.value_micro for r in gapfill_interpolate(
        df, "k", "ts", F.col("v"), "hour").collect()}
    assert out[0] == 3_500_000 and out[1] == 7_000_000
