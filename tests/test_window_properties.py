"""Property tests for window-assignment math (reference assign logic:
``operators/windowing.py:611-618`` sliding, ``:688-715`` session
merge). assign_windows is pure column arithmetic — these pin it
against a direct Python model over randomized timestamps."""

from __future__ import annotations

import pytest

import math
from datetime import datetime, timedelta, timezone

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

import bytewax_spark.operators.windowing as win

UTC = timezone.utc
EPOCH = datetime(2024, 1, 1, tzinfo=UTC)


def _model_sliding(ts_us: int, length_us: int, step_us: int) -> set[tuple[int, int]]:
    """All [start, start+length) windows containing ts, starts on the
    step grid (align_to = epoch)."""
    out = set()
    latest = ts_us - (ts_us % step_us)
    s = latest
    while s > ts_us - length_us:
        out.add((s, s + length_us))
        s -= step_us
    return out


@settings(max_examples=30, deadline=None)
@given(
    offsets=st.lists(st.integers(min_value=0, max_value=7 * 24 * 3600), min_size=1, max_size=8),
    length_m=st.integers(min_value=1, max_value=180),
    step_m=st.integers(min_value=1, max_value=180),
)
@pytest.mark.slow
def test_sliding_assignment_matches_model(spark, offsets, length_m, step_m):
    if step_m > length_m:
        step_m = length_m  # windower requires offset <= length
    rows = [(i, EPOCH.replace(tzinfo=None) + timedelta(seconds=o)) for i, o in enumerate(offsets)]
    df = spark.createDataFrame(rows, "i long, ts timestamp")
    w = win.SlidingWindower(timedelta(minutes=length_m), timedelta(minutes=step_m))
    got = win.assign_windows(df, F.col("ts"), w).collect()

    by_row: dict[int, set] = {}
    for r in got:
        by_row.setdefault(r["i"], set()).add(
            (int(r["window_start"].replace(tzinfo=UTC).timestamp() * 1e6),
             int(r["window_end"].replace(tzinfo=UTC).timestamp() * 1e6))
        )
    for i, o in enumerate(offsets):
        ts_us = int((EPOCH + timedelta(seconds=o)).timestamp() * 1e6)
        want = _model_sliding(ts_us, length_m * 60_000_000, step_m * 60_000_000)
        assert by_row[i] == want, f"row {i} at +{o}s"
        # invariant: floor or ceil of length/step windows, phase-dependent
        assert len(by_row[i]) in {length_m // step_m, math.ceil(length_m / step_m)}


@settings(max_examples=15, deadline=None)
@given(
    gaps=st.lists(st.integers(min_value=0, max_value=3600), min_size=2, max_size=12),
    gap_m=st.integers(min_value=1, max_value=30),
)
@pytest.mark.slow
def test_session_assignment_matches_model(spark, gaps, gap_m):
    """Sessions from cumulative inter-arrival gaps: windows match a
    direct linear scan (merge when delta <= gap)."""
    times = []
    t = 0
    for g in gaps:
        t += g
        times.append(t)
    rows = [(i, "k", EPOCH.replace(tzinfo=None) + timedelta(seconds=s)) for i, s in enumerate(times)]
    df = spark.createDataFrame(rows, "i long, k string, ts timestamp")
    w = win.SessionWindower(timedelta(minutes=gap_m))
    got = win.assign_windows(df, F.col("ts"), w, key_col="k").collect()

    # model: sorted times, new session when delta > gap
    gap_s = gap_m * 60
    xs = sorted(times)
    sessions = []
    start = prev = xs[0]
    for x in xs[1:]:
        if x - prev > gap_s:
            sessions.append((start, prev))
            start = x
        prev = x
    sessions.append((start, prev))

    def find(sec: int) -> tuple[int, int]:
        for s, e in sessions:
            if s <= sec <= e:
                return (s, e + gap_s)
        raise AssertionError(sec)

    for r in got:
        sec = times[r["i"]]
        ws = int((r["window_start"].replace(tzinfo=UTC) - EPOCH).total_seconds())
        we = int((r["window_end"].replace(tzinfo=UTC) - EPOCH).total_seconds())
        assert (ws, we) == find(sec), f"row {r['i']} at +{sec}s"
