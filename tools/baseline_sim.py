#!/usr/bin/env python
"""Optimistic stand-in measurement for the reference engine.

bytewax cannot be installed in this container (no pip), so the
BASELINE.md workloads are estimated with tight pure-Python loops that
do the same per-item work the reference's operators do (every bytewax
operator invokes Python callbacks item-at-a-time through its engine;
a bare Python loop with no engine overhead is therefore a strict
LOWER bound on the reference's runtime — the real engine adds
routing, epoch bookkeeping and FFI on top).

Workloads mirror BASELINE.md B1-B5 at sf0.1, reading the same parquet
via pyarrow (load time excluded, matching bench.py's warmed scans).

Prints one JSON line with per-workload seconds.
"""

from __future__ import annotations

import json
import time
from collections import defaultdict

import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.1"


def load(table: str, cols: list[str], sf_dir: str | None = None) -> list[tuple]:
    t = pq.read_table(f"{sf_dir or SF_DIR}/{table}.parquet", columns=cols)
    return list(zip(*[t.column(c).to_pylist() for c in cols]))


def b1_windowed_fold(sf_dir: str | None = None) -> float:
    """B1: keyed tumbling 1h fold into lists over events (the
    benchmark_windowing.py shape: assign window, append to list)."""
    rows = load("events", ["user_id", "ts", "value"], sf_dir)
    t0 = time.time()
    acc: dict[tuple, list] = defaultdict(list)
    for uid, ts, v in rows:
        win = ts.timestamp() // 3600
        acc[(uid, win)].append(v)
    return time.time() - t0


def b2_grouped_agg(sf_dir: str | None = None) -> float:
    """B2: 1BRC min/mean/max l_extendedprice by l_returnflag."""
    rows = load("lineitem", ["l_returnflag", "l_extendedprice"], sf_dir)
    t0 = time.time()
    acc: dict[str, list] = {}
    for k, v in rows:
        s = acc.get(k)
        if s is None:
            acc[k] = [v, v, v, 1]
        else:
            if v < s[0]:
                s[0] = v
            if v > s[1]:
                s[1] = v
            s[2] += v
            s[3] += 1
    return time.time() - t0


def b3_wordcount(sf_dir: str | None = None) -> float:
    rows = load("documents", ["text"], sf_dir)
    t0 = time.time()
    counts: dict[str, int] = defaultdict(int)
    for (text,) in rows:
        for w in text.lower().split():
            counts[w] += 1
    return time.time() - t0


def b4_keyed_join(sf_dir: str | None = None) -> float:
    """B4: orders ⋈ lineitem on orderkey, emit final (stateful join:
    build per-key state from both sides, emit merged)."""
    orders = load("orders", ["o_orderkey", "o_totalprice"], sf_dir)
    items = load("lineitem", ["l_orderkey", "l_extendedprice", "l_linenumber"], sf_dir)
    t0 = time.time()
    state: dict[int, list] = defaultdict(lambda: [None, None])
    for k, price in orders:
        state[k][0] = price
    for k, price, ln in items:
        state[k][1] = price
    out = [(k, v[0], v[1]) for k, v in state.items()]
    _ = len(out)
    return time.time() - t0


def b5_tumbling_count(sf_dir: str | None = None) -> float:
    rows = load("events", ["user_id", "ts"], sf_dir)
    t0 = time.time()
    acc: dict[tuple, int] = defaultdict(int)
    for uid, ts in rows:
        acc[(uid, ts.timestamp() // 3600)] += 1
    return time.time() - t0


def run_all(sf_dir: str | None = None) -> dict[str, float]:
    out = {
        "B1_windowed_fold": round(b1_windowed_fold(sf_dir), 3),
        "B2_grouped_agg": round(b2_grouped_agg(sf_dir), 3),
        "B3_wordcount": round(b3_wordcount(sf_dir), 3),
        "B4_keyed_join": round(b4_keyed_join(sf_dir), 3),
        "B5_tumbling_count": round(b5_tumbling_count(sf_dir), 3),
    }
    out["total"] = round(sum(out.values()), 3)
    return out


def main() -> None:
    import os

    print(json.dumps(run_all(os.environ.get("SPARK_GRAFT_SF_DIR"))))


if __name__ == "__main__":
    main()
