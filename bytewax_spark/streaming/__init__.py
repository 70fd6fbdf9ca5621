"""Streaming execution: the generic keyed-stateful primitive and
streaming compile helpers.

The reference's engine core is ONE stateful operator —
``stateful_batch`` with the ``StatefulBatchLogic`` lifecycle
(``on_batch / on_notify / on_eof / notify_at / snapshot``,
``pysrc/bytewax/operators/__init__.py:593-915`` →
``src/operators.rs:441-1041``). Here it compiles to:

- **streaming**: ``groupBy(key).applyInPandasWithState`` — the logic
  object lives in the Spark state store (pickled snapshot, exactly the
  reference's pickle snapshot protocol), ``notify_at`` maps to group
  state timeouts, recovery is checkpointing (no custom code, SURVEY
  §3).
- **batch**: ``groupBy(key).applyInPandas`` — one batch per key, then
  ``on_eof`` (batch EOF = all input seen), deterministic and
  oracle-checkable.

Semantics divergences (documented, not hidden):
- Streaming has no EOF signal; ``on_eof`` fires in batch mode and,
  in streaming, when a processing-time timeout set by ``notify_at``
  expires (the reference's wall-clock-advancing watermark has the same
  role, SURVEY §7.3).
- Items arrive batched per micro-batch per key, ordered within a
  batch by the source; cross-batch order follows event arrival as in
  the reference.
"""

from __future__ import annotations

import pickle
from abc import ABC, abstractmethod
from collections.abc import Callable
from datetime import datetime, timedelta
from typing import Any

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from bytewax_spark.dataflow import KeyedStream
from bytewax_spark.operators import _require_keyed

__all__ = [
    "StatefulBatchLogic",
    "stateful_batch",
    "stateful",
    "collect_stream",
    "dedup_ttl_stream",
    "distinct_count_stream",
    "funnel_stream",
    "cusum_stream",
    "ewma_stream",
    "holt_stream",
    "moments_stream",
    "sample_stream",
    "zscore_anomaly_stream",
    "frequency_cap_stream",
    "heavy_hitters_stream",
    "stateful_map_stream",
    "stateful_flat_map_stream",
]


class StatefulBatchLogic(ABC):
    """Per-key user logic (reference ``StatefulBatchLogic`` ABC).

    ``on_batch`` receives the key's rows of one (micro-)batch as a
    pandas DataFrame and returns ``(emit_df_or_None, is_complete)``;
    ``is_complete=True`` discards the key's state. ``snapshot`` must
    return something picklable; ``builder`` receives the unpickled
    snapshot (or None) to resume."""

    RETAIN = False
    DISCARD = True

    @abstractmethod
    def on_batch(self, pdf: pd.DataFrame) -> tuple[pd.DataFrame | None, bool]: ...

    def on_notify(self) -> tuple[pd.DataFrame | None, bool]:
        """Timer fired (streaming only; set via notify_at)."""
        return None, False

    def on_eof(self) -> tuple[pd.DataFrame | None, bool]:
        """End of input (batch mode; streaming: after notify timeout)."""
        return None, False

    def notify_at(self) -> datetime | timedelta | None:
        """Next wakeup: timedelta = processing-time delay from now."""
        return None

    def snapshot(self) -> Any:
        return None


def _ensure_key(pdf: pd.DataFrame | None, key_col: str, key_val: Any) -> pd.DataFrame | None:
    if pdf is None or len(pdf) == 0:
        return pdf
    if key_col not in pdf.columns:
        pdf = pdf.copy()
        pdf[key_col] = key_val
    return pdf


def stateful_batch(
    step_id: str,
    up: KeyedStream,
    builder: Callable[[Any], StatefulBatchLogic],
    schema: Any,
    timers: str = "none",
) -> KeyedStream:
    """THE generic keyed-stateful operator.

    ``schema`` is the output schema (must contain the key column; it is
    auto-filled if the logic omits it). Streaming: state = pickled
    ``logic.snapshot()`` in the state store; ``notify_at`` returning a
    ``timedelta`` arms a processing-time timeout which fires
    ``on_notify`` then ``on_eof`` if the logic still exists.

    ``timers``: ``none`` (default) | ``processing`` | ``event``.
    Logic that uses ``notify_at`` must opt into ``processing``/``event``
    — and note that a timeout-enabled query never goes idle under
    ``trigger(availableNow)`` (Spark schedules state-cleanup batches
    while any state exists), so drive it with a processing-time
    trigger and stop it explicitly, like any long-running stream.
    """
    up = _require_keyed(step_id, up)
    fq = up.flow.register(step_id, "stateful_batch", (up.step_id,))
    key_col = up.key_col

    if not up.df.isStreaming:
        def run_batch(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
            logic = builder(None)
            outs = []
            out, complete = logic.on_batch(pdf)
            if out is not None:
                outs.append(out)
            if not complete:
                out, _ = logic.on_eof()
                if out is not None:
                    outs.append(out)
            outs = [_ensure_key(o, key_col, key[0]) for o in outs if o is not None and len(o)]
            if not outs:
                return pd.DataFrame()
            return pd.concat(outs, ignore_index=True)

        out_df = up.df.groupBy(key_col).applyInPandas(run_batch, schema=schema)
        return KeyedStream(up.flow, fq, out_df, key_col)

    def run_stream(key: tuple, pdfs, state: GroupState):
        snap = pickle.loads(state.get[0]) if state.exists else None
        logic = builder(snap)
        outs = []
        complete = False
        if state.hasTimedOut:
            out, complete = logic.on_notify()
            if out is not None:
                outs.append(out)
            if not complete:
                out, complete = logic.on_eof()
                if out is not None:
                    outs.append(out)
        else:
            for pdf in pdfs:
                out, complete = logic.on_batch(pdf)
                if out is not None:
                    outs.append(out)
                if complete:
                    break
        if complete:
            state.remove()
        else:
            state.update((pickle.dumps(logic.snapshot()),))
            na = logic.notify_at()
            if isinstance(na, timedelta):
                state.setTimeoutDuration(int(na.total_seconds() * 1000))
            elif isinstance(na, datetime):
                state.setTimeoutTimestamp(int(na.timestamp() * 1000))
        for o in outs:
            o = _ensure_key(o, key_col, key[0])
            if o is not None and len(o):
                yield o

    timeout_conf = {
        "none": GroupStateTimeout.NoTimeout,
        "processing": GroupStateTimeout.ProcessingTimeTimeout,
        "event": GroupStateTimeout.EventTimeTimeout,
    }[timers]
    out_df = up.df.groupBy(key_col).applyInPandasWithState(
        run_stream,
        outputStructType=schema,
        stateStructType="snapshot binary",
        outputMode="append",
        timeoutConf=timeout_conf,
    )
    return KeyedStream(up.flow, fq, out_df, key_col)


def stateful(
    step_id: str,
    up: KeyedStream,
    builder: Callable[[Any], StatefulBatchLogic],
    schema: Any,
) -> KeyedStream:
    """Per-item flavor (reference ``stateful``): same engine primitive;
    logic authors simply iterate the batch rows."""
    return stateful_batch(step_id, up, builder, schema)


def stateful_map_stream(
    step_id: str,
    up: KeyedStream,
    mapper: Callable[[Any, Any], tuple[Any, Any]],
    value_col: str,
    out_col: str,
    out_type: str = "double",
    order_by: str | None = None,
) -> KeyedStream:
    """Streaming ``stateful_map`` with the reference's exact per-row
    contract (``operators/__init__.py:2920-3006``): ``mapper(state,
    value) -> (new_state, out)`` per item, state persists per key
    across micro-batches (pickled in the state store). The batch-mode
    ``op.stateful_map`` compiles to window functions instead; this is
    the unbounded-stream path.

    ``order_by`` sorts each delivered micro-batch per key (shuffle
    order is not source order); cross-batch order is arrival order.
    """
    if not up.df.isStreaming:
        raise ValueError("stateful_map_stream requires a streaming input; use op.stateful_map in batch")

    class _SMap(StatefulBatchLogic):
        def __init__(self, snap):
            self.state = snap

        def on_batch(self, pdf):
            if order_by is not None:
                pdf = pdf.sort_values(order_by)
            outs = []
            for v in pdf[value_col]:
                self.state, out = mapper(self.state, v)
                outs.append(out)
            res = pdf.copy()
            res[out_col] = outs
            return res, self.RETAIN

        def snapshot(self):
            return self.state

    up = _require_keyed(step_id, up)
    in_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in up.df.schema.fields)
    return stateful_batch(step_id, up, _SMap, schema=f"{in_schema}, {out_col} {out_type}")


def stateful_flat_map_stream(
    step_id: str,
    up: KeyedStream,
    mapper: Callable[[Any, Any], tuple[Any, Any]],
    value_col: str,
    out_col: str,
    out_type: str = "double",
    order_by: str | None = None,
) -> KeyedStream:
    """Streaming ``stateful_flat_map`` (reference
    ``operators/__init__.py:2860-2917``): ``mapper(state, value) ->
    (new_state, iterable_of_outputs)`` per item; ``new_state=None``
    discards the key's state (the next item rebuilds from scratch).
    1→many means input rows can't be carried through — the output is
    ``(key, out_col)`` rows. Batch mode: use ``op.stateful_flat_map``.
    """
    if not up.df.isStreaming:
        raise ValueError(
            "stateful_flat_map_stream requires a streaming input; use op.stateful_flat_map in batch"
        )

    class _SFMap(StatefulBatchLogic):
        def __init__(self, snap):
            self.state = snap

        def on_batch(self, pdf):
            if order_by is not None:
                pdf = pdf.sort_values(order_by)
            outs: list[Any] = []
            for v in pdf[value_col]:
                self.state, emitted = mapper(self.state, v)
                outs.extend(emitted)
            res = pd.DataFrame({out_col: outs})
            return res, (self.DISCARD if self.state is None else self.RETAIN)

        def snapshot(self):
            return self.state

    up = _require_keyed(step_id, up)
    key_type = {f.name: f.dataType.simpleString() for f in up.df.schema.fields}[up.key_col]
    return stateful_batch(
        step_id, up, _SFMap, schema=f"{up.key_col} {key_type}, {out_col} {out_type}"
    )


def heavy_hitters_stream(
    step_id: str,
    up: KeyedStream,
    item_col: str,
    k: int = 10,
    capacity: int | None = None,
) -> KeyedStream:
    """Streaming top-k heavy hitters per key via the SPACE-SAVING
    sketch (Metwally, Agrawal, El Abbadi 2005 — public algorithm):
    ``capacity`` counters per key, an unseen item evicts the minimum
    counter and inherits its count as its error bound. Guarantees:
    every item with true frequency > N/capacity is present, and
    ``count_est - err_bound <= true <= count_est``.

    This is the unbounded-stream complement of the exact two-phase
    rank in ``functions/topk.py``: exact top-k needs the whole corpus
    (a shuffle per query); this holds O(capacity) state per key
    FOREVER — at 100 TB/day the sketch is the only option for "top
    domains right now" dashboards. Streaming emits the running top-k
    after each micro-batch (downstream takes the latest); batch mode
    emits once at EOF. Output: (key, item, count_est, err_bound).
    With ``capacity`` >= distinct items, counts are exact and
    err_bound is 0."""
    if capacity is None:
        capacity = 10 * k
    if capacity < k:
        raise ValueError(f"capacity {capacity} < k {k}")
    emit_each = bool(up.df.isStreaming)

    class _SpaceSaving(StatefulBatchLogic):
        def __init__(self, snap):
            self.counters: dict = snap if snap is not None else {}

        def on_batch(self, pdf):
            for it in pdf[item_col]:
                c = self.counters.get(it)
                if c is not None:
                    self.counters[it] = (c[0] + 1, c[1])
                elif len(self.counters) < capacity:
                    self.counters[it] = (1, 0)
                else:
                    # evict the min counter (deterministic tie-break);
                    # the newcomer inherits its count as error bound
                    victim, (cmin, _) = min(
                        self.counters.items(), key=lambda kv: (kv[1][0], str(kv[0]))
                    )
                    del self.counters[victim]
                    self.counters[it] = (cmin + 1, cmin)
            return (self._top(), self.RETAIN) if emit_each else (None, self.RETAIN)

        def on_eof(self):
            return self._top(), self.DISCARD

        def _top(self):
            top = sorted(
                self.counters.items(), key=lambda kv: (-kv[1][0], str(kv[0]))
            )[:k]
            return pd.DataFrame(
                {
                    item_col: [t[0] for t in top],
                    "count_est": [t[1][0] for t in top],
                    "err_bound": [t[1][1] for t in top],
                }
            )

        def snapshot(self):
            return self.counters

    up = _require_keyed(step_id, up)
    key_type = {f.name: f.dataType.simpleString() for f in up.df.schema.fields}[up.key_col]
    item_type = {f.name: f.dataType.simpleString() for f in up.df.schema.fields}[item_col]
    return stateful_batch(
        step_id,
        up,
        _SpaceSaving,
        schema=f"{up.key_col} {key_type}, {item_col} {item_type}, count_est long, err_bound long",
    )


def collect_stream(
    step_id: str,
    up: KeyedStream,
    value_col: str,
    timeout: timedelta,
    max_size: int,
    order_by: str | None = None,
) -> KeyedStream:
    """Streaming ``collect``: per-key batches emitted when ``max_size``
    values accumulate OR ``timeout`` elapses since the last emit —
    the reference's size/timeout pair (``operators/__init__.py:
    1106-1218``), which no Spark built-in provides (``collect_list``
    has no trigger). Built on :func:`stateful_batch` with a
    processing-time timer ≙ the reference's ``notify_at``.

    Output rows: ``(key, values: array)``. State per key is at most
    ``max_size`` buffered values — bounded, checkpoint-covered.

    ``order_by`` sorts each delivered micro-batch's rows for a key
    before buffering: the shuffle to the stateful operator does not
    preserve source order (the reference's per-worker arrival order),
    so deterministic chunking needs an explicit order column.
    Cross-batch order is micro-batch arrival, as in the reference.
    """
    if max_size < 1:
        raise ValueError("max_size must be >= 1")

    class _Collect(StatefulBatchLogic):
        def __init__(self, snap):
            self.buf = list(snap) if snap else []

        def on_batch(self, pdf):
            if order_by is not None:
                pdf = pdf.sort_values(order_by)
            self.buf.extend(pdf[value_col].tolist())
            out = []
            while len(self.buf) >= max_size:
                out.append(self.buf[:max_size])
                self.buf = self.buf[max_size:]
            if out:
                return pd.DataFrame({"values": out}), self.RETAIN
            return None, self.RETAIN

        def on_notify(self):
            if self.buf:
                out = pd.DataFrame({"values": [self.buf]})
                self.buf = []
                return out, self.RETAIN
            return None, self.DISCARD

        def on_eof(self):
            # batch mode / final flush: emit the partial tail
            return self.on_notify()

        def notify_at(self):
            return timeout if self.buf else None

        def snapshot(self):
            return self.buf

    up = _require_keyed(step_id, up)
    vtype = up.df.schema[value_col].dataType.simpleString()
    schema = f"{up.key_col} {up.df.schema[up.key_col].dataType.simpleString()}, values array<{vtype}>"
    return stateful_batch(step_id, up, _Collect, schema=schema, timers="processing")


def interval_join_stream(
    step_id: str,
    left: KeyedStream,
    right: KeyedStream,
    left_ts: str,
    right_ts: str,
    lower: timedelta,
    upper: timedelta,
    watermark: timedelta,
) -> KeyedStream:
    """Watermarked STREAM-STREAM interval join: emit (left, right) for
    same-key rows with ``left_ts + lower <= right_ts <= left_ts +
    upper`` — the unbounded-stream form of ``op.interval_join``
    (clicks joined to purchases within the following hour, as both
    arrive live). The reference can only express this as a running
    join that retains state forever; the Spark-native form is
    bounded by construction.

    Both sides get an event-time watermark and the range condition is
    part of the join predicate — exactly the shape Structured
    Streaming requires to PRUNE join state: each side buffers only
    rows younger than watermark + the range width, so state is
    O(arrival rate × horizon) regardless of stream length. Without
    the time bound a stream-stream join must keep every row forever
    (Spark refuses it in append mode for good reason).

    Late rows beyond ``watermark`` are dropped by the engine. Output
    columns: key + both sides' value columns (names must be disjoint
    apart from the key, like ``op.interval_join``)."""
    left = _require_keyed(step_id, left)
    right = _require_keyed(step_id, right)
    key = left.key_col
    if right.key_col != key:
        raise ValueError("interval_join_stream sides must share the key column name")
    if upper < lower:
        raise ValueError(f"need lower <= upper, got {lower} > {upper}")
    if not (left.df.isStreaming and right.df.isStreaming):
        raise ValueError(
            "interval_join_stream requires two streaming inputs; "
            "use op.interval_join in batch"
        )
    overlap = (set(left.df.columns) & set(right.df.columns)) - {key}
    if overlap:
        raise ValueError(f"interval_join_stream value columns overlap: {sorted(overlap)}")
    flow = left.flow
    fq = flow.register(step_id, "interval_join_stream", (left.step_id, right.step_id))

    wm = f"{int(watermark.total_seconds())} seconds"
    lw = left.df.withWatermark(left_ts, wm)
    rw = right.df.withWatermark(right_ts, wm).withColumnRenamed(key, "_rk")
    # raw event-time comparisons with INTERVAL literals: the streaming
    # planner derives its state-eviction bounds by analyzing exactly
    # this shape (wrapping the columns in conversions would defeat it)
    lo = f"INTERVAL {int(lower.total_seconds() * 1_000_000)} MICROSECOND"
    hi = f"INTERVAL {int(upper.total_seconds() * 1_000_000)} MICROSECOND"
    cond = (
        (F.col(key) == F.col("_rk"))
        & (F.col(right_ts) >= F.expr(f"{left_ts} + {lo}"))
        & (F.col(right_ts) <= F.expr(f"{left_ts} + {hi}"))
    )
    out = lw.join(rw, cond).drop("_rk")
    return KeyedStream(flow, fq, out, key)


def distinct_count_stream(
    step_id: str,
    up: KeyedStream,
    item_col: str,
    p: int = 12,
) -> KeyedStream:
    """Streaming approximate distinct count per key via HyperLogLog
    registers: state is at most ``2**p`` small ints per key FOREVER —
    the bounded-state complement of an exact streaming
    ``dropDuplicates`` (whose state grows with the distinct count and
    needs a watermark TTL to survive). At ~1.04/sqrt(2**p) relative
    error (p=12 ≈ 1.6%), this is the "distinct users right now per
    segment" dashboard operator for unbounded streams.

    Streaming emits the running ``(key, est)`` after each micro-batch
    (downstream takes the latest); batch mode emits once at EOF. The
    hash and estimator are EXACTLY the batch ones
    (:func:`bytewax_spark.functions.sketches.hll_build` /
    ``hll_estimate``: md5-derived 60-bit hash, integer-scaled harmonic
    sum, linear-counting small-range branch), so a streamed estimate
    equals the batch estimate over the same rows — tested, and the
    snapshot/restore of the sparse register dict rides the standard
    checkpoint path."""
    import hashlib
    import math

    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4, 16], got {p}")
    m = 1 << p
    wbits = 60 - p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    scale = float(1 << (wbits + 1))
    emit_each = bool(up.df.isStreaming)

    class _HLL(StatefulBatchLogic):
        def __init__(self, snap):
            self.regs: dict = dict(snap) if snap else {}

        def on_batch(self, pdf):
            for it in pdf[item_col]:
                h = int(hashlib.md5(str(it).encode()).hexdigest()[:15], 16)
                idx = h >> wbits
                w = h & ((1 << wbits) - 1)
                rank = wbits + 1 if w == 0 else wbits - (w.bit_length() - 1)
                if rank > self.regs.get(idx, 0):
                    self.regs[idx] = rank
            return (self._est(), self.RETAIN) if emit_each else (None, self.RETAIN)

        def on_eof(self):
            return self._est(), self.DISCARD

        def _est(self):
            nz = len(self.regs)
            ssum = sum(1 << (wbits + 1 - r) for r in self.regs.values())
            v = m - nz
            z = (v * scale + ssum) / scale
            raw = alpha * m * m / z
            est = m * math.log(m / v) if (raw <= 2.5 * m and v > 0) else raw
            return pd.DataFrame({"est": [int(round(est))]})

        def snapshot(self):
            return self.regs

    up = _require_keyed(step_id, up)
    schema = (
        f"{up.key_col} {up.df.schema[up.key_col].dataType.simpleString()}, est bigint"
    )
    return stateful_batch(step_id, up, _HLL, schema=schema)


def frequency_cap_stream(
    step_id: str,
    up: KeyedStream,
    item_col: str,
    cap: int,
    width: int = 1024,
    depth: int = 4,
    order_by: str | None = None,
) -> KeyedStream:
    """Streaming frequency cap: pass each row through only while its
    item's RUNNING count (per key) is <= ``cap``, tracked in a
    count-min sketch — ``depth * width`` counters of state per key
    FOREVER, however many distinct items flow past. The bounded-state
    version of "at most N occurrences of any item" (repeat-capping a
    training stream, ad frequency capping): an exact counter map grows
    with the distinct-item count; the sketch never does.

    One-sided error, the safe direction for capping: the CMS estimate
    only over-counts, so a kept row is GUARANTEED under the cap; a
    rare over-estimate may drop an item early (tune ``width`` to the
    tolerated over-count rate). Hashing matches
    :func:`bytewax_spark.functions.sketches.countmin_build` (md5
    digest splitting).

    ``order_by`` sorts each delivered micro-batch per key before
    counting — arrival order within a batch is not deterministic
    after the shuffle to the stateful operator, so reproducible runs
    need an explicit order column (same contract as
    ``collect_stream``)."""
    import hashlib

    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    if width <= 0 or depth <= 0:
        raise ValueError(f"width/depth must be positive, got {width}/{depth}")

    def _positions(item) -> list[int]:
        out = []
        for d in range((depth + 3) // 4):
            salt = f"cm{d}:" if d else ""
            digest = hashlib.md5((salt + str(item)).encode()).hexdigest()
            for c in range(min(4, depth - 4 * d)):
                out.append(int(digest[8 * c : 8 * c + 8], 16) % width)
        return out

    class _FreqCap(StatefulBatchLogic):
        def __init__(self, snap):
            self.counters: dict = dict(snap) if snap else {}

        def on_batch(self, pdf):
            if order_by is not None:
                pdf = pdf.sort_values(order_by)
            keep = []
            for i, it in enumerate(pdf[item_col]):
                pos = _positions(it)
                est = min(self.counters.get((d, b), 0) for d, b in enumerate(pos))
                if est < cap:
                    keep.append(i)
                    for d, b in enumerate(pos):
                        self.counters[(d, b)] = self.counters.get((d, b), 0) + 1
            return (pdf.iloc[keep] if keep else None), self.RETAIN

        def on_eof(self):
            return None, self.DISCARD

        def snapshot(self):
            return self.counters

    up = _require_keyed(step_id, up)
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in up.df.schema.fields
    )
    return stateful_batch(step_id, up, _FreqCap, schema=schema)


def funnel_stream(
    step_id: str,
    up: KeyedStream,
    ts_col: str,
    type_col: str,
    steps: list[str],
    tiebreak_col: str | None = None,
) -> KeyedStream:
    """Streaming ordered-step funnel per key: state is ONE (step
    pointer, timestamp) pair per key — O(1) forever, regardless of
    event volume. Each time the key's pointer advances (its first
    step-i event at-or-after its step-(i-1) time, the same sequential
    rule as the batch ``functions.behavior.funnel``), a row
    ``(key, step_idx, step, ts)`` is emitted; a key that completes the
    last step DISCARDS its state (the conversion is final).

    Rows are replayed in timestamp order WITHIN each micro-batch,
    scanning equal-timestamp GROUPS rather than individual rows: the
    batch operator's ts-only ``>=`` rule means several steps may
    advance at one timestamp and the order of same-timestamp rows is
    semantically irrelevant — so a step-i row sharing its timestamp
    with the step-(i-1) row is credited regardless of how a tiebreak
    would sort them (row-at-a-time scanning silently skipped it).
    ``tiebreak_col`` is retained for API compatibility and
    deterministic replay, but carries no semantic weight. Ordering
    across micro-batches is arrival order — the standard
    streaming-funnel semantics. When the input is globally ts-ordered
    (or batch mode, where each key sees all its rows at once), the
    advancement times equal the batch operator's — tested.
    Batch mode emits the full trajectory at EOF."""
    if not steps:
        raise ValueError("funnel_stream needs at least one step")
    last = len(steps) - 1
    emit_each = bool(up.df.isStreaming)
    sort_cols = [ts_col] + ([tiebreak_col] if tiebreak_col else [])

    class _Funnel(StatefulBatchLogic):
        def __init__(self, snap):
            # (next step index to look for, time of last reached step)
            self.nxt, self.t = snap if snap is not None else (0, None)
            self.pending: list[tuple] = []

        def on_batch(self, pdf):
            out = []
            for ts, grp in pdf.sort_values(sort_cols).groupby(ts_col, sort=True):
                if self.nxt > last:
                    break
                if self.t is not None and ts < self.t:
                    continue
                types = set(grp[type_col])
                while self.nxt <= last and steps[self.nxt] in types:
                    out.append((self.nxt + 1, steps[self.nxt], ts))
                    self.t = ts
                    self.nxt += 1
            done = self.nxt > last
            if emit_each:
                emit = (
                    pd.DataFrame(out, columns=["step_idx", "step", ts_col])
                    if out
                    else None
                )
                return emit, (self.DISCARD if done else self.RETAIN)
            self.pending.extend(out)
            return None, self.RETAIN

        def on_eof(self):
            if not self.pending:
                return None, self.DISCARD
            return (
                pd.DataFrame(self.pending, columns=["step_idx", "step", ts_col]),
                self.DISCARD,
            )

        def snapshot(self):
            return (self.nxt, self.t)

    up = _require_keyed(step_id, up)
    key_t = up.df.schema[up.key_col].dataType.simpleString()
    ts_t = up.df.schema[ts_col].dataType.simpleString()
    schema = f"{up.key_col} {key_t}, step_idx int, step string, {ts_col} {ts_t}"
    return stateful_batch(step_id, up, _Funnel, schema=schema)


def zscore_anomaly_stream(
    step_id: str,
    up: KeyedStream,
    val_col: str,
    threshold: float = 3.0,
    min_n: int = 10,
    order_by: str | None = None,
) -> KeyedStream:
    """Streaming anomaly detection per key: each value is z-scored
    against the key's RUNNING mean/variance (Welford's online update,
    public) and emitted when ``|z| > threshold``; state is three
    numbers per key forever. The "alert on weird values per sensor"
    operator — the streaming complement of the batch
    ``functions.stats.standardize`` + ``outlier_counts`` pair.

    Each row is scored against the statistics of the values BEFORE it
    (so an outlier can't mask itself), then folded in; no alerts until
    ``min_n`` prior values exist (cold-start guard). ``order_by``
    sorts rows inside each micro-batch for a deterministic replay;
    cross-batch order is arrival order, as for every streaming
    operator here. Emits ``(key, value, z)`` rows; batch mode emits
    the same alerts at EOF."""
    if threshold <= 0 or min_n < 2:
        raise ValueError(
            f"threshold must be > 0 and min_n >= 2, got {threshold}, {min_n}"
        )
    emit_each = bool(up.df.isStreaming)

    class _Welford(StatefulBatchLogic):
        def __init__(self, snap):
            self.n, self.mean, self.m2 = snap if snap is not None else (0, 0.0, 0.0)
            self.alerts: list[tuple] = []

        def _score_and_fold(self, pdf):
            out = []
            rows = pdf.sort_values(order_by) if order_by else pdf
            for v in rows[val_col]:
                x = float(v)
                if self.n >= min_n:
                    var = self.m2 / self.n
                    if var > 0:
                        z = (x - self.mean) / (var ** 0.5)
                        if abs(z) > threshold:
                            out.append((x, round(z, 6)))
                self.n += 1
                d = x - self.mean
                self.mean += d / self.n
                self.m2 += d * (x - self.mean)
            return out

        def on_batch(self, pdf):
            out = self._score_and_fold(pdf)
            if emit_each:
                emit = (
                    pd.DataFrame(out, columns=[val_col, "z"]) if out else None
                )
                return emit, self.RETAIN
            self.alerts.extend(out)
            return None, self.RETAIN

        def on_eof(self):
            if not self.alerts:
                return None, self.DISCARD
            return pd.DataFrame(self.alerts, columns=[val_col, "z"]), self.DISCARD

        def snapshot(self):
            return (self.n, self.mean, self.m2)

    up = _require_keyed(step_id, up)
    key_t = up.df.schema[up.key_col].dataType.simpleString()
    schema = f"{up.key_col} {key_t}, {val_col} double, z double"
    return stateful_batch(step_id, up, _Welford, schema=schema)


def dedup_ttl_stream(
    step_id: str,
    up: KeyedStream,
    item_col: str,
    ts_col: str,
    ttl,
) -> KeyedStream:
    """Streaming TTL dedup per key: a row passes iff the same
    ``item_col`` value was NOT emitted within ``ttl`` of it — emit,
    suppress repeats for the TTL, emit again (alert-throttling /
    at-least-once-source dedup semantics, keyed). Reference users
    hand-roll exactly this with ``stateful_flat_map`` + a timestamp
    dict (reference pysrc/bytewax/operators/__init__.py stateful
    docs); here it is a first-class bounded-state operator.

    State per key is ``{item-hash: last-emitted-ts}`` and every batch
    PRUNES entries older than ``ttl`` behind the max timestamp seen —
    bounded by the distinct items per TTL horizon, never by stream
    length, and snapshot/restore rides the standard checkpoint path.
    Rows process in ``ts_col`` order (stable-sorted within each
    batch, ties by item), so batch mode equals the streamed result
    over the same rows — order-deterministic, not arrival-dependent.
    """
    from datetime import timedelta

    if not isinstance(ttl, timedelta) or ttl <= timedelta(0):
        raise ValueError(f"ttl must be a positive timedelta, got {ttl!r}")

    class _TtlDedup(StatefulBatchLogic):
        def __init__(self, snap):
            self.last: dict = dict(snap) if snap else {}

        def on_batch(self, pdf):
            pdf = pdf.sort_values([ts_col, item_col], kind="mergesort")
            keep = []
            hi = None
            for i, (it, ts) in enumerate(zip(pdf[item_col], pdf[ts_col])):
                hi = ts if hi is None or ts > hi else hi
                prev = self.last.get(it)
                if prev is None or ts - prev >= ttl:
                    keep.append(i)
                    self.last[it] = ts
            if hi is not None:
                floor = hi - ttl
                self.last = {k: v for k, v in self.last.items() if v > floor}
            return (pdf.iloc[keep] if keep else None), self.RETAIN

        def on_eof(self):
            return None, self.DISCARD

        def snapshot(self):
            return self.last

    up = _require_keyed(step_id, up)
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in up.df.schema.fields
    )
    return stateful_batch(step_id, up, _TtlDedup, schema=schema)


def moments_stream(
    step_id: str,
    up: KeyedStream,
    val_col: str,
    lo: float,
    hi: float,
    k: int = 4,
) -> KeyedStream:
    """Streaming moments quantile sketch per key (Gan et al. 2018,
    public; batch twin: ``functions.sketches.moments_build``): state
    is ``k + 3`` EXACT integers per key forever — count, scaled
    min/max, and the first ``k`` power sums of the range-scaled value
    (Python ints never overflow, matching the batch build's
    DECIMAL(38,0) bit-for-bit). Read quantiles from the emitted rows
    with ``functions.sketches.moments_quantiles``.

    Quantization matches the batch side exactly: HALF-UP rounding of
    ``(clamp(v)-lo)/(hi-lo) * 2S`` (Spark's ``F.round``; Python's
    banker's ``round`` would disagree on .5 boundaries), ``S = 2 **
    moments_scale_bits(k)``. Streaming mode emits the key's RUNNING
    sketch each batch; batch mode emits once at EOF — equal to the
    grouped batch build, which the tests assert. Power sums emit as
    strings (the exact value survives any transport width)."""
    import math

    from bytewax_spark.functions.sketches import moments_scale_bits

    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi}]")
    s_cap = 1 << moments_scale_bits(k)
    emit_each = bool(up.df.isStreaming)

    class _Moments(StatefulBatchLogic):
        def __init__(self, snap):
            if snap is not None:
                self.n, self.smin, self.smax, self.ms = (
                    snap[0],
                    snap[1],
                    snap[2],
                    [int(m) for m in snap[3]],
                )
            else:
                self.n, self.smin, self.smax, self.ms = 0, None, None, [0] * k

        def _fold(self, pdf):
            for v in pdf[val_col]:
                x = min(max(float(v), lo), hi)
                s = int(math.floor((x - lo) / (hi - lo) * (2 * s_cap) + 0.5)) - s_cap
                self.n += 1
                self.smin = s if self.smin is None else min(self.smin, s)
                self.smax = s if self.smax is None else max(self.smax, s)
                p = 1
                for i in range(k):
                    p *= s
                    self.ms[i] += p

        def _row(self):
            return pd.DataFrame(
                [
                    (self.n, self.smin, self.smax)
                    + tuple(str(m) for m in self.ms)
                ],
                columns=["n", "smin", "smax"] + [f"m{i+1}" for i in range(k)],
            )

        def on_batch(self, pdf):
            self._fold(pdf)
            if emit_each:
                return self._row(), self.RETAIN
            return None, self.RETAIN

        def on_eof(self):
            if self.n == 0:
                return None, self.DISCARD
            return self._row(), self.DISCARD

        def snapshot(self):
            return (self.n, self.smin, self.smax, [str(m) for m in self.ms])

    up = _require_keyed(step_id, up)
    key_t = up.df.schema[up.key_col].dataType.simpleString()
    mcols = ", ".join(f"m{i+1} string" for i in range(k))
    schema = f"{up.key_col} {key_t}, n long, smin long, smax long, {mcols}"
    return stateful_batch(step_id, up, _Moments, schema=schema)


def sample_stream(
    step_id: str,
    up: KeyedStream,
    item_col: str,
    n: int = 32,
    salt: str = "",
) -> KeyedStream:
    """Streaming uniform sample per key with O(n) state FOREVER: keep
    the ``n`` items whose salted md5 hash sorts lowest (min-wise /
    bottom-k sampling — the deterministic reservoir: membership
    depends only on (item, salt), never on arrival order, so streamed
    == batch == re-run, unlike an RNG reservoir). The bounded-state
    "show me examples per key" operator: distinct-item volume never
    grows the state past ``n`` (hash, item) pairs per key.

    Hashing matches ``functions.text.hash64`` (md5-derived), so batch
    mode equals ``functions.sampling.sample_exact_n`` run per key —
    SQL-oracle exact. Streaming emits the key's CURRENT sample each
    micro-batch; batch mode emits once at EOF, one row per kept item
    ``(key, item, rk)`` with ``rk`` the 1-based hash rank."""
    import hashlib

    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")

    def _h(item) -> int:
        d = hashlib.md5((salt + str(item)).encode()).hexdigest()
        return int(d[:15], 16)

    emit_each = bool(up.df.isStreaming)

    class _Sample(StatefulBatchLogic):
        def __init__(self, snap):
            # state: list of (hash, item) sorted ascending, <= n long
            self.kept = [tuple(x) for x in snap] if snap else []

        def _fold(self, pdf):
            changed = False
            for it in pdf[item_col]:
                pair = (_h(it), it)
                if pair in self.kept:
                    continue
                self.kept.append(pair)
                changed = True
            if changed:
                self.kept = sorted(set(self.kept))[:n]

        def _rows(self):
            return pd.DataFrame(
                [(it, i + 1) for i, (_, it) in enumerate(self.kept)],
                columns=[item_col, "rk"],
            )

        def on_batch(self, pdf):
            self._fold(pdf)
            if emit_each:
                return self._rows(), self.RETAIN
            return None, self.RETAIN

        def on_eof(self):
            if not self.kept:
                return None, self.DISCARD
            return self._rows(), self.DISCARD

        def snapshot(self):
            return [list(p) for p in self.kept]

    up = _require_keyed(step_id, up)
    key_t = up.df.schema[up.key_col].dataType.simpleString()
    item_t = up.df.schema[item_col].dataType.simpleString()
    schema = f"{up.key_col} {key_t}, {item_col} {item_t}, rk int"
    return stateful_batch(step_id, up, _Sample, schema=schema)


def ewma_stream(
    step_id: str,
    up: KeyedStream,
    val_col: str,
    ts_col: str,
    tiebreak_col: str,
    num: int = 1,
    den: int = 8,
) -> KeyedStream:
    """Streaming exponentially-weighted moving average per key —
    O(1) state (count + last level): each value folds through
    ``e = (num·x + (den−num)·e) div den`` on int64 micros, the same
    truncating integer recurrence as the batch twin
    (``functions.timeseries.ewma``), so streamed == batch == replay
    bit-for-bit. Rows process in ``(ts, tiebreak)`` order within each
    batch (order-deterministic, not arrival-dependent — the
    dedup_ttl_stream convention). Streaming mode emits the key's
    RUNNING level each batch; batch mode emits once at EOF. Emits
    ``(key, n, ewma_micro)``."""
    if not (0 < num < den):
        raise ValueError(f"need 0 < num < den, got {num}/{den}")
    emit_each = bool(up.df.isStreaming)

    def _tdiv(a: int, b: int) -> int:
        # truncate toward zero, matching SQL div / DuckDB //
        q = abs(a) // b
        return q if a >= 0 else -q

    class _Ewma(StatefulBatchLogic):
        def __init__(self, snap):
            self.n, self.e = snap if snap is not None else (0, None)

        def _fold(self, pdf):
            pdf = pdf.sort_values([ts_col, tiebreak_col], kind="mergesort")
            for v in pdf[val_col]:
                x = int(v)
                if self.e is None:
                    self.e = x
                else:
                    self.e = _tdiv(num * x + (den - num) * self.e, den)
                self.n += 1

        def _row(self):
            return pd.DataFrame(
                [(self.n, self.e)], columns=["n", "ewma_micro"]
            )

        def on_batch(self, pdf):
            self._fold(pdf)
            if emit_each:
                return self._row(), self.RETAIN
            return None, self.RETAIN

        def on_eof(self):
            if self.n == 0:
                return None, self.DISCARD
            return self._row(), self.DISCARD

        def snapshot(self):
            return (self.n, self.e)

    up = _require_keyed(step_id, up)
    key_t = up.df.schema[up.key_col].dataType.simpleString()
    schema = f"{up.key_col} {key_t}, n long, ewma_micro long"
    return stateful_batch(step_id, up, _Ewma, schema=schema)


def holt_stream(
    step_id: str,
    up: KeyedStream,
    val_col: str,
    ts_col: str,
    tiebreak_col: str,
    alpha=(1, 4),
    beta=(1, 4),
) -> KeyedStream:
    """Streaming Holt double exponential smoothing per key — O(1)
    state (count + level + trend): the same truncating two-state
    integer recurrence as the batch twin
    (``functions.timeseries.holt_linear``), so streamed == batch ==
    replay bit-for-bit; rows process in ``(ts, tiebreak)`` order
    within each batch. Streaming mode emits the running state each
    batch; batch mode once at EOF. Emits ``(key, n, level_micro,
    trend_micro)`` — one-step forecast = level + trend."""
    an, ad = alpha
    bn, bd = beta
    if not (0 < an < ad and 0 < bn < bd):
        raise ValueError(f"need 0 < num < den for alpha/beta, got {alpha}, {beta}")
    emit_each = bool(up.df.isStreaming)

    def _tdiv(a: int, b: int) -> int:
        q = abs(a) // b
        return q if a >= 0 else -q

    class _Holt(StatefulBatchLogic):
        def __init__(self, snap):
            self.n, self.l, self.b = snap if snap is not None else (0, None, 0)

        def _fold(self, pdf):
            pdf = pdf.sort_values([ts_col, tiebreak_col], kind="mergesort")
            for v in pdf[val_col]:
                x = int(v)
                if self.l is None:
                    self.l, self.b = x, 0
                else:
                    nl = _tdiv(an * x + (ad - an) * (self.l + self.b), ad)
                    self.b = _tdiv(bn * (nl - self.l) + (bd - bn) * self.b, bd)
                    self.l = nl
                self.n += 1

        def _row(self):
            return pd.DataFrame(
                [(self.n, self.l, self.b)],
                columns=["n", "level_micro", "trend_micro"],
            )

        def on_batch(self, pdf):
            self._fold(pdf)
            if emit_each:
                return self._row(), self.RETAIN
            return None, self.RETAIN

        def on_eof(self):
            if self.n == 0:
                return None, self.DISCARD
            return self._row(), self.DISCARD

        def snapshot(self):
            return (self.n, self.l, self.b)

    up = _require_keyed(step_id, up)
    key_t = up.df.schema[up.key_col].dataType.simpleString()
    schema = f"{up.key_col} {key_t}, n long, level_micro long, trend_micro long"
    return stateful_batch(step_id, up, _Holt, schema=schema)


def cusum_stream(
    step_id: str,
    up: KeyedStream,
    val_col: str,
    ts_col: str,
    tiebreak_col: str,
    target_micro: int,
    drift_micro: int = 0,
    threshold_micro: int = 0,
) -> KeyedStream:
    """Page's one-sided CUSUM test per key (Page 1954 — the ONLINE
    form, unlike the batch locator in ``functions.timeseries.
    cusum_changepoint`` which needs the global mean): state is one
    int64, ``S = max(0, S + (x − target − drift))`` on micro inputs,
    alarming when ``S > threshold``. Emits one row per key per batch
    (streaming) or at EOF (batch): ``(key, n, s_micro, alarms,
    first_alarm_ts)`` — alarms counts threshold crossings evaluated
    AFTER each fold step; the S statistic resets to 0 is NOT applied
    on alarm (the monitoring convention where the operator reports and
    the caller decides). Rows process in ``(ts, tiebreak)`` order, so
    streamed == batch == a recursive-CTE replay, exactly."""
    emit_each = bool(up.df.isStreaming)

    class _Cusum(StatefulBatchLogic):
        def __init__(self, snap):
            if snap is not None:
                self.n, self.s, self.alarms, self.first_ts = snap
            else:
                self.n, self.s, self.alarms, self.first_ts = 0, 0, 0, None

        def _fold(self, pdf):
            pdf = pdf.sort_values([ts_col, tiebreak_col], kind="mergesort")
            for v, t in zip(pdf[val_col], pdf[ts_col]):
                self.s = max(0, self.s + int(v) - target_micro - drift_micro)
                self.n += 1
                if self.s > threshold_micro:
                    self.alarms += 1
                    if self.first_ts is None:
                        self.first_ts = t
            return None

        def _row(self):
            return pd.DataFrame(
                [(self.n, self.s, self.alarms, self.first_ts)],
                columns=["n", "s_micro", "alarms", "first_alarm_ts"],
            )

        def on_batch(self, pdf):
            self._fold(pdf)
            if emit_each:
                return self._row(), self.RETAIN
            return None, self.RETAIN

        def on_eof(self):
            if self.n == 0:
                return None, self.DISCARD
            return self._row(), self.DISCARD

        def snapshot(self):
            return (self.n, self.s, self.alarms, self.first_ts)

    up = _require_keyed(step_id, up)
    key_t = up.df.schema[up.key_col].dataType.simpleString()
    schema = (
        f"{up.key_col} {key_t}, n long, s_micro long, alarms long, "
        "first_alarm_ts timestamp"
    )
    return stateful_batch(step_id, up, _Cusum, schema=schema)
