"""Input batching helpers (sources: batch / batch_getter /
batch_getter_ex / batch_async — reference §2.6,
pysrc/bytewax/inputs.py:455-629). Pure-Python contract tests: these
helpers serve custom-source authors (pollers, queue drains, async
feeds), not the engine's Arrow batching."""

from __future__ import annotations

import queue
from datetime import timedelta

from bytewax_spark.sources import (
    batch,
    batch_async,
    batch_getter,
    batch_getter_ex,
)


def test_batch_chunks_and_never_yields_empty():
    assert list(batch(range(7), 3)) == [[0, 1, 2], [3, 4, 5], [6]]
    assert list(batch(range(6), 3)) == [[0, 1, 2], [3, 4, 5]]
    assert list(batch([], 3)) == []
    assert list(batch(range(3), 1)) == [[0], [1], [2]]


def test_batch_is_incremental_not_materializing():
    def gen():
        yield from range(5)
        raise AssertionError("must not be pulled past the first chunk")

    it = batch(gen(), 2)
    assert next(it) == [0, 1]
    assert next(it) == [2, 3]


def test_batch_getter_sentinel_yields_partial_then_continues():
    feed = iter([1, 2, None, 3, None, None, 4, 5, 6, 7])

    def getter():
        try:
            return next(feed)
        except StopIteration:
            raise StopIteration from None

    got = list(batch_getter(getter, 3))
    # sentinel closes the running batch (possibly empty); EOF flushes
    assert got == [[1, 2], [3], [], [4, 5, 6], [7]]


def test_batch_getter_custom_sentinel():
    feed = iter([1, -1, 2])

    def getter():
        return next(feed)

    assert list(batch_getter(getter, 5, yield_on=-1)) == [[1], [2]]


def test_batch_getter_ex_drains_a_queue():
    q: "queue.Queue" = queue.Queue()
    for x in (1, 2, 3):
        q.put(x)
    calls = {"n": 0}

    def getter():
        calls["n"] += 1
        if calls["n"] > 5:  # after one empty poll, signal EOF
            raise StopIteration
        return q.get_nowait()

    got = list(batch_getter_ex(getter, 2))
    # call 4 and call 5 are empty polls (one closes batch [3], one
    # yields an empty keep-cadence batch); call 6 is EOF, which
    # flushes the final (empty) batch once — reference semantics
    assert got == [[1, 2], [3], [], []]


def test_batch_getter_ex_custom_exception():
    class NotYet(Exception):
        pass

    feed = iter(["a", NotYet, "b", StopIteration])

    def getter():
        item = next(feed)
        if item is NotYet:
            raise NotYet
        if item is StopIteration:
            raise StopIteration
        return item

    assert list(batch_getter_ex(getter, 4, yield_ex=NotYet)) == [["a"], ["b"]]


def test_batch_async_gathers_and_flushes_on_eof():
    async def agen():
        for i in range(5):
            yield i

    got = list(batch_async(agen(), timedelta(seconds=5), 2))
    assert got == [[0, 1], [2, 3], [4]]


def test_batch_async_timeout_yields_partial_and_loses_nothing():
    import asyncio

    async def agen():
        yield 1
        await asyncio.sleep(0.25)  # longer than the batch window
        yield 2
        yield 3

    got = []
    for chunk in batch_async(agen(), timedelta(seconds=0.1), 10):
        got.append(chunk)
        if sum(len(c) for c in got) >= 3:
            break
    # first window closes with only item 1; the in-flight fetch of
    # item 2 survives the timeout and lands in a later batch
    assert got[0] == [1]
    assert [x for c in got for x in c] == [1, 2, 3]


def test_batch_size_validation():
    import pytest

    for fn in (lambda: list(batch([1], 0)),
               lambda: list(batch_getter(lambda: 1, 0)),
               lambda: list(batch_getter_ex(lambda: 1, 0)),
               lambda: list(batch_async(None, timedelta(seconds=1), 0))):
        with pytest.raises(ValueError):
            fn()
