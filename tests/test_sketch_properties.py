"""Property-based invariants for the sketch family
(functions/sketches.py, streaming frequency cap): the guarantees the
docstrings sell, exercised on hypothesis-generated data instead of
fixtures."""

from __future__ import annotations

import pytest

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from bytewax_spark.functions import sketches as sk

_keys = st.lists(
    st.text(alphabet="abcdefgh0123456789", min_size=1, max_size=8),
    min_size=1,
    max_size=60,
)


@settings(max_examples=6, deadline=None)
@given(_keys, st.integers(min_value=1, max_value=3))
def test_countmin_never_underestimates(spark, keys, depth):
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    true = Counter(keys)
    sketch = sk.countmin_build(df, "k", width=16, depth=depth)
    probes = df.select("k").distinct()
    est = sk.countmin_estimate(sketch, probes, "k", width=16, depth=depth)
    for r in est.collect():
        assert r["est"] >= true[r["k"]], (r, true)


@settings(max_examples=6, deadline=None)
@given(_keys)
def test_countmin_total_mass_per_depth(spark, keys):
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    rows = sk.countmin_build(df, "k", width=8, depth=4).collect()
    per_depth = Counter()
    for r in rows:
        per_depth[r["depth"]] += r["cnt"]
    assert all(v == len(keys) for v in per_depth.values())


@settings(max_examples=6, deadline=None)
@given(_keys, _keys)
@pytest.mark.slow
def test_hll_merge_associative(spark, ka, kb):
    a = spark.createDataFrame([(k,) for k in ka], "k string")
    b = spark.createDataFrame([(k,) for k in kb], "k string")
    merged = (
        sk.hll_build(a, "k", p=6)
        .unionByName(sk.hll_build(b, "k", p=6))
        .groupBy("idx")
        .agg(F.max("maxrank").alias("maxrank"))
    )
    direct = sk.hll_build(a.unionByName(b), "k", p=6)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )
    # and the merged estimate is the direct estimate (same registers)
    em = sk.hll_estimate(merged, p=6).collect()[0]["est"]
    ed = sk.hll_estimate(direct, p=6).collect()[0]["est"]
    assert em == ed


@settings(max_examples=4, deadline=None)
@given(_keys, st.integers(min_value=1, max_value=4))
def test_frequency_cap_never_exceeds_cap(spark, keys, cap):
    from bytewax_spark.dataflow import Dataflow
    from bytewax_spark.sources import TestingSource
    from bytewax_spark.streaming import frequency_cap_stream
    import bytewax_spark.operators as op

    rows = [("p0", k, i) for i, k in enumerate(keys)]
    flow = Dataflow("fc_prop")
    src = TestingSource(rows, schema="part string, item string, seq long")
    ks = op.key_on("key", op.input("in", flow, src), "part")
    out = frequency_cap_stream("fc", ks, "item", cap=cap, order_by="seq")
    got = Counter(r["item"] for r in out.df.collect())
    true = Counter(keys)
    for k, c in got.items():
        # kept count never exceeds cap, never exceeds truth; CMS
        # collisions may only DROP extra occurrences, not add
        assert c <= cap
        assert c <= true[k]


# ---------------------------------------------------------------------------
# bloom filter
# ---------------------------------------------------------------------------


def test_bloom_no_false_negatives_and_bounded_fp(spark):
    from bytewax_spark.functions import sketches as sk

    members = spark.createDataFrame([(i,) for i in range(500)], "v bigint")
    bloom = sk.bloom_build(members, "v", m_bits=1 << 14, k=4)
    probes = spark.createDataFrame([(i,) for i in range(1000)], "v bigint")
    got = {r["v"]: r["might_contain"] for r in sk.bloom_contains(bloom, probes, "v", m_bits=1 << 14, k=4).collect()}
    # every true member answers yes — the Bloom guarantee
    assert all(got[i] for i in range(500))
    # 500 keys in 2^14 bits at k=4 -> FP ~ (1-e^-0.122)^4 ~ 1.7e-4;
    # 500 non-member probes should see at most a couple
    fps = sum(1 for i in range(500, 1000) if got[i])
    assert fps <= 5


def test_bloom_merge_is_union(spark):
    from bytewax_spark.functions import sketches as sk

    a = sk.bloom_build(spark.createDataFrame([(1,), (2,)], "v bigint"), "v", m_bits=1 << 10)
    b = sk.bloom_build(spark.createDataFrame([(3,)], "v bigint"), "v", m_bits=1 << 10)
    merged = sk.bloom_merge(a, b)
    probes = spark.createDataFrame([(1,), (3,)], "v bigint")
    got = {r["v"]: r["might_contain"] for r in sk.bloom_contains(merged, probes, "v", m_bits=1 << 10).collect()}
    assert got == {1: True, 3: True}
    # idempotent: merging a with itself changes nothing
    assert sk.bloom_merge(a, a).count() == a.count()


def test_bloom_build_validates(spark):
    import pytest

    from bytewax_spark.functions import sketches as sk

    df = spark.createDataFrame([(1,)], "v bigint")
    with pytest.raises(ValueError):
        sk.bloom_build(df, "v", m_bits=0)


def test_bloom_probe_join_is_broadcastable(spark):
    """The bit table side of the membership join stays broadcast-sized
    and the plan contains no Python."""
    from bytewax_spark.functions import sketches as sk
    from pyspark.sql import functions as F

    members = spark.createDataFrame([(i,) for i in range(100)], "v bigint")
    bloom = sk.bloom_build(members, "v", m_bits=1 << 12)
    probes = spark.createDataFrame([(i,) for i in range(200)], "v bigint")
    out = sk.bloom_contains(F.broadcast(bloom), probes, "v", m_bits=1 << 12)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "EvalPython" not in plan


_vals = st.lists(
    st.floats(min_value=0.0, max_value=100.0, allow_nan=False, width=32),
    min_size=1,
    max_size=50,
)


@settings(max_examples=6, deadline=None)
@given(_vals)
def test_moments_power_sums_match_python(spark, vals):
    """The decimal power sums equal exact Python-int arithmetic under
    the same HALF-UP quantization — the engine-exactness claim."""
    import math

    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    row = sk.moments_build(df, "v", 0.0, 100.0, k=4).collect()[0]
    s_cap = 1 << sk.moments_scale_bits(4)
    scaled = [
        int(math.floor(min(max(v, 0.0), 100.0) / 100.0 * 2 * s_cap + 0.5)) - s_cap
        for v in vals
    ]
    assert row["n"] == len(vals)
    assert row["smin"] == min(scaled) and row["smax"] == max(scaled)
    for i in range(1, 5):
        assert int(row[f"m{i}"]) == sum(s**i for s in scaled), (i, vals)


@settings(max_examples=6, deadline=None)
@given(_vals, _vals)
def test_moments_merge_commutes_and_matches_concat(spark, va, vb):
    a = spark.createDataFrame([(float(v),) for v in va], "v double")
    b = spark.createDataFrame([(float(v),) for v in vb], "v double")
    both = spark.createDataFrame([(float(v),) for v in va + vb], "v double")
    sa = sk.moments_build(a, "v", 0.0, 100.0, k=3)
    sb = sk.moments_build(b, "v", 0.0, 100.0, k=3)
    direct = sk.moments_build(both, "v", 0.0, 100.0, k=3).collect()
    assert sk.moments_merge(sa, sb).collect() == direct
    assert sk.moments_merge(sb, sa).collect() == direct


@settings(max_examples=4, deadline=None)
@given(_keys, _keys)
def test_countmin_join_size_never_underestimates(spark, ka, kb):
    from collections import Counter as C

    a_df = spark.createDataFrame([(k,) for k in ka], "k string")
    b_df = spark.createDataFrame([(k,) for k in kb], "k string")
    a = sk.countmin_build(a_df, "k", width=32, depth=4)
    b = sk.countmin_build(b_df, "k", width=32, depth=4)
    est = sk.countmin_join_size(a, b).collect()[0]["est"]
    ca, cb = C(ka), C(kb)
    true = sum(ca[k] * cb[k] for k in ca)
    assert est >= true
