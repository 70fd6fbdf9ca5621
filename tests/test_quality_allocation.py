"""Round-4 additions: Gopher rule set, water-filling budget,
tokens-per-byte signal, centroid outlier pruning."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from bytewax_spark.functions import selection as sel
from bytewax_spark.functions import similarity as sim
from bytewax_spark.functions import text as tx


def _rules(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(tx.gopher_rules("text").alias("r")).collect()[0]["r"].asDict()


def test_gopher_rules_good_document(spark):
    good = (
        "The quick brown fox jumps over the lazy dog and then runs off to "
        "be with the other animals that have come along with plenty of "
        "ordinary words in sentences that keep going for a while so that "
        "the word count clears fifty easily and the mean word length stays "
        "inside the usual band for natural english prose text overall."
    )
    r = _rules(spark, good)
    assert r["passes"] and all(v for v in r.values())


def test_gopher_rules_individual_failures(spark):
    # too short
    assert not _rules(spark, "tiny doc")["r_word_count"]
    # symbol soup: >= 10% of words contain '#'
    sym = " ".join(["#tag"] * 20 + ["word"] * 30)
    assert not _rules(spark, sym)["r_symbol_ratio"]
    # bullets on >= 90% of lines
    bullets = "\n".join(["- item one two"] * 19 + ["plain line"])
    assert not _rules(spark, bullets)["r_bullet_lines"]
    # ellipsis endings on >= 30% of lines
    ell = "\n".join(["line goes on..."] * 4 + ["line stays"] * 6)
    assert not _rules(spark, ell)["r_ellipsis_lines"]
    # numeric soup: <= 80% words with a letter
    nums = " ".join(["12345"] * 30 + ["word"] * 10)
    assert not _rules(spark, nums)["r_alpha_words"]
    # no Gopher stop words
    assert not _rules(spark, "lorem ipsum dolor sit amet")["r_stopwords"]
    # empty text: line rules pass vacuously, word rules fail
    r = _rules(spark, "")
    assert r["r_bullet_lines"] and r["r_ellipsis_lines"]
    assert not r["r_word_count"] and not r["passes"]


def _serial_waterfill(sizes: dict[str, int], budget: int):
    vals = sorted(sizes.values())
    g = len(vals)
    best = None
    p = 0
    for k, s in enumerate(vals, start=1):
        p += s
        if p + (g - k) * s <= budget:
            best = (k, p, s)
    if best is None:
        w = budget // g
    else:
        k, p, s = best
        w = s if k == g else s + (budget - (p + (g - k) * s)) // (g - k)
    return {grp: min(sz, w) for grp, sz in sizes.items()}, w


@pytest.mark.parametrize("budget", [0, 5, 17, 60, 100, 10_000])
def test_waterfill_matches_serial(spark, budget):
    sizes = {"a": 3, "b": 10, "c": 10, "d": 40}
    rows = [(g, 1) for g, s in sizes.items() for _ in range(s)]
    df = spark.createDataFrame(rows, "src string, tok long")
    got = {
        r["src"]: (r["alloc"], r["waterline"])
        for r in sel.waterfill_budget(df, "src", "tok", budget).collect()
    }
    want, w = _serial_waterfill(sizes, budget)
    assert {g: a for g, (a, _) in got.items()} == want
    assert all(wl == w for _, wl in got.values())
    assert sum(want.values()) <= budget or budget >= sum(sizes.values())


def test_waterfill_rejects_negative_budget(spark):
    df = spark.createDataFrame([("a", 1)], "src string, tok long")
    with pytest.raises(ValueError, match="budget"):
        sel.waterfill_budget(df, "src", "tok", -1)


def test_tokens_per_byte_micro(spark):
    df = spark.createDataFrame([("ab cd!",), ("",), ("é",)], "text string")
    got = [r["m"] for r in df.select(tx.tokens_per_byte_micro("text").alias("m")).collect()]
    # "ab cd!" -> tokens [ab, cd, !] = 3, bytes 6 -> 500000
    # "é" -> 1 token over 2 UTF-8 BYTES (octet_length, not chars) -> 500000
    assert got == [500_000, 0, 500_000]


def test_centroid_outliers_flags_flipped_vector(spark):
    base = [1.0, 0.0, 0.0, 0.0]
    rows = [(i, base, 0) for i in range(9)] + [(9, [-1.0, 0.0, 0.0, 0.0], 0)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = sim.centroid_outliers(df, "embedding", "vec_id", "label", threshold=0.0)
    got = [(r["vec_id"], r["label"]) for r in out.collect()]
    assert got == [(9, 0)]
    # centroid = (0.8, 0, 0, 0); flipped vector cosine = -1
    cos = {r["vec_id"]: r["cos_centroid"] for r in out.collect()}
    assert math.isclose(cos[9], -1.0, abs_tol=1e-6)


def test_centroid_outliers_respects_groups(spark):
    # same vector, different labels: each label's centroid is itself
    rows = [(0, [1.0, 0.0], 0), (1, [0.0, 1.0], 1)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = sim.centroid_outliers(df, "embedding", "vec_id", "label", threshold=0.99)
    assert out.count() == 0


def test_readability_micro_hand_computed(spark):
    # "The cat sat." -> W=3 (\S+ runs), S=1 ([.!?]+ runs),
    # Y=3 ([aeiouy]+ groups: e, a, a) ->
    # 206835000 - 1015000*3//1 - 84600000*3//3 = 119190000 (119.19)
    df = spark.createDataFrame([("The cat sat.",), ("",), (None,)], "text string")
    got = [
        r["m"] for r in df.select(tx.readability_micro("text").alias("m")).collect()
    ]
    assert got == [119_190_000, 0, 0]


def test_readability_micro_orders_by_difficulty(spark):
    easy = "The dog ran. The dog sat. The dog ate."
    hard = (
        "Notwithstanding institutional heterogeneity considerations, "
        "epistemological ramifications predominantly characterize "
        "interdisciplinary methodological paradigms."
    )
    df = spark.createDataFrame([(easy,), (hard,)], "text string")
    a, b = [
        r["m"] for r in df.select(tx.readability_micro("text").alias("m")).collect()
    ]
    assert a > b  # simple prose reads easier than academic sludge
    assert a > 80_000_000 and b < 30_000_000


def test_zipf_alpha_natural_vs_uniform(spark):
    from bytewax_spark.functions.text import zipf_alpha

    # Zipfian corpus: word_k appears ~100/k times -> alpha near 2
    rows = []
    for k in range(1, 30):
        rows += [(f"w{k}",)] * max(100 // k, 1)
    zipfy = spark.createDataFrame([(" ".join(w for (w,) in rows),)], "text string")
    a_zipf = zipf_alpha(zipfy, "text", f_min=2).collect()[0]
    assert 1_500_000 < a_zipf.alpha_micro < 3_000_000

    # every word exactly at f_min: zero log mass -> sentinel 0
    at_min = spark.createDataFrame(
        [(" ".join(f"u{k}" for k in range(50) for _ in range(2)),)], "text string"
    )
    assert zipf_alpha(at_min, "text", f_min=2).collect()[0].alpha_micro == 0

    # flat at 5x f_min: alpha = 1 + n/(n*ln(2.5)) exactly
    import math

    flat5 = spark.createDataFrame(
        [(" ".join(f"v{k}" for k in range(50) for _ in range(5)),)], "text string"
    )
    got = zipf_alpha(flat5, "text", f_min=2).collect()[0].alpha_micro
    lm = round(math.log(2.5) * 1e6)
    assert got == 1_000_000 + (50 * 10**12) // (50 * lm)
