"""BPE tokenizer induction (functions/tokenizer.py): merge learning
on the word-frequency table, greedy rank-order encoding."""

from __future__ import annotations

import pytest

from bytewax_spark.functions import tokenizer as tk


def _corpus(spark):
    # the canonical Sennrich 2016 example: low x5, lower x2,
    # newest x6, widest x3
    rows = [("low " * 5,), ("lower " * 2,), ("newest " * 6,), ("widest " * 3,)]
    return spark.createDataFrame(rows, "text string")


def test_bpe_train_canonical_merges(spark):
    m = tk.bpe_train(_corpus(spark), "text", n_merges=6).collect()
    got = [(r["rank"], r["left"], r["right"], r["pair_count"]) for r in m]
    assert got == [
        (1, "e", "s", 9),
        (2, "es", "t", 9),
        (3, "l", "o", 7),
        (4, "lo", "w", 7),
        (5, "e", "w", 6),
        (6, "ew", "est", 6),
    ]


def test_bpe_pair_counts_weighted_by_word_freq(spark):
    pc = {
        (r["left"], r["right"]): r["pair_count"]
        for r in tk.bpe_pair_counts(_corpus(spark), "text").collect()
    }
    assert pc[("l", "o")] == 7  # low x5 + lower x2
    assert pc[("e", "s")] == 9  # newest x6 + widest x3
    assert pc[("w", "e")] == 8  # newest x6 + lower x2


def test_bpe_train_stops_when_no_pairs(spark):
    df = spark.createDataFrame([("a b c",)], "text string")
    m = tk.bpe_train(df, "text", n_merges=10).collect()
    assert m == []  # all words are single chars: nothing to merge


def test_bpe_encode_greedy_rank_order(spark):
    merges = [(r["left"], r["right"]) for r in tk.bpe_train(_corpus(spark), "text", n_merges=6).collect()]
    probe = spark.createDataFrame([("low lower newest widest",)], "text string")
    got = tk.bpe_encode(probe, "text", merges).collect()[0]["bpe_tokens"]
    assert got == ["low", "low", "e", "r", "n", "ewest", "w", "i", "d", "est"]


def test_bpe_encode_nonoverlapping(spark):
    probe = spark.createDataFrame([("aaaa aaa",)], "text string")
    got = tk.bpe_encode(probe, "text", [("a", "a")]).collect()[0]["bpe_tokens"]
    assert got == ["aa", "aa", "aa", "a"]


def test_bpe_encode_empty_and_unknown(spark):
    probe = spark.createDataFrame([("",), ("zzz",)], "text string")
    rows = tk.bpe_encode(probe, "text", [("a", "b")]).collect()
    by_text = {r["text"]: r["bpe_tokens"] for r in rows}
    assert by_text[""] == []
    assert by_text["zzz"] == ["z", "z", "z"]


def test_bpe_train_validates(spark):
    with pytest.raises(ValueError):
        tk.bpe_train(_corpus(spark), "text", n_merges=0)
