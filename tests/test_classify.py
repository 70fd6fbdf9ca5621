"""Hashed-feature naive-Bayes classifier (functions/classify.py):
training counts, weight exactness, scoring semantics, separation on
separable data."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from bytewax_spark.functions import classify as cl


def _corpus(spark):
    # class 1 speaks {apple banana cherry}, class 0 speaks {dog elk fox};
    # "the" is common to both
    rows = []
    for i in range(40):
        rows.append((i, 1, "the apple banana cherry apple the banana"))
    for i in range(40, 80):
        rows.append((i, 0, "the dog elk fox dog the elk"))
    return spark.createDataFrame(rows, "id long, y int, text string")


def test_nb_learns_separable_classes(spark):
    df = _corpus(spark)
    model = cl.nb_train(df, "text", "y", bits=16)
    scored = cl.nb_score(df, model, "text", "id", bits=16)
    ev = scored.join(df, "id").collect()
    assert all((r["score_micro"] > 0) == (r["y"] == 1) for r in ev)
    assert all(r["pred"] == (r["y"] == 1) for r in ev)


def test_nb_weight_formula_exact(spark):
    df = _corpus(spark)
    bits = 16
    model = {r["bucket"]: r for r in cl.nb_train(df, "text", "y", bits=bits).collect()}
    # recompute one bucket's weight by hand
    v = 1 << bits
    n1 = sum(r["c1"] for r in model.values())
    n0 = sum(r["c0"] for r in model.values())
    for r in model.values():
        w = round(
            1_000_000.0
            * math.log(((r["c1"] + 1) * (n0 + v)) / ((r["c0"] + 1) * (n1 + v)))
        )
        assert r["w_micro"] == w


def test_nb_model_bounded_by_bits(spark):
    df = _corpus(spark)
    model = cl.nb_train(df, "text", "y", bits=4)
    rows = model.collect()
    assert len(rows) <= 16
    assert all(0 <= r["bucket"] < 16 for r in rows)


def test_nb_score_counts_occurrences(spark):
    # repeated token accumulates weight once per occurrence
    df = spark.createDataFrame(
        [(0, 1, "apple"), (1, 0, "dog")], "id long, y int, text string"
    )
    model = cl.nb_train(df, "text", "y", bits=16)
    probe = spark.createDataFrame(
        [(10, "apple"), (11, "apple apple apple")], "id long, text string"
    )
    got = {r["id"]: r["score_micro"] for r in cl.nb_score(probe, model, "text", "id", bits=16).collect()}
    assert got[11] == 3 * got[10]


def test_nb_empty_doc_gets_prior(spark):
    df = _corpus(spark)
    model = cl.nb_train(df, "text", "y", bits=16)
    probe = spark.createDataFrame([(7, ""), (8, "zzz_unseen")], "id long, text string")
    got = {r["id"]: r for r in cl.nb_score(probe, model, "text", "id", bits=16, prior_micro=-5).collect()}
    assert got[7]["score_micro"] == -5
    assert got[8]["score_micro"] == -5  # unseen bucket contributes 0
    assert got[7]["pred"] is False


def test_eval_confusion_hand_computed(spark):
    from bytewax_spark.functions.classify import eval_confusion

    # truth:  a a a b b
    # pred:   a b a b a   -> class a: tp 2, n_true 3, n_pred 3
    #                        class b: tp 1, n_true 2, n_pred 2
    df = spark.createDataFrame(
        [("a", "a"), ("a", "b"), ("a", "a"), ("b", "b"), ("b", "a")],
        "t string, p string",
    )
    out = {r.label: r for r in eval_confusion(df, "t", "p").collect()}
    assert (out["a"].n_true, out["a"].n_pred, out["a"].tp) == (3, 3, 2)
    assert out["a"].precision_ppm == 666_666
    assert out["a"].recall_ppm == 666_666
    assert out["a"].f1_ppm == 666_666
    assert (out["b"].n_true, out["b"].n_pred, out["b"].tp) == (2, 2, 1)
    assert out["b"].precision_ppm == 500_000


def test_eval_confusion_unseen_class_on_one_side(spark):
    from bytewax_spark.functions.classify import eval_confusion

    # class c never predicted; class d never true
    df = spark.createDataFrame(
        [("c", "d"), ("c", "c")], "t string, p string"
    )
    out = {r.label: r for r in eval_confusion(df, "t", "p").collect()}
    assert out["c"].n_true == 2 and out["c"].n_pred == 1 and out["c"].tp == 1
    assert out["d"].n_true == 0 and out["d"].n_pred == 1 and out["d"].tp == 0
    assert out["d"].recall_ppm == 0 and out["d"].f1_ppm == 0
