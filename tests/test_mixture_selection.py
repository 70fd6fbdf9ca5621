"""Domain-mixture sampling and token-budget selection."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bytewax_spark.functions import sampling, selection


def _docs(spark, per_domain):
    rows, i = [], 0
    for dom, n in per_domain.items():
        for _ in range(n):
            rows.append((i, dom))
            i += 1
    return spark.createDataFrame(rows, "id long, dom string")


def test_domain_mixture_hits_target_ratios(spark):
    df = _docs(spark, {"web": 4000, "books": 500, "code": 1500})
    out = sampling.domain_mixture(df, "dom", "id", {"web": 5, "books": 1, "code": 2})
    got = {r["dom"]: r["c"] for r in out.groupBy("dom").agg(F.count("*").alias("c")).collect()}
    # books is binding: 500/1 -> n_out = 5000, targets web 2500 books 500 code 1000
    assert got["books"] == 500  # binding domain kept whole
    assert abs(got["web"] - 2500) < 250 and abs(got["code"] - 1000) < 150
    # unlisted domains are dropped entirely
    df2 = _docs(spark, {"web": 100, "junk": 100})
    out2 = sampling.domain_mixture(df2, "dom", "id", {"web": 1})
    assert {r["dom"] for r in out2.select("dom").distinct().collect()} == {"web"}


def test_domain_mixture_determinism_and_validation(spark):
    df = _docs(spark, {"a": 300, "b": 100})
    a = sorted(r["id"] for r in sampling.domain_mixture(df, "dom", "id", {"a": 1, "b": 1}).collect())
    b = sorted(r["id"] for r in sampling.domain_mixture(df, "dom", "id", {"a": 1, "b": 1}).collect())
    assert a == b
    with pytest.raises(ValueError, match="non-negative int"):
        sampling.domain_mixture(df, "dom", "id", {"a": 0.5})
    with pytest.raises(ValueError, match="at least one"):
        sampling.domain_mixture(df, "dom", "id", {})


def test_select_token_budget_exact_semantics(spark):
    df = spark.createDataFrame(
        [(1, 0.9, 40), (2, 0.9, 30), (3, 0.8, 50), (4, 0.7, 10), (5, 0.95, 25)],
        "id long, q double, n long",
    )
    rows = sorted(
        (r["id"], r["cum_tokens"])
        for r in selection.select_token_budget(df, "id", "n", "q", budget=100).collect()
    )
    # order: id5(25), id1(65), id2(95), id3 would hit 145 -> excluded
    assert rows == [(1, 65), (2, 95), (5, 25)]
    # budget 0 selects nothing; negative rejected
    assert selection.select_token_budget(df, "id", "n", "q", budget=0).count() == 0
    with pytest.raises(ValueError, match="budget"):
        selection.select_token_budget(df, "id", "n", "q", budget=-1)


def test_select_token_budget_partition_invariance(spark):
    rows = [(i, float((i * 7) % 13) / 13, (i * 3) % 17 + 1) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, q double, n long")
    a = sorted(selection.select_token_budget(df, "id", "n", "q", 500, num_partitions=3).collect())
    b = sorted(selection.select_token_budget(df, "id", "n", "q", 500, num_partitions=17).collect())
    assert a == b and len(a) > 0


# ---------------------------------------------------------------------------
# temperature_mixture (alpha-sampling, fully distributed)
# ---------------------------------------------------------------------------


def test_temperature_mixture_alpha_shapes(spark):
    from bytewax_spark.functions import sampling

    rows = [(i, "big") for i in range(900)] + [(i + 1000, "small") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, dom string")
    # alpha=1: natural mixture — keep ratio equal across domains
    nat = sampling.temperature_mixture(df, "dom", "doc_id", alpha=1.0, n_target=500)
    by_dom = {r["dom"]: r["n"] for r in nat.groupBy("dom").agg(F.count("*").alias("n")).collect()}
    assert abs(by_dom["big"] / 900 - by_dom["small"] / 100) < 0.15
    # alpha=0: uniform target — both domains aim at 250; small (100 rows)
    # is kept whole, big is cut toward 250
    uni = sampling.temperature_mixture(df, "dom", "doc_id", alpha=0.0, n_target=500)
    by_dom0 = {r["dom"]: r["n"] for r in uni.groupBy("dom").agg(F.count("*").alias("n")).collect()}
    assert by_dom0["small"] == 100
    assert 180 < by_dom0["big"] < 320
    # alpha=0.5 sits between: small keeps more than its natural share
    mid = sampling.temperature_mixture(df, "dom", "doc_id", alpha=0.5, n_target=500)
    by_domm = {r["dom"]: r["n"] for r in mid.groupBy("dom").agg(F.count("*").alias("n")).collect()}
    assert by_domm["small"] / 100 > by_domm["big"] / 900


def test_temperature_mixture_deterministic_and_validates(spark):
    from bytewax_spark.functions import sampling

    rows = [(i, f"d{i % 3}") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, dom string")
    a = sorted(r["doc_id"] for r in sampling.temperature_mixture(df, "dom", "doc_id", 0.5, 150).collect())
    b = sorted(
        r["doc_id"]
        for r in sampling.temperature_mixture(df.repartition(17), "dom", "doc_id", 0.5, 150).collect()
    )
    assert a == b and len(a) > 0
    with pytest.raises(ValueError):
        sampling.temperature_mixture(df, "dom", "doc_id", -0.1, 100)
    with pytest.raises(ValueError):
        sampling.temperature_mixture(df, "dom", "doc_id", 0.5, 0)
