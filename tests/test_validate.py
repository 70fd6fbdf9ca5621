"""Data-quality gates (functions/validate.py): rule compilation,
violation counts, single-pass report."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bytewax_spark.functions import validate as dq


def _df(spark):
    return spark.createDataFrame(
        [
            (1, "a@x.com", 10.0, "GOLD"),
            (2, None, 5.0, "SILVER"),
            (3, "bad-email", -1.0, "GOLD"),
            (3, "c@y.org", 200.0, "BRONZE"),
            (4, "d@z.net", 50.0, "IRON"),
        ],
        "id long, email string, amount double, tier string",
    )


def test_expect_expression_rules(spark):
    rep = {
        (r["rule"], r["column"]): (r["violations"], r["ok"])
        for r in dq.expect(
            _df(spark),
            [
                ("not_null", "email"),
                ("in_range", "amount", 0.0, 100.0),
                ("matches", "email", r"[^@]+@[^@]+\.[a-z]+"),
                ("in_set", "tier", ["GOLD", "SILVER", "BRONZE"]),
            ],
        ).collect()
    }
    assert rep[("not_null", "email")] == (1, False)
    assert rep[("in_range", "amount")] == (2, False)  # -1 and 200
    assert rep[("matches", "email")] == (1, False)  # bad-email; NULL passes
    assert rep[("in_set", "tier")] == (1, False)  # IRON


def test_expect_unique_and_fk(spark):
    df = _df(spark)
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pid long")
    rep = {
        r["rule"]: r["violations"]
        for r in dq.expect(
            df, [("unique", ["id"]), ("fk", "id", parent, "pid")]
        ).collect()
    }
    assert rep["unique"] == 2  # id=3 appears twice -> both rows counted
    assert rep["fk"] == 1  # id=4 has no parent


def test_expect_all_green(spark):
    df = _df(spark)
    rep = dq.expect(df, [("not_null", "id"), ("in_range", "amount", -10.0, 1000.0)]).collect()
    assert all(r["ok"] and r["violations"] == 0 for r in rep)


def test_expect_expr_rule_and_validation(spark):
    df = _df(spark)
    rep = dq.expect(df, [("expr", "neg_amount", F.col("amount") < 0)]).collect()
    assert rep[0]["violations"] == 1 and rep[0]["column"] == "neg_amount"
    with pytest.raises(ValueError):
        dq.expect(df, [])
    with pytest.raises(ValueError):
        dq.expect(df, [("nope", "x")])


def test_fk_violations_null_keys_pass(spark):
    child = spark.createDataFrame([(None,), (9,)], "k long")
    parent = spark.createDataFrame([(1,)], "p long")
    got = dq.fk_violations(child, parent, "k", "p").collect()
    assert [r["k"] for r in got] == [9]


def test_k_anonymity_counts_sub_k_groups(spark):
    df = spark.createDataFrame(
        # quasi (zip, age): group (1, 30) has 3 rows, (1, 40) has 1,
        # (2, 30) has 2 -> at k=3: 2 violating groups, 3 rows at risk
        [(1, 30), (1, 30), (1, 30), (1, 40), (2, 30), (2, 30)],
        "zip int, age int",
    )
    row = dq.k_anonymity(df, ["zip", "age"], k=3).collect()[0]
    assert row.k == 3 and row.n_rows == 6 and row.n_groups == 3
    assert row.min_group_size == 1
    assert row.violating_groups == 2
    assert row.rows_at_risk == 3


def test_k_anonymity_all_anonymous_at_k1(spark):
    df = spark.createDataFrame([(1,), (2,)], "zip int")
    row = dq.k_anonymity(df, ["zip"], k=1).collect()[0]
    assert row.violating_groups == 0 and row.rows_at_risk == 0


def test_k_anonymity_rejects_bad_k(spark):
    df = spark.createDataFrame([(1,)], "zip int")
    with pytest.raises(ValueError):
        dq.k_anonymity(df, ["zip"], k=0)


def test_table_checksum_order_independent(spark):
    a = spark.createDataFrame([(1, "x"), (2, "y"), (3, "z")], "id long, s string")
    b = spark.createDataFrame([(3, "z"), (1, "x"), (2, "y")], "id long, s string")
    ra = dq.table_checksum(a).collect()[0]
    rb = dq.table_checksum(b.repartition(7)).collect()[0]
    assert (ra.n_rows, ra.checksum) == (rb.n_rows, rb.checksum)


def test_table_checksum_detects_single_cell_change(spark):
    a = spark.createDataFrame([(1, "x"), (2, "y")], "id long, s string")
    b = spark.createDataFrame([(1, "x"), (2, "Y")], "id long, s string")
    assert (
        dq.table_checksum(a).collect()[0].checksum
        != dq.table_checksum(b).collect()[0].checksum
    )


def test_table_checksum_null_vs_shifted_columns_differ(spark):
    # (a, NULL) must not hash like (NULL, a): explicit sentinel + ws sep
    a = spark.createDataFrame([("a", None)], "x string, y string")
    b = spark.createDataFrame([(None, "a")], "x string, y string")
    assert (
        dq.table_checksum(a).collect()[0].checksum
        != dq.table_checksum(b).collect()[0].checksum
    )


def test_table_checksum_grouped(spark):
    df = spark.createDataFrame(
        [("g1", 1), ("g1", 2), ("g2", 3)], "g string, v long"
    )
    rows = {r.g: r.n_rows for r in dq.table_checksum(df, group_cols=["g"]).collect()}
    assert rows == {"g1": 2, "g2": 1}
