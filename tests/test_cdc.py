"""CDC shapes (functions/cdc.py): latest snapshots and SCD2
intervals."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from bytewax_spark.functions import cdc


def _log(spark):
    t = lambda h: datetime(2024, 1, 1, h)  # noqa: E731
    return spark.createDataFrame(
        [
            (1, t(0), 100, "a0"),
            (1, t(2), 101, "a2"),
            (1, t(1), 102, "a1"),   # late arrival: ts order, not file order
            (2, t(5), 103, "b5"),
        ],
        "k bigint, ts timestamp, seq bigint, val string",
    )


def test_latest_snapshot_picks_max_ts(spark):
    got = {r["k"]: r["val"] for r in cdc.latest_snapshot(_log(spark), "k", "ts", "seq").collect()}
    assert got == {1: "a2", 2: "b5"}


def test_latest_snapshot_tiebreak_total_order(spark):
    t = datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(1, t, 5, "low"), (1, t, 9, "high")],
        "k bigint, ts timestamp, seq bigint, val string",
    )
    got = cdc.latest_snapshot(df, "k", "ts", "seq").collect()
    assert len(got) == 1 and got[0]["val"] == "high"


def test_latest_snapshot_no_window_in_plan(spark):
    df = _log(spark)
    plan = cdc.latest_snapshot(df, "k", "ts", "seq")._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan  # pure max_by aggregation
    assert "partial_max_by" in plan or "partial_max" in plan


def test_scd2_intervals_chain(spark):
    rows = {
        (r["k"], str(r["valid_from"])): (str(r["valid_to"]), r["is_current"])
        for r in cdc.scd2(_log(spark), "k", "ts", "seq").collect()
    }
    # k=1 versions chain 00:00 -> 01:00 -> 02:00 (late row slots in order)
    assert rows[(1, "2024-01-01 00:00:00")] == ("2024-01-01 01:00:00", False)
    assert rows[(1, "2024-01-01 01:00:00")] == ("2024-01-01 02:00:00", False)
    assert rows[(1, "2024-01-01 02:00:00")] == ("None", True)
    assert rows[(2, "2024-01-01 05:00:00")] == ("None", True)


def test_scd2_point_in_time_join(spark):
    """The canonical consumer: as-of lookup via the interval."""
    dim = cdc.scd2(_log(spark), "k", "ts", "seq")
    facts = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 1, 30))], "k bigint, fts timestamp"
    )
    j = facts.join(dim, "k").filter(
        (F.col("fts") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("fts") < F.col("valid_to")))
    )
    got = j.collect()
    assert len(got) == 1 and got[0]["val"] == "a1"  # version valid at 01:30


def test_table_diff_add_remove_change(spark):
    from bytewax_spark.functions.cdc import table_diff

    before = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, None, 40)],
        "id long, name string, v long",
    )
    after = spark.createDataFrame(
        [(2, "b", 20), (3, "C", 30), (4, None, 40), (5, "e", 50)],
        "id long, name string, v long",
    )
    got = {r["id"]: r["change"] for r in table_diff(before, after, "id").collect()}
    assert got == {1: "removed", 3: "changed", 5: "added"}
    # key 2 identical, key 4 null-safe identical: absent


def test_table_diff_compare_cols_subset(spark):
    from bytewax_spark.functions.cdc import table_diff

    before = spark.createDataFrame([(1, "x", 1)], "id long, a string, b long")
    after = spark.createDataFrame([(1, "x", 999)], "id long, a string, b long")
    assert table_diff(before, after, "id", compare_cols=["a"]).count() == 0
    got = table_diff(before, after, "id", compare_cols=["b"]).collect()
    assert [(r["id"], r["change"]) for r in got] == [(1, "changed")]


def test_apply_upserts_update_insert_untouched(spark):
    from datetime import datetime

    from bytewax_spark.functions.cdc import apply_upserts

    base = spark.createDataFrame(
        [(1, datetime(2024, 1, 1), 10, "a"), (2, datetime(2024, 1, 1), 11, "b")],
        "k long, ts timestamp, i long, v string",
    )
    changes = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 2), 20, "a2"),   # update key 1
            (1, datetime(2024, 1, 3), 21, "a3"),   # later version wins
            (3, datetime(2024, 1, 2), 22, "c"),    # insert key 3
        ],
        "k long, ts timestamp, i long, v string",
    )
    out = {
        r.k: r.v
        for r in apply_upserts(base, changes, "k", "ts", "i").collect()
    }
    assert out == {1: "a3", 2: "b", 3: "c"}


def test_apply_upserts_change_wins_even_with_null_payload(spark):
    from datetime import datetime

    from bytewax_spark.functions.cdc import apply_upserts

    base = spark.createDataFrame(
        [(1, datetime(2024, 1, 1), 1, "old")],
        "k long, ts timestamp, i long, v string",
    )
    changes = spark.createDataFrame(
        [(1, datetime(2024, 1, 2), 2, None)],
        "k long, ts timestamp, i long, v string",
    )
    row = apply_upserts(base, changes, "k", "ts", "i").collect()[0]
    assert row.v is None  # whole-row MERGE, not a patch


def test_apply_upserts_delete_flag_removes_key(spark):
    from datetime import datetime

    from bytewax_spark.functions.cdc import apply_upserts

    base = spark.createDataFrame(
        [(1, datetime(2024, 1, 1), 1, "x", False)],
        "k long, ts timestamp, i long, v string, deleted boolean",
    )
    changes = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 2), 2, "x", True),    # delete key 1
            (2, datetime(2024, 1, 2), 3, "y", False),   # insert key 2
        ],
        "k long, ts timestamp, i long, v string, deleted boolean",
    )
    out = apply_upserts(
        base, changes, "k", "ts", "i", delete_col="deleted"
    ).collect()
    assert [(r.k, r.v) for r in out] == [(2, "y")]
