"""Change-data shapes — turning an append-only update log into the
two tables consumers actually query: the latest snapshot (one current
row per key) and SCD2 validity intervals (every historical version
with its [valid_from, valid_to) range). This is the batch/lakehouse
form of what the reference's users build with ``stateful_map`` "keep
last value" loops (reference pysrc/bytewax/operators/__init__.py:1040).

Scale posture: both operators are one shuffle on the entity key.
``latest_snapshot`` is a single ``max_by`` aggregation (map-side
partial — never a window over the whole log); ``scd2`` needs the
per-key order so it uses a per-key window (millions of small sorts,
no global sort). Late-arriving updates are handled by ordering on
(event time, tiebreak), not arrival order, so a backfilled log
produces the same tables as a perfectly ordered one.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["apply_upserts", "latest_snapshot", "scd2", "table_diff"]


def latest_snapshot(
    df: DataFrame,
    key_cols: Sequence[str] | str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """One row per key: the version with the greatest
    ``(ts, tiebreak)``. A single ``max_by`` aggregation over a struct
    of all columns — one shuffle, map-side combine, no window, no
    row_number. ``tiebreak_col`` makes the order total so simultaneous
    updates resolve identically on every engine and partitioning."""
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    payload = [c for c in df.columns if c not in key_cols]
    ord_key = F.struct(F.col(ts_col), F.col(tiebreak_col))
    agg = df.groupBy(*key_cols).agg(
        F.max_by(F.struct(*payload), ord_key).alias("_row")
    )
    return agg.select(*key_cols, *[F.col(f"_row.{c}").alias(c) for c in payload])


def scd2(
    df: DataFrame,
    key_cols: Sequence[str] | str,
    ts_col: str,
    tiebreak_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current: str = "is_current",
) -> DataFrame:
    """Slowly-changing-dimension type 2: every input row becomes a
    version with ``valid_from`` = its own timestamp, ``valid_to`` =
    the NEXT version's timestamp (null while current), and an
    ``is_current`` flag. Consumers join facts with
    ``fact.ts >= valid_from AND (fact.ts < valid_to OR valid_to IS
    NULL)`` — the standard point-in-time lookup.

    One per-key-partitioned window (``lead`` over (ts, tiebreak));
    deterministic under any partitioning because the order is total."""
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    w = Window.partitionBy(*key_cols).orderBy(F.col(ts_col), F.col(tiebreak_col))
    nxt = F.lead(F.col(ts_col)).over(w)
    return (
        df.withColumn(valid_from, F.col(ts_col))
        .withColumn(valid_to, nxt)
        .withColumn(current, nxt.isNull())
    )


def table_diff(
    before: DataFrame,
    after: DataFrame,
    key_cols: Sequence[str] | str,
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Snapshot diff — what changed between two versions of a table →
    one row per affected key ``(*key_cols, change)`` with ``change ∈
    {added, removed, changed}``; unchanged keys emit nothing. The
    regression gate for dataset releases ("what did this pipeline
    change?") and the input to incremental downstream refresh.

    One full-outer join on the key; ``compare_cols`` (default: all
    non-key columns present on BOTH sides) compare null-safely via a
    struct equality — a single expression, no per-column joins. Cost
    is the same one shuffle a join of the two snapshots costs, with
    only keys + compared columns shuffled (column-pruned scans)."""
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if compare_cols is None:
        compare_cols = [
            c
            for c in before.columns
            if c not in key_cols and c in after.columns
        ]
    compare_cols = list(compare_cols)
    b = before.select(
        *key_cols,
        F.struct(*[F.col(c) for c in compare_cols]).alias("_vb"),
        F.lit(1).alias("_inb"),
    )
    a = after.select(
        *key_cols,
        F.struct(*[F.col(c) for c in compare_cols]).alias("_va"),
        F.lit(1).alias("_ina"),
    )
    j = b.join(a, key_cols, "full_outer")
    change = (
        F.when(F.col("_inb").isNull(), F.lit("added"))
        .when(F.col("_ina").isNull(), F.lit("removed"))
        .when(~F.col("_vb").eqNullSafe(F.col("_va")), F.lit("changed"))
    )
    return (
        j.select(*key_cols, change.alias("change"))
        .filter(F.col("change").isNotNull())
    )


def apply_upserts(
    base: DataFrame,
    changes: DataFrame,
    key_cols,
    ts_col: str,
    tiebreak_col: str,
    delete_col: str | None = None,
) -> DataFrame:
    """MERGE a change batch into a snapshot — the CDC apply step
    (the public Delta/Iceberg MERGE INTO shape, as a pure dataflow):
    the latest change per key (by ``(ts, tiebreak)``, via
    :func:`latest_snapshot`) replaces the base row, new keys insert,
    and — when ``delete_col`` names a boolean column — a latest change
    with it true removes the key. Returns the next snapshot with the
    BASE schema (the delete flag never lands in the snapshot).

    One max_by aggregation over the CHANGE BATCH only (the small
    side), then one full-outer join against the base on the key —
    the base is never aggregated or windowed, so applying a day of
    changes to a 100 TB snapshot costs one co-partitioned join."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    latest = latest_snapshot(changes, keys, ts_col, tiebreak_col).withColumn(
        "_chg", F.lit(1)
    )
    out_cols = list(base.columns)
    b = base.select(*[F.col(c).alias(f"_b_{c}") for c in out_cols])
    cond = None
    for k in keys:
        eq = F.col(f"_b_{k}") == latest[k]
        cond = eq if cond is None else cond & eq
    j = b.join(latest, cond, "full_outer")
    if delete_col is not None:
        j = j.filter(~F.coalesce(F.col(delete_col), F.lit(False)))
    updated = F.col("_chg") == 1
    sel = []
    for c in out_cols:
        if c in keys:
            if c in latest.columns:
                sel.append(F.coalesce(F.col(c), F.col(f"_b_{c}")).alias(c))
            else:
                sel.append(F.col(f"_b_{c}").alias(c))
        elif c in latest.columns:
            # whole-row replace: an updated key takes the change row's
            # value even when it is NULL (MERGE semantics, not patch)
            sel.append(
                F.when(updated, F.col(c)).otherwise(F.col(f"_b_{c}")).alias(c)
            )
        else:
            # column absent from the change batch: survives untouched
            # for updates, NULL for brand-new keys (no base row)
            sel.append(F.col(f"_b_{c}").alias(c))
    return j.select(*sel)
