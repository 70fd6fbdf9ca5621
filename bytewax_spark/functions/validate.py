"""Rule-based data-quality gates — assert expectations over a table
and get a violations report, the contract check a 100 TB pipeline
runs between stages (the shape popularized by Great Expectations /
Deequ, both public tools; this is an independent Spark-expression
implementation).

Each rule compiles to ONE boolean expression evaluated in the same
single aggregation pass (a violation counter per rule), except
``unique`` (one groupBy on the rule's columns) and ``fk`` (one
anti-join against the parent) which are separate single-shuffle jobs
by nature. The report is tiny — one row per rule — so gating a
petabyte table costs one scan plus one shuffle per relational rule.

Complement to :func:`bytewax_spark.functions.profiling.profile_table`
(the census: what IS in the table) — ``expect`` answers "does the
table satisfy the contract", with exact violation counts.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "expect",
    "fk_violations",
    "k_anonymity",
    "table_checksum",
    "unique_violations",
]


def k_anonymity(df: DataFrame, quasi_cols: Sequence[str], k: int = 5) -> DataFrame:
    """k-anonymity audit over a quasi-identifier tuple (Sweeney 2002,
    public definition): a release is k-anonymous when every
    quasi-identifier combination is shared by at least ``k`` rows —
    smaller groups re-identify individuals by linkage. Returns ONE row:
    ``(k, n_rows, n_groups, min_group_size, violating_groups,
    rows_at_risk)`` where ``rows_at_risk`` counts rows in sub-``k``
    groups (the rows that would need suppression or generalization).

    One groupBy on the quasi-identifier (map-side combined) and one
    aggregation over the group-size table — the audit of a petabyte
    release costs a single keyed shuffle, and the verdict is one row."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    sizes = df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("_n"))
    n = F.col("_n")
    return sizes.agg(
        F.lit(k).cast("long").alias("k"),
        F.sum(n).alias("n_rows"),
        F.count(F.lit(1)).alias("n_groups"),
        F.min(n).alias("min_group_size"),
        F.sum((n < k).cast("long")).alias("violating_groups"),
        F.sum(F.when(n < k, n).otherwise(F.lit(0))).alias("rows_at_risk"),
    )


def fk_violations(
    child: DataFrame, parent: DataFrame, child_key: str, parent_key: str
) -> DataFrame:
    """Rows of ``child`` whose ``child_key`` has no match in
    ``parent.parent_key`` (NULL keys are not violations — pair with a
    ``not_null`` rule to forbid them). One left-anti join; Spark
    broadcasts the parent side when it is small."""
    return child.filter(F.col(child_key).isNotNull()).join(
        parent.select(F.col(parent_key).alias(child_key)).distinct(),
        child_key,
        "left_anti",
    )


def unique_violations(df: DataFrame, cols: list[str]) -> DataFrame:
    """Key groups appearing more than once → ``(*cols, n)``. One
    groupBy on the key."""
    return (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )


def expect(df: DataFrame, rules: list[tuple], name_col: str = "rule") -> DataFrame:
    """Evaluate a rule list → one report row per rule:
    ``(rule, column, violations, ok)``.

    Rule forms (tuples):

    - ``("not_null", col)``
    - ``("unique", [col, ...])``
    - ``("in_range", col, lo, hi)``  (inclusive; NULL passes)
    - ``("matches", col, regex)``  (full-match; NULL passes)
    - ``("in_set", col, [v, ...])``  (NULL passes)
    - ``("fk", col, parent_df, parent_col)``
    - ``("expr", label, bool_column)``  (True = violation)

    All expression rules share ONE aggregation pass; each ``unique``
    adds one groupBy job and each ``fk`` one anti-join job — the
    minimum possible I/O for those semantics."""
    if not rules:
        raise ValueError("expect needs at least one rule")
    spark = df.sparkSession
    expr_aggs: list = []
    expr_meta: list[tuple[str, str]] = []
    extra_reports: list[DataFrame] = []
    for r in rules:
        kind = r[0]
        if kind == "not_null":
            _, c = r
            expr_aggs.append(F.sum(F.col(c).isNull().cast("long")))
            expr_meta.append(("not_null", c))
        elif kind == "in_range":
            _, c, lo, hi = r
            bad = F.col(c).isNotNull() & ~F.col(c).between(F.lit(lo), F.lit(hi))
            expr_aggs.append(F.sum(bad.cast("long")))
            expr_meta.append(("in_range", c))
        elif kind == "matches":
            _, c, pat = r
            bad = F.col(c).isNotNull() & ~F.col(c).rlike(f"^(?:{pat})$")
            expr_aggs.append(F.sum(bad.cast("long")))
            expr_meta.append(("matches", c))
        elif kind == "in_set":
            _, c, vals = r
            bad = F.col(c).isNotNull() & ~F.col(c).isin(list(vals))
            expr_aggs.append(F.sum(bad.cast("long")))
            expr_meta.append(("in_set", c))
        elif kind == "expr":
            _, label, cond = r
            expr_aggs.append(F.sum(cond.cast("long")))
            expr_meta.append(("expr", label))
        elif kind == "unique":
            _, cols = r
            cnt = unique_violations(df, list(cols)).agg(
                F.coalesce(F.sum(F.col("n")), F.lit(0)).alias("violations")
            )
            extra_reports.append(
                cnt.select(
                    F.lit("unique").alias(name_col),
                    F.lit(",".join(cols)).alias("column"),
                    F.col("violations").cast("long").alias("violations"),
                )
            )
        elif kind == "fk":
            _, c, parent, pcol = r
            cnt = fk_violations(df, parent, c, pcol).agg(
                F.count(F.lit(1)).alias("violations")
            )
            extra_reports.append(
                cnt.select(
                    F.lit("fk").alias(name_col),
                    F.lit(c).alias("column"),
                    F.col("violations").cast("long").alias("violations"),
                )
            )
        else:
            raise ValueError(f"unknown rule kind {kind!r}")
    reports: list[DataFrame] = []
    if expr_aggs:
        wide = df.agg(
            *[a.alias(f"_v{i}") for i, a in enumerate(expr_aggs)]
        )
        longed = wide.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(k).alias(name_col),
                            F.lit(c).alias("column"),
                            F.coalesce(F.col(f"_v{i}"), F.lit(0))
                            .cast("long")
                            .alias("violations"),
                        )
                        for i, (k, c) in enumerate(expr_meta)
                    ]
                )
            ).alias("_r")
        ).select("_r.*")
        reports.append(longed)
    reports.extend(extra_reports)
    out = reports[0]
    for rep in reports[1:]:
        out = out.unionByName(rep)
    return out.withColumn("ok", F.col("violations") == 0)


def table_checksum(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    group_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Order-independent table checksum -- the migration/replication
    verifier: ``bit_xor`` of a per-row md5-derived int64 over the
    chosen columns joined with an ASCII unit separator (NULLs get an
    explicit sentinel so ``(a, NULL)`` and ``(NULL, a)`` differ). Two
    relations with equal ``(n_rows, checksum)`` per group are
    byte-equal on those columns up to duplicate-row parity -- XOR
    cancels identical rows pairwise, which is why the row count rides
    along (the standard checksum-table caveat; include a unique key in
    ``cols`` to break ties). Returns ``group_cols + (n_rows,
    checksum)``; one aggregation, map-side combined,
    engine-replayable (md5 is md5 everywhere).

    Compare two snapshots cheaply BEFORE reaching for
    :func:`~bytewax_spark.functions.cdc.table_diff`, which shuffles
    both tables to name the differing keys."""
    from bytewax_spark.functions.text import hash64

    use = list(cols) if cols is not None else list(df.columns)
    if not use:
        raise ValueError("table_checksum needs at least one column")
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit("<NULL>")) for c in use
    ]
    row_h = hash64(F.concat_ws("\u001f", *parts))
    g = list(group_cols) if group_cols else []
    agg = [
        F.count(F.lit(1)).alias("n_rows"),
        F.bit_xor(row_h).alias("checksum"),
    ]
    # the per-row md5 is the whole cost and combines map-side; an
    # under-split scan would run it on one core (no-op at scale)
    from bytewax_spark.io import ensure_min_partitions

    df = ensure_min_partitions(df)
    return df.groupBy(*g).agg(*agg) if g else df.agg(*agg)
