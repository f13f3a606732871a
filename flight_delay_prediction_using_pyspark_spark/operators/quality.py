"""Data-quality constraint checking — the dbt-test / Deequ-style
validation pass a production table runs before it is published.

`constraint_report` evaluates ALL row-level checks in ONE hash
aggregate over a single scan (each check is an aggregate expression
producing its violation count), then unpivots to a (check_name,
n_violations) report with `stack`. Adding a check adds a counter to
the same pass, not another job — the difference between O(checks)
scans and O(1) at 100 TB.

Referential checks need a second table, so they are their own
(anti-join shaped) operator and union into the same report schema.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def violations_where(pred: Column) -> Column:
    """Aggregate violation counter for a row-level predicate."""
    return F.count(F.when(pred, 1))


def duplicate_rows(key: Column | str) -> Column:
    """Aggregate counter for uniqueness: rows beyond the first per
    key value (COUNT(*) - COUNT(DISTINCT key))."""
    k = F.col(key) if isinstance(key, str) else key
    return F.count(F.lit(1)) - F.count_distinct(k)


def constraint_report(df: DataFrame, checks: dict[str, Column]) -> DataFrame:
    """Evaluate every check (an aggregate Column yielding a violation
    count) in one pass; returns (check_name, n_violations) rows."""
    names = list(checks)
    aggs = [checks[n].cast("long").alias(f"__c_{i}") for i, n in enumerate(names)]
    stack_args = ", ".join(f"'{n}', __c_{i}" for i, n in enumerate(names))
    return df.agg(*aggs).select(
        F.expr(f"stack({len(names)}, {stack_args}) AS (check_name, n_violations)")
    )


def fk_violation_report(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
    check_name: str,
) -> DataFrame:
    """Referential-integrity check: child rows whose key has no match
    in the parent (left anti join on the key only — the parent side
    prunes to its key column and broadcasts when small). Same report
    schema as `constraint_report` for unioning."""
    orphans = child.join(
        parent.select(F.col(parent_key).alias(child_key)),
        child_key,
        "left_anti",
    )
    return orphans.agg(
        F.lit(check_name).alias("check_name"),
        F.count(F.lit(1)).alias("n_violations"),
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Table-reconciliation diff between two snapshots: per-row status
    `added` / `deleted` / `changed` / `unchanged` via one full outer
    join on the key.

    Rows are compared by a portable full-width (128-bit) md5 row-hash
    over `compare_cols` (cast to string, '|'-joined with a NULL
    sentinel) — at 100 TB the shuffle carries (key, 32-char hash) per
    side instead of whole rows, and the same hash powers cross-engine/
    cross-snapshot audits. Full width matters for a reconciliation
    tool: a truncated 32-bit hash would silently misclassify a changed
    row as unchanged with p≈2^-32 per row — certain to happen somewhere
    at billions of rows — while 128 bits keeps the whole-table collision
    probability negligible (~n²/2^129). The caller aggregates statuses
    or filters to the changed keys."""

    def row_hash(df: DataFrame) -> Column:
        parts = [
            F.coalesce(F.col(c).cast("string"), F.lit("\x00null"))
            for c in compare_cols
        ]
        return F.md5(F.concat_ws("|", *parts))

    o = old.select(*key_cols, row_hash(old).alias("__h_old"))
    n = new.select(*key_cols, row_hash(new).alias("__h_new"))
    joined = o.join(n, key_cols, "full_outer")
    status = (
        F.when(F.col("__h_old").isNull(), F.lit("added"))
        .when(F.col("__h_new").isNull(), F.lit("deleted"))
        .when(F.col("__h_old") == F.col("__h_new"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(*key_cols, status.alias("diff_status"))
