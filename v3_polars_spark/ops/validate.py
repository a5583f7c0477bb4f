"""Declarative data-validation checks — the expectations layer.

Every production warehouse runs rule suites against landed tables
(dbt tests, Great Expectations): null-rate ceilings, key uniqueness,
accepted value domains, referential integrity. As relational algebra
each rule is one aggregate or one anti-join, so a whole suite compiles
to a handful of scans whose outputs are single-row counts — the report
is rules-sized no matter how big the table.

Each check builder returns a one-row DataFrame
``(rule, n_checked, n_violations, passed)``; ``run_checks`` unions a
suite into one report frame. Scale notes per rule:

- not_null / accepted_values: map-side aggregable conditional counts —
  one scan, no shuffle beyond the final 1-row agg.
- unique: one hash aggregation on the key (count - countDistinct);
  exact, the same shuffle an analytic query on that key pays anyway.
- referential: LEFT ANTI join child→parent on the key — broadcastable
  when the parent's key column is dimension-sized, shuffle join
  otherwise; violations counted, never materialized wide.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _report(rule: str, n_checked: Column, n_violations: Column, df: DataFrame) -> DataFrame:
    return df.agg(
        F.lit(rule).alias("rule"),
        n_checked.cast("long").alias("n_checked"),
        n_violations.cast("long").alias("n_violations"),
        (n_violations == 0).alias("passed"),
    )


def check_not_null(df: DataFrame, col: str) -> DataFrame:
    """Rows where ``col`` IS NULL are violations."""
    return _report(
        f"not_null:{col}",
        F.count(F.lit(1)),
        F.count(F.when(F.col(col).isNull(), 1)),
        df,
    )


def check_unique(df: DataFrame, cols: list[str]) -> DataFrame:
    """Duplicate (beyond-first) rows per key tuple are violations.
    NULL-containing keys participate via null-safe distinctness, exactly
    like ``GROUP BY``."""
    key = F.struct(*[F.col(c) for c in cols])
    return _report(
        "unique:" + ",".join(cols),
        F.count(F.lit(1)),
        F.count(F.lit(1)) - F.countDistinct(key),
        df,
    )


def check_accepted_values(df: DataFrame, col: str, values: list) -> DataFrame:
    """Non-NULL values outside ``values`` are violations (NULL is
    not_null's business, not this rule's)."""
    return _report(
        f"accepted_values:{col}",
        F.count(F.lit(1)),
        F.count(
            F.when(F.col(col).isNotNull() & ~F.col(col).isin(values), 1)
        ),
        df,
    )


def check_range(df: DataFrame, col: str, lo, hi) -> DataFrame:
    """Non-NULL values outside [lo, hi] are violations."""
    return _report(
        f"range:{col}",
        F.count(F.lit(1)),
        F.count(
            F.when(
                F.col(col).isNotNull()
                & ((F.col(col) < lo) | (F.col(col) > hi)),
                1,
            )
        ),
        df,
    )


def check_referential(
    child: DataFrame,
    child_col: str,
    parent: DataFrame,
    parent_col: str,
) -> DataFrame:
    """Non-NULL child keys with no matching parent key are violations
    (SQL FK semantics: NULL child keys pass)."""
    orphans = (
        child.filter(F.col(child_col).isNotNull())
        .select(child_col)
        .join(
            parent.select(F.col(parent_col).alias(child_col)).distinct(),
            child_col,
            "left_anti",
        )
    )
    total = child.agg(F.count(F.lit(1)).alias("n"))
    bad = orphans.agg(F.count(F.lit(1)).alias("v"))
    return total.crossJoin(bad).select(
        F.lit(f"referential:{child_col}").alias("rule"),
        F.col("n").cast("long").alias("n_checked"),
        F.col("v").cast("long").alias("n_violations"),
        (F.col("v") == 0).alias("passed"),
    )


def run_checks(checks: list[DataFrame]) -> DataFrame:
    """Union a suite of check frames into one report. Each input is a
    1-row frame, so the report is rules-sized; Spark runs the underlying
    scans as independent jobs of one action."""
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out
