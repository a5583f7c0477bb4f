"""Table diffing — reconcile two keyed snapshots.

The operational complement of MERGE: after a backfill, migration, or
engine swap, diff the old and new snapshot and get per-key verdicts
(added / removed / changed / unchanged). One full-outer join on the key
with a single content hash per side — at scale this is the only honest
way to compare tables (row-by-row collect comparisons don't distribute),
and with both sides bucketed by key (``tables.write_bucketed``) the join
is exchange-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def diff_tables(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Per-key diff of two same-schema tables.

    Returns (keys..., status) with status in {'added', 'removed',
    'changed', 'unchanged'} — 'added' = in ``right`` only, 'removed' =
    in ``left`` only. Content equality is md5 over the string-cast
    ``compare_cols`` (default: all non-key columns, in ``left``'s
    order) with a field separator that cannot collide with values
    joined across columns; NULL encodes distinctly from ''.
    """
    cols = compare_cols or [c for c in left.columns if c not in keys]
    if set(cols) - set(right.columns):
        raise ValueError("compare_cols must exist in both tables")

    def content_hash(df: DataFrame) -> F.Column:
        parts = []
        for c in cols:
            parts.append(
                F.coalesce(F.concat(F.lit("v:"), F.col(c).cast("string")),
                           F.lit("null"))
            )
        return F.md5(F.concat_ws("\x1f", *parts))

    l_ = left.select(*keys, content_hash(left).alias("__lh"))
    r_ = right.select(*keys, content_hash(right).alias("__rh"))
    j = l_.join(r_, keys, "full_outer")
    status = (
        F.when(F.col("__lh").isNull(), F.lit("added"))
        .when(F.col("__rh").isNull(), F.lit("removed"))
        .when(F.col("__lh") == F.col("__rh"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(*keys, status.alias("status"))
