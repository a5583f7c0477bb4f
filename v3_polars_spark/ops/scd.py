"""SCD Type-2 history build — validity intervals from an append-only
change log.

The engine's source tables are append-only event logs (SURVEY §1); the
warehouse-side consumer of such a log routinely needs the *dimension
history*: for each key, the runs of attribute values with
``[valid_from, valid_to)`` intervals and an ``is_current`` flag (slowly
changing dimension, type 2). Lakehouse engines bolt this onto MERGE;
relationally it is two window passes over one partitioning:

1. change detection — a row opens a new version iff any tracked
   attribute differs (null-safely) from its predecessor in
   ``(keys, order)`` sequence;
2. interval close — ``valid_to`` of a version is the ``valid_from`` of
   the next surviving version (lead over the filtered rows).

Both windows share the same ``partitionBy(keys)``, so Catalyst plans ONE
exchange (pinned in tests/test_plans.py); at 100 TB this is a single
shuffle on the dimension key, with no iterative log replay and no
driver-side state.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    attrs: list[str],
    order: list[str] | None = None,
) -> DataFrame:
    """Collapse a change log into SCD2 validity intervals.

    Parameters
    ----------
    df : change log with one row per observation.
    keys : dimension key columns (partitioning).
    ts_col : observation timestamp; becomes ``valid_from``.
    attrs : tracked attribute columns — a new version opens when any of
        them changes (NULL-safe comparison).
    order : extra tiebreak columns after ``ts_col`` (e.g. a log sequence
        id) so runs are deterministic under equal timestamps.

    Returns ``keys + attrs + valid_from + valid_to + is_current`` with
    one row per version. ``valid_to`` is NULL for the open version
    (half-open intervals: a version covers ``[valid_from, valid_to)``).
    """
    order = order or []
    seq = Window.partitionBy(*keys).orderBy(ts_col, *order)
    # first row of a key opens a version too
    changed = reduce(
        lambda a, b: a | b,
        [~F.col(c).eqNullSafe(F.lag(c).over(seq)) for c in attrs],
        F.row_number().over(seq) == 1,
    )
    versions = df.withColumn("__open", changed).filter(F.col("__open"))
    extra = [c for c in order if c not in keys and c not in attrs and c != ts_col]
    # ts_col is renamed to valid_from by the select below, so it must not
    # appear in the interval-close ordering (valid_from already encodes it)
    close_order = [c for c in order if c != ts_col]
    return (
        versions.select(*keys, *attrs, F.col(ts_col).alias("valid_from"), *extra)
        .withColumn(
            "valid_to",
            F.lead("valid_from").over(
                Window.partitionBy(*keys).orderBy("valid_from", *close_order)
            ),
        )
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop(*extra)
    )
