"""Cohort retention — the activity-over-time companion to the funnel.

Users are grouped into cohorts by their first-activity period; the
retention matrix counts, for each (cohort, offset) cell, how many of
that cohort's users were active `offset` periods after joining.

Scale shape: two hash aggregates and one join — (1) first-activity
period per key (map-side combinable min), (2) distinct (key, period)
activity pairs, joined back (the first-activity side is one row per key
— broadcasts while small, shuffle-joins at scale), then (3) the cell
count. No windows, no per-period re-scans of the raw events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PERIODS = {"day": 86400, "week": 604800}


def retention_matrix(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    period: str = "week",
) -> DataFrame:
    """Return (cohort, offset, n_active) — epoch-aligned ``period``
    buckets ('day' or 'week', fixed-width UTC intervals so bucket math is
    integer-exact and portable), cohort = the key's first active bucket,
    offset >= 0 in periods. Every key contributes to offset 0 by
    construction.
    """
    if period not in _PERIODS:
        raise ValueError(f"period must be one of {sorted(_PERIODS)}")
    # micros-domain floor: integer-exact and portable (Spark long cast
    # truncates where other engines' double->int casts round, so the
    # explicit floor is part of the cross-engine contract)
    us = _PERIODS[period] * 1_000_000
    bucket = F.floor(
        F.unix_micros(F.col(ts_col).cast("timestamp")) / F.lit(us)
    ).cast("long")
    acts = df.select(F.col(key_col).alias("__k"), bucket.alias("__b")).distinct()
    first = acts.groupBy("__k").agg(F.min("__b").alias("__cohort"))
    return (
        acts.join(first, "__k")
        .groupBy(
            F.col("__cohort").alias("cohort"),
            (F.col("__b") - F.col("__cohort")).alias("offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
