"""Bucketed range join (point-in-interval) — the distributed shape for
joins whose only predicate is ``lo <= point < hi``.

Without an equi key Spark plans such a join as BroadcastNestedLoop or a
cartesian product — O(|L|·|R|) comparisons, the classic scale cliff. The
bucketed decomposition manufactures an equi key: every interval is exploded
into the fixed-width buckets it covers, the point side computes its single
bucket, and the join runs as an ordinary hash/sort-merge equi-join on the
bucket id with the exact range predicate as a residual filter. Work is
O(|L| + |R|·avg_span/width + candidate pairs) — linear, shuffle-partitioned,
AQE/skew-join compatible. (Same family as the banded LSH joins in
datapipe.dedup and the bin-based range-join optimization in commercial
Spark runtimes.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``lo <= point < hi`` (closed-open, the standard bucket convention).

    ``bucket_width`` trades replication for candidate precision: intervals
    are replicated ``~span/width`` times; points are never replicated.
    Pick width ≈ the typical interval span. ``how`` supports "inner" and
    "left" (left = points keep a row with null interval columns when no
    interval covers them). Column names must not overlap across sides.
    Timestamp columns are supported directly (validity-window joins):
    bucketing happens on the microsecond epoch and ``bucket_width`` is in
    SECONDS.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how: {how}")
    clash = set(points.columns) & set(intervals.columns)
    if clash:
        raise ValueError(f"overlapping column names across sides: {sorted(clash)}")
    w = float(bucket_width)

    # timestamp intervals are the common case (events ↔ validity windows):
    # bucket on microsecond epochs, bucket_width stays in SECONDS
    from pyspark.sql import types as T

    def _num(side, c):
        if isinstance(side.schema[c].dataType, (T.TimestampType, T.TimestampNTZType)):
            return F.unix_micros(F.col(c)).cast("double") / F.lit(1e6)
        return F.col(c)

    p = points.withColumn("__rb_p", F.floor(_num(points, point_col) / F.lit(w)).cast("long"))
    # covering buckets floor(lo/w)..floor(hi/w): the last bucket is a
    # (filtered) false candidate when hi lands exactly on a boundary —
    # cheaper than an epsilon dance, and robust for float bounds. Malformed
    # intervals (hi <= lo) get no buckets (sequence would otherwise emit a
    # DESCENDING range).
    lo_n, hi_n = _num(intervals, lo_col), _num(intervals, hi_col)
    spans = F.when(
        F.col(hi_col) > F.col(lo_col),
        F.sequence(
            F.floor(lo_n / F.lit(w)).cast("long"),
            F.floor(hi_n / F.lit(w)).cast("long"),
        ),
    ).otherwise(F.array().cast("array<long>"))
    iv = intervals.withColumn("__rb_i", F.explode(spans))
    cond = (
        (p["__rb_p"] == iv["__rb_i"])
        & (p[point_col] >= iv[lo_col])
        & (p[point_col] < iv[hi_col])
    )
    return p.join(iv, cond, how).drop("__rb_p", "__rb_i")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_lo: str,
    left_hi: str,
    right_lo: str,
    right_hi: str,
    bucket_width: float,
) -> DataFrame:
    """Inner join of interval pairs that OVERLAP: ``l.lo < r.hi AND
    r.lo < l.hi`` (closed-open intervals; touching intervals don't
    overlap). The interval×interval generalization of ``range_join``.

    Both sides explode into their covering buckets; a pair that overlaps
    shares at least one bucket, so the bucket equi-join bounds the
    candidates, the exact predicate filters residually, and a distinct on
    the joined rows collapses multi-bucket matches. Replication is
    ``~span/width`` per row on each side. Column names must not overlap
    across sides; empty intervals (hi <= lo) match nothing.
    """
    clash = set(left.columns) & set(right.columns)
    if clash:
        raise ValueError(f"overlapping column names across sides: {sorted(clash)}")
    w = float(bucket_width)

    def _explode(df, lo, hi, bname):
        from pyspark.sql import types as T

        def _num(c):
            if isinstance(df.schema[c].dataType, (T.TimestampType, T.TimestampNTZType)):
                return F.unix_micros(F.col(c)).cast("double") / F.lit(1e6)
            return F.col(c)

        spans = F.when(
            F.col(hi) > F.col(lo),
            F.sequence(
                F.floor(_num(lo) / F.lit(w)).cast("long"),
                F.floor(_num(hi) / F.lit(w)).cast("long"),
            ),
        ).otherwise(F.array().cast("array<long>"))
        return df.withColumn(bname, F.explode(spans))

    a = _explode(left, left_lo, left_hi, "__ob_l")
    b = _explode(right, right_lo, right_hi, "__ob_r")
    cond = (
        (a["__ob_l"] == b["__ob_r"])
        & (a[left_lo] < b[right_hi])
        & (b[right_lo] < a[left_hi])
    )
    return a.join(b, cond, "inner").drop("__ob_l", "__ob_r").distinct()
