"""Upsample — densify a (possibly per-group) time-bucket series onto its
full regular grid, so gaps become explicit rows (NULL-filled or
forward-filled). The complement of ``resample``: the reference's price
series gets density implicitly by as-of-joining against chain-wide block
buckets (reference v3/helpers/pool_helpers.py:136-151 + :202); this op is
the standalone form for any bucketed series.

Plan shape: per-group min/max aggregate (map-side combinable) →
``F.sequence`` explode of the grid (rows ∝ buckets, never a cartesian) →
left join of the observed rows (equi on group+bucket; the grid side is
usually the small one and broadcasts) → optional ``ffill``. Everything is
partitioned by the group keys; no single-task stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .resample import duration_to_interval
from .windows import ffill as _ffill


def upsample(
    df: DataFrame,
    ts_col: str,
    every: str,
    by: list[str] | None = None,
    fill: list[str] | None = None,
) -> DataFrame:
    """Densify ``df`` (one row per existing bucket) to every ``every``-wide
    bucket between each group's min and max ``ts_col``.

    ``fill`` names value columns to forward-fill across the introduced
    gap rows (others stay NULL there). ``ts_col`` values must lie on the
    bucket grid (e.g. the output of ``resample``)."""
    by = list(by or [])
    interval = duration_to_interval(every)
    bounds = df.groupBy(*by).agg(
        F.min(ts_col).alias("__lo"), F.max(ts_col).alias("__hi")
    )
    grid = bounds.select(
        *by,
        F.explode(
            F.sequence(
                F.col("__lo"), F.col("__hi"), F.expr(f"INTERVAL {interval}")
            )
        ).alias(ts_col),
    )
    dense = grid.join(df, by + [ts_col], "left")
    if fill:
        dense = _ffill(dense, fill, order=[ts_col], by=by)
    return dense
