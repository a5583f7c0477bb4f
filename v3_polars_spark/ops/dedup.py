"""Deterministic dedup-last — L1 op A2 (SURVEY.md §2.4).

The reference collapses same-timestamp rows with
``sort(ts).group_by(ts).last()`` (v3/helpers/pool_helpers.py:144-146), whose
tie-break is file order — nondeterministic under a distributed scan
(SURVEY.md §8.1 Q3). This op requires an explicit total-order tiebreak
(``block_number, transaction_index, log_index`` for event tables) and is a
single map-side-combinable hash aggregation — ONE shuffle on the group keys,
no window sort, no row_number pass. ``max_by`` over a struct gives
last-in-order in a single agg expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_last(
    df: DataFrame,
    keys: list[str],
    order: list[str],
    value_cols: list[str] | None = None,
) -> DataFrame:
    """Latest row per ``keys`` under the total order ``order``.

    Implemented as ``groupBy(keys).agg(max_by(struct(values), struct(order)))``
    — an ordinary hash aggregate (partial agg on the map side, one shuffle),
    strictly cheaper at scale than the window-row_number formulation which
    must sort every partition's full rowset.
    """
    value_cols = value_cols or [c for c in df.columns if c not in keys]
    ord_struct = F.struct(*[F.col(c) for c in order])
    packed = df.groupBy(*keys).agg(
        F.max_by(F.struct(*[F.col(c) for c in value_cols]), ord_struct).alias("__v")
    )
    return packed.select(*keys, *[F.col(f"__v.{c}").alias(c) for c in value_cols])


def dedup_first(
    df: DataFrame,
    keys: list[str],
    order: list[str],
    value_cols: list[str] | None = None,
) -> DataFrame:
    """Earliest row per ``keys`` — same plan shape with ``min_by``."""
    value_cols = value_cols or [c for c in df.columns if c not in keys]
    ord_struct = F.struct(*[F.col(c) for c in order])
    packed = df.groupBy(*keys).agg(
        F.min_by(F.struct(*[F.col(c) for c in value_cols]), ord_struct).alias("__v")
    )
    return packed.select(*keys, *[F.col(f"__v.{c}").alias(c) for c in value_cols])
