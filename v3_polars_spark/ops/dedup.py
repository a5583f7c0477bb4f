"""Deterministic dedup-last — L1 op A2 (SURVEY.md §2.4).

The reference collapses same-timestamp rows with
``sort(ts).group_by(ts).last()`` (v3/helpers/pool_helpers.py:144-146), whose
tie-break is file order — nondeterministic under a distributed scan
(SURVEY.md §8.1 Q3). This op requires an explicit total-order tiebreak
(``block_number, transaction_index, log_index`` for event tables) and is a
single map-side-combinable hash aggregation — ONE shuffle on the group keys,
no window sort, no row_number pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _orderable(dt) -> bool:
    """True if Spark can ORDER BY this type (maps cannot; arrays/structs
    are orderable iff their element/field types are)."""
    if isinstance(dt, T.MapType):
        return False
    if isinstance(dt, T.ArrayType):
        return _orderable(dt.elementType)
    if isinstance(dt, T.StructType):
        return all(_orderable(f.dataType) for f in dt.fields)
    return True


def _dedup(df, keys, order, value_cols, agg_fn, by_fn):
    value_cols = value_cols or [c for c in df.columns if c not in keys]
    dtypes = {f.name: f.dataType for f in df.schema.fields}
    packed = order + [c for c in value_cols if c not in order]
    if len(packed) == 1 and _orderable(dtypes[packed[0]]) and not isinstance(
        dtypes[packed[0]], (T.ArrayType, T.StructType)
    ):
        # single packed column: max/min of the bare column is the same row
        # selection as max/min of a 1-field struct, but keeps the aggregate
        # HASH-aggregable — a 1-field-struct buffer forces SortAggregate
        # (two full sorts of the fact table at scale; post-change plan on
        # the 10 M-row series_pipeline shape: 4 HashAggregates, zero sorts —
        # BENCH_NOTES r6 parallelism-curve audit).
        #
        # NULL note: min/max of a bare column SKIPS nulls (same as
        # min_by/max_by), while min/max of a struct orders a NULL field
        # FIRST — so this path and the struct path below can pick different
        # rows when the order column contains NULLs. The op's determinism
        # contract already requires the order tuple to be a total order per
        # key, which NULLs break; callers must supply non-null order
        # columns (see the docstrings).
        c = packed[0]
        agged = df.groupBy(*keys).agg(agg_fn(F.col(c)).alias(c))
        return agged.select(*keys, *[F.col(c).alias(v) for v in value_cols])
    if all(_orderable(dtypes[c]) for c in packed):
        # min/max over a struct whose leading fields are the order columns:
        # selects the same row as min_by/max_by when the order tuple is
        # unique per key (the op's determinism contract), and — unlike
        # min_by/max_by — is duplicate-agnostic, so Catalyst's
        # RemoveRedundantAggregates can collapse an upstream DISTINCT on
        # (keys ∪ packed) into this aggregate (one exchange instead of two
        # in the reference's unique→last pipeline shape,
        # pool_helpers.py:143-146).
        agged = df.groupBy(*keys).agg(
            agg_fn(F.struct(*[F.col(c) for c in packed])).alias("__v")
        )
    else:
        # unorderable payload types (maps): order only by the order tuple
        ord_struct = F.struct(*[F.col(c) for c in order])
        agged = df.groupBy(*keys).agg(
            by_fn(F.struct(*[F.col(c) for c in packed]), ord_struct).alias("__v")
        )
    return agged.select(*keys, *[F.col(f"__v.{c}").alias(c) for c in value_cols])


def dedup_last(
    df: DataFrame,
    keys: list[str],
    order: list[str],
    value_cols: list[str] | None = None,
) -> DataFrame:
    """Latest row per ``keys`` under the total order ``order``.

    An ordinary hash/sort aggregate (partial agg on the map side, one
    shuffle) — strictly cheaper at scale than the window-row_number
    formulation which must sort every partition's full rowset.

    Contract: ``order`` columns must be NON-NULL — the op's determinism
    guarantee requires the order tuple to totally order rows within a key,
    and NULLs break totality (they also make the single-column fast path
    NULL-skipping where the struct path is NULLs-first).
    """
    return _dedup(df, keys, order, value_cols, F.max, F.max_by)


def dedup_first(
    df: DataFrame,
    keys: list[str],
    order: list[str],
    value_cols: list[str] | None = None,
) -> DataFrame:
    """Earliest row per ``keys`` — same plan shape with ``min``/``min_by``."""
    return _dedup(df, keys, order, value_cols, F.min, F.min_by)
