"""Hypertable rollup — multi-resolution time-bucket aggregates (the
continuous-aggregate / materialized-rollup shape of time-series stores).

Two strategies, both cartesian-free and single-raw-scan:

- ``grouping_sets`` (default, for one-shot queries): every resolution's
  bucket is a derived column; ONE aggregation over GROUPING SETS computes
  all levels — one scan, one shuffle (Expand multiplies pre-agg rows ×k,
  map-side partial aggregation collapses them to ~k·|buckets| before the
  exchange). The plan is pinned single-scan/single-shuffle in
  tests/test_plans.py.
- ``hierarchical`` (for materialized pipelines): the finest resolution
  aggregates the raw events; each coarser level re-aggregates the
  PREVIOUS level's (already materialized) bucket rows — the incremental
  backfill path of a streaming rollup, where the finest level is what a
  watermarked streaming ``resample`` emits and each coarser table is a
  tiny re-agg of the finer one, never a second scan of 100 TB of raw
  events. Requires re-aggregable aggregates (sum/count/min/max; averages
  derive as sum/count at read time). Within a single lazy plan Spark
  may recompute the finest subtree per level — use this strategy when
  levels are written out (its operational context), ``grouping_sets``
  when they are consumed in one query.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .resample import duration_to_interval

_SECONDS = {"seconds": 1, "minutes": 60, "hours": 3600, "days": 86400, "weeks": 604800}


def _interval_seconds(every: str) -> int:
    n, unit = duration_to_interval(every).split()
    return int(n) * _SECONDS[unit]


def hypertable_rollup(
    df: DataFrame,
    ts_col: str,
    everies: list[str],
    aggs: dict[str, tuple[Column, str]],
    by: list[str] | None = None,
    bucket_alias: str = "bucket_ts",
    strategy: str = "grouping_sets",
) -> DataFrame:
    """Tumbling-bucket aggregates at every resolution in ``everies``.

    ``everies``: resolutions fine→coarse ("1h", "6h", "1d"); each width
    must be an integer multiple of the previous (coarser buckets are exact
    unions of finer — required for ``hierarchical``, enforced for both so
    the strategies are interchangeable).
    ``aggs``: {out_col: (agg_over_raw_rows, reagg_fn_name)} with
    reagg_fn_name ∈ {"sum", "min", "max"} (counts re-aggregate with
    "sum"); the re-agg is only exercised by ``hierarchical``.
    Buckets are epoch-aligned closed-left (same grid as ``resample``).
    Rows with a NULL timestamp are dropped (no bucket).
    Output: (resolution, ``by``..., ``bucket_alias``, *aggs).
    """
    by = list(by or [])
    secs = [_interval_seconds(e) for e in everies]
    if sorted(secs) != secs or len(set(secs)) != len(secs):
        raise ValueError(f"everies must be strictly fine-to-coarse: {everies}")
    for prev_s, s in zip(secs, secs[1:]):
        if s % prev_s != 0:
            raise ValueError(
                "each width must be an integer multiple of the previous "
                f"(coarser buckets must be exact unions of finer): {everies}"
            )
    reagg = {"sum": F.sum, "min": F.min, "max": F.max}
    for name, (_, fn) in aggs.items():
        if fn not in reagg:
            raise ValueError(f"agg {name!r}: re-aggregation {fn!r} not in {list(reagg)}")
    if strategy == "grouping_sets":
        return _rollup_grouping_sets(df, ts_col, everies, secs, aggs, by, bucket_alias)
    if strategy == "hierarchical":
        return _rollup_hierarchical(df, ts_col, everies, secs, aggs, by, bucket_alias)
    raise ValueError(f"unknown strategy: {strategy}")


def _bucket(ts_col: str, s: int) -> Column:
    # epoch floor; unix_timestamp truncates sub-second digits, which cannot
    # change bucket membership for whole-second widths on an aligned grid
    return F.timestamp_seconds(
        F.floor(F.unix_timestamp(F.col(ts_col)) / F.lit(s)) * F.lit(s)
    )


def _rollup_grouping_sets(df, ts_col, everies, secs, aggs, by, bucket_alias):
    bnames = [f"__b_{i}" for i in range(len(everies))]
    buckets = {n: _bucket(ts_col, s) for n, s in zip(bnames, secs)}
    base = df.filter(F.col(ts_col).isNotNull()).withColumns(buckets)
    gsets = [[*(F.col(c) for c in by), F.col(n)] for n in bnames]
    gcols = [*(F.col(c) for c in by), *(F.col(n) for n in bnames)]
    # grouping(col) = 0 iff the column is in the active set — the exact
    # level tag (only legal inside the grouping-sets agg itself)
    agged = base.groupingSets(gsets, *gcols).agg(
        *[expr.alias(name) for name, (expr, _) in aggs.items()],
        *[F.grouping(F.col(n)).alias(f"__g{i}") for i, n in enumerate(bnames)],
    )
    resolution = F.when(F.col("__g0") == 0, F.lit(everies[0]))
    for i, e in enumerate(everies[1:], start=1):
        resolution = resolution.when(F.col(f"__g{i}") == 0, F.lit(e))
    bucket = F.coalesce(*[F.col(n) for n in bnames])
    return agged.select(
        resolution.alias("resolution"),
        *by,
        bucket.alias(bucket_alias),
        *aggs,
    )


def _rollup_hierarchical(df, ts_col, everies, secs, aggs, by, bucket_alias):
    finest = (
        df.filter(F.col(ts_col).isNotNull())
        .groupBy(*by, _bucket(ts_col, secs[0]).alias(bucket_alias))
        .agg(*[expr.alias(name) for name, (expr, _) in aggs.items()])
    )
    reagg = {"sum": F.sum, "min": F.min, "max": F.max}
    levels = [finest.withColumn("resolution", F.lit(everies[0]))]
    prev = finest
    for every, s in zip(everies[1:], secs[1:]):
        cur = (
            prev.groupBy(*by, _bucket(bucket_alias, s).alias("__b"))
            .agg(*[reagg[fn](F.col(name)).alias(name) for name, (_, fn) in aggs.items()])
            .withColumnRenamed("__b", bucket_alias)
        )
        levels.append(cur.withColumn("resolution", F.lit(every)))
        prev = cur
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out.select("resolution", *by, bucket_alias, *aggs)
