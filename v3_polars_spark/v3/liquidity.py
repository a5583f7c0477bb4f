"""Liquidity distribution (createLiq) — the flagship composite pipeline:
group-sums (A1) -> coalescing full-outer join (J1) -> ordered prefix sum
(W1). Reference: v3/helpers/swap_math.py:25-71.

Spark-first plan shape:
  - the two group-sums are hash aggregates with map-side partial agg;
  - the outer join is key-coalescing (USING join) on `tick`;
  - the prefix sum is a window — partitioned by pool/chain when computing
    distributions for MANY pools at once (`liquidity_distribution_multi`),
    which is how this runs at 100 TB: one shuffle per agg, one window,
    all stages parallel across pools. The single-pool variant keeps the
    unpartitioned window (the frame is O(#initialized ticks) ≈ 10²-10⁴ rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _signed_liq(mb: DataFrame, as_of: float | None) -> DataFrame:
    df = mb
    if as_of is not None:
        # strict < : "value before the transaction at that index" (SURVEY §8.2)
        df = df.filter(F.col("as_of") < F.lit(float(as_of)))
    return df


def liquidity_distribution(mb: DataFrame, as_of: float | None = None) -> DataFrame:
    """(tick, liquidity) distribution as of ``as_of`` for a single pool's
    mint/burn frame (columns: amount double, type_of_event double,
    tick_lower/upper long, as_of double).

    1. +amount*type_of_event grouped on tick_lower  (liquidity added at lower)
    2. -amount*type_of_event grouped on tick_upper  (removed at upper)
    3. full-outer coalescing join on tick, fill 0, add
    4. sort by tick, prefix sum
    (reference v3/helpers/swap_math.py:36-69)
    """
    base = _signed_liq(mb, as_of)
    tl = (
        base.withColumn("liquidity_lower", F.col("amount") * F.col("type_of_event"))
        .groupBy(F.col("tick_lower").alias("tick"))
        .agg(F.sum("liquidity_lower").alias("liquidity_lower"))
        .filter(F.col("liquidity_lower") != 0)
    )
    tu = (
        base.withColumn("liquidity_upper", -(F.col("amount") * F.col("type_of_event")))
        .groupBy(F.col("tick_upper").alias("tick"))
        .agg(F.sum("liquidity_upper").alias("liquidity_upper"))
        .filter(F.col("liquidity_upper") != 0)
    )
    joined = (
        tl.join(tu, "tick", "full_outer")
        .na.fill(0, subset=["liquidity_lower", "liquidity_upper"])
        .withColumn("delta", F.col("liquidity_lower") + F.col("liquidity_upper"))
    )
    w = (
        Window.orderBy(F.col("tick").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "tick", F.sum("delta").over(w).alias("liquidity")
    )


def liquidity_distribution_multi(
    mb: DataFrame, as_of: float | None = None, by: list[str] = ("chain_name", "address")
) -> DataFrame:
    """Same semantics, computed for EVERY pool in one distributed plan —
    the scale path. All shuffles key on (pool keys, tick); the prefix-sum
    window partitions by pool, so no single-task stage exists."""
    by = list(by)
    base = _signed_liq(mb, as_of)
    tl = (
        base.withColumn("d", F.col("amount") * F.col("type_of_event"))
        .groupBy(*by, F.col("tick_lower").alias("tick"))
        .agg(F.sum("d").alias("liquidity_lower"))
        .filter(F.col("liquidity_lower") != 0)
    )
    tu = (
        base.withColumn("d", -(F.col("amount") * F.col("type_of_event")))
        .groupBy(*by, F.col("tick_upper").alias("tick"))
        .agg(F.sum("d").alias("liquidity_upper"))
        .filter(F.col("liquidity_upper") != 0)
    )
    joined = (
        tl.join(tu, by + ["tick"], "full_outer")
        .na.fill(0, subset=["liquidity_lower", "liquidity_upper"])
        .withColumn("delta", F.col("liquidity_lower") + F.col("liquidity_upper"))
    )
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col("tick").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(*by, "tick", F.sum("delta").over(w).alias("liquidity"))
