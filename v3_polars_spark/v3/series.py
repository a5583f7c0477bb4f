"""Price series and datetime→block helpers.

Reference: v3/helpers/pool_helpers.py:134-204 (getPriceSeries),
v3/helpers/pool_helpers.py:44-60 (dtToBN). Composite pipeline:
distinct (A7) -> deterministic dedup-last (A2) -> tumbling-bucket agg (A3,
with median gas A6) -> forward fill (W3) -> as-of join (J2).

Parity notes:
- `bn_series` is CHAIN-wide (not pool-filtered) while `tick_series` is
  pool-filtered — intentional reference asymmetry (SURVEY.md §8.1 Q4): block
  numbers advance chain-wide even in buckets where the pool didn't trade;
  the as-of join backfills the tick.
- the reference's group_by(ts).last() tie-break is file order
  (nondeterministic); we pin (block_number, transaction_index, log_index)
  (SURVEY.md §8.1 Q3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..ops import asof_join, dedup_last, ffill, resample

_TIEBREAK = ["block_number", "transaction_index", "log_index"]


def bn_series(swaps: DataFrame, start_time, every: str) -> DataFrame:
    """Latest block number per time bucket (reference pool_helpers.py:136-151).
    Input: chain-filtered swaps (NOT pool-filtered — Q4)."""
    df = (
        swaps.filter(F.col("block_timestamp") >= F.lit(start_time))
        .select("block_timestamp", "block_number")
        .distinct()
    )
    df = dedup_last(df, keys=["block_timestamp"], order=["block_number"])
    return resample(
        df,
        "block_timestamp",
        every,
        [F.max("block_number").alias("block_number")],
    )


def tick_series(swaps: DataFrame, start_time, every: str, gas: bool = False) -> DataFrame:
    """Last tick (and median gas) per time bucket for ONE pool
    (reference pool_helpers.py:153-201). Caller pre-filters chain+address."""
    cols = ["block_timestamp", "tick"] + (["gas_price", "gas_used"] if gas else [])
    df = (
        swaps.filter(F.col("block_timestamp") >= F.lit(start_time))
        .select(*cols, *_TIEBREAK)
        .withColumn("tick", F.col("tick").cast("long"))
    )
    if gas:
        df = df.withColumn("gas_price", F.col("gas_price").cast("double")).withColumn(
            "gas_used", F.col("gas_used").cast("double")
        )
    df = dedup_last(df, keys=["block_timestamp"], order=_TIEBREAK)

    # "last tick in bucket" needs an order — max_by over the tiebreak
    ord_struct = F.struct(*[F.col(c) for c in _TIEBREAK])
    aggs = [F.max_by(F.col("tick"), ord_struct).alias("tick")]
    if gas:
        aggs += [
            F.percentile(F.col("gas_price"), F.lit(0.5)).alias("gas_price"),
            F.percentile(F.col("gas_used"), F.lit(0.5)).alias("gas_used"),
        ]
    out = resample(df, "block_timestamp", every, aggs)
    if gas:
        out = ffill(out, ["gas_price", "gas_used", "tick"], order=["bucket_ts"])
    return out


def price_series(
    chain_swaps: DataFrame,
    pool_swaps: DataFrame,
    start_time,
    every: str = "6h",
    gas: bool = False,
) -> DataFrame:
    """bn_series ⟕asof tick_series on the bucket timestamp
    (reference pool_helpers.py:202-204). Output columns:
    (block_timestamp, block_number, tick[, gas_price, gas_used])."""
    bn = bn_series(chain_swaps, start_time, every).withColumnRenamed(
        "bucket_ts", "block_timestamp"
    )
    tk = tick_series(pool_swaps, start_time, every, gas=gas).withColumnRenamed(
        "bucket_ts", "block_timestamp"
    )
    return asof_join(bn, tk, on="block_timestamp")


def bn_at_date(swaps: DataFrame, dt) -> int | None:
    """Max block number at/after a datetime (reference pool_helpers.py:44-60
    — filter ts >= dt, max(block_number))."""
    row = (
        swaps.filter(F.col("block_timestamp") >= F.lit(dt))
        .agg(F.max("block_number").alias("bn"))
        .first()
    )
    return row["bn"] if row else None


def tick_to_price(tick_col, decimal_adjustment: float = 1.0, invert: bool = False):
    """Price-space conversion: 1.0001^tick scaled by the token decimal
    adjustment (reference notebook Crosschain_Liquidity_GIF.ipynb cell 12:
    ``1.0001 ** tick * 1e12`` for the USDC/WETH pools; ``invert`` flips to
    the token1/token0 quote). Pure column math — composes into any plan."""
    p = F.pow(F.lit(1.0001), tick_col) * F.lit(float(decimal_adjustment))
    return (F.lit(1.0) / p) if invert else p


def liquidity_price_frames(
    mb: DataFrame,
    frames: list[float],
    decimal_adjustment: float = 1.0,
    invert: bool = False,
) -> DataFrame:
    """The notebook's animation pipeline ending in PRICE space: multi-frame
    liquidity distributions (one plan, no per-frame re-scan) with each tick
    converted to a price and liquidity normalized to the frame max — the
    exact frame data cell 12 plots. Output: (frame_as_of, tick, price,
    liquidity, liquidity_norm)."""
    from pyspark.sql import Window

    from .liquidity import liquidity_timeline

    tl = liquidity_timeline(mb, frames)
    w = Window.partitionBy("frame_as_of")
    return tl.withColumn(
        "price", tick_to_price(F.col("tick"), decimal_adjustment, invert)
    ).withColumn("liquidity_norm", F.col("liquidity") / F.max("liquidity").over(w))


def tick_twap(
    swaps: DataFrame,
    start_time,
    end_time,
) -> DataFrame:
    """Uniswap-oracle-semantics TWAP over the swap series: the
    time-weighted average TICK between ``start_time`` and ``end_time``
    (each swap's tick holds until the next swap), then price =
    1.0001^avg_tick — the geometric-mean price, exactly what the
    on-chain observations oracle accumulates (tickCumulative deltas).

    Caller pre-filters chain+address (same contract as tick_series).
    Integration is integer micros x integer tick — exact — with one
    float division and one pow at the end. Returns a 1-row frame
    (avg_tick, twap_price, total_duration_us, n_swaps); empty/singleton
    windows return NULL metrics.
    """
    from ..ops import time_weighted_avg

    df = (
        swaps.filter(
            (F.col("block_timestamp") >= F.lit(start_time))
            & (F.col("block_timestamp") < F.lit(end_time))
        )
        .select("block_timestamp", "tick", *_TIEBREAK)
        .withColumn("tick", F.col("tick").cast("long"))
    )
    # one event per timestamp: last swap wins (same pin as tick_series)
    df = dedup_last(df, keys=["block_timestamp"], order=_TIEBREAK)
    twa = time_weighted_avg(
        df.withColumn("__one", F.lit(1)),
        "block_timestamp",
        "tick",
        by=["__one"],
        decimals=0,  # ticks are integers: exact at scale 1
        out="avg_tick",
    )
    return twa.select(
        "avg_tick",
        F.pow(F.lit(1.0001), F.col("avg_tick")).alias("twap_price"),
        "total_duration_us",
        F.col("n_obs").alias("n_swaps"),
    )
