"""Time-weighted averages — the TWAP shape.

The canonical financial/ops aggregate the plain mean gets wrong: each
observation holds until the next one, so its weight is its holding
duration, not 1. (This is exactly Uniswap's TWAP-oracle semantics over a
tick/price series — reference `getPriceSeries` resamples to a grid, this
op integrates the raw event series directly.)

One shuffle: a per-key lead window supplies each row's holding duration,
then a hash aggregate folds the weighted sums. For cross-engine
exactness the integration runs in integer space — duration in micros
(int64) times the value in fixed-point cents (int64) — with ONE float
division at the end; double summation order never matters because there
is none.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def time_weighted_avg(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    by: list[str],
    decimals: int = 2,
    out: str = "twa",
) -> DataFrame:
    """Per ``by`` key: the time-weighted average of ``value_col`` over
    [first event, last event], each value held until the next event.

    ``decimals`` fixes the value's fixed-point resolution (cents by
    default): values are rounded to that precision for integration —
    the portability contract, not a loss of information for
    currency-like inputs. Keys with a single event (zero total duration)
    return NULL. Output: (by..., ``out``, total_duration_us, n_obs).
    """
    scale = 10 ** decimals
    t = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(*by).orderBy(F.col("__t"))
    stepped = df.select(
        *by,
        t.alias("__t"),
        F.round(F.col(value_col) * scale).cast("long").alias("__v"),
    ).withColumn("__dur", F.lead("__t").over(w) - F.col("__t"))
    agg = stepped.groupBy(*by).agg(
        F.sum(F.col("__dur") * F.col("__v")).alias("__wsum"),
        F.sum("__dur").alias("total_duration_us"),
        F.count(F.lit(1)).alias("n_obs"),
    )
    return agg.withColumn(
        out,
        F.when(
            F.col("total_duration_us") > 0,
            F.col("__wsum").cast("double")
            / F.col("total_duration_us")
            / F.lit(float(scale)),
        ),
    ).drop("__wsum")
