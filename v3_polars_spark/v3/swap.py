"""Swap-frame precompute and swapIn simulation.

Reference: v3/helpers/pool_helpers.py:63-131 (createSwapDF) and
v3/helpers/swap.py:41-212 (swapIn). Spark shape: the swap frame is a
DataFrame pipeline (lead window + column math) over the liquidity
distribution; it is O(#initialized ticks), so the branch logic collects it
once and runs driver-side scalar kernels — the correct Spark idiom per
SURVEY.md §3.2. Branch B's tick-crossing is the vectorized prefix-sum +
first-covering plan, computed on the collected frame with numpy-free pure
Python (frames are 10²-10⁴ rows; no JVM round-trips in the hot loop).
"""

from __future__ import annotations

import bisect
from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import swap_math as sm
from .liquidity import liquidity_distribution


@dataclass
class InRangeValues:
    """The 7-tuple the reference caches (v3/helpers/pool_helpers.py:119-131)."""

    sqrt_p: float
    in_range0: float
    in_range_to_swap0: float
    in_range1: float
    in_range_to_swap1: float
    liquidity: float
    tick: int


def swap_frame(
    liq: DataFrame,
    tick_spacing: int,
    max_tick: int = sm.MAX_TICK,
    min_liquidity: float = 0.0,
) -> DataFrame:
    """Per-tick-range tradable amounts from a liquidity distribution
    (reference v3/helpers/pool_helpers.py:80-94).

    filter liquidity > min_liquidity (numerical-error guard; the reference
    uses 0 — the telescoped top tick is ±epsilon, so cross-engine
    comparisons pass a positive threshold instead) -> lead(tick) with the
    last range capped at (MAX_TICK//ts)*ts -> p = 1.0001^(t/2) -> x/y
    tradable in each range. All whole-stage-codegen column math; the only
    window is the lead.
    """
    cap = (max_tick // tick_spacing) * tick_spacing
    w = Window.orderBy(F.col("tick").asc())
    df = (
        liq.filter(F.col("liquidity") > min_liquidity)
        .withColumn("tick_a", F.col("tick"))
        .withColumn("tick_b", F.coalesce(F.lead("tick", 1).over(w), F.lit(cap)))
        .select("liquidity", "tick_a", "tick_b")
        .withColumn("p_a", F.pow(F.lit(1.0001), F.col("tick_a") / F.lit(2.0)))
        .withColumn("p_b", F.pow(F.lit(1.0001), F.col("tick_b") / F.lit(2.0)))
        .withColumn("yInTick", F.col("liquidity") * (F.col("p_b") - F.col("p_a")))
        .withColumn(
            "xInTick",
            F.col("liquidity")
            * ((F.col("p_b") - F.col("p_a")) / (F.col("p_b") * F.col("p_a"))),
        )
    )
    return df


def in_range_values(
    swap_df_rows: list[dict], price_x96: float, tick_spacing: int
) -> InRangeValues:
    """Locate the in-range row and precompute in-range capacities
    (reference v3/helpers/pool_helpers.py:96-117)."""
    tick_floor = sm.price_x96_to_tick_floor(price_x96, tick_spacing)
    hits = [r for r in swap_df_rows if r["tick_a"] <= tick_floor < r["tick_b"]]
    if len(hits) != 1:
        raise ValueError(f"Missing/Duplicate in-range tick - Size of {len(hits)}")
    row = hits[0]
    sqrt_p = price_x96 / sm.Q96
    p_a, p_b, liquidity, tick = row["p_a"], row["p_b"], row["liquidity"], row["tick_a"]
    return InRangeValues(
        sqrt_p=sqrt_p,
        in_range0=sm.get_amount0_delta(p_a, sqrt_p, liquidity),
        in_range_to_swap0=sm.get_amount1_delta(p_a, sqrt_p, liquidity),
        in_range1=sm.get_amount1_delta(p_b, sqrt_p, liquidity),
        in_range_to_swap1=sm.get_amount0_delta(p_b, sqrt_p, liquidity),
        liquidity=liquidity,
        tick=tick,
    )


def swap_in(
    swap_df_rows: list[dict],
    irv: InRangeValues,
    token_in_is_token1: bool,
    amount_in: float,
    fee_ppm: int,
    fees: bool = False,
):
    """Simulate a swap (reference v3/helpers/swap.py:41-212).

    Branch A (within current tick): pure scalar math. Branch B (cross
    ticks): direction-sorted prefix sums of per-tick tradable amounts, first
    tick whose cumulative depth covers the trade, scalar kernel for the
    partial final tick. Returns (amt_out, (sqrt_price_last, sqrt_p, fee_dict)).

    Note: the reference's `findMax` flag is a no-op (immediately overwritten,
    v3/helpers/swap.py:99-102, SURVEY.md §8.1 Q2) — not implemented.
    """
    assert amount_in != 0, "We do not support swaps of 0"
    zero_for_one = not token_in_is_token1
    asset_in, asset_out = ("x", "y") if zero_for_one else ("y", "x")
    fee_dict: dict = {}

    in_range_test, in_range_to_swap = (
        (irv.in_range0, irv.in_range_to_swap0)
        if zero_for_one
        else (irv.in_range1, irv.in_range_to_swap1)
    )
    fee_frac = fee_ppm / 1e6
    swap_in_minus_fee = amount_in * (1 - fee_frac)

    if in_range_test > swap_in_minus_fee:
        # Branch A — enough liquidity in the current tick
        liquidity = irv.liquidity
        if not zero_for_one:
            sqrt_price_last = sm.get_next_price_amount1(
                irv.sqrt_p, liquidity, swap_in_minus_fee, zero_for_one
            )
            amt_out = sm.get_amount0_delta(sqrt_price_last, irv.sqrt_p, liquidity)
        else:
            sqrt_price_last = sm.get_next_price_amount0(
                irv.sqrt_p, liquidity, swap_in_minus_fee, zero_for_one
            )
            amt_out = sm.get_amount1_delta(sqrt_price_last, irv.sqrt_p, liquidity)
        if fees:
            fee_dict[irv.tick] = (amount_in * fee_frac, liquidity)
        return amt_out, (sqrt_price_last, irv.sqrt_p, fee_dict)

    # Branch B — cross ticks (vectorized precompute, reference swap.py:125-168)
    left_to_swap = amount_in - in_range_test
    left_to_swap_minus_fee = left_to_swap * (1 - fee_frac)
    if fees:
        fee_dict[irv.tick] = (in_range_test * fee_frac, irv.liquidity)

    if zero_for_one:
        oor = [r for r in swap_df_rows if r["tick_a"] < irv.tick]
        oor.sort(key=lambda r: r["tick_a"], reverse=True)
    else:
        oor = [r for r in swap_df_rows if r["tick_a"] > irv.tick]
        oor.sort(key=lambda r: r["tick_a"])

    cum_key = "xInTick" if zero_for_one else "yInTick"
    cums, run = [], 0.0
    for r in oor:
        run += r[cum_key]
        cums.append(run)
    max_amount_out = cums[-1] if cums else 0.0
    assert max_amount_out > left_to_swap, "Not enough liquidity in pool"

    # first covering tick: cums is nondecreasing -> bisect
    idx = bisect.bisect_left(cums, left_to_swap_minus_fee)
    liquid_row = oor[idx]
    previous = oor[:idx]

    sqrt_p_last_top, sqrt_p_last_bottom = liquid_row["p_b"], liquid_row["p_a"]
    liquidity = liquid_row["liquidity"]

    prev_in = sum(r[f"{asset_in}InTick"] for r in previous)
    prev_out = sum(r[f"{asset_out}InTick"] for r in previous)
    amt_in_to_swap_left = left_to_swap - prev_in
    amt_in_swapped_left_minus_fee = amt_in_to_swap_left * (1 - fee_frac)
    amt_out_prev_ticks = in_range_to_swap + prev_out

    if fees:
        for r in previous:
            fee_dict[r["tick_a"]] = (r[f"{asset_in}InTick"] * fee_frac, r["liquidity"])
        fee_dict[liquid_row["tick_a"]] = (amt_in_to_swap_left * fee_frac, liquidity)

    amt_out_last_tick, sqrt_price_last = sm.final_amt_out_from_tick(
        zero_for_one,
        sqrt_p_last_top,
        sqrt_p_last_bottom,
        amt_in_swapped_left_minus_fee,
        liquidity,
    )
    return amt_out_last_tick + amt_out_prev_ticks, (sqrt_price_last, irv.sqrt_p, fee_dict)
