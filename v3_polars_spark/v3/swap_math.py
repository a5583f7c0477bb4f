"""Uniswap v3 scalar math kernels (driver-side Python) and column variants.

Semantics follow the reference's float64 approximation of the Solidity
fixed-point math (reference v3/helpers/swap_math.py:7-22,74-153, which cites
Uniswap/v3-core SqrtPriceMath.sol / SwapMath.sol). These are deliberately
driver-side scalars: in the reference every call operates on values already
extracted from O(#ticks) frames (SURVEY.md §2.9), and the same holds here —
they never appear inside a per-row distributed path. For batched simulation
over many swaps, `swap.py` vectorizes the same formulas as column
expressions.
"""

from __future__ import annotations

import math

Q96 = 2**96
MAX_TICK = 887272


def price_x96_to_tick(price: float) -> float:
    """sqrtPriceX96 -> (non-integer) tick: tick = log((p/Q96)^2)/log(1.0001)
    (reference v3/helpers/swap_math.py:7-13)."""
    return math.log((price / Q96) ** 2) / math.log(1.0001)


def price_x96_to_tick_floor(price: float, tick_spacing: int) -> int:
    """sqrtPriceX96 -> tick floored to the pool's tick spacing
    (reference v3/helpers/swap_math.py:16-22). Python ``//`` floor-division
    semantics (rounds toward -inf) are load-bearing for negative ticks."""
    tick = price_x96_to_tick(price)
    return (int(math.floor(tick)) // tick_spacing) * tick_spacing


def get_amount0_delta(ratio_a: float, ratio_b: float, liq: float) -> float:
    """amount0 between two sqrt prices at constant liquidity:
    L * (rb - ra) / (rb * ra), operands ordered ascending
    (reference v3/helpers/swap_math.py:101-108)."""
    if ratio_a > ratio_b:
        ratio_a, ratio_b = ratio_b, ratio_a
    return liq * ((ratio_b - ratio_a) / (ratio_b * ratio_a))


def get_amount1_delta(ratio_a: float, ratio_b: float, liq: float) -> float:
    """amount1 between two sqrt prices: L * (rb - ra)
    (reference v3/helpers/swap_math.py:111-117)."""
    if ratio_a > ratio_b:
        ratio_a, ratio_b = ratio_b, ratio_a
    return liq * (ratio_b - ratio_a)


def get_next_price_amount0(ratio_a: float, liq: float, amount: float, add: bool) -> float:
    """Next sqrt price after swapping `amount` of token0
    (reference v3/helpers/swap_math.py:120-129)."""
    denom = liq + amount * ratio_a if add else liq - amount * ratio_a
    return (liq * ratio_a) / denom


def get_next_price_amount1(ratio_a: float, liq: float, amount: float, add: bool) -> float:
    """Next sqrt price after swapping `amount` of token1
    (reference v3/helpers/swap_math.py:132-141). Note the reference's
    inverted `add` convention: not add -> ratio_a + amount/L."""
    if not add:
        return ratio_a + amount / liq
    return ratio_a - amount / liq


def get_next_sqrt_price(ratio_a: float, liq: float, amount: float, zero_for_one: bool) -> float:
    """Dispatch by direction (reference v3/helpers/swap_math.py:144-153)."""
    if zero_for_one:
        return get_next_price_amount0(ratio_a, liq, amount, zero_for_one)
    return get_next_price_amount1(ratio_a, liq, amount, zero_for_one)


def final_amt_out_from_tick(
    zero_for_one: bool,
    sqrt_p_last_top: float,
    sqrt_p_last_bottom: float,
    amt_in_left_minus_fee: float,
    liquidity: float,
):
    """Partial consumption of the final covering tick — computeSwapStep()
    analog (reference v3/helpers/swap_math.py:74-98)."""
    if zero_for_one:
        sqrt_p_next = get_next_price_amount0(
            sqrt_p_last_top, liquidity, amt_in_left_minus_fee, zero_for_one
        )
        amt_out = get_amount1_delta(sqrt_p_next, sqrt_p_last_top, liquidity)
    else:
        sqrt_p_next = get_next_price_amount1(
            sqrt_p_last_bottom, liquidity, amt_in_left_minus_fee, zero_for_one
        )
        amt_out = get_amount0_delta(sqrt_p_next, sqrt_p_last_bottom, liquidity)
    return amt_out, sqrt_p_next
