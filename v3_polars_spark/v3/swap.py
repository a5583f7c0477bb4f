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
import math
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


def swap_depth(
    swap_df: DataFrame, irv: InRangeValues, token_in_is_token1: bool
) -> DataFrame:
    """The direction-ordered cumulative-depth state as ONE broadcastable
    row: (__darr array<struct<cum/tick/liq/prices/amounts/prev sums>>,
    __max_cum). This is the build step of the quote path — the exact
    analog of the reference's cached createSwapDF arrays that its scalar
    bisect walks (v3/helpers/swap.py:122-143, pool_helpers.py:80-94).
    Build it once per (frame, direction), ``.cache()`` it, and serve any
    number of ``quote_ladder`` batches against it; passing ``depth=`` to
    ``quote_ladder`` skips the rebuild."""
    zero_for_one = not token_in_is_token1
    in_key, out_key = ("xInTick", "yInTick") if zero_for_one else ("yInTick", "xInTick")
    if zero_for_one:
        oor = swap_df.filter(F.col("tick_a") < F.lit(irv.tick))
        order = F.col("tick_a").desc()
    else:
        oor = swap_df.filter(F.col("tick_a") > F.lit(irv.tick))
        order = F.col("tick_a").asc()
    w_cum = Window.orderBy(order).rowsBetween(Window.unboundedPreceding, 0)
    w_prev = Window.orderBy(order).rowsBetween(Window.unboundedPreceding, -1)
    # prev_* use the PRECEDING-rows window (not cum - current): identical
    # left-to-right float accumulation as the scalar path's running sums.
    # Kept asymmetric on purpose: max cum > left_to_swap (pre-fee) while
    # the covering search uses >= left_minus_fee.
    depth = oor.select(
        F.col("tick_a").alias("__tick"),
        F.col("liquidity").alias("__liq"),
        F.col("p_a").alias("__p_a"),
        F.col("p_b").alias("__p_b"),
        F.col(in_key).alias("__in_amt"),
        F.sum(in_key).over(w_cum).alias("__cum_in"),
        F.coalesce(F.sum(in_key).over(w_prev), F.lit(0.0)).alias("__prev_in"),
        F.coalesce(F.sum(out_key).over(w_prev), F.lit(0.0)).alias("__prev_out"),
    )
    # ONE row: the depth table as a cum-ordered array (array_sort on the
    # struct orders by its first field, __cum_in — strictly increasing, no
    # ties). The reference-Q5 depth assert's max cum is the LAST running
    # sum — same left-to-right float accumulation, so max(cum) is
    # bit-identical to the old full-frame window sum.
    return depth.agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    "__cum_in", "__tick", "__liq", "__p_a", "__p_b",
                    "__in_amt", "__prev_in", "__prev_out",
                )
            )
        ).alias("__darr"),
        F.max("__cum_in").alias("__max_cum"),
    )


def quote_ladder(
    swap_df: DataFrame | None,
    irv: InRangeValues,
    token_in_is_token1: bool,
    amounts: DataFrame,
    fee_ppm: int,
    amount_col: str = "amount_in",
    fees: bool = False,
    depth: DataFrame | None = None,
) -> DataFrame:
    """Batched swapIn: quote MANY input amounts against one swap frame in a
    single distributed plan — the batch-of-swaps generalization SURVEY.md
    §2.9 calls for, with zero driver loops.

    The scalar path's bisect over the cumulative-depth array (reference
    v3/helpers/swap.py:144-168) stays an ARRAY bisect: the ordered
    cumulative-depth table (tiny, O(#initialized ticks)) collapses to ONE
    broadcast row holding the sorted depth array, and the covering-row
    search — bisect_left == "first cum >= axis" — is a per-amount
    ``filter``+``get(0)`` column expression. All swap math runs as column
    expressions with the same operation order as the scalar kernels, so
    results are bit-identical to looping ``swap_in`` (pinned in tests).

    Scale shape: amounts can be arbitrarily large — after the broadcast
    of the single depth row, the amount side is ONE narrow map stage: no
    join duplication (the old join×agg shape duplicated every amount row
    per qualifying tick and re-aggregated it back), no shuffle, no
    single-task stage. The only depth-side window is the per-frame
    cumsum over O(#ticks) rows (single pool — for many pools, partition
    it by pool keys as liquidity_distribution_multi does).
    Insufficient-depth quotes get sufficient=false and NULL outputs
    instead of the scalar assert.

    Output: all ``amounts`` columns + amt_out, sqrt_price_last, branch
    ('A'|'B'), sufficient; with ``fees=True`` also ``fees`` — an
    array<struct<tick,fee,liquidity>> of per-tick LP fee attribution,
    value-identical to the scalar path's fee_dict (reference
    v3/helpers/swap.py:141-142,148-149,180-183): the in-range tick's fee,
    one entry per fully-crossed tick, and the partial covering tick. In
    fee mode the crossed-tick entries come from a ``filter``+``transform``
    over the same depth array — still one row per amount end-to-end.
    """
    zero_for_one = not token_in_is_token1
    fee_frac = fee_ppm / 1e6
    in_range_test, in_range_to_swap = (
        (irv.in_range0, irv.in_range_to_swap0)
        if zero_for_one
        else (irv.in_range1, irv.in_range_to_swap1)
    )

    # --- depth side: prebuilt (cached) or derived from the swap frame ----
    darr = depth if depth is not None else swap_depth(swap_df, irv, token_in_is_token1)

    # --- amount side: one narrow stage, no shuffle -----------------------
    a_in = F.col(amount_col)
    amt = amounts.withColumns(
        {
            "__swap_in_minus_fee": a_in * F.lit(1 - fee_frac),
            "__left": a_in - F.lit(in_range_test),
            "__axis": (a_in - F.lit(in_range_test)) * F.lit(1 - fee_frac),
        }
    )

    axis = F.col("__axis")
    # covering row = first depth element with cum_in >= axis (bisect_left);
    # F.get returns NULL past the end — the insufficient case
    cov = F.get(F.filter(F.col("__darr"), lambda d: axis <= d["__cum_in"]), F.lit(0))
    depth_cols = ["__tick", "__liq", "__p_a", "__p_b", "__prev_in", "__prev_out"]
    proj = [
        *[F.col(c) for c in amt.columns],
        F.col("__max_cum"),
        *[cov[c].alias(c) for c in depth_cols],
    ]
    if fees:
        # crossed ticks = every depth element strictly below the axis,
        # re-sorted by tick (the fee struct's first field) like the scalar
        # fee_dict's key order
        proj.append(
            F.array_sort(
                F.transform(
                    F.filter(F.col("__darr"), lambda d: d["__cum_in"] < axis),
                    lambda d: F.struct(
                        d["__tick"].alias("tick"),
                        (d["__in_amt"] * F.lit(fee_frac)).alias("fee"),
                        d["__liq"].alias("liquidity"),
                    ),
                )
            ).alias("__prev_fees")
        )
    joined = amt.join(F.broadcast(darr), F.lit(True), "left").select(*proj)

    is_a = F.lit(in_range_test) > F.col("__swap_in_minus_fee")
    liq, sp = F.lit(irv.liquidity), F.lit(irv.sqrt_p)

    # branch A column math (get_next_price_amount{0,1} + get_amount{1,0}_delta)
    if zero_for_one:
        spl_a = (liq * sp) / (liq + F.col("__swap_in_minus_fee") * sp)
        lo_a, hi_a = F.least(spl_a, sp), F.greatest(spl_a, sp)
        out_a = liq * (hi_a - lo_a)                       # amount1 delta
    else:
        spl_a = sp + F.col("__swap_in_minus_fee") / liq
        lo_a, hi_a = F.least(spl_a, sp), F.greatest(spl_a, sp)
        out_a = liq * ((hi_a - lo_a) / (hi_a * lo_a))     # amount0 delta

    # branch B column math (final_amt_out_from_tick on the covering tick)
    left_mf = (F.col("__left") - F.col("__prev_in")) * F.lit(1 - fee_frac)
    bl = F.col("__liq")
    if zero_for_one:
        spl_b = (bl * F.col("__p_b")) / (bl + left_mf * F.col("__p_b"))
        lo_b, hi_b = F.least(spl_b, F.col("__p_b")), F.greatest(spl_b, F.col("__p_b"))
        out_last = bl * (hi_b - lo_b)
    else:
        spl_b = F.col("__p_a") + left_mf / bl
        lo_b, hi_b = F.least(spl_b, F.col("__p_a")), F.greatest(spl_b, F.col("__p_a"))
        out_last = bl * ((hi_b - lo_b) / (hi_b * lo_b))
    # same association as the scalar path: last + (in_range_to_swap + prev)
    out_b = out_last + (F.lit(in_range_to_swap) + F.col("__prev_out"))

    sufficient = is_a | (
        F.col("__tick").isNotNull() & (F.col("__max_cum") > F.col("__left"))
    )
    res = (
        joined.withColumn("sufficient", sufficient)
        .withColumn(
            "amt_out",
            F.when(~sufficient, F.lit(None).cast("double"))
            .when(is_a, out_a)
            .otherwise(out_b),
        )
        .withColumn(
            "sqrt_price_last",
            F.when(~sufficient, F.lit(None).cast("double"))
            .when(is_a, spl_a)
            .otherwise(spl_b),
        )
        .withColumn("branch", F.when(is_a, F.lit("A")).otherwise(F.lit("B")))
    )
    out_cols = [*amounts.columns, "amt_out", "sqrt_price_last", "branch", "sufficient"]
    if fees:
        # scalar fee_dict parity (swap_in fees=True): branch A charges the
        # whole amount at the in-range tick; branch B charges the in-range
        # capacity there, each crossed tick's full tradable input, and the
        # residual at the covering tick — identical operand order per entry
        def _entry(tick, fee, liquidity):
            return F.struct(
                tick.cast("long").alias("tick"),
                fee.alias("fee"),
                liquidity.alias("liquidity"),
            )

        fee_a = F.array(_entry(F.lit(irv.tick), a_in * F.lit(fee_frac), F.lit(irv.liquidity)))
        fee_b = F.concat(
            F.array(
                _entry(
                    F.lit(irv.tick),
                    F.lit(in_range_test * fee_frac),
                    F.lit(irv.liquidity),
                )
            ),
            F.col("__prev_fees"),
            F.array(
                _entry(
                    F.col("__tick"),
                    (F.col("__left") - F.col("__prev_in")) * F.lit(fee_frac),
                    F.col("__liq"),
                )
            ),
        )
        res = res.withColumn(
            "fees",
            F.when(~F.col("sufficient"), F.lit(None))
            .when(is_a, fee_a)
            .otherwise(fee_b),
        )
        out_cols.append("fees")
    return res.select(*out_cols)


def quote_ladder_multi(
    mb: DataFrame,
    swaps: DataFrame,
    factory: DataFrame,
    amounts: DataFrame,
    as_of: float,
    zero_for_one: bool,
    by: list[str] = ("chain_name", "address"),
    amount_col: str = "amount_in",
    fees: bool = False,
) -> DataFrame:
    """Batched swapIn across MANY pools in one distributed plan — the full
    scale generalization: every per-pool scalar the single-pool path
    collects (price, tick floor, in-range capacities, fee, tick spacing)
    is derived as a column, so nothing is collected per pool and every
    window partitions by the pool keys.

    Inputs: mb (cast, with as_of), swaps (with as_of; sqrtPriceX96 string),
    factory with the pool keys + tickSpacing/fee (strings ok), amounts with
    the pool keys + ``amount_col``. One direction per call (``zero_for_one``
    — amount rows quote token0-in when true, token1-in when false).

    Output: amounts columns + amt_out, sqrt_price_last, branch, sufficient.
    Bit-parity with looping Pool.swap_in per pool is pinned in tests.
    """
    by = list(by)

    # pool metadata (J5 as a real dimension join, broadcast — factory is
    # the smallest table in the system)
    meta = factory.select(
        *[F.col(c) for c in by],
        F.col("tickSpacing").cast("long").alias("__ts"),
        F.col("fee").cast("long").alias("__fee"),
    )

    # per-pool price in force strictly before as_of (J3 per key: max_by)
    price = (
        swaps.filter(F.col("as_of") < F.lit(float(as_of)))
        .groupBy(*by)
        .agg(
            F.max_by(
                F.col("sqrtPriceX96").cast("double"),
                F.struct(F.col("as_of"), F.col("log_index")),
            ).alias("__price_x96")
        )
    )

    # per-pool swap frame (lead window partitioned by pool)
    from .liquidity import liquidity_distribution_multi

    liqm = liquidity_distribution_multi(mb, as_of, by)
    w_lead = Window.partitionBy(*by).orderBy(F.col("tick").asc())
    frame = (
        liqm.join(meta, by)
        .filter(F.col("liquidity") > 0)
        .withColumn("tick_a", F.col("tick"))
        .withColumn(
            "tick_b",
            F.coalesce(
                F.lead("tick", 1).over(w_lead),
                (F.floor(F.lit(sm.MAX_TICK) / F.col("__ts")) * F.col("__ts")).cast(
                    "long"
                ),
            ),
        )
        .select(*by, "liquidity", "tick_a", "tick_b", "__ts", "__fee")
        .withColumn("p_a", F.pow(F.lit(1.0001), F.col("tick_a") / F.lit(2.0)))
        .withColumn("p_b", F.pow(F.lit(1.0001), F.col("tick_b") / F.lit(2.0)))
        .withColumn("yInTick", F.col("liquidity") * (F.col("p_b") - F.col("p_a")))
        .withColumn(
            "xInTick",
            F.col("liquidity")
            * ((F.col("p_b") - F.col("p_a")) / (F.col("p_b") * F.col("p_a"))),
        )
    )

    # per-pool in-range values (the irv 7-tuple as columns):
    # tick floor exactly as the scalar kernel: floor(log((p/Q96)^2)/log(1.0001))
    # then floor-div to spacing (price_x96_to_tick_floor)
    sp = F.col("__price_x96") / F.lit(float(sm.Q96))
    tick_real = F.log(sp * sp) / F.lit(math.log(1.0001))
    pool_sp = price.withColumn("__sqrt_p", sp).withColumn(
        "__tick_floor_raw", F.floor(tick_real).cast("long")
    )

    # ONE pass over the frame (r11 plan diet): broadcast the per-pool
    # price row in, mark the unique in-range tick, and window-propagate
    # every irv scalar to all rows of the pool. The previous
    # frame -> irv -> join-back diamond recomputed the whole frame
    # subtree (mb scan + liquidity windows + lead window) once per
    # branch; now the depth branch and the per-pool scalar row both read
    # the same single derivation. max(when(in_range, e)) over the
    # pool partition copies the exact in-range-row value (ticks
    # partition the line, so at most one row qualifies) — bit parity
    # with the join formulation.
    in_range = (F.col("tick_a") <= F.col("__tick_floor")) & (
        F.col("__tick_floor") < F.col("tick_b")
    )
    w_pool = Window.partitionBy(*by)

    def _prop(e, name):
        return F.max(F.when(in_range, e)).over(w_pool).alias(name)

    # get_amount{0,1}_delta with explicit ascending operand order
    ir0 = F.col("liquidity") * (
        (F.greatest(F.col("p_a"), F.col("__sqrt_p")) - F.least(F.col("p_a"), F.col("__sqrt_p")))
        / (F.greatest(F.col("p_a"), F.col("__sqrt_p")) * F.least(F.col("p_a"), F.col("__sqrt_p")))
    )
    irts0 = F.col("liquidity") * (
        F.greatest(F.col("p_a"), F.col("__sqrt_p")) - F.least(F.col("p_a"), F.col("__sqrt_p"))
    )
    ir1 = F.col("liquidity") * (
        F.greatest(F.col("p_b"), F.col("__sqrt_p")) - F.least(F.col("p_b"), F.col("__sqrt_p"))
    )
    irts1 = F.col("liquidity") * (
        (F.greatest(F.col("p_b"), F.col("__sqrt_p")) - F.least(F.col("p_b"), F.col("__sqrt_p")))
        / (F.greatest(F.col("p_b"), F.col("__sqrt_p")) * F.least(F.col("p_b"), F.col("__sqrt_p")))
    )
    fr = (
        frame.join(F.broadcast(pool_sp), by)
        .withColumn(
            "__tick_floor",
            (F.floor(F.col("__tick_floor_raw") / F.col("__ts")) * F.col("__ts")).cast(
                "long"
            ),
        )
        .select(
            "*",
            _prop(F.col("tick_a"), "__irv_tick"),
            _prop(F.col("liquidity"), "__irv_liq"),
            _prop(ir0, "__in_range0"),
            _prop(irts0, "__in_range_to_swap0"),
            _prop(ir1, "__in_range1"),
            _prop(irts1, "__in_range_to_swap1"),
        )
        # pools whose price row lands outside every held tick had no irv
        # row before (inner join) — same drop here
        .filter(F.col("__irv_tick").isNotNull())
    )
    irv_cols = [
        "__irv_tick", "__irv_liq", "__sqrt_p", "__ts", "__fee",
        "__in_range0", "__in_range_to_swap0",
        "__in_range1", "__in_range_to_swap1",
    ]
    # per-pool direction-ordered depth with cumulative/preceding sums,
    # PLUS the per-pool in-range "anchor" row, in the SAME pass (r12 plan
    # diet step 2): the irv scalars are already columns on every fr row,
    # so the amounts side no longer needs its own irv join — it joins the
    # depth rows once, on the pool keys alone, and the anchor row keeps
    # every priced pool joinable even when no out-of-range depth exists
    # in the direction (branch-A-only quotes). The window sums skip the
    # anchor via NULL-ignoring when(): its __cum_in is NULL, so the
    # covering min_by and the fee collect never select it — exactly the
    # all-NULL depth row the old left join produced.
    in_key, out_key = ("xInTick", "yInTick") if zero_for_one else ("yInTick", "xInTick")
    if zero_for_one:
        directional = F.col("tick_a") < F.col("__irv_tick")
        order = F.col("tick_a").desc()
    else:
        directional = F.col("tick_a") > F.col("__irv_tick")
        order = F.col("tick_a").asc()
    in_dir = F.when(directional, F.col(in_key))
    out_dir = F.when(directional, F.col(out_key))
    w_cum = Window.partitionBy(*by).orderBy(order).rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_prev = Window.partitionBy(*by).orderBy(order).rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_all = Window.partitionBy(*by).orderBy(order).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    # per-pool max cum rides along in the same partitioned window pass
    # (positive tick amounts: max(cum) == full-frame ordered sum) — no
    # separate aggregate, no persist, no extra join. The anchor sorts
    # first in either direction (its tick is the directional extreme),
    # so directional prev-sums are unchanged by its presence.
    depth = fr.filter(directional | in_range).select(
        *by,
        *irv_cols,
        F.when(directional, F.col("tick_a")).alias("__tick"),
        F.when(directional, F.col("liquidity")).alias("__liq"),
        F.when(directional, F.col("p_a")).alias("__p_a"),
        F.when(directional, F.col("p_b")).alias("__p_b"),
        in_dir.alias("__in_amt"),
        F.sum(in_dir).over(w_cum).alias("__cum_in"),
        F.coalesce(F.sum(in_dir).over(w_prev), F.lit(0.0)).alias("__prev_in"),
        F.coalesce(F.sum(out_dir).over(w_prev), F.lit(0.0)).alias("__prev_out"),
        F.sum(in_dir).over(w_all).alias("__max_cum"),
    )

    # amount side: ONE join — pool keys only; per-quote scalars are
    # derived from the joined irv columns (identical on every row of the
    # pool, so F.first in the aggregate is deterministic)
    in_range_test = F.col("__in_range0") if zero_for_one else F.col("__in_range1")
    in_range_to_swap = (
        F.col("__in_range_to_swap0") if zero_for_one else F.col("__in_range_to_swap1")
    )
    one_minus_fee = F.lit(1.0) - F.col("__fee") / F.lit(1e6)
    a_in = F.col(amount_col)
    amt = amounts.withColumn("__rid", F.monotonically_increasing_id())
    depth_cols = ["__tick", "__liq", "__p_a", "__p_b", "__prev_in", "__prev_out"]
    depth_r = depth.select(
        *[F.col(k).alias(f"__d_{k}") for k in by],
        *irv_cols,
        *depth_cols,
        "__in_amt",
        "__cum_in",
        "__max_cum",
    )
    cond = F.lit(True)
    for k in by:
        cond = cond & (amt[k] == depth_r[f"__d_{k}"])
    # LEFT join: quotes for pools with no depth/anchor rows (no factory
    # row, no price before as_of, no unambiguous in-range tick — states
    # where the scalar path raises) keep flowing with NULL scalars and
    # resolve to sufficient=false + NULL outputs below, so EVERY input
    # amount row comes back without a second pass over the frame subtree
    cand = (
        amt.join(depth_r, cond, "left")
        .withColumn("__omf", one_minus_fee)
        .withColumn("__swap_in_minus_fee", a_in * F.col("__omf"))
        .withColumn("__left", a_in - in_range_test)
        .withColumn("__axis", (a_in - in_range_test) * F.col("__omf"))
        .withColumn("__irt", in_range_test)
        .withColumn("__irts", in_range_to_swap)
    )
    # the covering row is picked inside the aggregate in BOTH modes now:
    # qual is NULL on non-covering rows (and on the anchor, whose
    # __cum_in is NULL), and min_by/max_by skip NULL ordering keys
    qual = F.when(F.col("__axis") <= F.col("__cum_in"), F.col("__cum_in"))
    if fees:
        fee_frac_c = F.col("__fee") / F.lit(1e6)
        fee_aggs = [
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("__cum_in") < F.col("__axis"),
                        F.struct(
                            F.col("__tick").alias("tick"),
                            (F.col("__in_amt") * fee_frac_c).alias("fee"),
                            F.col("__liq").alias("liquidity"),
                        ),
                    )
                )
            ).alias("__prev_fees")
        ]
    else:
        fee_aggs = []
    scalar_cols = [
        c for c in amounts.columns
    ] + list(irv_cols) + [
        "__omf", "__swap_in_minus_fee", "__left", "__axis", "__irt", "__irts",
    ]
    joined = cand.groupBy("__rid").agg(
        *[F.first(c).alias(c) for c in scalar_cols],
        *[F.min_by(c, qual).alias(c) for c in depth_cols],
        F.max("__max_cum").alias("__max_cum"),
        *fee_aggs,
    )

    is_a = F.col("__irt") > F.col("__swap_in_minus_fee")
    liq_c, sp_c = F.col("__irv_liq"), F.col("__sqrt_p")

    if zero_for_one:
        spl_a = (liq_c * sp_c) / (liq_c + F.col("__swap_in_minus_fee") * sp_c)
        out_a = liq_c * (F.greatest(spl_a, sp_c) - F.least(spl_a, sp_c))
    else:
        spl_a = sp_c + F.col("__swap_in_minus_fee") / liq_c
        out_a = liq_c * (
            (F.greatest(spl_a, sp_c) - F.least(spl_a, sp_c))
            / (F.greatest(spl_a, sp_c) * F.least(spl_a, sp_c))
        )

    left_mf = (F.col("__left") - F.col("__prev_in")) * F.col("__omf")
    bl = F.col("__liq")
    if zero_for_one:
        spl_b = (bl * F.col("__p_b")) / (bl + left_mf * F.col("__p_b"))
        out_last = bl * (F.greatest(spl_b, F.col("__p_b")) - F.least(spl_b, F.col("__p_b")))
    else:
        spl_b = F.col("__p_a") + left_mf / bl
        out_last = bl * (
            (F.greatest(spl_b, F.col("__p_a")) - F.least(spl_b, F.col("__p_a")))
            / (F.greatest(spl_b, F.col("__p_a")) * F.least(spl_b, F.col("__p_a")))
        )
    out_b = out_last + (F.col("__irts") + F.col("__prev_out"))

    sufficient = is_a | (
        F.col("__tick").isNotNull() & (F.col("__max_cum") > F.col("__left"))
    )
    res = (
        joined.withColumn("sufficient", F.coalesce(sufficient, F.lit(False)))
        .withColumn(
            "amt_out",
            F.when(~F.col("sufficient"), F.lit(None).cast("double"))
            .when(is_a, out_a)
            .otherwise(out_b),
        )
        .withColumn(
            "sqrt_price_last",
            F.when(~F.col("sufficient"), F.lit(None).cast("double"))
            .when(is_a, spl_a)
            .otherwise(spl_b),
        )
        # unpriceable quotes (NULL irv scalars from the left join) keep a
        # NULL branch — priced-but-insufficient quotes still report theirs
        .withColumn(
            "branch",
            F.when(F.col("__irv_tick").isNull(), F.lit(None).cast("string"))
            .when(is_a, F.lit("A"))
            .otherwise(F.lit("B")),
        )
    )
    out_cols = [*amounts.columns, "amt_out", "sqrt_price_last", "branch", "sufficient"]
    fee_type = "array<struct<tick:bigint,fee:double,liquidity:double>>"
    if fees:
        fee_frac_c = F.col("__fee") / F.lit(1e6)

        def _entry(tick, fee, liquidity):
            return F.struct(
                tick.cast("long").alias("tick"),
                fee.alias("fee"),
                liquidity.alias("liquidity"),
            )

        fee_a = F.array(
            _entry(F.col("__irv_tick"), a_in * fee_frac_c, F.col("__irv_liq"))
        )
        fee_b = F.concat(
            F.array(
                _entry(
                    F.col("__irv_tick"),
                    F.col("__irt") * fee_frac_c,
                    F.col("__irv_liq"),
                )
            ),
            F.col("__prev_fees"),
            F.array(
                _entry(
                    F.col("__tick"),
                    (F.col("__left") - F.col("__prev_in")) * fee_frac_c,
                    F.col("__liq"),
                )
            ),
        )
        res = res.withColumn(
            "fees",
            F.when(~F.col("sufficient"), F.lit(None).cast(fee_type))
            .when(is_a, fee_a)
            .otherwise(fee_b),
        )
        out_cols.append("fees")
    # every-input-row contract holds WITHOUT a union: the LEFT candidate
    # join carries unpriceable quotes through with NULL scalars, which
    # resolve above to sufficient=false, NULL outputs, NULL branch
    return res.select(*out_cols)
