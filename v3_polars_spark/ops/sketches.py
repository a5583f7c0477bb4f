"""Mergeable sketch operators — the cardinality/quantile story at 100 TB.

At cluster scale, exact ``COUNT(DISTINCT ...)`` and exact percentiles are
the queries that stop fitting: both force a full shuffle of every distinct
value. Sketches replace them with fixed-size mergeable state:

- **HLL** (Apache DataSketches HllSketch, built into Spark >= 3.5 as
  ``hll_sketch_agg`` / ``hll_union_agg``): per-partition sketches are a
  few KB each, union is associative+commutative, so daily sketch tables
  roll up to monthly/global cardinalities without ever re-reading the raw
  data — the pre-aggregated-cube pattern the reference's block-range
  probes (v3/helpers/connectors/gbq.py:49-71) approximate by re-querying.
- **KLL-style approximate percentiles** (``percentile_approx``): rank
  error bounded by the accuracy knob, partial-aggregable, no sort.

Verification contract: sketch outputs are engine-specific, so oracle
parity cannot compare raw estimates across engines. Instead each check
emits the *accuracy contract itself* as a boolean column computed from
the data (estimate within tolerance of exact / within rank tolerance);
the DuckDB oracle emits the exact values and ``TRUE``, so a hash match
proves the sketch met its contract on this data. Mergeability (daily
sketches unioned == one global sketch) is exact and pinned in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct_by(
    df: DataFrame,
    key: str,
    group_cols: list[str],
    rsd: float = 0.05,
) -> DataFrame:
    """Per-group approximate distinct count (HLL++ via
    ``approx_count_distinct``) next to the exact count and a
    within-tolerance flag.

    The exact count is included for the verification harness only — a
    production rollup would emit just the estimate (that is the point).
    Tolerance is 4*rsd: rsd is the standard deviation of the relative
    error, so 4 sigma is a deterministic-data safety margin.
    """
    return (
        df.groupBy(*group_cols)
        .agg(
            F.countDistinct(key).alias("exact_distinct"),
            F.approx_count_distinct(key, rsd).alias("approx_distinct"),
        )
        .withColumn(
            "within_tol",
            (
                F.abs(F.col("approx_distinct") - F.col("exact_distinct"))
                <= F.lit(4 * rsd) * F.col("exact_distinct")
            ),
        )
    )


def hll_sketches(
    df: DataFrame,
    key: str,
    group_cols: list[str],
    lg_config_k: int = 12,
) -> DataFrame:
    """Build per-group mergeable HLL sketches (binary column ``sketch``).

    This is the materialization half of the scale pattern: group by the
    finest rollup unit (e.g. day), keep the sketch bytes, and never touch
    the raw keys again. One hash-aggregate shuffle; sketch state is
    ~2^lg_config_k bytes per group regardless of cardinality.
    """
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(key, F.lit(lg_config_k)).alias("sketch")
    )


def hll_rollup(
    sketch_df: DataFrame,
    group_cols: list[str],
    sketch_col: str = "sketch",
) -> DataFrame:
    """Roll sketches up to a coarser grain: union the binary sketches and
    estimate. Input is a sketch table from :func:`hll_sketches`; the raw
    data is not needed. Empty ``group_cols`` gives the global estimate.
    """
    agg = F.hll_union_agg(sketch_col).alias("union_sketch")
    g = sketch_df.groupBy(*group_cols).agg(agg) if group_cols else sketch_df.agg(agg)
    return g.withColumn(
        "approx_distinct", F.hll_sketch_estimate("union_sketch")
    ).drop("union_sketch")


def approx_quantile_check(
    df: DataFrame,
    col: str,
    probs: list[float],
    accuracy: int = 10_000,
) -> DataFrame:
    """Approximate percentiles with an in-plan rank-error proof.

    ``percentile_approx(col, p, accuracy)`` guarantees a rank error of at
    most ``1/accuracy``: the returned value's true rank r satisfies
    |r/n - p| <= 1/accuracy (plus discretization on ties). The check
    recomputes each estimate's true rank with a second aggregation over
    the broadcast 1-row estimate frame and emits ``rank_ok``. Exact
    ``percentile`` is emitted alongside for the oracle's exact columns.
    """
    est = df.agg(
        F.percentile_approx(col, probs, accuracy).alias("approx_vals"),
        F.percentile(col, probs).alias("exact_vals"),
        F.count(F.col(col)).alias("n"),
    )
    # explode (p, approx, exact) triples, then join back for true ranks
    triples = est.select(
        F.posexplode(
            F.arrays_zip(
                F.lit(probs).alias("p"),
                F.col("approx_vals").alias("approx_val"),
                F.col("exact_vals").alias("exact_val"),
            )
        ).alias("i", "t"),
        F.col("n"),
    ).select(
        F.col("t.p").alias("p"),
        F.col("t.approx_val").alias("approx_val"),
        F.col("t.exact_val").alias("exact_val"),
        "n",
    )
    ranks = (
        df.select(F.col(col).alias("__v"))
        .crossJoin(F.broadcast(triples))
        .groupBy("p", "approx_val", "exact_val", "n")
        .agg(
            F.count(F.when(F.col("__v") < F.col("approx_val"), 1)).alias("r_lo"),
            F.count(F.when(F.col("__v") <= F.col("approx_val"), 1)).alias("r_hi"),
        )
    )
    tol = 1.0 / accuracy + 1e-9
    target = F.col("p") * F.col("n")
    rank_ok = (F.col("r_lo") - F.lit(tol) * F.col("n") <= target) & (
        target <= F.col("r_hi") + F.lit(tol) * F.col("n")
    )
    return ranks.select(
        "p", "exact_val", rank_ok.alias("rank_ok")
    ).orderBy("p")


def hll_intersect_estimate(
    sketch_df: DataFrame,
    group_col: str,
    a,
    b,
    sketch_col: str = "sketch",
) -> DataFrame:
    """Estimate |A ∩ B| for two sketched groups by inclusion-exclusion:
    est(A) + est(B) - est(A ∪ B), all from the stored sketches — overlap
    questions ("users active in BOTH event types") answered without
    re-reading raw data. Error compounds across the three estimates;
    treat small intersections of large sets as noisy (standard HLL
    caveat, documented here rather than hidden)."""
    pair = sketch_df.filter(F.col(group_col).isin([a, b]))
    est = pair.select(
        F.col(group_col),
        F.hll_sketch_estimate(sketch_col).alias("__e"),
        F.col(sketch_col),
    )
    union = pair.agg(
        F.hll_sketch_estimate(F.hll_union_agg(sketch_col)).alias("__u")
    )
    return (
        est.groupBy()
        .agg(F.sum("__e").alias("__sum_ab"))
        .crossJoin(union)
        .select(
            F.lit(str(a)).alias("group_a"),
            F.lit(str(b)).alias("group_b"),
            F.greatest(
                F.col("__sum_ab") - F.col("__u"), F.lit(0)
            ).alias("approx_intersection"),
        )
    )


def approx_quantile_by(
    df: DataFrame,
    col: str,
    probs: list[float],
    group_cols: list[str],
    accuracy: int = 10_000,
) -> DataFrame:
    """Grouped approximate percentiles: one hash aggregate carrying
    fixed-size percentile state per group (no per-group sort), exact
    percentiles alongside for verification — the grouped twin of
    :func:`approx_quantile_check`'s global form. Returns one row per
    (group, p)."""
    est = df.groupBy(*group_cols).agg(
        F.percentile_approx(col, probs, accuracy).alias("approx_vals"),
        F.percentile(col, probs).alias("exact_vals"),
    )
    triple = F.posexplode(
        F.arrays_zip(
            F.lit(probs).alias("p"),
            F.col("approx_vals").alias("approx_val"),
            F.col("exact_vals").alias("exact_val"),
        )
    )
    return est.select(*group_cols, triple.alias("i", "t")).select(
        *group_cols,
        F.col("t.p").alias("p"),
        F.col("t.approx_val").alias("approx_val"),
        F.col("t.exact_val").alias("exact_val"),
    )


def histogram(
    df: DataFrame,
    col: str,
    bins: int,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Equal-width histogram: one pass for bounds (skipped when given),
    one hash aggregate for counts — never a sort. Returns
    (bin, bin_lo, bin_hi, n) with ``bins`` rows (empty bins included via
    a range join against the bin spine, so downstream plotting/diffing
    sees a dense spine). Values exactly at ``hi`` land in the last bin.
    """
    if lo is None or hi is None:
        b = df.agg(F.min(col).alias("lo"), F.max(col).alias("hi")).first()
        lo = float(b.lo if lo is None else lo)
        hi = float(b.hi if hi is None else hi)
    width = (hi - lo) / bins or 1.0
    idx = F.least(
        F.lit(bins - 1),
        F.greatest(F.lit(0), F.floor((F.col(col) - lo) / width).cast("int")),
    )
    counts = df.groupBy(idx.alias("bin")).agg(F.count(F.lit(1)).alias("n"))
    spine = df.sparkSession.range(bins).select(F.col("id").cast("int").alias("bin"))
    return (
        spine.join(counts, "bin", "left")
        .select(
            "bin",
            (F.lit(lo) + F.col("bin") * width).alias("bin_lo"),
            (F.lit(lo) + (F.col("bin") + 1) * width).alias("bin_hi"),
            F.coalesce("n", F.lit(0)).alias("n"),
        )
    )
