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


# ---------------------------------------------------------------------------
# KLL quantile sketch tables (Apache DataSketches, built into Spark >= 4.0)
# ---------------------------------------------------------------------------


def kll_sketches(
    df: DataFrame,
    col: str,
    group_cols: list[str],
    k: int = 200,
) -> DataFrame:
    """Per-group mergeable KLL quantile sketches (binary column ``kll``)
    over a BIGINT column — the quantile twin of :func:`hll_sketches`:
    materialize per-day/per-segment sketches once, answer any-quantile /
    any-rollup questions forever without re-reading raw data. One hash
    aggregate; state is O(k log n) bytes per group. Rank error is
    ~1.65%/sqrt-free deterministic bound ≈ 2.3% at k=200 (single-sided,
    99% confidence) — pass a larger k to tighten."""
    return df.groupBy(*group_cols).agg(
        F.kll_sketch_agg_bigint(F.col(col).cast("long"), F.lit(k)).alias("kll")
    )


def kll_rollup(
    sketch_df: DataFrame,
    group_cols: list[str],
    probs: list[float],
    sketch_col: str = "kll",
) -> DataFrame:
    """Merge KLL sketches to a coarser grain and extract quantile
    estimates: ``group_cols..., p, approx_value, n``. Raw data is never
    re-read; merge is associative so any rollup path gives the same
    sketch."""
    merged = (
        sketch_df.groupBy(*group_cols)
        if group_cols
        else sketch_df.groupBy(F.lit(1).alias("__g"))
    ).agg(F.kll_merge_agg_bigint(sketch_col).alias("__m"))
    out = merged.select(
        *group_cols,
        F.kll_sketch_get_n_bigint("__m").alias("n"),
        F.explode(
            F.arrays_zip(
                F.lit(probs).alias("p"),
                F.kll_sketch_get_quantile_bigint(
                    F.col("__m"), F.lit(probs)
                ).alias("approx_value"),
            )
        ).alias("__q"),
    )
    return out.select(
        *group_cols, F.col("__q.p").alias("p"),
        F.col("__q.approx_value").alias("approx_value"), "n"
    )


def kll_quantile_check(
    df: DataFrame,
    col: str,
    probs: list[float],
    k: int = 200,
    rank_tol: float = 0.03,
) -> DataFrame:
    """KLL quantile estimates with the rank-error contract proven in-plan
    (the :func:`approx_quantile_check` pattern): for each p, the
    estimate's true rank — recomputed from the data — must be within
    ``rank_tol`` of p. Emits ``p, approx_value, exact_value, rank_ok``;
    the oracle pins the exact values and ``TRUE``."""
    est = df.agg(
        F.kll_sketch_agg_bigint(F.col(col).cast("long"), F.lit(k)).alias("__s"),
        F.percentile(F.col(col).cast("long"), F.lit(probs)).alias("__exact"),
        F.count(F.col(col)).alias("__n"),
    ).select(
        F.explode(
            F.arrays_zip(
                F.lit(probs).alias("p"),
                F.kll_sketch_get_quantile_bigint(F.col("__s"), F.lit(probs)).alias(
                    "approx_value"
                ),
                F.col("__exact").alias("exact_value"),
            )
        ).alias("__q"),
        "__n",
    ).select(
        F.col("__q.p").alias("p"),
        F.col("__q.approx_value").alias("approx_value"),
        F.col("__q.exact_value").alias("exact_value"),
        "__n",
    )
    # true rank of each estimate, recomputed from the data
    ranks = df.join(F.broadcast(est), how="cross").groupBy(
        "p", "approx_value", "exact_value", "__n"
    ).agg(
        F.sum(
            (F.col(col).cast("long") <= F.col("approx_value")).cast("long")
        ).alias("__le")
    )
    return ranks.select(
        "p",
        "approx_value",
        "exact_value",
        (
            F.abs(F.col("__le") / F.col("__n") - F.col("p")) <= F.lit(rank_tol)
        ).alias("rank_ok"),
    )


# ---------------------------------------------------------------------------
# Theta sketch set algebra (distinct-count intersections without raw data)
# ---------------------------------------------------------------------------


def theta_sketches(
    df: DataFrame,
    key: str,
    group_cols: list[str],
    lg_nom_entries: int = 12,
) -> DataFrame:
    """Per-group mergeable Theta sketches (binary column ``theta``).

    Theta sketches keep a bounded uniform sample of hashed keys, so —
    unlike HLL — they support INTERSECTION and DIFFERENCE natively with
    bounded relative error, not via inclusion-exclusion blowup. Below
    2^lg_nom_entries distinct keys the sketch is exact. Same
    materialize-once/roll-up-forever table pattern as HLL/KLL."""
    return df.groupBy(*group_cols).agg(
        F.theta_sketch_agg(key, F.lit(lg_nom_entries)).alias("theta")
    )


def theta_set_estimate(
    sketch_df: DataFrame,
    label_col: str,
    label_a,
    label_b,
    sketch_col: str = "theta",
) -> DataFrame:
    """Distinct-count set algebra between two labeled sketch groups:
    one row ``(n_a, n_b, n_union, n_intersect, n_a_only)`` estimated
    purely from stored sketches. Merges each side first, so the labels
    may cover many segment rows each."""
    a = sketch_df.filter(F.col(label_col) == label_a).agg(
        F.theta_union_agg(sketch_col).alias("sa")
    )
    b = sketch_df.filter(F.col(label_col) == label_b).agg(
        F.theta_union_agg(sketch_col).alias("sb")
    )
    return a.crossJoin(b).select(
        F.theta_sketch_estimate("sa").alias("n_a"),
        F.theta_sketch_estimate("sb").alias("n_b"),
        F.theta_sketch_estimate(F.theta_union("sa", "sb")).alias("n_union"),
        F.theta_sketch_estimate(F.theta_intersection("sa", "sb")).alias(
            "n_intersect"
        ),
        F.theta_sketch_estimate(F.theta_difference("sa", "sb")).alias("n_a_only"),
    )


def heavy_hitters(
    df: DataFrame,
    col: str,
    k: int = 20,
    candidate_factor: int = 8,
    ndv_threshold: int = 5_000_000,
) -> DataFrame:
    """EXACT top-``k`` most frequent values of ``col`` without a
    full-cardinality shuffle — the bounded-memory heavy-hitters pattern a
    100 TB vocabulary head needs (a plain groupBy+orderBy shuffles one
    row per DISTINCT value; at web scale that is billions of rows for a
    20-row answer).

    Two passes + a soundness check:

    1. **Candidates** (one scan, no shuffle): per-partition Misra-Gries
       summaries with ``m = k * candidate_factor`` counters, merged by
       union. Each Arrow batch is reduced with vectorized
       ``value_counts`` first, so Python work is O(distinct-per-batch +
       m), never per-row; merging exact batch counts into an MG summary
       is MG-merge with epsilon 0, preserving the bound: any value with
       true count > N/m survives in some partition's summary.
    2. **Exact recount** (one small shuffle): the candidate set (at most
       m x partitions values) broadcasts into a semi join; survivors are
       exactly counted and the top k taken with a deterministic (count
       DESC, value ASC) tiebreak.
    3. **Soundness check**: if the k-th recounted count > N/m, no
       excluded value can displace the answer — the result is provably
       exact. Otherwise (near-uniform data, where no sketch can certify
       a top-k) fall back to the exact full aggregation.

    The fast path's guarantee is CHECKED at runtime, not assumed — the
    operator always returns the exact answer; the sketch only decides
    how much shuffles.

    **Adaptive gate**: the candidate pass ships every value through an
    Arrow/pandas boundary, which only pays for itself when the exact
    aggregation's shuffle is the real cost — i.e. when the column's
    cardinality is enormous. A one-scan JVM ``approx_count_distinct``
    probe routes: NDV below ``ndv_threshold`` (default 5 M — a partial
    agg's hashmap and a ~100 MB shuffle are trivial there, measured
    0.11 s vs 27.8 s for the sketch pass on a 45 M-token/31-distinct
    column) runs the plain exact aggregation; above it, the Misra-Gries
    pipeline engages. Pass ``ndv_threshold=0`` to force the sketch path.

    Output: (``value``, ``n``), k rows, ordered (n DESC, value ASC).
    """
    m = max(k * candidate_factor, k + 1)
    src = df.select(F.col(col).cast("string").alias("value")).filter(
        F.col("value").isNotNull()
    )

    def exact_topk():
        return (
            src.groupBy("value")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.col("n").desc(), F.col("value").asc())
            .limit(k)
        )

    n_total = None
    if ndv_threshold > 0:
        # total-N rides the NDV probe's scan — the soundness check below
        # then needs no separate src.count() pass
        probe = src.agg(
            F.approx_count_distinct("value").alias("d"),
            F.count(F.lit(1)).alias("n"),
        ).first()
        if probe["d"] < ndv_threshold:
            return exact_topk()
        n_total = probe["n"]

    def mg_partition(batches):
        import numpy as np
        import pandas as pd

        counters: dict = {}
        n_seen = 0
        for pdf in batches:
            n_seen += len(pdf)
            vc = pdf["value"].value_counts()
            for v, c in vc.items():
                counters[v] = counters.get(v, 0) + int(c)
            if len(counters) > m:
                # Misra-Gries decrement: subtract the (m+1)-th largest
                # count from everyone, drop non-positives (batch-sized
                # generalization of the classic -1 step). np.partition
                # finds the cut in O(len) instead of a full sort.
                arr = np.fromiter(
                    counters.values(), dtype=np.int64, count=len(counters)
                )
                kth = arr.size - m - 1
                cut = int(np.partition(arr, kth)[kth])
                counters = {
                    v: c
                    for v, c in zip(counters.keys(), (arr - cut).tolist())
                    if c > 0
                }
        # one sentinel row (value NULL) carries the partition's row count
        # so total-N can be summed from this same pass when the NDV probe
        # was skipped (ndv_threshold=0) — never a third scan of src
        yield pd.DataFrame(
            {
                "value": list(counters.keys()) + [None],
                "n_seen": [0] * len(counters) + [n_seen],
            }
        )

    mg = src.mapInPandas(mg_partition, "value string, n_seen long").persist()
    try:
        if n_total is None:
            n_total = mg.agg(F.sum("n_seen").alias("n")).first()["n"] or 0
        cand = (
            mg.filter(F.col("value").isNotNull()).select("value").distinct()
        )
        counted = (
            src.join(F.broadcast(cand), ["value"], "left_semi")
            .groupBy("value")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        top = counted.orderBy(F.col("n").desc(), F.col("value").asc()).limit(k)
        rows = top.collect()  # k rows — driver-small by construction
    finally:
        mg.unpersist()
    if len(rows) >= k and rows[-1]["n"] * m > n_total:
        return df.sparkSession.createDataFrame(rows, "value string, n long")
    # near-uniform data: the sketch cannot certify top-k — exact fallback
    return exact_topk()
