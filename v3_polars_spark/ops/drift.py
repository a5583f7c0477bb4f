"""Distribution drift between two table snapshots — PSI.

Monitoring a 100 TB ingest means comparing today's corpus against a
baseline: did the length distribution shift? the score distribution? the
source mix? The standard scalar for this is the Population Stability
Index — bin both snapshots on the same fixed edges, compare bin shares:

    PSI = sum_bins (p_cur - p_base) * ln(p_cur / p_base)

(<0.1 stable, 0.1-0.25 moderate shift, >0.25 major shift, the usual
model-monitoring reading.)

Scale shape: ONE hash aggregation per snapshot (map-side combinable
counts over fixed bin ids — the same plan as ``ops.sketches.histogram``),
then all remaining arithmetic on two ``n_bins``-row frames. Nothing
downstream of the two scans grows with the data. Bin edges are explicit
parameters — not derived from the data — both because drift monitoring
requires *stable* edges across snapshots and because it keeps the
operator a single deterministic pass.

Cross-engine note: bin shares are exact dyadic rationals (int/int in
IEEE double) and the smoothing ``greatest(p, eps)`` is exact, but ``ln``
may differ in the last ulp across libms — consumers comparing engines
should round the contribution (the driver query rounds to 9 dp).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def psi_drift(
    base: DataFrame,
    current: DataFrame,
    col: str,
    lo: float,
    hi: float,
    n_bins: int = 10,
    eps: float = 1e-6,
) -> DataFrame:
    """Per-bin PSI decomposition of ``current`` vs ``base`` over
    ``n_bins`` equal-width bins of ``col`` on [lo, hi] (values outside
    clamp to the edge bins; NULLs are dropped). Returns one row per bin:
    ``bin, bin_lo, bin_hi, n_base, n_cur, pct_base, pct_cur, psi_contrib``
    — ``SUM(psi_contrib)`` is the PSI. Shares are smoothed with
    ``max(p, eps)`` so empty bins contribute finitely (the standard PSI
    convention)."""
    return psi_from_counts(
        bin_counts(base, col, lo, hi, n_bins),
        bin_counts(current, col, lo, hi, n_bins),
        lo,
        hi,
        n_bins,
        eps=eps,
    )


def bin_counts(
    df: DataFrame, col: str, lo: float, hi: float, n_bins: int
) -> DataFrame:
    """Equal-width bin counts of ``col`` on fixed [lo, hi) edges —
    ``(bin, n)``, only non-empty bins (``psi_from_counts`` re-densifies
    against the spine). The counts are additive, so incremental pipelines
    (per-day segments, streaming foreachBatch) can maintain them as a
    tiny state table and diff snapshots without re-reading raw data."""
    width = (hi - lo) / n_bins or 1.0
    idx = F.least(
        F.lit(n_bins - 1),
        F.greatest(F.lit(0), F.floor((F.col(col) - lo) / width).cast("int")),
    )
    return (
        df.filter(F.col(col).isNotNull())
        .groupBy(idx.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def psi_from_counts(
    base_counts: DataFrame,
    cur_counts: DataFrame,
    lo: float,
    hi: float,
    n_bins: int,
    eps: float = 1e-6,
) -> DataFrame:
    """The PSI arithmetic over two ``(bin, n)`` count tables (the shape
    ``bin_counts`` emits and incremental/streaming state maintains).
    Duplicate bins per side are summed, so pre-aggregated per-segment
    counts can be passed directly."""
    width = (hi - lo) / n_bins or 1.0
    spark = base_counts.sparkSession
    spine = spark.range(n_bins).select(F.col("id").cast("int").alias("bin"))
    joined = (
        spine.join(
            base_counts.groupBy("bin").agg(F.sum("n").alias("n_base")),
            "bin",
            "left",
        )
        .join(
            cur_counts.groupBy("bin").agg(F.sum("n").alias("n_cur")),
            "bin",
            "left",
        )
        .select(
            "bin",
            F.coalesce("n_base", F.lit(0)).alias("n_base"),
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
        )
    )
    # totals over the n_bins-row frame: a bounded single-partition window
    # (n_bins rows by construction — never data-sized)
    from pyspark.sql import Window

    w = Window.partitionBy(F.lit(1))
    p_base = F.greatest(
        F.col("n_base") / F.sum("n_base").over(w), F.lit(float(eps))
    )
    p_cur = F.greatest(F.col("n_cur") / F.sum("n_cur").over(w), F.lit(float(eps)))
    return joined.select(
        "bin",
        (F.lit(lo) + F.col("bin") * width).alias("bin_lo"),
        (F.lit(lo) + (F.col("bin") + 1) * width).alias("bin_hi"),
        "n_base",
        "n_cur",
        p_base.alias("pct_base"),
        p_cur.alias("pct_cur"),
        ((p_cur - p_base) * F.log(p_cur / p_base)).alias("psi_contrib"),
    )
