"""Per-group outlier scoring for corpus quality metrics.

Flags documents whose metric (length, token count, repetition fraction,
...) sits more than ``z`` sample standard deviations from their group's
mean — the usual guard against truncated/concatenated/garbage documents
before training. Two-pass shape that scales: one hash aggregate computes
per-group moments (groups are few — language, source — so the stats
frame broadcasts), then one broadcast join scores every row; no window
over the full table, no second shuffle.

Moments are accumulated as exact integer/decimal sums (sum(x), sum(x^2),
n) and the mean/variance derived with explicit IEEE arithmetic rather
than a streaming variance aggregate, so the result is bit-reproducible
across engines and partitionings (sum order does not matter while the
sums are exact) — which is what lets the DuckDB oracle hash-match it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zscore_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    z: float = 3.0,
) -> DataFrame:
    """Score ``value_col`` against its group distribution.

    Returns the input columns plus ``group_mean``, ``group_std`` (sample
    std, NULL for singleton groups), ``zscore`` and ``is_outlier``
    (|zscore| > z; false where std is NULL/0). ``value_col`` must be
    integral (or exact decimal) for cross-engine reproducibility — casts
    to long for the moment sums.
    """
    v = F.col(value_col).cast("long")
    stats = df.groupBy(*group_cols).agg(
        F.sum(v).alias("__s1"),
        F.sum(v * v).alias("__s2"),
        F.count(v).alias("__n"),
    )
    mean = F.col("__s1").cast("double") / F.col("__n")
    # sample variance from exact sums: (s2 - s1^2/n) / (n - 1)
    var = (
        F.col("__s2").cast("double")
        - F.col("__s1").cast("double") * F.col("__s1") / F.col("__n")
    ) / (F.col("__n") - 1)
    stats = stats.select(
        *group_cols,
        mean.alias("group_mean"),
        F.when(F.col("__n") > 1, F.sqrt(F.greatest(var, F.lit(0.0)))).alias(
            "group_std"
        ),
    )
    scored = df.join(F.broadcast(stats), group_cols, "left")
    zscore = F.when(
        F.col("group_std") > 0,
        (F.col(value_col).cast("double") - F.col("group_mean")) / F.col("group_std"),
    )
    return scored.withColumn("zscore", zscore).withColumn(
        "is_outlier", F.coalesce(F.abs(F.col("zscore")) > z, F.lit(False))
    )


def corr_exact(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: list[str],
    decimals: int = 2,
) -> DataFrame:
    """Per-group Pearson correlation, bit-reproducible across engines.

    Streaming correlation aggregates (Welford) give order-dependent
    floats; here both variables are fixed-pointed to ``decimals`` and the
    five moment sums (n, Sx, Sy, Sxx, Syy, Sxy) accumulate as
    decimal(38,0) — exact under any partitioning — with the correlation
    derived by explicit IEEE arithmetic from the exact sums. One
    map-side-combinable hash aggregate. NULL for degenerate groups
    (n < 2 or zero variance).
    """
    scale = 10 ** decimals
    x = F.round(F.col(x_col) * scale).cast("decimal(38,0)")
    y = F.round(F.col(y_col) * scale).cast("decimal(38,0)")
    m = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(x).alias("__sx"),
        F.sum(y).alias("__sy"),
        F.sum(x * x).alias("__sxx"),
        F.sum(y * y).alias("__syy"),
        F.sum(x * y).alias("__sxy"),
    )
    n = F.col("__n").cast("double")
    sx, sy = F.col("__sx").cast("double"), F.col("__sy").cast("double")
    sxx, syy = F.col("__sxx").cast("double"), F.col("__syy").cast("double")
    sxy = F.col("__sxy").cast("double")
    cov = sxy - sx * sy / n
    vx = sxx - sx * sx / n
    vy = syy - sy * sy / n
    corr = F.when(
        (F.col("__n") > 1) & (vx > 0) & (vy > 0), cov / F.sqrt(vx * vy)
    )
    return m.select(
        *group_cols, F.col("__n").cast("long").alias("n"), corr.alias("corr")
    )


def mad_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    z: float = 3.5,
) -> DataFrame:
    """Robust (median/MAD) outlier scoring — the heavy-tail-safe twin of
    ``zscore_outliers``: web-scale length/score distributions have tails
    that inflate the mean and std until nothing is an outlier, while the
    median and the Median Absolute Deviation ignore them.

    Score: modified z ``0.6745 * (x - median) / MAD`` (Iglewicz-Hoaglin),
    ``is_outlier`` = |score| > z (their recommended 3.5 default); NULL
    score where MAD is 0/NULL (constant or singleton group).

    Two grouped exact-percentile aggregations (median, then MAD over
    |x - median|) and two broadcast joins of the tiny per-group stats —
    no window over the data, so it scales like two hash aggs. Exact
    interpolated percentiles keep the result engine-portable for integral
    ``value_col`` (medians are then .0/.5 rationals, exact in double —
    the same argument as ``zscore_outliers``' moment sums).
    """
    v = F.col(value_col).cast("double")
    med = (
        df.filter(v.isNotNull())
        .groupBy(*group_cols)
        .agg(F.percentile(v, F.lit(0.5)).alias("group_median"))
    )
    with_med = df.join(F.broadcast(med), group_cols, "left")
    mad = (
        with_med.filter(v.isNotNull())
        .groupBy(*group_cols)
        .agg(
            F.percentile(F.abs(v - F.col("group_median")), F.lit(0.5)).alias(
                "group_mad"
            )
        )
    )
    scored = with_med.join(F.broadcast(mad), group_cols, "left")
    score = F.when(
        F.col("group_mad") > 0,
        F.lit(0.6745) * (v - F.col("group_median")) / F.col("group_mad"),
    )
    return scored.withColumn("mad_z", score).withColumn(
        "is_outlier", F.coalesce(F.abs(F.col("mad_z")) > z, F.lit(False))
    )
