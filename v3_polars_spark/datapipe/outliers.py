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
