"""Dataset profiling — per-column health stats in ONE pass.

The standard pre-ingest/post-transform check (null rates, cardinalities,
value ranges) computed as a single wide aggregation over one scan: every
column contributes its (count, nulls, distinct, min, max) expressions to
the same hash-aggregate, so profiling a 100 TB table costs one read no
matter how many columns are profiled. Exact distinct counts by default
(the verification-friendly choice); pass ``approx=True`` to swap in
HLL++ estimates, which turns the blocking expand-per-distinct-value agg
into fixed-size sketch state per column — the right knob at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    cols: list[str] | None = None,
    approx: bool = False,
) -> DataFrame:
    """Long-format profile: one row per column with ``n_rows``,
    ``n_nulls``, ``n_distinct``, ``min_str``, ``max_str`` (min/max cast
    to string so heterogeneous column types stack into one frame)."""
    cols = cols or df.columns
    distinct = (
        (lambda c: F.approx_count_distinct(c)) if approx else F.countDistinct
    )
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"__nulls_{c}"),
            distinct(c).alias(f"__dist_{c}"),
            F.min(F.col(c).cast("string")).alias(f"__min_{c}"),
            F.max(F.col(c).cast("string")).alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n_rows"),
                F.col(f"__nulls_{c}").alias("n_nulls"),
                F.col(f"__dist_{c}").alias("n_distinct"),
                F.col(f"__min_{c}").alias("min_str"),
                F.col(f"__max_{c}").alias("max_str"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(rows).alias("p")).select("p.*")
