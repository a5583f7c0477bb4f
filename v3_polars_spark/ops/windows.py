"""Ordered/window operators — L1 ops W1-W3, W5 and the scalable prefix-sum
(SURVEY.md §2.5, §4 "ordered-state physicality").

The reference's cumsum/shift/forward-fill run as single-threaded ordered
scans in Polars. Here each op takes explicit (partition, order) keys:

- with ``by`` keys (pool/chain/user) Spark parallelizes natively;
- without keys, ``cumsum``/``lead``/``ffill`` degrade to a single-task
  window — correct, and fine for O(ticks) frames — while
  ``cumsum_scalable`` provides the two-pass distributed prefix sum for
  globally-ordered 100 TB data: range-repartition by the order key, window
  WITHIN each partition (parallel), then add broadcast per-partition offsets.
  Cost: one range shuffle + one tiny driver collect of #partitions rows;
  no global sort task ever materializes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _window(by: list[str] | None, order: list[str | Column], desc: bool = False):
    cols = [F.col(c) if isinstance(c, str) else c for c in order]
    keys = [c.desc() if desc else c.asc() for c in cols]
    w = Window.partitionBy(*(by or [])).orderBy(*keys)
    return w.rowsBetween(Window.unboundedPreceding, Window.currentRow)


def cumsum(
    df: DataFrame,
    col: str,
    order: list[str],
    by: list[str] | None = None,
    out: str | None = None,
    desc: bool = False,
) -> DataFrame:
    """W1 running sum over an explicit order (reference
    v3/helpers/swap_math.py:68 — the liquidity distribution is literally a
    prefix sum; v3/helpers/swap.py:154-158 — cumulative tradable amounts)."""
    return df.withColumn(out or col, F.sum(F.col(col)).over(_window(by, order, desc)))


def lead_col(
    df: DataFrame,
    col: str,
    order: list[str],
    by: list[str] | None = None,
    out: str | None = None,
    default=None,
) -> DataFrame:
    """W2 shift(-1): next value in order; nulls at the end filled with
    ``default`` (reference v3/helpers/pool_helpers.py:82-84 fills the last
    tick range with (MAX_TICK // ts) * ts)."""
    w = Window.partitionBy(*(by or [])).orderBy(*[F.col(c).asc() for c in order])
    expr = F.lead(F.col(col), 1).over(w)
    if default is not None:
        expr = F.coalesce(expr, F.lit(default))
    return df.withColumn(out or col, expr)


def ffill(
    df: DataFrame,
    cols: list[str],
    order: list[str],
    by: list[str] | None = None,
) -> DataFrame:
    """W3 forward fill = last non-null so far (reference
    v3/helpers/pool_helpers.py:176-180, gaps in sparse resample buckets)."""
    w = _window(by, order)
    out = df
    for c in cols:
        out = out.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))
    return out


def first_covering(
    df: DataFrame,
    cum_col: str,
    threshold,
    order: list[str],
    desc: bool = False,
) -> DataFrame:
    """W5 first row whose cumulative value covers ``threshold`` — the
    vectorized replacement for Solidity's per-tick loop (reference
    v3/helpers/swap.py:168: ``filter(cumulative >= need).head(1)``).
    Spark shape: filter + TakeOrdered(1) — no full sort."""
    keys = [F.col(c).desc() if desc else F.col(c).asc() for c in order]
    return df.filter(F.col(cum_col) >= F.lit(threshold)).orderBy(*keys).limit(1)


def take_ordered(
    df: DataFrame,
    keys: list[Column],
    k: int,
    expected_rows: int | None = None,
    rows_per_task: int = 50_000,
) -> DataFrame:
    """W6 ordered limit-``k`` (TakeOrderedAndProject — per-partition heap
    top-k, driver merge of #partitions × k rows; never a full sort), with
    a scheduling-floor cut for KNOWN-SMALL inputs.

    A LIMIT-k runs one tiny heap task per input partition; over a cached
    table split for data-parallel queries (32 ways) that is pure task-
    scheduling floor when the whole table is a few hundred thousand rows.
    When the caller knows the input size (``expected_rows`` — e.g. from
    parquet footers at cache-materialization time), the scan is coalesced
    (narrow dependency, NO shuffle, cache untouched) so per-task work
    stays ~``rows_per_task`` rows and the task count shrinks with the
    data. With no hint the input partitioning is left alone: at scale the
    scan dominates and every partition is worth a task — measured at
    sf1 (1.5 M rows) ANY coalesce loses (0.10 s → 0.15-0.21 s, the merged
    tasks serialize the scan), while at sf0.1 (150 k rows) coalescing to
    ~3 tasks wins 0.085 s → 0.055 s. The hint rule reproduces both
    choices automatically.

    ``expected_rows`` must describe ``df`` ITSELF (post-filter), not an
    unfiltered parent table — an overestimate merely keeps more tasks, but
    a parent-table count on a highly selective filter would defeat the
    coalesce. ``coalesce(n)`` is a no-op when ``n`` >= the current
    partition count, so no partition-count probe is needed (the previous
    ``df.rdd.getNumPartitions()`` probe forced a plan-to-RDD conversion on
    every call — non-trivial on complex cached plans, and pre-AQE anyway).
    """
    if expected_rows is not None:
        target = max(1, -(-int(expected_rows) // rows_per_task))
        df = df.coalesce(target)
    return df.orderBy(*keys).limit(k)


def cumsum_scalable(
    df: DataFrame,
    col: str,
    order_col: str,
    out: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed global prefix sum (the 100 TB path for W1 when there is
    no natural partition key).

    Two passes:
      1. ``repartitionByRange(order_col)`` then window partitioned by the
         physical partition id — each task prefix-sums its own range slice.
      2. per-partition totals (#partitions rows) come to the driver, are
         exclusive-prefix-summed, and go back as a broadcast join on the
         partition id.

    The only full-data movement is the range shuffle; no stage is
    single-task. Determinism requires ``order_col`` to be a total order
    within each partition — pass a unique key (or add a tiebreaker column).
    """
    out = out or col
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(parts, F.col(order_col)).withColumn(
        "__pid", F.spark_partition_id()
    )
    w = (
        Window.partitionBy("__pid")
        .orderBy(F.col(order_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranged = ranged.withColumn("__local_cum", F.sum(F.col(col)).over(w))
    # cache: pass 2 reuses the shuffled+windowed result instead of recomputing
    ranged = ranged.persist()
    totals = (
        ranged.groupBy("__pid").agg(F.sum(F.col(col)).alias("__tot")).collect()
    )
    totals_sorted = sorted(((r["__pid"], r["__tot"]) for r in totals))
    offsets, running = {}, 0
    for pid, tot in totals_sorted:
        offsets[pid] = running
        running += tot or 0
    spark = df.sparkSession
    # offsets keep the column's own numeric type (no float() coercion —
    # long sums past 2^53 would silently lose precision as doubles) and
    # the explicit schema also makes the empty-input case well-defined
    from pyspark.sql.types import LongType, StructField, StructType

    sum_type = ranged.schema["__local_cum"].dataType
    off_schema = StructType(
        [StructField("__pid", LongType()), StructField("__off", sum_type)]
    )
    conv = float if sum_type.typeName() in ("double", "float") else int
    offsets_df = spark.createDataFrame(
        [(int(pid), conv(off)) for pid, off in offsets.items()], off_schema
    )
    zero = F.lit(0).cast(sum_type)
    joined = ranged.join(F.broadcast(offsets_df), "__pid", "left")
    return joined.withColumn(
        out, F.col("__local_cum") + F.coalesce(F.col("__off"), zero)
    ).drop("__pid", "__local_cum", "__off")
