"""Funnel analysis — furthest ordered step reached per key.

The event-analytics staple: given an ordered list of step predicates
(view → click → purchase), find for each user the earliest time each
step was completed with strictly increasing timestamps, and the furthest
stage reached.

Scale shape: ONE shuffle. Events are collected per key into a
timestamp-sorted array (one hash aggregate) and the funnel recursion
runs as an ``F.aggregate`` fold over that array — entirely JVM-side
column expressions, no UDF, no per-step re-join. The k-join formulation
(min-per-step + join, which the SQL oracle uses) costs k shuffles and
re-reads; it is the semantic spec, not the plan. Per-key event lists
must fit a task (same contract as every keyed window here); at 100 TB
pre-filter to the funnel's event types first — the fold only needs
step events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    df: DataFrame,
    steps: list[str],
    ts_col: str,
    type_col: str,
    by: list[str],
) -> DataFrame:
    """Per ``by`` key: ``stage`` (how many of ``steps`` completed in
    strict timestamp order) and ``t_<i>`` epoch-micros completion time
    for each step (NULL once incomplete).

    A step completes at the earliest event of its type that is strictly
    later than the previous step's completion. Events sort by
    (timestamp, step-rank) so a same-timestamp tie never advances two
    steps at once.
    """
    k = len(steps)
    if k == 0:
        raise ValueError("funnel requires at least one step")
    rank = F.create_map(
        *[x for i, s in enumerate(steps) for x in (F.lit(s), F.lit(i))]
    )
    ev = df.filter(F.col(type_col).isin(steps)).select(
        *by,
        F.struct(
            # cast: parquet NTZ timestamps -> TIMESTAMP (UTC session, so
            # the cast is identity) for unix_micros
            F.unix_micros(F.col(ts_col).cast("timestamp")).alias("t"),
            F.element_at(rank, F.col(type_col)).alias("r"),
        ).alias("__e"),
    )
    # acc: (stage, times[k]); one pass over the time-sorted event array
    zero = F.struct(
        F.lit(0).alias("stage"),
        F.array_repeat(F.lit(None).cast("long"), k).alias("times"),
    )
    advance = lambda acc, e: F.when(  # noqa: E731
        (acc["stage"] < k)
        & (e["r"] == acc["stage"])
        & ((acc["stage"] == 0) | (e["t"] > acc["times"][acc["stage"] - 1])),
        F.struct(
            (acc["stage"] + 1).alias("stage"),
            F.concat(
                F.slice(acc["times"], 1, acc["stage"]),
                F.array(e["t"]),
                F.slice(
                    acc["times"],
                    acc["stage"] + 2,
                    k - acc["stage"] - 1,
                ),
            ).alias("times"),
        ),
    ).otherwise(acc)
    agg = ev.groupBy(*by).agg(
        F.aggregate(
            F.array_sort(F.collect_list("__e")), zero, advance
        ).alias("__f")
    )
    return agg.select(
        *by,
        F.col("__f.stage").alias("stage"),
        *[F.col("__f.times")[i].alias(f"t_{i}") for i in range(k)],
    )
