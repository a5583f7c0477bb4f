"""Gap-based session windows (sessionization) — a training-data-pipeline
staple (user activity segmentation, conversation threading) the reference
has no analog for; included as a first-class L1 op alongside the tumbling
``resample`` (SURVEY.md §2.4 A3).

Implemented with Spark's native ``F.session_window``: an ordinary
aggregation whose grouping key is the merged session interval — one shuffle
on (by, session), map-side partial merge, and the IDENTICAL expression
streams under a watermark (Structured Streaming merges late sessions
per-key in state). Semantics: two events belong to the same session iff
the later one starts at or before ``earlier.ts + gap`` — touching windows
merge (Spark's session-window contract; verified by test_ops); the
session's ``end`` is ``last.ts + gap``. Equal to the classic
gaps-and-islands SQL formulation (new session iff ``ts > lag(ts) + gap``)
an oracle can replay.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .resample import duration_to_interval


def sessionize(
    df: DataFrame,
    ts_col: str,
    gap: str,
    by: list[str] | None = None,
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Aggregate events into gap-delimited sessions.

    Output: ``by`` + (session_start, session_end) + the ``aggs`` (default:
    ``n_events``). ``session_start`` is the first event's timestamp;
    ``session_end`` is last event's timestamp + gap (exclusive bound).
    ``gap`` accepts Polars-style durations ("30m") or Spark intervals.
    """
    by = by or []
    aggs = aggs or [F.count(F.lit(1)).alias("n_events")]
    interval = duration_to_interval(gap)
    win = F.session_window(F.col(ts_col), interval)
    out = df.groupBy(*by, win.alias("__s")).agg(*aggs)
    return (
        out.withColumn("session_start", F.col("__s.start"))
        .withColumn("session_end", F.col("__s.end"))
        .drop("__s")
    )
