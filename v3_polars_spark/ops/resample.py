"""Time-bucket (tumbling window) aggregation — L1 op A3 (SURVEY.md §2.4).

The reference resamples with ``group_by_dynamic(ts, every=frequency)``
(v3/helpers/pool_helpers.py:148-149,168-175) using duration strings like
"15m"/"6h". Spark's ``F.window`` is the same tumbling bucket semantics —
epoch-aligned closed-left buckets — and the identical expression streams
under a watermark (SURVEY.md §2.8), so the batch and streaming paths share
this op. A plain hash aggregation: one shuffle on the bucket key.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_UNITS = {
    "s": "seconds",
    "m": "minutes",
    "h": "hours",
    "d": "days",
    "w": "weeks",
}


def duration_to_interval(every: str) -> str:
    """Translate a Polars-style duration string ("15m", "6h", "1d") into a
    Spark interval string ("15 minutes", ...)."""
    m = re.fullmatch(r"(\d+)\s*([smhdw])", every.strip())
    if not m:
        # already a Spark interval string ("15 minutes")
        return every
    n, unit = m.groups()
    return f"{n} {_UNITS[unit]}"


_MICROS = {
    "seconds": 1_000_000,
    "minutes": 60_000_000,
    "hours": 3_600_000_000,
    "days": 86_400_000_000,
}


def _interval_micros(interval: str) -> int | None:
    """Fixed-length interval -> microseconds (None when not of the simple
    'N unit' form). Matches Spark's TimeWindow conversion exactly: months
    are disallowed there; days/weeks are fixed 86400 s multiples."""
    m = re.fullmatch(r"(\d+)\s+(seconds?|minutes?|hours?|days?)", interval.strip())
    if not m:
        return None
    n, unit = m.groups()
    return int(n) * _MICROS[unit.rstrip("s") + "s"]


def resample(
    df: DataFrame,
    ts_col: str,
    every: str,
    aggs: list[Column],
    bucket_alias: str = "bucket_ts",
    slide: str | None = None,
) -> DataFrame:
    """Tumbling-window aggregate: ``bucket_alias`` is the bucket START
    timestamp (matches Polars group_by_dynamic's bucket label).

    ``slide`` turns the tumbling window into a HOPPING one (width =
    ``every``, hop = ``slide``; each event lands in every/slide
    overlapping buckets — Spark's windowing replicates rows before the
    aggregation, so it remains one ordinary shuffle and streams under a
    watermark unchanged).

    Weekly buckets get startTime="96 hours": Spark aligns tumbling windows
    to the epoch (1970-01-01, a Thursday) while Polars aligns "1w" buckets
    to Monday — the offset shifts the grid to Monday boundaries."""
    interval = duration_to_interval(every)
    slide_interval = duration_to_interval(slide) if slide else None
    if slide_interval is None and not df.isStreaming:
        # Tumbling BATCH fast path: group on a LONG floor-aligned bucket
        # key (pure integer arithmetic, pmod = floor-mod so pre-1970
        # timestamps floor correctly) instead of F.window's per-row
        # (start, end) struct allocation + struct-key hashing — measured
        # ~10% off the 10 M-row sf1 resample. Streaming keeps F.window:
        # watermark state eviction is keyed to the time-window operator.
        if interval.endswith("weeks"):
            n = int(interval.split()[0])
            step, off = n * 7 * _MICROS["days"], 96 * _MICROS["hours"]
        else:
            step, off = _interval_micros(interval), 0
        if step is not None:
            # Bucket type must match what the F.window path would emit so
            # batch and streaming callers see one contract: F.window
            # preserves TIMESTAMP_NTZ but coerces DATE/STRING inputs to
            # TIMESTAMP — so cast back only for timestamp-family inputs.
            ts_type = dict(df.dtypes)[ts_col]
            out_type = ts_type if ts_type.startswith("timestamp") else "timestamp"
            e = F.unix_micros(F.col(ts_col).cast("timestamp"))
            bucket = e - F.pmod(e - F.lit(off), F.lit(step))
            out = df.groupBy(bucket.alias("__b")).agg(*aggs)
            return out.withColumn(
                bucket_alias,
                F.timestamp_micros(F.col("__b")).cast(out_type),
            ).drop("__b")
    if interval.endswith("weeks"):
        n = int(interval.split()[0])
        win = F.window(
            F.col(ts_col), f"{n * 7} days", slide_interval, startTime="96 hours"
        ) if slide_interval else F.window(
            F.col(ts_col), f"{n * 7} days", startTime="96 hours"
        )
    elif slide_interval:
        win = F.window(F.col(ts_col), interval, slide_interval)
    else:
        win = F.window(F.col(ts_col), interval)
    out = df.groupBy(win.alias("__w")).agg(*aggs)
    return out.withColumn(bucket_alias, F.col("__w.start")).drop("__w")
