"""Physical-plan inspection helpers.

The scale contract of every operator ("filter is pushed down", "this join
broadcasts", "only one shuffle") is enforceable, not aspirational: these
helpers parse `.explain("formatted")` output so tests can pin plan shapes
and fail when a refactor silently introduces an extra Exchange or loses
parquet pushdown.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's parquet scans."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[(.*?)\]", explain_str(df)):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists actually read from parquet (one per scan) — the
    column-pruning evidence."""
    schemas = []
    for m in re.finditer(r"ReadSchema: struct<(.*?)>", explain_str(df)):
        cols = [f.split(":")[0].strip() for f in m.group(1).split(",") if f.strip()]
        schemas.append(cols)
    return schemas


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchanges in the plan (BroadcastExchange excluded —
    broadcasts are the cheap kind)."""
    return len(re.findall(r"\(\d+\) Exchange\b", explain_str(df)))


def has_broadcast_hash_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df)
