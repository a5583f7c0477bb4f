"""Cogrouped-pandas escape hatch — the last cell of the UDF-surface matrix.

The engine's UDF story (SURVEY §2.9) is: built-in column expressions
first, Arrow-batched ``mapInPandas`` for per-row kernels,
``applyInPandas`` for per-key recursive semantics (EWMA),
``applyInPandasWithState`` for streaming state. The remaining Spark
surface is ``groupBy().cogroup().applyInPandas`` — TWO tables shuffled
to the same keys, each key's pair of pandas frames handed to one Python
function. It is the right escape hatch when per-key logic genuinely
needs both sides materialized together and is not expressible as a join
(pandas-library algorithms, per-key model scoring against a reference
frame).

``cogrouped_asof`` demonstrates the pattern with semantics the engine
already has natively: per-key ``pandas.merge_asof``. The column-
expression ``ops.asof.asof_join`` (one window, no Python) remains the
production path — pinned by the parity test — so this module is the
documented template, not a replacement: same shuffle count (one per
side), but Arrow transfer + per-key Python on the hot path, and a
whole-key memory footprint instead of a streaming window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def cogrouped_asof(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    value_cols: list[str],
) -> DataFrame:
    """Backward as-of join via ``cogroup().applyInPandas`` — per key,
    ``pandas.merge_asof(left_sorted, right_sorted, on=on)``. Output is
    ``left.* + value_cols`` (right-side columns carried at the last
    right ``on`` <= left ``on``). Requires ``by`` keys: cogrouping IS
    the per-key shuffle; there is deliberately no single-key fallback."""
    import pandas as pd

    if not by:
        raise ValueError("cogrouped_asof requires by keys (the cogroup keys)")
    out_fields = left.schema.fields + [
        f for f in right.schema.fields if f.name in value_cols
    ]
    from pyspark.sql.types import StructType

    schema = StructType(out_fields)
    names = [f.name for f in out_fields]

    def merge(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if l.empty:
            return pd.DataFrame(columns=names)
        l = l.sort_values(on, kind="mergesort")
        if r.empty:
            out = l.copy()
            for c in value_cols:
                out[c] = None
            return out[names]
        r = r.sort_values(on, kind="mergesort")
        merged = pd.merge_asof(
            l, r[[on] + value_cols], on=on, direction="backward"
        )
        return merged[names]

    return (
        left.groupBy(*by)
        .cogroup(right.groupBy(*by))
        .applyInPandas(merge, schema)
    )
