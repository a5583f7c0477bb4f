"""Exponentially-weighted moving average — the documented escape hatch.

EWMA is genuinely recursive (y_t = a*x_t + (1-a)*y_{t-1}): no
fixed-width window frame or prefix aggregate expresses it, so this is
one of the few operators where the right Spark answer is a vectorized
Pandas path, not column expressions (SURVEY §2.9's rule: built-ins
first, Arrow-batched pandas only where built-ins can't express the
semantics). ``applyInPandas`` per key keeps it distributed: each key's
series is one group, the recursion runs inside pandas' C ``ewm`` kernel,
and there is exactly one shuffle (the groupBy). Keys must fit a task's
memory — the same per-key contract as every keyed window here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ewma(
    df: DataFrame,
    value_col: str,
    order_col: str,
    by: list[str],
    alpha: float = 0.3,
    out: str = "ewma",
) -> DataFrame:
    """Per-key EWMA of ``value_col`` in ``order_col`` order.

    Returns the input columns plus ``out``. ``adjust=False`` pandas
    semantics: y_0 = x_0, y_t = alpha*x_t + (1-alpha)*y_{t-1}.
    """
    if not by:
        raise ValueError("ewma requires at least one key column ('by')")

    from pyspark.sql.types import DoubleType, StructField, StructType

    cols = list(df.columns)
    # fresh StructType: .add would mutate the DataFrame's cached schema
    schema = StructType(
        list(df.schema.fields) + [StructField(out, DoubleType(), True)]
    )

    def _fold(pdf):
        pdf = pdf.sort_values(order_col, kind="mergesort")
        pdf[out] = (
            pdf[value_col].astype("float64").ewm(alpha=alpha, adjust=False).mean()
        )
        return pdf[cols + [out]]

    return df.groupBy(*by).applyInPandas(_fold, schema=schema)
