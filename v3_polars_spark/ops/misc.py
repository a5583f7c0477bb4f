"""Small L1 ops: coalescing outer join (J1), dict-map recode (P8),
segment bounds (W7), emptiness probe (A9). SURVEY.md §2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def outer_join_coalesced(
    left: DataFrame, right: DataFrame, on: str | list[str], fill=None
) -> DataFrame:
    """J1 — full outer equi-join with a single coalesced key column.

    Spark's USING-style join (string/list key) already coalesces the key,
    matching old-Polars outer semantics the reference relies on
    (v3/helpers/swap_math.py:62-65). ``fill`` applies ``na.fill`` to the
    non-key columns (the reference's ``fill_null(0)``).
    """
    keys = [on] if isinstance(on, str) else list(on)
    out = left.join(right, keys, "full_outer")
    if fill is not None:
        out = out.na.fill(fill, subset=[c for c in out.columns if c not in keys])
    return out


def recode_map(
    df: DataFrame,
    col: str,
    mapping: dict,
    out: str | None = None,
    default=None,
) -> DataFrame:
    """P8 — map/dict recode with null (or ``default``) for unmatched keys
    (reference v3/helpers/data_update.py:260-277, OVM1→EVM address
    translation via ``map_dict``).

    Small maps inline as a literal MapType (constant-folded, no shuffle);
    at scale the same semantics come from a broadcast-joined mapping table —
    use ``recode_join`` for that.
    """
    pairs = []
    for k, v in mapping.items():
        pairs += [F.lit(k), F.lit(v)]
    m = F.create_map(*pairs)
    expr = F.element_at(m, F.col(col))
    if default is not None:
        expr = F.coalesce(expr, F.lit(default))
    return df.withColumn(out or col, expr)


def recode_join(
    df: DataFrame,
    col: str,
    mapping_df: DataFrame,
    key_col: str,
    value_col: str,
    out: str | None = None,
) -> DataFrame:
    """P8 at scale: broadcast left join against a mapping dimension
    (SURVEY.md §1.2 'CSV mapping table → small dimension DataFrame,
    broadcast')."""
    m = F.broadcast(
        mapping_df.select(
            F.col(key_col).alias("__k"), F.col(value_col).alias("__recode_v")
        ).dropDuplicates(["__k"])  # a dup mapping key would multiply event rows
    )
    joined = df.join(m, df[col] == m["__k"], "left").drop("__k")
    return joined.withColumn(out or col, F.col("__recode_v")).drop("__recode_v")


def segment_bounds(df: DataFrame, order_col: str, n_rows: int):
    """W7 — the block horizon that accumulates ~n_rows in ``order_col``
    order (reference ingest segmentation, v3/helpers/data_update.py:93-104;
    SQL shape gbq.py:49-71). Spark: TakeOrdered(n) then max — no full sort."""
    row = (
        df.orderBy(F.col(order_col).asc())
        .limit(n_rows)
        .agg(F.max(F.col(order_col)).alias("hi"))
        .first()
    )
    return row["hi"] if row else None


def is_empty(df: DataFrame) -> bool:
    """A9 emptiness probe (reference ``.is_empty()`` gates,
    v3/helpers/data_update.py:56,87). Spark's isEmpty is a limit-1 probe."""
    return df.isEmpty()
