"""Ordered per-key sequence assembly — build training examples from logs.

The last step of most LLM data pipelines over interaction logs is
reassembly: collapse each key's rows (a user's events, a thread's
messages, a document's chunks) into ONE ordered training example. The
scale shape is a single hash aggregation: ``collect_list(struct(order
cols, value))`` per key (map-side partial aggregation, one shuffle on
the key), then ``array_sort`` + ``transform`` + ``array_join`` entirely
inside codegen — never a global sort, never a window, never Python.

The per-key payload is the only thing that grows: a pathological key
with millions of rows would balloon its aggregation buffer. ``max_items``
bounds that by truncating each sorted sequence (keep-earliest) inside
the same plan; at 100 TB pair it with an upstream heavy-key audit
(``ops.profile``) the way web-scale dedup pipelines cap per-domain
document counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assemble_sequences(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    value_col: str,
    sep: str = " ",
    max_items: int | None = None,
    out: str = "sequence",
) -> DataFrame:
    """One row per key: ``value_col`` values concatenated in
    ``order_cols`` order (ties broken by the value itself, so the result
    is deterministic even for duplicate order keys).

    Returns ``key_cols + [out, n_items]`` where ``n_items`` counts the
    items actually assembled (post-truncation).
    """
    grouped = df.groupBy(*key_cols).agg(
        F.array_sort(
            F.collect_list(F.struct(*order_cols, F.col(value_col).alias("__v")))
        ).alias("__packed")
    )
    packed = F.col("__packed")
    if max_items is not None:
        packed = F.slice(packed, 1, max_items)
    vals = F.transform(packed, lambda x: x["__v"])
    return grouped.select(
        *key_cols,
        F.array_join(vals, sep).alias(out),
        F.size(vals).alias("n_items"),
    )
