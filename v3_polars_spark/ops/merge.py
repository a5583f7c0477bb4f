"""MERGE (upsert) — apply a batch of keyed updates onto a snapshot.

The engine's tables are append-only event logs (SURVEY §1), but the
derived *snapshot* tables users maintain from them (latest position per
NFP token, current liquidity per tick, account balances) need MERGE
semantics: update matched keys, insert unmatched ones, optionally delete.
Lakehouse formats bolt this onto the table layer; as a relational
operator it is exactly one full-outer equi-join with coalescing
projection — which is how it scales: one shuffle (or zero, if both sides
are bucketed by the key via ``tables.write_bucketed``), no row-at-a-time
log replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    keys: list[str],
    delete_col: str | None = None,
) -> DataFrame:
    """Upsert ``updates`` into ``target`` on ``keys``.

    - matched keys take every non-key column from ``updates``;
    - unmatched update rows are inserted;
    - unmatched target rows pass through;
    - if ``delete_col`` names a boolean column in ``updates``, matched
      rows with it true are dropped (the WHEN MATCHED THEN DELETE arm);
      the column itself is not emitted.

    Both sides must share the schema (minus ``delete_col``). Updates must
    be unique per key — enforce upstream with ``dedup_last`` (which is
    also the right way to collapse a CDC batch to its final state).
    """
    u_cols = [c for c in updates.columns if c != delete_col]
    if set(u_cols) != set(target.columns):
        raise ValueError("target and updates schemas must match (minus delete_col)")
    data_cols = [c for c in target.columns if c not in keys]
    t = target.select(
        *keys, *[F.col(c).alias(f"__t_{c}") for c in data_cols]
    )
    u_extra = [F.col(delete_col).alias("__del")] if delete_col else []
    u = updates.select(
        *keys,
        *[F.col(c).alias(f"__u_{c}") for c in data_cols],
        F.lit(True).alias("__has_u"),
        *u_extra,
    )
    j = t.join(u, keys, "full_outer")
    if delete_col:
        j = j.filter(~F.coalesce(F.col("__del"), F.lit(False)))
    return j.select(
        *keys,
        *[
            F.when(F.col("__has_u").isNotNull(), F.col(f"__u_{c}"))
            .otherwise(F.col(f"__t_{c}"))
            .alias(c)
            for c in data_cols
        ],
    )
