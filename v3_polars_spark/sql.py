"""SQL surface: register the event tables (and derived as-of views) as
temp views so every query in this engine is reachable from ``spark.sql``.

The reference exposes only a Python API; Spark gives us the SQL runtime
for free — the same Catalyst plans serve both. ``register_tables`` is the
one-call setup; the docstring examples are the §2 composite queries in
their SQL form (same plans as the DataFrame builders, verified in tests).
"""

from __future__ import annotations

import hashlib
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from . import tables as T

VIEWS = {
    "factory_pool_created": "factory",
    "pool_initialize_events": "initialize_events",
    "pool_swap_events": "swaps",
    "pool_mint_burn_events": "mint_burns",
}


def register_tables(
    spark: SparkSession, data_path: str, suffix: str = ""
) -> list[str]:
    """Create temp views over a landed event-table directory.

    - ``swaps{suffix}`` / ``mint_burns{suffix}``: with the ``as_of``
      total-order key derived (and mint/burn numeric casts applied, as the
      batch reader does — reference v3/state.py:135-167);
    - ``factory{suffix}`` / ``initialize_events{suffix}``: raw.

    Returns the view names. Example SQL (same plan as create_liq):

        SELECT tick, SUM(delta) OVER (ORDER BY tick
                                      ROWS UNBOUNDED PRECEDING) AS liquidity
        FROM (
            SELECT COALESCE(tl.tick, tu.tick) AS tick,
                   COALESCE(l, 0) + COALESCE(u, 0) AS delta
            FROM (SELECT tick_lower AS tick,
                         SUM(CAST(amount AS DOUBLE) * type_of_event) AS l
                  FROM mint_burns WHERE chain_name = ? AND address = ?
                    AND as_of < ? GROUP BY 1 HAVING SUM(...) != 0) tl
            FULL OUTER JOIN (...) tu USING (tick)
        )
    """
    names = []
    for table, base in VIEWS.items():
        df = T.read_table(spark, data_path, table)
        if table == "pool_mint_burn_events":
            from pyspark.sql import functions as F

            df = df.withColumns(
                {
                    "amount": F.col("amount").cast("double"),
                    "tick_lower": F.col("tick_lower").cast("long"),
                    "tick_upper": F.col("tick_upper").cast("long"),
                    "type_of_event": F.col("type_of_event").cast("double"),
                }
            )
        if table in ("pool_swap_events", "pool_mint_burn_events"):
            df = T.with_as_of(df)
        name = f"{base}{suffix}"
        df.createOrReplaceTempView(name)
        names.append(name)
    return names


def register_testdata(
    spark: SparkSession,
    sf_dir: str,
    loader: Callable[[SparkSession, str, str], DataFrame],
    table_names: tuple[str, ...] = (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ),
) -> dict[str, str]:
    """Register the analytics tables as temp views so any portable SQL
    string runs through ``spark.sql`` against the same (cached) frames
    the DataFrame queries use.

    View names are suffixed with a hash of ``sf_dir`` so one session can
    serve several data directories without view collisions; returns the
    {logical name -> view name} mapping for ``str.format`` substitution
    into SQL templates.
    """
    sfx = "_" + hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    out = {}
    for t in table_names:
        df = loader(spark, sf_dir, t)
        view = f"{t}{sfx}"
        df.createOrReplaceTempView(view)
        out[t] = view
    return out
