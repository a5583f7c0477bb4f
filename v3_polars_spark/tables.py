"""L0 — schema registry and parquet directory sources/sinks for the four
v3 event tables.

Semantics from the reference (SURVEY.md §1):
- tables are immutable append-only event logs stored as a directory of
  parquet segments, read as one table (reference v3/state.py:130,152;
  v3/helpers/pool_helpers.py:20) — in Spark a directory read IS the union
  of appended segments (S1/S2, §2.6);
- 256-bit EVM quantities are strings at rest, cast to double at the point
  of use (reference v3/helpers/swap.py:61-64, v3/state.py:157-164);
- every read is tenant-filtered on (chain_name, address)
  (reference v3/state.py:131-134).

Scale design: the canonical on-disk layout is hive-partitioned by
``chain_name`` so tenant filters become partition pruning and "drop chain"
(reference v3/helpers/pool_helpers.py:207-231, S6) becomes a partition
delete instead of a per-file probe-and-remove. Reads enforce the declared
StructType so string-typed big ints never get auto-inferred as longs
(SURVEY.md §1.3).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

TABLES = [
    "factory_pool_created",
    "pool_initialize_events",
    "pool_swap_events",
    "pool_mint_burn_events",
]

_S = StringType()
_L = LongType()
_T = TimestampType()


def _common(with_tx_index: bool = True) -> list[StructField]:
    fields = [
        StructField("chain_name", _S),
        StructField("block_timestamp", _T),
        StructField("block_number", _L),
        StructField("transaction_hash", _S),
        StructField("log_index", _L),
    ]
    if with_tx_index:
        fields.append(StructField("transaction_index", _L))
    fields += [
        StructField("gas_price", _S),
        StructField("gas_used", _S),
        StructField("l1_fee", _S),
    ]
    return fields


# Physical schemas of the four landed tables (SURVEY.md §1.2; the reference
# documents them via v3/data/examples/{table} per connectors/template.py:95-101).
SCHEMAS: dict[str, StructType] = {
    "factory_pool_created": StructType(
        _common(with_tx_index=False)
        + [
            StructField("token0", _S),
            StructField("token1", _S),
            StructField("fee", _S),
            StructField("tickSpacing", _S),
            StructField("pool", _S),
        ]
    ),
    "pool_initialize_events": StructType(
        _common()
        + [
            StructField("address", _S),
            StructField("sqrtPriceX96", _S),
            StructField("tick", _S),
            StructField("to_address", _S),
            StructField("from_address", _S),
        ]
    ),
    "pool_swap_events": StructType(
        _common()
        + [
            StructField("address", _S),
            StructField("sender", _S),
            StructField("recipient", _S),
            StructField("amount0", _S),
            StructField("amount1", _S),
            StructField("sqrtPriceX96", _S),
            StructField("liquidity", _S),
            StructField("tick", _S),
            StructField("from_address", _S),
            StructField("to_address", _S),
        ]
    ),
    "pool_mint_burn_events": StructType(
        _common()
        + [
            StructField("address", _S),
            StructField("amount", _S),
            StructField("amount0", _S),
            StructField("amount1", _S),
            StructField("owner", _S),
            StructField("tick_lower", _S),
            StructField("tick_upper", _S),
            StructField("type_of_event", _L),
        ]
    ),
}


def read_table(
    spark: SparkSession,
    data_path: str,
    table: str,
    enforce_schema: bool = False,
) -> DataFrame:
    """Read an event table from its parquet directory (S1).

    The reference globs ``{data_path}/{table}/*.parquet``; a Spark directory
    read is the same implicit UNION ALL of segments, plus partition
    discovery if the layout is hive-partitioned. ``enforce_schema=False``
    (default) trusts parquet footers but re-orders/prunes to the registry
    columns when they all exist — robust to both the reference's example
    layout and our partitioned sink.
    """
    path = os.path.join(data_path, table)
    if enforce_schema:
        return spark.read.schema(SCHEMAS[table]).parquet(path)
    df = spark.read.parquet(path)
    want = [f.name for f in SCHEMAS[table].fields]
    have = set(df.columns)
    if all(c in have for c in want):
        df = df.select(*want)
    return df


def tenant_filter(df: DataFrame, chain: str, address: str | None = None) -> DataFrame:
    """The multi-tenant filter applied on every read
    (reference v3/state.py:131-134). Addresses are normalized lowercase at
    the boundary (reference v3/state.py:45)."""
    cond = F.col("chain_name") == chain
    if address is not None:
        cond = cond & (F.col("address") == address.lower())
    return df.filter(cond)


def with_as_of(df: DataFrame) -> DataFrame:
    """Derive the synthetic total-order key
    ``as_of = block_number + transaction_index/1e4``
    (reference v3/state.py:135-137). All time-travel reads are strict
    ``as_of < X`` — "the value before the transaction at that index"."""
    return df.withColumn(
        "as_of", F.col("block_number") + F.col("transaction_index") / F.lit(1e4)
    )


def write_segment(df: DataFrame, data_path: str, table: str) -> None:
    """Append one ingest segment (S2, reference v3/helpers/data_update.py:51-59).

    The reference names files ``{idx}_{min}_{max}_{table}.parquet`` to make
    the directory an ordered manifest; Spark's committed part-files plus the
    ``chain_name`` partition column carry the same information, and readers
    never depend on file order (every ordered op takes explicit sort keys).
    """
    (
        df.write.mode("append")
        .partitionBy("chain_name")
        .parquet(os.path.join(data_path, table))
    )


def drop_chain(spark: SparkSession, data_path: str, table: str, chain: str) -> None:
    """S6 'drop tables for a chain'. With the chain-partitioned layout this
    is a partition-directory delete — structurally fixing the reference's
    footgun of deleting co-located other-chain rows
    (reference v3/helpers/pool_helpers.py:218-231, SURVEY.md §8.1 Q6)."""
    import shutil

    part_dir = os.path.join(data_path, table, f"chain_name={chain}")
    if os.path.isdir(part_dir):
        shutil.rmtree(part_dir)
