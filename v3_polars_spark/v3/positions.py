"""NFP position attribution: match NonfungiblePositionManager events to
the core pool mint/burn events they wrap.

The reference performs this inside the provider's SQL (allium.py:158-212):
decoded position-manager logs join core uniswap_v3 events on FOUR equi
keys (transaction_hash, amount, amount0, amount1) plus the log-ordering
theta predicate nfp.log_index > core.log_index — the NFP wrapper event is
always emitted after the core event it wraps within a transaction.

Spark shape: the equi keys drive an ordinary shuffled hash/sort-merge
join (transaction_hash is high-cardinality, so partitions balance); the
theta predicate rides along as a join residual evaluated per matched
pair — NO cross product, no range-join blowup. At 100 TB both sides
shuffle once on the equi keys and the residual is a per-row comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: columns of the matched-positions output, mirroring the reference's
#: nfp SELECT list (allium.py:163-175)
POSITION_COLUMNS = [
    "name",
    "chain_name",
    "transaction_hash",
    "block_number",
    "tx_index",
    "from_address",
    "amount",
    "amount0",
    "amount1",
    "tokenId",
    "address",
    "tick_lower",
    "tick_upper",
]


def nfp_positions(nfp: DataFrame, mint_burns: DataFrame) -> DataFrame:
    """Join decoded position-manager events (tables.SCHEMAS['nfp']) to core
    mint/burn events, attributing each NFP event to its pool and tick range.

    ``mint_burns`` needs (transaction_hash, amount, amount0, amount1,
    log_index, address, tick_lower, tick_upper). Inner join — NFP events
    with no core match (direct pool interactions, other protocols) drop,
    exactly as the reference's INNER JOIN does."""
    n = nfp.select(
        "name",
        "chain_name",
        "transaction_hash",
        "block_number",
        "tx_index",
        "from_address",
        "amount",
        "amount0",
        "amount1",
        "tokenId",
        F.col("log_index").alias("__nfp_log_index"),
    )
    m = mint_burns.select(
        F.col("transaction_hash").alias("__m_hash"),
        F.col("amount").alias("__m_amount"),
        F.col("amount0").alias("__m_amount0"),
        F.col("amount1").alias("__m_amount1"),
        F.col("log_index").alias("__core_log_index"),
        "address",
        "tick_lower",
        "tick_upper",
    )
    cond = (
        (n["transaction_hash"] == m["__m_hash"])
        & (n["amount"] == m["__m_amount"])
        & (n["amount0"] == m["__m_amount0"])
        & (n["amount1"] == m["__m_amount1"])
        & (n["__nfp_log_index"] > m["__core_log_index"])
    )
    return n.join(m, cond, "inner").select(*POSITION_COLUMNS)
