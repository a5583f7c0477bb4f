"""Document chunking — split long documents into overlapping windows.

The standard pre-tokenization step for embedding/RAG/context-window
pipelines: each document becomes ceil((len - overlap) / step) chunks of
at most ``chunk_size`` units with ``overlap`` units shared between
neighbours. Pure column expressions (``sequence`` -> ``posexplode`` ->
``substring``/``slice``): one narrow map stage, no shuffle, no UDF — at
100 TB this runs at parquet scan speed and the output is immediately
repartitionable by (doc_id, chunk_idx).

Chunk identity is deterministic: (id_col, chunk_idx) with chunk_idx
dense from 0 in document order, so re-runs and incremental backfills
produce identical chunk keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = 512,
    overlap: int = 64,
    unit: str = "chars",
) -> DataFrame:
    """Explode each document into overlapping chunks.

    ``unit="chars"`` windows over characters with ``substring``;
    ``unit="tokens"`` windows over whitespace tokens with ``slice`` +
    ``array_join`` (token == ``\\s+``-delimited word, the same
    tokenization as ``text.token_counts``'s ``n_tokens_ws``).

    Every document yields at least one chunk (short docs pass through
    whole); the final chunk may be shorter than ``chunk_size``; start
    offsets advance by ``chunk_size - overlap``.

    Returns (id_col, chunk_idx, chunk_text, chunk_len).
    """
    if not 0 <= overlap < chunk_size:
        raise ValueError("require 0 <= overlap < chunk_size")
    step = chunk_size - overlap
    if unit == "chars":
        n = F.length(F.col(text_col))
        starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(step))
        exploded = df.select(
            F.col(id_col),
            F.posexplode(starts).alias("chunk_idx", "__start"),
            F.col(text_col),
        )
        chunk = F.substring(F.col(text_col), F.col("__start") + 1, chunk_size)
    elif unit == "tokens":
        words = F.split(F.trim(F.col(text_col)), r"\s+")
        n = F.size(words)
        starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(step))
        exploded = df.select(
            F.col(id_col),
            F.posexplode(starts).alias("chunk_idx", "__start"),
            words.alias("__words"),
        )
        chunk = F.array_join(
            F.slice(F.col("__words"), F.col("__start") + 1, chunk_size), " "
        )
    else:
        raise ValueError(f"unknown unit {unit!r}")
    return exploded.select(
        F.col(id_col),
        F.col("chunk_idx"),
        chunk.alias("chunk_text"),
        F.length(chunk).alias("chunk_len"),
    )
