"""v3_polars_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of Uniswap/v3-polars.

Reference: /root/reference (Uniswap/v3-polars @ 2024-10-08). This is NOT a
port — the reference tells us WHAT to compute (operators, query semantics,
data model); the architecture here is idiomatic PySpark: declarative
DataFrame plans optimized by Catalyst, partition-aware operators designed for
multi-executor clusters, Pandas UDFs only where built-ins can't express the
semantics.

Layers (see SURVEY.md §7):
  L0 ``tables``    — schema registry + parquet directory sources/sinks.
  L1 ``ops``       — the operator library (as-of join, dedup-last, resample,
                     prefix sums, …): every SURVEY §2 row, batch-first with
                     explicit determinism contracts.
  L2 ``v3``        — domain parity: Pool facade, liquidity distribution,
                     swap simulation, price series.
  ``datapipe``     — LLM-training-data operators (dedup, similarity search,
                     text analysis, multimodal columns) built on L1.
  ``sources``      — segmented batch ingest + connector protocol.
  ``streaming``    — Structured Streaming re-expression of the ingest loop.
"""

__version__ = "0.1.0"
