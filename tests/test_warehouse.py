"""Warehouse connector executors: golden SQL templates, injected-client
executors, and LocalParquetConnector parity through the real ingest loop.

The BigQuery fake actually EXECUTES the generated templates: it rewrites
the backticked remote table name to a DuckDB read_parquet over the
reference example files, so the probe SQL is validated as runnable SQL,
not just string-matched."""

from __future__ import annotations

import pytest

from v3_polars_spark import tables as T
from v3_polars_spark.sources import (
    AlliumSource,
    BigQuerySource,
    LocalParquetConnector,
    update_table,
)
from v3_polars_spark.sources.warehouse import MAX_PULL_ROWS

MB = "pool_mint_burn_events"
CHAIN = "ethereum"


# ---------------------------------------------------------------------------
# fakes
# ---------------------------------------------------------------------------


class DuckDBBigQueryFake:
    """Injected ``execute`` that runs the template against the reference
    example parquet by rewriting `project.dataset.remote_name` to a
    read_parquet call. Returns list-of-dicts like an arrow round-trip."""

    def __init__(self, src: BigQuerySource, examples_root: str):
        self.src = src
        self.root = examples_root
        self.queries: list[str] = []

    def __call__(self, sql: str) -> list[dict]:
        import duckdb

        self.queries.append(sql)
        for logical, remote in self.src.REMOTE_TABLES.items():
            full = f"`{self.src.project}.{self.src.dataset}.{remote}`"
            sql = sql.replace(
                full, f"read_parquet('{self.root}/{logical}/*.parquet')"
            )
        out = duckdb.sql(sql)
        cols = out.columns
        return [dict(zip(cols, row)) for row in out.fetchall()]


class FakeHttpPost:
    """Injected ``http_post`` serving canned responses, optionally failing
    the first N calls to exercise the retry path."""

    def __init__(self, responses: list[dict], fail_first: int = 0):
        self.responses = responses
        self.fail_first = fail_first
        self.calls: list[dict] = []

    def __call__(self, url, json=None, headers=None, timeout=None):
        self.calls.append(
            {"url": url, "json": json, "headers": headers, "timeout": timeout}
        )
        if self.fail_first > 0:
            self.fail_first -= 1
            raise ConnectionError("transient")
        return self.responses[min(len(self.calls), len(self.responses)) - 1]


# ---------------------------------------------------------------------------
# golden SQL templates
# ---------------------------------------------------------------------------


def test_bigquery_templates(spark):
    src = BigQuerySource(spark, execute=lambda q: [])
    mm = src.sql_min_max(CHAIN, MB)
    assert "MIN(block_number)" in mm and "MAX(block_number)" in mm
    assert "`uniswap-labs.on_chain_events." in mm
    assert f"chain_name = '{CHAIN}'" in mm

    seg = src.sql_find_segment(CHAIN, MB, 100, 200, 5000)
    # GBQ probes order by TIMESTAMP (reference gbq.py:49-71)
    assert "ORDER BY block_timestamp ASC" in seg and "LIMIT 5000" in seg
    assert "block_number >= 100" in seg and "block_number <= 200" in seg

    rd = src.sql_read(CHAIN, MB, 7, 9)
    assert rd.startswith("SELECT * FROM")
    assert "block_number >= 7" in rd and "block_number <= 9" in rd


def test_allium_templates(spark):
    src = AlliumSource(
        spark, http_post=lambda *a, **k: {"data": []}, pool="0xPOOL".lower()
    )
    sel = src.sql_select("pool_mint_burn_events", CHAIN)
    assert "ethereum.dex.uniswap_v3_events" in sel
    assert "t.event IN ('mint', 'burn')" in sel
    assert "CASE WHEN t.event = 'mint' THEN 1 ELSE -1 END AS type_of_event" in sel
    assert "liquidity_pool_address = '0xpool'" in sel

    swaps = src.sql_select("pool_swap_events", CHAIN)
    assert "t.event = 'swap'" in swaps
    assert "sqrt_price_x96" in swaps

    factory = src.sql_select("factory_pool_created", CHAIN)
    assert "ethereum.dex.pools" in factory and "uniswap_v3" in factory

    # Allium probes order by BLOCK NUMBER (reference allium.py:232-255)
    seg = src.sql_find_segment(CHAIN, MB, 1, 10, 99)
    assert "ORDER BY block_number ASC" in seg

    with pytest.raises(ValueError):
        src.sql_select(MB, "optimism")  # no provider dataset (reference parity)


def test_allium_nfp_template(spark):
    src = AlliumSource(spark, http_post=lambda *a, **k: {"data": []}, pool="0xab")
    nfp = src.sql_nfp(CHAIN)
    # the 4-equi-key + log-ordering theta join (reference allium.py:193-210)
    assert "n.transaction_hash = m.transaction_hash" in nfp
    assert "n.amount = m.amount" in nfp
    assert "n.amount0 = m.amount0" in nfp and "n.amount1 = m.amount1" in nfp
    assert "n.nfp_log_index > m.core_log_index" in nfp
    assert "0xc36442b4a4522e871399cd717abdd847ab11fe88" in nfp


# ---------------------------------------------------------------------------
# executors against the reference example data
# ---------------------------------------------------------------------------


def test_bigquery_probes_run(spark, ref_examples):
    src = BigQuerySource(spark, execute=lambda q: [])
    src.execute = DuckDBBigQueryFake(src, ref_examples)
    lo, hi = src.min_max_block(CHAIN, MB)
    assert lo is not None and hi is not None and lo <= hi
    horizon = src.segment_horizon(CHAIN, MB, lo, 100)
    assert horizon is not None and lo <= horizon <= hi
    seg = src.read_segment(spark, CHAIN, MB, lo, horizon)
    n = seg.count()
    assert n >= 100  # >= tgt because every row at the horizon block lands
    assert seg.schema == T.SCHEMAS[MB]


def test_bigquery_parity_with_local_connector(spark, ref_examples, tmp_path):
    """Landing mint/burns through BigQuerySource via the real ingest loop
    produces the identical table as LocalParquetConnector."""
    src = BigQuerySource(spark, execute=lambda q: [])
    src.execute = DuckDBBigQueryFake(src, ref_examples)
    local = LocalParquetConnector(spark, ref_examples)

    n_bq = update_table(spark, src, str(tmp_path / "bq"), MB, CHAIN, tgt_max_rows=400)
    n_lc = update_table(
        spark, local, str(tmp_path / "lc"), MB, CHAIN, tgt_max_rows=400
    )
    assert n_bq >= 1 and n_lc >= 1

    a = spark.read.parquet(str(tmp_path / "bq" / MB))
    b = spark.read.parquet(str(tmp_path / "lc" / MB))
    cols = sorted(set(a.columns) & set(b.columns))
    assert a.count() == b.count()
    assert (
        a.select(cols).exceptAll(b.select(cols)).isEmpty()
        and b.select(cols).exceptAll(a.select(cols)).isEmpty()
    )


def test_allium_executor_renames_and_parses(spark):
    rows = [
        {
            "chain_name": CHAIN,
            "address": "0xab",
            "block_timestamp": "2021-05-04 10:00:00",
            "block_number": 5,
            "transaction_hash": "0xh",
            "log_index": 1,
            "sqrt_price_x96": "79228162514264337593543950336",
            "tick": "0",
            "to_address": None,
            "from_address": None,
            "transaction_index": 3,
            "gas_price": "1",
            "gas_used": "2",
        }
    ]
    post = FakeHttpPost([{"data": rows}])
    src = AlliumSource(spark, http_post=post, pool="0xab", api_key="k")
    df = src.read_segment(spark, CHAIN, "pool_initialize_events", 0, 10)
    got = df.collect()[0]
    assert got["sqrtPriceX96"] == "79228162514264337593543950336"  # renamed
    assert got["block_number"] == 5
    assert got["block_timestamp"] is not None  # parsed to timestamp
    assert post.calls[0]["headers"] == {"X-API-Key": "k"}
    assert "query_text" in post.calls[0]["json"]


def test_allium_retry_and_row_cap(spark):
    # transient failure then success -> retried, not raised
    post = FakeHttpPost([{"data": []}], fail_first=1)
    src = AlliumSource(
        spark, http_post=post, pool="0xab", retries=2, backoff_s=0.0
    )
    assert src.min_max_block(CHAIN, MB) == (None, None)
    assert len(post.calls) == 2

    # exhausted retries -> raises
    post2 = FakeHttpPost([{"data": []}], fail_first=5)
    src2 = AlliumSource(
        spark, http_post=post2, pool="0xab", retries=1, backoff_s=0.0
    )
    with pytest.raises(ConnectionError):
        src2.min_max_block(CHAIN, MB)

    # row cap enforced (reference allium.py:318-320)
    big = [{"block_number": i} for i in range(MAX_PULL_ROWS)]
    src3 = AlliumSource(
        spark, http_post=FakeHttpPost([{"data": big}]), pool="0xab"
    )
    with pytest.raises(RuntimeError, match="cap"):
        src3._run("SELECT 1")
