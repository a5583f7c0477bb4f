"""Pool facade — the engine's analog of the reference's ``v3Pool``
(reference v3/state.py:8-331).

Differences by design (Spark-first):
- table materialization uses ``df.cache()`` (executor-memory columnar
  cache) instead of driver RAM;
- every ordered op has explicit (block_number, transaction_index, log_index)
  determinism keys;
- the swap precompute keeps the reference's single-slot memo keyed by exact
  ``as_of`` (v3/state.py:176-195): repeat swaps at one time are O(1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import tables as T
from ..ops import asof_lookup_scalar
from . import swap_math as sm
from .liquidity import liquidity_distribution
from .series import bn_at_date as _bn_at_date
from .series import price_series as _price_series
from .swap import InRangeValues, in_range_values, quote_ladder, swap_frame, swap_in


class UninitializedPoolError(AssertionError):
    """Raised by point-in-time getters when ``revert_on_uninitialized`` is
    set and the pool has no state at ``as_of`` (reference state.py:226,241
    uses a bare assert; subclassing AssertionError keeps except-clauses
    written against the reference's behavior working)."""


class Pool:
    MAX_TICK = sm.MAX_TICK
    Q96 = sm.Q96

    def __init__(
        self,
        spark: SparkSession,
        pool: str,
        chain: str,
        data_path: str,
        pull: bool = True,
        save_path: str | None = None,
        refresh: bool = False,
    ):
        """``save_path`` is the cross-session analog of the reference's
        ``readFromMemoryOrDisk(save=True)`` (state.py:114-174): the
        preprocessed (tenant-filtered, as_of-keyed) swap / mint-burn
        frames are persisted as parquet under ``save_path/<table>/`` on
        first access and read straight back on later Pool inits —
        skipping the raw-table scan + filter entirely. In-session reuse
        is covered either way by ``.cache()``.

        Staleness: unlike the reference's per-session in-memory cache
        (which can never outlive its data), a persisted frame CAN go
        stale when new events land in the raw tables. Each save carries
        a fingerprint of the source directory's file listing
        (fsutil.dir_fingerprint — names/sizes/mtimes, no data scan);
        a later init whose raw listing differs rebuilds automatically.
        ``refresh=True`` forces a rebuild regardless. All marker/
        fingerprint IO goes through the Hadoop FS API, so remote
        (hdfs://, s3a://) save_paths behave the same as local ones."""
        self.spark = spark
        self.chain = chain
        self.pool = pool.lower()  # normalize checksummed addresses (state.py:45)
        self.data_path = data_path
        self.save_path = save_path
        self.refresh = refresh
        self._cache: dict = {"as_of": None}

        # initializePoolFromFactory (reference pool_helpers.py:10-34)
        factory = T.tenant_filter(
            T.read_table(spark, data_path, "factory_pool_created"), chain
        ).filter(F.col("pool") == self.pool)
        rows = factory.select("tickSpacing", "fee", "token0", "token1").collect()
        assert len(rows) != 0, "Pool missing from factory"
        assert len(rows) == 1, "Multiple pools at that address"
        self.ts = int(rows[0]["tickSpacing"])
        self.fee = int(rows[0]["fee"])
        self.token0 = rows[0]["token0"]
        self.token1 = rows[0]["token1"]

        self._swaps: DataFrame | None = None
        self._mb: DataFrame | None = None
        self.max_supported = -1
        if pull:
            s, m = self.swaps, self.mb
            bounds = [
                s.agg(F.max("block_number")).first()[0],
                m.agg(F.max("block_number")).first()[0],
            ]
            # a pool can have one table empty (initialized but never
            # traded, or never minted): the completeness watermark is then
            # undefined — keep the -1 sentinel instead of min(None, int)
            self.max_supported = min(bounds) if all(b is not None for b in bounds) else -1

    # readFromMemoryOrDisk analogs (reference state.py:114-174) ------------
    def _saved_or(self, table: str, build) -> DataFrame:
        """Return the preprocessed frame from ``save_path`` if previously
        persisted AND still current, else (re)build and persist it.
        The location is namespaced by (chain, pool) — the frames are
        tenant-FILTERED, so a table-only key would silently serve one
        pool's events as another's when two Pools share a save_path.

        Currency check: the save carries ``_RAW_FINGERPRINT`` (a listing
        fingerprint of the SOURCE table directory). If the raw table
        gained/changed files since the save, the cache rebuilds instead
        of silently serving pre-append state forever. Spark's file index
        ignores underscore-prefixed files, so the extra marker never
        pollutes the parquet read."""
        import posixpath

        from .. import fsutil

        if self.save_path is None:
            return build()
        loc = posixpath.join(self.save_path, self.chain, self.pool, table)
        raw_dir = posixpath.join(self.data_path, table)
        current = fsutil.dir_fingerprint(self.spark, raw_dir)
        saved = fsutil.read_text(self.spark, posixpath.join(loc, "_RAW_FINGERPRINT"))
        fresh = (
            not self.refresh
            and saved == current
            and fsutil.exists(self.spark, posixpath.join(loc, "_SUCCESS"))
        )
        if not fresh:
            # Drop session-level caches for both paths: the raw dir's
            # file-status listing may predate the append that made the
            # save stale, and an earlier Pool's .cache() of the save
            # location would otherwise serve the pre-overwrite rows
            # (CacheManager matches by plan, i.e. by path).
            self.spark.catalog.refreshByPath(raw_dir)
            self.spark.catalog.refreshByPath(loc)
            build().write.mode("overwrite").parquet(loc)
            # Atomic marker: a rebuild that dies between the overwrite
            # and the marker leaves no/old fingerprint -> reads stale ->
            # rebuilt next init. save_path still assumes one writer at a
            # time (concurrent overwrites of the *parquet* can interleave);
            # the marker just guarantees a torn rebuild is never trusted.
            fsutil.write_text_atomic(
                self.spark, posixpath.join(loc, "_RAW_FINGERPRINT"), current
            )
            self.spark.catalog.refreshByPath(loc)
        return self.spark.read.parquet(loc)

    @property
    def swaps(self) -> DataFrame:
        if self._swaps is None:
            def build() -> DataFrame:
                df = T.tenant_filter(
                    T.read_table(self.spark, self.data_path, "pool_swap_events"),
                    self.chain,
                    self.pool,
                )
                return T.with_as_of(df)

            self._swaps = self._saved_or("pool_swap_events", build).cache()
        return self._swaps

    @property
    def mb(self) -> DataFrame:
        if self._mb is None:
            def build() -> DataFrame:
                df = T.tenant_filter(
                    T.read_table(
                        self.spark, self.data_path, "pool_mint_burn_events"
                    ),
                    self.chain,
                    self.pool,
                ).withColumns(
                    {
                        "amount": F.col("amount").cast("double"),
                        "tick_lower": F.col("tick_lower").cast("long"),
                        "tick_upper": F.col("tick_upper").cast("long"),
                        "type_of_event": F.col("type_of_event").cast("double"),
                    }
                )
                return T.with_as_of(df)

            self._mb = self._saved_or("pool_mint_burn_events", build).cache()
        return self._mb

    # point-in-time getters (reference state.py:197-244) ------------------
    def get_property_at(self, as_of: float, column: str):
        return asof_lookup_scalar(self.swaps, "as_of", float(as_of), column)

    def get_tick_at(
        self, as_of: float, revert_on_uninitialized: bool = False
    ) -> int | None:
        """reference state.py:216-229: None (or raise) before the first swap."""
        v = self.get_property_at(as_of, "tick")
        if v is None and revert_on_uninitialized:
            raise UninitializedPoolError("Tick is not initialized")
        return int(v) if v is not None else None

    def get_price_at(
        self, as_of: float, revert_on_uninitialized: bool = False
    ) -> int | None:
        """reference state.py:231-244: None (or raise) before the first swap."""
        v = self.get_property_at(as_of, "sqrtPriceX96")
        if v is None and revert_on_uninitialized:
            raise UninitializedPoolError("Price is not initialized")
        return int(v) if v is not None else None

    # liquidity + swap precompute ------------------------------------------
    def create_liq(self, as_of: float) -> DataFrame:
        return liquidity_distribution(self.mb, as_of)

    def calc_swap_df(self, as_of: float):
        """createSwapDF with the single-slot memo (reference state.py:176-195)."""
        if self._cache.get("as_of") == as_of:
            return self._cache["swap_rows"], self._cache["irv"]
        price = self.get_price_at(as_of)
        assert price is not None, "Pool not initialized"
        sdf = swap_frame(self.create_liq(as_of), self.ts)
        rows = [r.asDict() for r in sdf.collect()]  # O(#ticks) — driver idiom
        irv = in_range_values(rows, float(price), self.ts)
        self._cache.update({"as_of": as_of, "swap_rows": rows, "irv": irv})
        return rows, irv

    def swap_in(self, calldata: dict):
        """reference swap.py:41-212 / state.py:278-299. calldata keys:
        as_of, tokenIn, swapIn, fees (findMax is a documented no-op)."""
        as_of = calldata["as_of"]
        token_in = calldata["tokenIn"]
        amount_in = calldata["swapIn"]
        if isinstance(amount_in, str):
            amount_in = float(amount_in)
        fees = bool(calldata.get("fees", False))
        if self.max_supported != -1 and self.max_supported < as_of:
            print("Mint/burn and swap data are not updated at this date")
        rows, irv = self.calc_swap_df(as_of)
        return swap_in(
            rows,
            irv,
            token_in_is_token1=(token_in.lower() == self.token1),
            amount_in=float(amount_in),
            fee_ppm=self.fee,
            fees=fees,
        )

    def quote_ladder(
        self,
        as_of: float,
        token_in: str,
        amounts: DataFrame,
        amount_col: str = "amount_in",
        fees: bool = False,
    ) -> DataFrame:
        """Batched swapIn: quote every amount in ``amounts`` at one as_of in
        a single distributed plan (forward as-of join on cumulative depth).
        Bit-identical to looping swap_in; ``fees=True`` adds the per-tick
        fee attribution array (scalar fee_dict parity); see
        swap.quote_ladder."""
        _, irv = self.calc_swap_df(as_of)
        sdf = swap_frame(self.create_liq(as_of), self.ts)
        return quote_ladder(
            sdf,
            irv,
            token_in_is_token1=(token_in.lower() == self.token1),
            amounts=amounts,
            fee_ppm=self.fee,
            amount_col=amount_col,
            fees=fees,
        )

    # series ----------------------------------------------------------------
    def get_price_series(self, start_time, frequency: str = "6h", gas: bool = False) -> DataFrame:
        chain_swaps = T.tenant_filter(
            T.read_table(self.spark, self.data_path, "pool_swap_events"), self.chain
        )
        return _price_series(chain_swaps, self.swaps, start_time, frequency, gas)

    def get_bn_at_date(self, dt) -> int | None:
        return _bn_at_date(self.swaps, dt)
