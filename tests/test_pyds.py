"""Spark 4 Python Data Source: partitioned warehouse reads
(sources/pyds.py) — the segmented ingest loop as a parallel source."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def registered(spark):
    from v3_polars_spark.sources.pyds import WarehouseDataSource

    spark.dataSource.register(WarehouseDataSource)
    return spark


def test_pyds_reads_match_direct_scan(registered, spark, ref_examples):
    df = (
        spark.read.format("v3warehouse")
        .option("provider", "local")
        .option("path", ref_examples)
        .option("table", "pool_swap_events")
        .option("chain", "ethereum")
        .load()
    )
    direct = (
        spark.read.parquet(f"{ref_examples}/pool_swap_events")
        .filter(F.col("chain_name") == "ethereum")
    )
    assert df.count() == direct.count() == 1001
    # full-row equivalence on the pinned total order
    key = ["block_number", "transaction_index", "log_index"]
    a = df.orderBy(*key).select("transaction_hash", "amount0").collect()
    b = direct.orderBy(*key).select("transaction_hash", "amount0").collect()
    assert a == b


def test_pyds_block_range_and_partitioning(registered, spark, ref_examples):
    from v3_polars_spark.sources.pyds import WarehouseReader
    from v3_polars_spark.tables import SCHEMAS

    # bounded read: inclusive block range, same rows as a filtered scan
    df = (
        spark.read.format("v3warehouse")
        .option("provider", "local")
        .option("path", ref_examples)
        .option("table", "pool_swap_events")
        .option("chain", "ethereum")
        .option("min_block", "12370000")
        .option("max_block", "12373000")
        .load()
    )
    direct = (
        spark.read.parquet(f"{ref_examples}/pool_swap_events")
        .filter(
            (F.col("chain_name") == "ethereum")
            & (F.col("block_number") >= 12370000)
            & (F.col("block_number") <= 12373000)
        )
    )
    assert df.count() == direct.count() > 0

    # slice planning: ~N rows per slice, never splitting a block
    r = WarehouseReader(
        SCHEMAS["pool_swap_events"],
        {
            "path": ref_examples,
            "table": "pool_swap_events",
            "chain": "ethereum",
            "rows_per_partition": "300",
        },
    )
    parts = r.partitions()
    assert len(parts) >= 3  # 1001 rows / 300-row target
    # contiguous, ordered, non-overlapping
    for a, b in zip(parts, parts[1:]):
        assert a.hi < b.lo
    # union of slices covers exactly the direct scan
    total = 0
    for p in parts:
        total += sum(batch.num_rows for batch in r.read(p))
    assert total == 1001


def test_pyds_unknown_table_and_provider(registered, spark, ref_examples):
    from v3_polars_spark.sources.pyds import WarehouseReader
    from v3_polars_spark.tables import SCHEMAS

    with pytest.raises(Exception, match="unknown table"):
        (
            spark.read.format("v3warehouse")
            .option("path", ref_examples)
            .option("table", "nope")
            .load()
            .count()
        )
    with pytest.raises(NotImplementedError, match="live binding"):
        WarehouseReader(SCHEMAS["pool_swap_events"], {"provider": "allium"})


def test_pyds_filter_pushdown(registered, spark, ref_examples):
    """Spark filters on chain/block bounds reach the reader: they tighten
    the slice plan (partition pruning) and the filtered read equals the
    direct scan."""
    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThanOrEqual,
        LessThanOrEqual,
    )

    from v3_polars_spark.sources.pyds import WarehouseReader
    from v3_polars_spark.tables import SCHEMAS

    # unit: consumed vs remaining filters, tightened bounds
    r = WarehouseReader(
        SCHEMAS["pool_swap_events"],
        {"path": ref_examples, "table": "pool_swap_events", "chain": "ethereum",
         "rows_per_partition": "300"},
    )
    other = EqualTo(("address",), "0xabc")
    rest = r.pushFilters([
        EqualTo(("chain_name",), "ethereum"),
        GreaterThanOrEqual(("block_number",), 12370000),
        LessThanOrEqual(("block_number",), 12373000),
        other,
    ])
    assert list(rest) == [other]
    assert (r.min_block, r.max_block) == (12370000, 12373000)
    full = WarehouseReader(
        SCHEMAS["pool_swap_events"],
        {"path": ref_examples, "table": "pool_swap_events", "chain": "ethereum",
         "rows_per_partition": "300"},
    )
    assert len(r.partitions()) < len(full.partitions())  # pruned plan

    # end-to-end: .filter() on the loaded frame, results == direct scan
    df = (
        spark.read.format("v3warehouse")
        .option("provider", "local")
        .option("path", ref_examples)
        .option("table", "pool_swap_events")
        .load()
        .filter(
            (F.col("chain_name") == "ethereum")
            & (F.col("block_number") >= 12370000)
            & (F.col("block_number") <= 12373000)
        )
    )
    direct = (
        spark.read.parquet(f"{ref_examples}/pool_swap_events")
        .filter(
            (F.col("chain_name") == "ethereum")
            & (F.col("block_number") >= 12370000)
            & (F.col("block_number") <= 12373000)
        )
    )
    assert df.count() == direct.count() > 0


def test_segment_sink_roundtrip_and_manifest_names(spark, tmp_path):
    """The write half of the Python Data Source API: executor-staged
    parquet published by the driver commit under the reference's ordered
    manifest names — written rows read back exactly, no staging residue."""
    from v3_polars_spark.sources.pyds import SegmentSinkDataSource

    spark.dataSource.register(SegmentSinkDataSource)
    df = spark.createDataFrame(
        [(b, f"tx{b}", b * 1.5) for b in range(100, 160)],
        ["block_number", "tx", "amount"],
    ).repartition(3)
    (
        df.write.format("v3segments")
        .option("path", str(tmp_path))
        .option("table", "pool_swap_events")
        .mode("append")
        .save()
    )
    import os

    table_dir = tmp_path / "pool_swap_events"
    files = sorted(os.listdir(table_dir))
    assert "_staging" not in files
    # ordered-manifest names: {idx}_{min}_{max}_{table}.parquet
    assert all(f.endswith("_pool_swap_events.parquet") for f in files)
    idxs = [int(f.split("_", 1)[0]) for f in files]
    assert idxs == list(range(len(files))) and 1 <= len(files) <= 3
    back = spark.read.parquet(str(table_dir))
    assert back.count() == 60
    assert {r.block_number for r in back.select("block_number").collect()} == set(
        range(100, 160)
    )

    # second append continues the index sequence
    df.limit(10).coalesce(1).write.format("v3segments").option(
        "path", str(tmp_path)
    ).option("table", "pool_swap_events").mode("append").save()
    files2 = sorted(os.listdir(table_dir))
    assert len(files2) == len(files) + 1
    assert max(int(f.split("_", 1)[0]) for f in files2) == len(files)


def test_segment_sink_rejects_overwrite(spark, tmp_path):
    from v3_polars_spark.sources.pyds import SegmentSinkDataSource

    spark.dataSource.register(SegmentSinkDataSource)
    df = spark.createDataFrame([(1, "a", 1.0)], ["block_number", "tx", "amount"])
    import pytest as _pytest

    with _pytest.raises(Exception, match="append-only"):
        (
            df.write.format("v3segments")
            .option("path", str(tmp_path))
            .option("table", "t")
            .mode("overwrite")
            .save()
        )


def test_stream_reader_incremental_exactly_once(spark, ref_examples, tmp_path):
    """The streaming source lands each block exactly once across
    checkpointed AvailableNow drains: first drain sees the initial
    segment, the second (same checkpoint) sees ONLY blocks appended
    in between."""
    import uuid

    from v3_polars_spark.sources.pyds import WarehouseDataSource

    spark.dataSource.register(WarehouseDataSource)
    full = spark.read.parquet(f"{ref_examples}/pool_swap_events")
    blocks = sorted(
        r.block_number
        for r in full.select("block_number").distinct().collect()
    )
    cut = blocks[len(blocks) // 2]
    src = str(tmp_path / "wh")
    table_dir = f"{src}/pool_swap_events"
    full.filter(f"block_number <= {cut}").write.mode("append").parquet(table_dir)

    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "landed")

    def drain():
        stream = (
            spark.readStream.format("v3warehouse")
            .option("provider", "local")
            .option("path", src)
            .option("table", "pool_swap_events")
            .option("chain", "ethereum")
            .option("rows_per_partition", "5000")
            .load()
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        if q.isActive:
            q.stop()

    drain()
    got1 = spark.read.parquet(sink).count()
    want1 = full.filter(f"block_number <= {cut}").count()
    assert got1 == want1

    # append the rest; a fresh drain on the SAME checkpoint lands only
    # the new blocks — total is exactly-once
    full.filter(f"block_number > {cut}").write.mode("append").parquet(table_dir)
    drain()
    landed = spark.read.parquet(sink)
    assert landed.count() == full.count()
    assert landed.select("block_number").distinct().count() == len(blocks)


def test_stream_to_segment_sink_end_to_end(spark, ref_examples, tmp_path):
    """The reference's whole ingest loop as ONE streaming pipeline over
    custom sources: readStream v3warehouse -> writeStream v3segments.
    Landed segments carry ordered manifest names and exactly the source
    rows."""
    from v3_polars_spark.sources.pyds import (
        SegmentSinkDataSource,
        WarehouseDataSource,
    )

    spark.dataSource.register(WarehouseDataSource)
    spark.dataSource.register(SegmentSinkDataSource)

    src = str(tmp_path / "wh")
    out = str(tmp_path / "landed")
    full = spark.read.parquet(f"{ref_examples}/pool_swap_events")
    full.write.mode("append").parquet(f"{src}/pool_swap_events")

    stream = (
        spark.readStream.format("v3warehouse")
        .option("provider", "local")
        .option("path", src)
        .option("table", "pool_swap_events")
        .option("chain", "ethereum")
        .option("rows_per_partition", "4000")
        .load()
    )
    q = (
        stream.writeStream.format("v3segments")
        .option("path", out)
        .option("table", "pool_swap_events")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    if q.isActive:
        q.stop()

    import os

    files = sorted(os.listdir(f"{out}/pool_swap_events"))
    assert files and all(f.endswith("_pool_swap_events.parquet") for f in files)
    landed = spark.read.parquet(f"{out}/pool_swap_events")
    assert landed.count() == full.count()
    assert landed.select("transaction_hash").distinct().count() == \
        full.select("transaction_hash").distinct().count()
