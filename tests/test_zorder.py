"""Z-order layout (tables.write_zorder): multi-dimensional file pruning.

The measurable contract: after a Z-order write, per-file parquet min/max
stats are tight in BOTH dimensions, so a point/range predicate on either
column overlaps only a fraction of the files — while a linear sort prunes
only its prefix column."""

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from v3_polars_spark.tables import write_zorder, zorder_key


def _overlapping_files(path: str, col: str, lo: int, hi: int) -> tuple[int, int]:
    files = sorted(glob.glob(f"{path}/*.parquet"))
    n_hit = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        fmin, fmax = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                cmd = md.row_group(rg).column(ci)
                if cmd.path_in_schema == col and cmd.statistics is not None:
                    s = cmd.statistics
                    fmin = s.min if fmin is None else min(fmin, s.min)
                    fmax = s.max if fmax is None else max(fmax, s.max)
        if fmin is not None and not (hi < fmin or lo > fmax):
            n_hit += 1
    return n_hit, len(files)


def _grid_df(spark, n=60_000):
    # two independent uniform dimensions
    return spark.range(n).select(
        (F.col("id") % 1000).alias("x"),
        ((F.col("id") * 7919) % 1000).alias("y"),
        F.col("id").alias("payload"),
    )


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    df = _grid_df(spark)
    zpath = str(tmp_path / "zordered")
    lpath = str(tmp_path / "linear")
    write_zorder(df, zpath, ["x", "y"], num_files=16)
    (
        df.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(lpath)
    )

    zx, ztot = _overlapping_files(zpath, "x", 100, 120)
    zy, _ = _overlapping_files(zpath, "y", 100, 120)
    lx, ltot = _overlapping_files(lpath, "x", 100, 120)
    ly, _ = _overlapping_files(lpath, "y", 100, 120)

    # linear sort: perfect on x, useless on y
    assert lx <= 3
    assert ly == ltot
    # z-order: real pruning on BOTH dimensions
    assert zx <= ztot // 2
    assert zy <= ztot // 2


def test_zorder_preserves_rows(spark, tmp_path):
    df = _grid_df(spark, n=10_000)
    path = str(tmp_path / "z")
    write_zorder(df, path, ["x", "y"], num_files=4)
    back = spark.read.parquet(path)
    assert back.count() == 10_000
    assert back.agg(F.sum("payload")).first()[0] == sum(range(10_000))


def test_zorder_key_locality(spark):
    """Neighbours in z differ little in both coords: the key of (x, y)
    and (x+1, y) share high bits far more often than random pairs."""
    bounds = {"x": (0, 1023), "y": (0, 1023)}
    df = spark.range(1024).select(
        (F.col("id") % 32 * 33).alias("x"),
        (F.floor(F.col("id") / 32) * 33).alias("y"),
    )
    out = df.select("x", "y", zorder_key(["x", "y"], bounds, bits=10).alias("z"))
    rows = out.orderBy("z").collect()
    # walking the z-curve, successive points move by a bounded step in
    # at least one coordinate most of the time (curve locality)
    small_steps = sum(
        1
        for a, b in zip(rows, rows[1:])
        if abs(a.x - b.x) <= 66 or abs(a.y - b.y) <= 66
    )
    assert small_steps >= int(0.9 * (len(rows) - 1))


def test_zorder_key_rejects_too_many_bits(spark):
    try:
        zorder_key(["a", "b", "c"], {c: (0, 1) for c in "abc"}, bits=32)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_partitioned_zorder_layout(spark, tmp_path):
    """write_partitioned_zorder: hive directory pruning on the partition
    column AND z-stat file pruning inside each partition, with rows
    preserved."""
    from pyspark.sql import functions as F

    from v3_polars_spark.plans import executed_scan_metrics
    from v3_polars_spark.tables import write_partitioned_zorder

    df = spark.range(40_000).select(
        (F.col("id") % 4).cast("string").alias("tenant"),
        (F.col("id") % 1000).alias("x"),
        ((F.col("id") * 7919) % 1000).alias("y"),
        F.col("id").alias("payload"),
    )
    path = str(tmp_path / "pz")
    write_partitioned_zorder(df, path, ["tenant"], ["x", "y"], num_files=32)

    back = spark.read.parquet(path)
    assert back.count() == 40_000
    assert back.agg(F.sum("payload")).first()[0] == sum(range(40_000))

    full = executed_scan_metrics(back.agg(F.count(F.lit(1))))
    part = executed_scan_metrics(
        back.filter(F.col("tenant") == "2").agg(F.count(F.lit(1)))
    )
    both = executed_scan_metrics(
        back.filter(
            (F.col("tenant") == "2") & (F.col("x") >= 100) & (F.col("x") < 120)
        ).agg(F.count(F.lit(1)))
    )
    f = next(s for s in full if "parquet" in s["node"].lower())
    p = next(s for s in part if "parquet" in s["node"].lower())
    b = next(s for s in both if "parquet" in s["node"].lower())
    # directory pruning: one tenant of four (planning-time, numFiles drops)
    assert int(p["numPartitions"]) == 1 and int(f["numPartitions"]) == 4
    assert int(p["numFiles"]) < int(f["numFiles"])
    # z-range predicate: vanilla Spark has no file-stats index, so the
    # win lands at ROW-GROUP granularity — the scan must DECODE well
    # under the tenant's full row count (10k), not merely post-filter it
    assert int(b["numOutputRows"]) < int(p["numOutputRows"])
