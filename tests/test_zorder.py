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
