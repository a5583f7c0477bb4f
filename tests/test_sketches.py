"""Sketch operators (ops/sketches.py): accuracy contracts and — the part
that matters at scale — lossless mergeability of pre-aggregated sketches."""

import os

import pytest
from pyspark.sql import functions as F

from v3_polars_spark.ops import (
    approx_distinct_by,
    approx_quantile_check,
    hll_rollup,
    hll_sketches,
)

SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet")


def test_approx_distinct_within_tolerance(events):
    rows = approx_distinct_by(events, "user_id", ["event_type"], rsd=0.05).collect()
    assert rows
    assert all(r.within_tol for r in rows)


def test_hll_daily_rollup_equals_direct_sketch(events, spark):
    """Union of per-day sketches must give the IDENTICAL estimate as one
    sketch over the raw data — HLL merge is lossless at equal precision.
    This is the invariant that makes sketch tables safe to materialize."""
    ev = events.withColumn("day", F.to_date("ts"))
    daily = hll_sketches(ev, "user_id", ["day"], lg_config_k=14)
    merged = hll_rollup(daily, []).collect()[0].approx_distinct
    direct = events.agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg("user_id", F.lit(14))
        ).alias("e")
    ).collect()[0].e
    assert merged == direct


def test_hll_rollup_partial_groups(events):
    """Rolling daily sketches up to week grain: estimates stay within 5%
    of exact per-week distincts."""
    ev = events.withColumn("day", F.to_date("ts")).withColumn(
        "week", F.weekofyear("day")
    )
    daily = hll_sketches(ev, "user_id", ["week", "day"], lg_config_k=14)
    weekly = hll_rollup(daily, ["week"])
    exact = ev.groupBy("week").agg(F.countDistinct("user_id").alias("exact"))
    joined = weekly.join(exact, "week").collect()
    assert joined
    for r in joined:
        assert abs(r.approx_distinct - r.exact) <= 0.05 * r.exact + 1


def test_approx_quantile_rank_bound(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    rows = approx_quantile_check(
        li, "l_extendedprice", [0.1, 0.5, 0.95], accuracy=1000
    ).collect()
    assert [r.p for r in rows] == [0.1, 0.5, 0.95]
    assert all(r.rank_ok for r in rows)


def test_hll_intersect_estimate(events):
    from v3_polars_spark.ops import hll_intersect_estimate

    sk = hll_sketches(events, "user_id", ["event_type"], lg_config_k=14)
    got = hll_intersect_estimate(sk, "event_type", "view", "purchase").collect()[0]
    exact = (
        events.filter("event_type = 'view'")
        .select("user_id")
        .intersect(events.filter("event_type = 'purchase'").select("user_id"))
        .count()
    )
    assert abs(got.approx_intersection - exact) <= 0.1 * max(exact, 10)


def test_ewma_matches_pandas(spark):
    import pandas as pd

    from v3_polars_spark.ops import ewma

    rows = [(k, t, float((t * 7 + k * 3) % 11)) for k in range(3) for t in range(40)]
    df = spark.createDataFrame(rows, ["k", "t", "v"])
    got = ewma(df, "v", "t", by=["k"], alpha=0.25).toPandas()
    pdf = pd.DataFrame(rows, columns=["k", "t", "v"]).sort_values(["k", "t"])
    want = (
        pdf.groupby("k")["v"].apply(lambda s: s.ewm(alpha=0.25, adjust=False).mean())
        .reset_index(drop=True)
    )
    merged = got.sort_values(["k", "t"]).reset_index(drop=True)
    assert (merged["ewma"] - want.reset_index(drop=True)).abs().max() < 1e-12


def test_ewma_requires_keys(spark):
    import pytest

    from v3_polars_spark.ops import ewma

    df = spark.createDataFrame([(1, 1.0)], ["t", "v"])
    with pytest.raises(ValueError):
        ewma(df, "v", "t", by=[])


def test_approx_quantile_by_groups(spark):
    from v3_polars_spark.ops import approx_quantile_by

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    rows = approx_quantile_by(
        li, "l_quantity", [0.5, 0.9], ["l_returnflag"], accuracy=10_000
    ).collect()
    flags = li.select("l_returnflag").distinct().count()
    assert len(rows) == flags * 2
    # at this accuracy over integral quantities the estimate is exact
    assert all(abs(r.approx_val - r.exact_val) <= 1.0 for r in rows)


def test_histogram_dense_spine_and_edges(spark):
    from v3_polars_spark.ops import histogram

    df = spark.createDataFrame([(float(v),) for v in [0, 1, 5, 9, 10, 10]], ["x"])
    h = {r.bin: r for r in histogram(df, "x", bins=5, lo=0.0, hi=10.0).collect()}
    assert sorted(h) == [0, 1, 2, 3, 4]          # dense spine, empty bins kept
    assert h[0].n == 2 and h[2].n == 1
    assert h[4].n == 3                            # 9, and both 10s (hi -> last bin)
    assert h[1].n == 0
    assert sum(r.n for r in h.values()) == 6


def test_histogram_auto_bounds(spark, sf_dir):
    from v3_polars_spark.ops import histogram

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    h = histogram(li, "l_extendedprice", bins=8).collect()
    assert len(h) == 8
    assert sum(r.n for r in h) == li.count()
