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


# ---------------------------------------------------------------------------
# KLL quantile sketch tables
# ---------------------------------------------------------------------------


def test_kll_rollup_exact_below_k(spark):
    """With n < k every value is retained, so per-segment sketches merged
    give exactly the same quantiles as one global sketch — mergeability
    with no approximation in the way."""
    from v3_polars_spark.ops import kll_rollup, kll_sketches

    rows = [(d, v) for d in range(4) for v in range(d * 10, d * 10 + 30)]
    df = spark.createDataFrame(rows, ["day", "v"])
    per_day = kll_sketches(df, "v", ["day"], k=200)
    merged = {
        r.p: r.approx_value
        for r in kll_rollup(per_day, [], probs=[0.1, 0.5, 0.9]).collect()
    }
    direct = {
        r.p: r.approx_value
        for r in kll_rollup(
            kll_sketches(df, "v", [], k=200), [], probs=[0.1, 0.5, 0.9]
        ).collect()
    }
    assert merged == direct
    assert merged[0.5] in range(0, 60)  # sane median of 0..59


def test_kll_quantile_check_contract_holds(spark):
    from v3_polars_spark.ops import kll_quantile_check

    df = spark.createDataFrame([(i % 1000,) for i in range(20_000)], ["v"])
    out = kll_quantile_check(df, "v", [0.25, 0.5, 0.75, 0.99], k=200).collect()
    assert len(out) == 4
    assert all(r.rank_ok for r in out)
    assert {r.p: r.exact_value for r in out}[0.5] == 499.5


def test_kll_rollup_grouped_n(spark):
    from v3_polars_spark.ops import kll_rollup, kll_sketches

    df = spark.createDataFrame(
        [("a", i) for i in range(50)] + [("b", i) for i in range(10)], ["g", "v"]
    )
    sk = kll_sketches(df, "v", ["g"])
    out = {(r.g, r.p): r.n for r in kll_rollup(sk, ["g"], probs=[0.5]).collect()}
    assert out[("a", 0.5)] == 50 and out[("b", 0.5)] == 10


# ---------------------------------------------------------------------------
# Theta sketch set algebra
# ---------------------------------------------------------------------------


def test_theta_set_algebra_exact_below_nominal(spark):
    """Below 2^lgNomEntries distinct keys theta sketches are exact, so
    union/intersection/difference estimates equal the true set sizes."""
    from v3_polars_spark.ops import theta_set_estimate, theta_sketches

    a_keys = set(range(0, 300))
    b_keys = set(range(200, 450))
    rows = [("a", k) for k in a_keys] + [("b", k) for k in b_keys]
    df = spark.createDataFrame(rows, ["side", "user"])
    sk = theta_sketches(df, "user", ["side"], lg_nom_entries=12)
    r = theta_set_estimate(sk, "side", "a", "b").first()
    assert round(r.n_a) == len(a_keys)
    assert round(r.n_b) == len(b_keys)
    assert round(r.n_union) == len(a_keys | b_keys)
    assert round(r.n_intersect) == len(a_keys & b_keys)
    assert round(r.n_a_only) == len(a_keys - b_keys)


def test_theta_sketches_merge_across_segments(spark):
    """Per-segment sketches union to the same answer as one pass —
    the materialize-once pattern."""
    from v3_polars_spark.ops import theta_set_estimate, theta_sketches

    rows = [("a", seg, k) for seg in range(3) for k in range(seg * 50, seg * 50 + 80)]
    rows += [("b", 0, k) for k in range(100, 160)]
    df = spark.createDataFrame(rows, ["side", "seg", "user"])
    # sketches at (side, seg) grain; estimate merges per side
    sk = theta_sketches(df, "user", ["side", "seg"])
    r = theta_set_estimate(sk, "side", "a", "b").first()
    exact_a = {k for s in range(3) for k in range(s * 50, s * 50 + 80)}
    exact_b = set(range(100, 160))
    assert round(r.n_a) == len(exact_a)
    assert round(r.n_intersect) == len(exact_a & exact_b)


# ---------------------------------------------------------------------------
# heavy_hitters: exact top-k via Misra-Gries candidates + recount
# ---------------------------------------------------------------------------


def test_heavy_hitters_exact_on_skewed_data(spark):
    """Zipf-ish data: fast path certifies and the answer equals the exact
    full aggregation with the same (n DESC, value ASC) tiebreak."""
    from collections import Counter

    from v3_polars_spark.ops import heavy_hitters

    vals = []
    for r in range(1, 201):
        vals += [f"v{r:03d}"] * max(1, 3000 // r)
    df = spark.createDataFrame([(v,) for v in vals], "tok string").repartition(8)
    got = [(r["value"], r["n"]) for r in heavy_hitters(df, "tok", k=15, ndv_threshold=0).collect()]
    exact = sorted(Counter(vals).items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    assert got == exact


def test_heavy_hitters_uniform_falls_back_exact(spark):
    """Near-uniform data: no sketch can certify a top-k, so the runtime
    soundness check must route to the exact fallback — the result is
    still exactly the deterministic top-k."""
    from collections import Counter

    from v3_polars_spark.ops import heavy_hitters

    # 500 values, counts 2 or 3 — k-th count can never exceed N/m
    vals = [f"u{i:04d}" for i in range(500)] * 2 + [f"u{i:04d}" for i in range(250)]
    df = spark.createDataFrame([(v,) for v in vals], "tok string").repartition(16)
    got = [(r["value"], r["n"]) for r in heavy_hitters(df, "tok", k=10, ndv_threshold=0).collect()]
    exact = sorted(Counter(vals).items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert got == exact


def test_heavy_hitters_edges(spark):
    """Fewer distinct values than k (returns all, ordered); nulls ignored;
    ties broken by value ascending."""
    from v3_polars_spark.ops import heavy_hitters

    rows = [("b",), ("a",), ("b",), ("a",), ("c",), (None,)]
    df = spark.createDataFrame(rows, "tok string")
    got = [(r["value"], r["n"]) for r in heavy_hitters(df, "tok", k=10).collect()]
    assert got == [("a", 2), ("b", 2), ("c", 1)]


def test_heavy_hitters_adaptive_gate_small_ndv(spark):
    """Default threshold: a low-cardinality column routes to the plain
    exact aggregation (no Python pass) and still yields the exact top-k."""
    from collections import Counter

    from v3_polars_spark.ops import heavy_hitters

    vals = [f"t{i % 40:02d}" for i in range(5000)]
    df = spark.createDataFrame([(v,) for v in vals], "tok string")
    got = [(r["value"], r["n"]) for r in heavy_hitters(df, "tok", k=5).collect()]
    exact = sorted(Counter(vals).items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert got == exact
