"""Property-based tests (hypothesis) for the L1 operator library: each op
is checked against a brute-force pure-Python reference on randomized
inputs — the per-operator rigor the reference repo lacks (SURVEY.md §5).

Example counts are kept small: every example is a full Spark job."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from v3_polars_spark.ops import asof_join, cumsum_scalable, dedup_last

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    derandomize=True,  # driver-graded CI: no fresh random examples mid-run
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# unique small ints for order keys; bounded values
keys_st = st.lists(
    st.integers(min_value=-50, max_value=50), min_size=1, max_size=20, unique=True
)
vals_st = st.integers(min_value=-1000, max_value=1000)


@settings(**SETTINGS)
@given(
    left_ts=keys_st,
    right=st.lists(
        st.tuples(st.integers(-50, 50), vals_st),
        min_size=1,
        max_size=20,
        unique_by=lambda t: t[0],
    ),
)
def test_asof_join_backward_matches_bruteforce(spark, left_ts, right):
    left = spark.createDataFrame([(t,) for t in left_ts], ["t"])
    rdf = spark.createDataFrame(right, ["t", "v"])
    got = {r["t"]: r["v"] for r in asof_join(left, rdf, on="t", by=[]).collect()}
    for t in left_ts:
        eligible = [v for (tr, v) in right if tr <= t]
        want = None
        if eligible:
            want = max((tr, v) for (tr, v) in right if tr <= t)[1]
        assert got[t] == want, (t, got[t], want)


@settings(**SETTINGS)
@given(
    left_ts=keys_st,
    right=st.lists(
        st.tuples(st.integers(-50, 50), vals_st),
        min_size=1,
        max_size=20,
        unique_by=lambda t: t[0],
    ),
)
def test_asof_join_forward_matches_bruteforce(spark, left_ts, right):
    left = spark.createDataFrame([(t,) for t in left_ts], ["t"])
    rdf = spark.createDataFrame(right, ["t", "v"])
    got = {
        r["t"]: r["v"]
        for r in asof_join(left, rdf, on="t", by=[], strategy="forward").collect()
    }
    for t in left_ts:
        cands = [(tr, v) for (tr, v) in right if tr >= t]
        want = min(cands)[1] if cands else None
        assert got[t] == want, (t, got[t], want)


@settings(**SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 5),      # key
            st.integers(-50, 50),   # order
            vals_st,                # value
        ),
        min_size=1,
        max_size=30,
        unique_by=lambda r: (r[0], r[1]),
    )
)
def test_dedup_last_picks_max_order_row(spark, rows):
    df = spark.createDataFrame(rows, ["k", "o", "v"]).repartition(4)
    got = {r["k"]: (r["o"], r["v"]) for r in dedup_last(df, ["k"], ["o"]).collect()}
    want = {}
    for k, o, v in rows:
        if k not in want or o > want[k][0]:
            want[k] = (o, v)
    assert got == want


@settings(**SETTINGS)
@given(
    rows=st.lists(
        st.tuples(st.integers(-1000, 1000), vals_st),
        min_size=1,
        max_size=40,
        unique_by=lambda r: r[0],
    )
)
def test_cumsum_scalable_matches_sorted_prefix_sum(spark, rows):
    df = spark.createDataFrame(rows, ["o", "v"]).repartition(4)
    out = cumsum_scalable(df, "v", "o", out="cum", num_partitions=4)
    got = {r["o"]: r["cum"] for r in out.collect()}
    run = 0
    for o, v in sorted(rows):
        run += v
        assert got[o] == run, (o, got[o], run)


@settings(**SETTINGS)
@given(
    left=st.lists(
        st.tuples(st.integers(0, 3), st.integers(-50, 50)),
        min_size=1, max_size=20, unique=True,
    ),
    right=st.lists(
        st.tuples(st.integers(0, 3), st.integers(-50, 50), vals_st),
        min_size=1, max_size=20, unique_by=lambda t: (t[0], t[1]),
    ),
)
def test_asof_join_by_keys_independent(spark, left, right):
    """With `by` keys, each group must as-of join independently — a right
    row never leaks across keys."""
    ldf = spark.createDataFrame(left, ["k", "t"])
    rdf = spark.createDataFrame(right, ["k", "t", "v"])
    got = {
        (r["k"], r["t"]): r["v"]
        for r in asof_join(ldf, rdf, on="t", by=["k"]).collect()
    }
    for k, t in left:
        cands = [(tr, v) for (kr, tr, v) in right if kr == k and tr <= t]
        want = max(cands)[1] if cands else None
        assert got[(k, t)] == want, (k, t, got[(k, t)], want)


@settings(**SETTINGS)
@given(
    points=st.lists(st.integers(-100, 100), min_size=1, max_size=15, unique=True),
    intervals=st.lists(
        st.tuples(st.integers(-100, 100), st.integers(0, 60)),
        min_size=1,
        max_size=10,
    ),
    width=st.sampled_from([1.0, 7.0, 25.0, 100.0]),
)
def test_range_join_matches_bruteforce(spark, points, intervals, width):
    """range_join(inner) over any bucket width == the naive all-pairs
    lo <= p < hi filter (the bucket decomposition must be lossless)."""
    from v3_polars_spark.ops import range_join

    pts = spark.createDataFrame([(i, float(p)) for i, p in enumerate(points)], ["pid", "p"])
    ivs = spark.createDataFrame(
        [(j, float(lo), float(lo + span)) for j, (lo, span) in enumerate(intervals)],
        ["iid", "lo", "hi"],
    )
    got = {
        (r["pid"], r["iid"])
        for r in range_join(pts, ivs, "p", "lo", "hi", bucket_width=width).collect()
    }
    want = {
        (i, j)
        for i, p in enumerate(points)
        for j, (lo, span) in enumerate(intervals)
        if lo <= p < lo + span
    }
    assert got == want


@settings(**SETTINGS)
@given(
    offsets=st.lists(st.integers(0, 500), min_size=1, max_size=20, unique=True),
    gap_min=st.sampled_from([1, 7, 30]),
)
def test_sessionize_matches_bruteforce(spark, offsets, gap_min):
    """sessionize == the sequential fold: same session iff the next event
    starts at or before last_ts + gap (touching windows merge)."""
    import datetime as dt

    from v3_polars_spark.ops import sessionize

    base = dt.datetime(2024, 1, 1)
    ts = sorted(base + dt.timedelta(minutes=m) for m in offsets)
    df = spark.createDataFrame([(t,) for t in ts], ["ts"])
    out = sorted(
        (r["session_start"], r["session_end"], r["n_events"])
        for r in sessionize(df, "ts", f"{gap_min}m").collect()
    )
    gap = dt.timedelta(minutes=gap_min)
    want, start, last, n = [], ts[0], ts[0], 1
    for t in ts[1:]:
        if t <= last + gap:
            last, n = t, n + 1
        else:
            want.append((start, last + gap, n))
            start, last, n = t, t, 1
    want.append((start, last + gap, n))
    assert out == sorted(want)


@settings(**SETTINGS)
@given(
    left_ts=keys_st,
    right=st.lists(
        st.tuples(st.integers(-50, 50), vals_st),
        min_size=1,
        max_size=20,
        unique_by=lambda t: t[0],
    ),
)
def test_asof_join_nearest_matches_bruteforce(spark, left_ts, right):
    left = spark.createDataFrame([(t,) for t in left_ts], ["t"])
    rdf = spark.createDataFrame(right, ["t", "v"])
    got = {
        r["t"]: r["v"]
        for r in asof_join(left, rdf, on="t", strategy="nearest").collect()
    }
    for t in left_ts:
        best = min(right, key=lambda p: (abs(p[0] - t), p[0] > t))
        assert got[t] == best[1], (t, right)


@settings(**SETTINGS)
@given(
    lefts=st.lists(st.tuples(st.integers(-50, 50), st.integers(0, 30)),
                   min_size=1, max_size=10),
    rights=st.lists(st.tuples(st.integers(-50, 50), st.integers(0, 30)),
                    min_size=1, max_size=10),
    width=st.sampled_from([1.0, 9.0, 40.0]),
)
def test_interval_overlap_join_matches_bruteforce(spark, lefts, rights, width):
    from v3_polars_spark.ops import interval_overlap_join

    a = spark.createDataFrame(
        [(i, float(lo), float(lo + sp)) for i, (lo, sp) in enumerate(lefts)],
        ["lid", "a_lo", "a_hi"],
    )
    b = spark.createDataFrame(
        [(j, float(lo), float(lo + sp)) for j, (lo, sp) in enumerate(rights)],
        ["rid", "b_lo", "b_hi"],
    )
    got = {
        (r["lid"], r["rid"])
        for r in interval_overlap_join(
            a, b, "a_lo", "a_hi", "b_lo", "b_hi", bucket_width=width
        ).collect()
    }
    want = {
        (i, j)
        for i, (llo, lsp) in enumerate(lefts)
        for j, (rlo, rsp) in enumerate(rights)
        # empty intervals (span 0) overlap nothing
        if lsp > 0 and rsp > 0 and llo < rlo + rsp and rlo < llo + lsp
    }
    assert got == want


@settings(**SETTINGS)
@given(
    texts=st.lists(
        st.text(alphabet="ab c", min_size=0, max_size=60), min_size=1, max_size=6
    ),
    chunk_size=st.integers(min_value=2, max_value=20),
    overlap_frac=st.integers(min_value=0, max_value=3),
)
def test_chunk_documents_reassembles(spark, texts, chunk_size, overlap_frac):
    """Chunk boundaries never lose or duplicate characters: dropping the
    overlap prefix of every non-first chunk and concatenating in
    chunk_idx order reproduces the input text exactly."""
    from v3_polars_spark.datapipe import chunk_documents

    overlap = min(overlap_frac, chunk_size - 1)
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    rows = chunk_documents(
        df, chunk_size=chunk_size, overlap=overlap, unit="chars"
    ).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, {})[r.chunk_idx] = r.chunk_text
    for i, text in enumerate(texts):
        chunks = [by_doc[i][j] for j in sorted(by_doc[i])]
        rebuilt = chunks[0] + "".join(c[overlap:] for c in chunks[1:])
        assert rebuilt == text
        assert all(len(c) <= chunk_size for c in chunks)


@settings(**SETTINGS)
@given(
    host=st.text(alphabet="abz.", min_size=1, max_size=10),
    path=st.text(alphabet="abz/", min_size=0, max_size=10),
    params=st.lists(
        st.sampled_from(["a=1", "b=2", "utm_source=x", "fbclid=9", "z=3"]),
        max_size=4,
    ),
)
def test_canonicalize_url_idempotent(spark, host, path, params):
    """canonicalize(canonicalize(u)) == canonicalize(u): the canonical
    form is a fixed point, so re-ingesting already-clean URLs is safe."""
    from pyspark.sql import functions as F

    from v3_polars_spark.datapipe import canonicalize_url

    url = f"https://{host}/{path}" + ("?" + "&".join(params) if params else "")
    df = spark.createDataFrame([(url,)], ["u"])
    once, twice = (
        df.select(
            canonicalize_url(F.col("u")).alias("c1"),
            canonicalize_url(canonicalize_url(F.col("u"))).alias("c2"),
        )
        .collect()[0]
    )
    assert once == twice


@settings(**SETTINGS)
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),   # user
            st.integers(min_value=0, max_value=30),  # second offset
            st.integers(min_value=0, max_value=3),   # event kind index
        ),
        min_size=1,
        max_size=25,
    )
)
def test_funnel_matches_brute_force(spark, events):
    """The one-shuffle sorted-array fold must equal the obvious
    sequential reference: walk each user's events in (ts, step-rank)
    order advancing the stage on strict-later matches."""
    import datetime as dtm

    from v3_polars_spark.ops import funnel

    kinds = ["view", "click", "purchase", "noise"]
    steps = ["view", "click", "purchase"]
    base = dtm.datetime(2024, 1, 1)
    rows = [
        (u, base + dtm.timedelta(seconds=s), kinds[k]) for u, s, k in events
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    got = {
        r.user_id: (r.stage, r.t_0, r.t_1, r.t_2)
        for r in funnel(df, steps, "ts", "event_type", by=["user_id"]).collect()
    }

    # brute force in the epoch-micros domain (UTC, matching the session)
    epoch = dtm.datetime(1970, 1, 1)
    rank = {s: i for i, s in enumerate(steps)}
    per_user = {}
    for u, ts, kind in rows:
        if kind in rank:
            us = int((ts - epoch).total_seconds() * 1_000_000)
            per_user.setdefault(u, []).append((us, rank[kind]))
    for u, evs in per_user.items():
        stage, times = 0, [None, None, None]
        for us, r in sorted(evs):
            if stage < 3 and r == stage and (stage == 0 or us > times[stage - 1]):
                times[stage] = us
                stage += 1
        assert got[u] == (stage, times[0], times[1], times[2]), (u, evs)
    assert set(got) == set(per_user)


@settings(**SETTINGS)
@given(
    target=st.lists(st.tuples(st.integers(0, 15), vals_st),
                    min_size=0, max_size=12, unique_by=lambda t: t[0]),
    updates=st.lists(st.tuples(st.integers(0, 15), vals_st, st.booleans()),
                     min_size=0, max_size=12, unique_by=lambda t: t[0]),
)
def test_merge_upsert_matches_brute_force(spark, target, updates):
    from v3_polars_spark.ops import merge_upsert

    tdf = spark.createDataFrame(target or [(99, 0)], ["k", "v"])
    udf_ = spark.createDataFrame(
        [(k, v, d) for k, v, d in updates] or [(98, 0, False)],
        ["k", "v", "del"],
    )
    got = {r.k: r.v for r in
           merge_upsert(tdf, udf_, ["k"], delete_col="del").collect()}
    want = dict(target or [(99, 0)])
    for k, v, d in (updates or [(98, 0, False)]):
        if d:
            want.pop(k, None)
        else:
            want[k] = v
    assert got == want


@settings(**SETTINGS)
@given(
    obs=st.lists(
        st.tuples(st.integers(0, 2),            # key
                  st.integers(0, 10_000),       # second offset (unique below)
                  st.integers(-500, 500)),      # value in cents
        min_size=2, max_size=15, unique_by=lambda t: (t[0], t[1]),
    )
)
def test_time_weighted_avg_matches_brute_force(spark, obs):
    import datetime as dtm

    from v3_polars_spark.ops import time_weighted_avg

    base = dtm.datetime(2024, 1, 1)
    rows = [(k, base + dtm.timedelta(seconds=s), c / 100.0) for k, s, c in obs]
    df = spark.createDataFrame(rows, ["k", "ts", "v"])
    got = {r.k: r.twa for r in time_weighted_avg(df, "ts", "v", by=["k"]).collect()}

    per_key = {}
    for k, s, c in obs:
        per_key.setdefault(k, []).append((s, c))
    for k, evs in per_key.items():
        evs.sort()
        if len(evs) < 2:
            assert got[k] is None
            continue
        total = evs[-1][0] - evs[0][0]
        wsum = sum((t2 - t1) * c1 for (t1, c1), (t2, _) in zip(evs, evs[1:]))
        assert abs(got[k] - wsum / total / 100.0) < 1e-12


@settings(**SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(1, 3),            # key
            st.integers(0, 30),           # ts
            st.integers(0, 40),           # unique-ifier
            st.sampled_from(["A", "B", "C", None]),
        ),
        min_size=1,
        max_size=25,
        unique_by=lambda t: (t[0], t[1], t[2]),
    )
)
def test_scd2_matches_sequential_brute_force(spark, rows):
    from v3_polars_spark.ops import scd2_history

    df = spark.createDataFrame(rows, "k int, ts int, seq int, attr string")
    got = sorted(
        (r.k, r.valid_from, r.attr, r.valid_to, r.is_current)
        for r in scd2_history(
            df, keys=["k"], ts_col="ts", attrs=["attr"], order=["seq"]
        ).collect()
    )
    # brute force: walk each key's rows in (ts, seq) order, open a version
    # on every attr change, close it at the next version's ts
    want = []
    by_key = {}
    for k, ts, seq, attr in rows:
        by_key.setdefault(k, []).append((ts, seq, attr))
    for k, seq_rows in by_key.items():
        seq_rows.sort()
        versions = []
        prev = object()
        for ts, _seq, attr in seq_rows:
            if attr != prev:
                versions.append([ts, attr])
                prev = attr
        for i, (vf, attr) in enumerate(versions):
            vt = versions[i + 1][0] if i + 1 < len(versions) else None
            want.append((k, vf, attr, vt, vt is None))
    assert got == sorted(want)


@settings(**SETTINGS)
@given(
    lefts=st.lists(
        st.text(alphabet="abcde3 ", min_size=1, max_size=8),
        min_size=1,
        max_size=10,
        unique=True,
    ),
    rights=st.lists(
        st.text(alphabet="abcde3 ", min_size=1, max_size=8),
        min_size=1,
        max_size=10,
        unique=True,
    ),
    max_dist=st.integers(0, 2),
)
def test_fuzzy_join_matches_blocked_brute_force(spark, lefts, rights, max_dist):
    from v3_polars_spark.ops import fuzzy_join_blocked

    ldf = spark.createDataFrame([(s,) for s in lefts], ["a"])
    rdf = spark.createDataFrame([(s,) for s in rights], ["b"])
    got = sorted(
        (r.a, r.b, r.distance)
        for r in fuzzy_join_blocked(
            ldf, rdf, "a", "b", max_dist=max_dist, block_len=4
        ).collect()
    )

    def lev(x, y):
        prev = list(range(len(y) + 1))
        for i, cx in enumerate(x, 1):
            cur = [i]
            for j, cy in enumerate(y, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (cx != cy))
                )
            prev = cur
        return prev[-1]

    def skel(s):
        return "".join(c for c in s.lower() if c in "bcdfghjklmnpqrstvwxyz")[:4]

    want = sorted(
        (a, b, lev(a, b))
        for a in lefts
        for b in rights
        if skel(a) == skel(b)
        and abs(len(a) - len(b)) <= max_dist
        and lev(a, b) <= max_dist
    )
    assert got == want


@settings(**SETTINGS)
@given(
    base=st.lists(st.integers(0, 99), min_size=1, max_size=30),
    cur=st.lists(st.integers(0, 99), min_size=1, max_size=30),
    n_bins=st.integers(2, 6),
)
def test_psi_matches_brute_force(spark, base, cur, n_bins):
    import math

    from v3_polars_spark.ops import psi_drift

    bdf = spark.createDataFrame([(v,) for v in base], ["x"])
    cdf = spark.createDataFrame([(v,) for v in cur], ["x"])
    rows = {
        r.bin: r
        for r in psi_drift(bdf, cdf, "x", lo=0.0, hi=100.0, n_bins=n_bins).collect()
    }
    width = 100.0 / n_bins
    eps = 1e-6
    for b in range(n_bins):
        nb = sum(1 for v in base if min(n_bins - 1, max(0, int(v // width))) == b)
        nc = sum(1 for v in cur if min(n_bins - 1, max(0, int(v // width))) == b)
        assert rows[b].n_base == nb and rows[b].n_cur == nc
        pb = max(nb / len(base), eps)
        pc = max(nc / len(cur), eps)
        assert rows[b].psi_contrib == pytest.approx(
            (pc - pb) * math.log(pc / pb), abs=1e-12
        )


@settings(**SETTINGS)
@given(
    rows=st.lists(
        st.tuples(st.integers(1, 2), st.integers(0, 10_000)),
        min_size=2,
        max_size=25,
    )
)
def test_mad_outliers_matches_brute_force(spark, rows):
    from v3_polars_spark.datapipe import mad_outliers

    df = spark.createDataFrame(
        [(g, i, v) for i, (g, v) in enumerate(rows)], ["g", "i", "x"]
    )
    got = {r.i: r for r in mad_outliers(df, "x", ["g"], z=3.5).collect()}

    def median(vs):
        vs = sorted(vs)
        n = len(vs)
        mid = n // 2
        return float(vs[mid]) if n % 2 else (vs[mid - 1] + vs[mid]) / 2.0

    by_g = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    for i, (g, v) in enumerate(rows):
        med = median(by_g[g])
        mad = median([abs(x - med) for x in by_g[g]])
        assert got[i].group_median == med and got[i].group_mad == mad
        if mad > 0:
            want = 0.6745 * (v - med) / mad
            assert got[i].mad_z == pytest.approx(want, abs=1e-12)
            assert got[i].is_outlier == (abs(want) > 3.5)
        else:
            assert got[i].mad_z is None and not got[i].is_outlier


@settings(**SETTINGS)
@given(
    rows=st.lists(
        st.tuples(st.integers(1, 3), st.integers(0, 20), st.text("abc", min_size=1, max_size=3)),
        min_size=1,
        max_size=25,
        unique_by=lambda t: (t[0], t[1], t[2]),
    ),
    max_items=st.integers(1, 6),
)
def test_assemble_sequences_matches_brute_force(spark, rows, max_items):
    from v3_polars_spark.datapipe import assemble_sequences

    df = spark.createDataFrame(rows, ["k", "ts", "v"])
    got = {
        r.k: (r.sequence, r.n_items)
        for r in assemble_sequences(
            df, ["k"], ["ts"], "v", max_items=max_items
        ).collect()
    }
    by_k = {}
    for k, ts, v in rows:
        by_k.setdefault(k, []).append((ts, v))
    for k, items in by_k.items():
        ordered = [v for _, v in sorted(items)][:max_items]
        assert got[k] == (" ".join(ordered), len(ordered))


@settings(**SETTINGS)
@given(
    left=st.lists(
        st.tuples(st.integers(1, 3), st.integers(0, 30)),
        min_size=1, max_size=20, unique=True,
    ),
    right=st.lists(
        st.tuples(st.integers(1, 3), st.integers(0, 30), st.integers(-99, 99)),
        min_size=1, max_size=20, unique_by=lambda t: (t[0], t[1]),
    ),
)
def test_cogrouped_asof_matches_native_on_random_inputs(spark, left, right):
    from v3_polars_spark.ops import asof_join, cogrouped_asof

    ldf = spark.createDataFrame(left, ["k", "t"])
    rdf = spark.createDataFrame(right, ["k", "t", "v"])
    a = {
        (r.k, r.t): r.v
        for r in cogrouped_asof(ldf, rdf, on="t", by=["k"], value_cols=["v"]).collect()
    }
    b = {(r.k, r.t): r.v for r in asof_join(ldf, rdf, on="t", by=["k"]).collect()}
    assert a == b


@settings(**SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 9),
            st.one_of(st.none(), st.sampled_from(["A", "B", "C"])),
            st.one_of(st.none(), st.integers(-5, 105)),
        ),
        min_size=1, max_size=30, unique_by=lambda t: t[0],
    )
)
def test_validate_counts_match_brute_force(spark, rows):
    from v3_polars_spark.ops import (
        check_accepted_values,
        check_not_null,
        check_range,
        check_unique,
        run_checks,
    )

    df = spark.createDataFrame(rows, "id int, status string, amt int")
    rep = {
        r.rule: (r.n_checked, r.n_violations)
        for r in run_checks(
            [
                check_not_null(df, "status"),
                check_unique(df, ["id"]),
                check_accepted_values(df, "status", ["A", "B"]),
                check_range(df, "amt", 0, 100),
            ]
        ).collect()
    }
    n = len(rows)
    assert rep["not_null:status"] == (n, sum(1 for _, s, _ in rows if s is None))
    assert rep["unique:id"] == (n, 0)  # ids unique by construction
    assert rep["accepted_values:status"] == (
        n, sum(1 for _, s, _ in rows if s is not None and s not in ("A", "B"))
    )
    assert rep["range:amt"] == (
        n, sum(1 for _, _, a in rows if a is not None and not (0 <= a <= 100))
    )


@settings(**SETTINGS)
@given(
    base=st.lists(st.tuples(st.integers(0, 4), st.integers(1, 50)),
                  min_size=1, max_size=12),
    cur=st.lists(st.tuples(st.integers(0, 4), st.integers(1, 50)),
                 min_size=1, max_size=12),
)
def test_psi_from_counts_sums_duplicate_bins(spark, base, cur):
    """psi_from_counts must treat pre-aggregated per-segment counts with
    DUPLICATE bin rows as additive — equal to the collapsed counts."""
    import math

    from v3_polars_spark.ops import psi_from_counts

    bdf = spark.createDataFrame(base, ["bin", "n"])
    cdf = spark.createDataFrame(cur, ["bin", "n"])
    got = {r.bin: r.psi_contrib
           for r in psi_from_counts(bdf, cdf, 0.0, 5.0, 5).collect()}

    def collapse(rows):
        out = {}
        for b, v in rows:
            out[b] = out.get(b, 0) + v
        return out

    cb, cc = collapse(base), collapse(cur)
    tb, tc = sum(cb.values()), sum(cc.values())
    for b in range(5):
        pb = max(cb.get(b, 0) / tb, 1e-6)
        pc = max(cc.get(b, 0) / tc, 1e-6)
        assert got[b] == pytest.approx((pc - pb) * math.log(pc / pb), abs=1e-12)


# ---------------------------------------------------------------------------
# codec properties (pure numpy, no Spark)
# ---------------------------------------------------------------------------


@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    c=st.sampled_from([1, 2, 3, 4]),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_png_roundtrip_property(h, w, c, seed):
    """PNG is lossless: decode(encode(x)) == x for every 8-bit array."""
    import numpy as np

    from v3_polars_spark.datapipe import codecs as C

    a = np.random.default_rng(seed).integers(0, 256, (h, w, c), dtype=np.uint8)
    out = C.decode_png(C.encode_png(a))
    assert out.shape == a.shape and (out == a).all()


@given(
    h=st.integers(8, 40),
    w=st.integers(8, 40),
    seed=st.integers(0, 2**31 - 1),
    gray=st.booleans(),
)
@settings(max_examples=25, deadline=None)
def test_jpeg_error_bounded_property(h, w, seed, gray):
    """Baseline JPEG at q=95 keeps mean abs error small on arbitrary
    uint8 content (worst case: white noise) and never changes shape."""
    import numpy as np

    from v3_polars_spark.datapipe import codecs as C

    rng = np.random.default_rng(seed)
    shape = (h, w) if gray else (h, w, 3)
    a = rng.integers(0, 256, shape, dtype=np.uint8)
    out = C.decode_jpeg(C.encode_jpeg(a, 95))
    assert out.shape == a.shape
    assert np.abs(out.astype(int) - a.astype(int)).mean() < 16


@given(
    n=st.integers(1, 2000),
    ch=st.integers(1, 2),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_wav_roundtrip_property(n, ch, rate, seed):
    """16-bit PCM WAV round trips within 1/16000 (scale + half LSB)."""
    import numpy as np

    from v3_polars_spark.datapipe import codecs as C

    s = np.random.default_rng(seed).uniform(-1, 1, (n, ch))
    dec, got_rate = C.decode_wav(C.encode_wav(s, rate))
    assert got_rate == rate and dec.shape == (n, ch)
    assert np.abs(dec - s).max() < 1.0 / 16000


@given(seed=st.integers(0, 2**31 - 1), shift=st.integers(-12, 12))
@settings(max_examples=25, deadline=None)
def test_phash_brightness_invariance_property(seed, shift):
    """pHash is DCT-AC-based: a global brightness shift flips at most a
    few bits; an unrelated image stays far."""
    import numpy as np

    from v3_polars_spark.datapipe import codecs as C

    rng = np.random.default_rng(seed)
    img = C.resize_bilinear(
        rng.integers(0, 256, (12, 16, 3)).astype(np.uint8), 64, 48
    )
    shifted = np.clip(img.astype(int) + shift, 0, 255).astype(np.uint8)
    d = bin((C.phash64(img) ^ C.phash64(shifted)) & (2**64 - 1)).count("1")
    assert d <= 6


def _uf_components(n_nodes, edges):
    """Union-find oracle: node -> min id of its component."""
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in range(n_nodes)}


def test_connected_components_chain_converges_logarithmically(spark):
    """VERDICT r4 item 6: a 100-node duplicate CHAIN (diameter 99 — the
    min-label-propagation worst case) must converge within the pointer-
    doubling budget (~log2(99) + constant), not 100 rounds, and label
    every node with the chain head."""
    from v3_polars_spark.datapipe import connected_components

    n = 100
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], ["id_a", "id_b"]
    )
    nodes = spark.createDataFrame([(i,) for i in range(n)], ["doc_id"])
    stats = {}
    got = {
        r["doc_id"]: r["rep"]
        for r in connected_components(pairs, nodes, max_iter=14, stats=stats).collect()
    }
    assert got == {i: 0 for i in range(n)}
    assert stats["rounds"] <= 12, stats  # observed ~8; 100 would be propagation-only


@settings(**SETTINGS)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 39), st.integers(0, 39)),
        min_size=0,
        max_size=60,
    )
)
def test_connected_components_matches_union_find(spark, edges):
    """Random multigraphs (self-loops and duplicate edges included) against
    a pure-Python union-find oracle."""
    from v3_polars_spark.datapipe import connected_components

    n = 40
    nodes = spark.createDataFrame([(i,) for i in range(n)], ["doc_id"])
    if edges:
        pairs = spark.createDataFrame(edges, ["id_a", "id_b"])
    else:
        pairs = spark.createDataFrame([], "id_a long, id_b long")
    got = {
        r["doc_id"]: r["rep"] for r in connected_components(pairs, nodes).collect()
    }
    assert got == _uf_components(n, edges)


@settings(**{**SETTINGS, "max_examples": 5})
@given(
    dup_counts=st.lists(st.integers(1, 5), min_size=2, max_size=6),
    drop_words=st.integers(0, 2),
)
@pytest.mark.fuzz
def test_minhash_collapse_equivalence_random_duplication(
    spark, dup_counts, drop_words
):
    """Random duplication profiles: N base docs (one a near-dup of
    another via word drops), each replicated 1-5x, must produce an
    identical pair list through the collapsed and uncollapsed pipelines
    — including near_dup_components vs components over expanded pairs."""
    from v3_polars_spark.datapipe import (
        connected_components,
        minhash_lsh_pairs,
        near_dup_components,
    )

    words = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
        "kilo lima mike november oscar papa quebec romeo sierra tango"
    ).split()
    rows, next_id = [], 0
    for base_i, d in enumerate(dup_counts):
        toks = words[base_i:] + words[:base_i]
        if base_i == 1 and drop_words:
            toks = toks[:-drop_words]  # near-dup of base 1's rotation
        text = " ".join(toks)
        for _ in range(d):
            rows.append((next_id, text))
            next_id += 1
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    key = lambda rs: sorted(
        (r["id_a"], r["id_b"], round(r["jaccard"], 12)) for r in rs
    )
    kw = dict(n=3, num_hashes=16, bands=4, verify_threshold=0.05)
    fast = key(minhash_lsh_pairs(docs, **kw).collect())
    slow = key(minhash_lsh_pairs(docs, **kw, collapse_exact=False).collect())
    assert fast == slow

    comp_fast = {
        r["doc_id"]: r["rep"]
        for r in near_dup_components(docs, **kw).collect()
    }
    pairs = minhash_lsh_pairs(docs, **kw, collapse_exact=False)
    comp_slow = {
        r["doc_id"]: r["rep"]
        for r in connected_components(pairs, docs.select("doc_id")).collect()
    }
    assert comp_fast == comp_slow


@settings(**SETTINGS)
@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=12
        ).map(" ".join),
        min_size=1,
        max_size=6,
    ),
    k=st.integers(min_value=2, max_value=4),
    min_count=st.integers(min_value=2, max_value=3),
)
def test_dedup_substrings_matches_bruteforce(spark, texts, k, min_count):
    """Window-hash duplicated-span removal agrees with a direct Python
    reimplementation of the contract (count every k-gram occurrence
    corpus-wide, remove all tokens covered by any k-gram occurring
    >= min_count times) on tiny random corpora with heavy collisions."""
    from collections import Counter

    from v3_polars_spark.datapipe import dedup_substrings

    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["text_clean"], r["n_tokens"], r["n_removed"])
        for r in dedup_substrings(df, k=k, min_count=min_count).collect()
    }
    toks = {i: t.split() for i, t in enumerate(texts)}
    counts = Counter(
        " ".join(t[i : i + k])
        for t in toks.values()
        for i in range(len(t) - k + 1)
    )
    for i, t in toks.items():
        cov = set()
        for j in range(len(t) - k + 1):
            if counts[" ".join(t[j : j + k])] >= min_count:
                cov.update(range(j, j + k))
        kept = [tok for j, tok in enumerate(t) if j not in cov]
        assert got[i] == (" ".join(kept), len(t), len(t) - len(kept)), (
            i, texts, k, min_count, got[i],
        )


# ---------------------------------------------------------------------------
# position-salted fingerprint (datapipe/fingerprint.py) — oracle
# infrastructure promoted to the library in round 10
# ---------------------------------------------------------------------------


def _fp_py(tokens):
    """Pure-Python replay of position_salted_fp: sum of 40-bit md5
    prefixes of 'i:token'."""
    import hashlib

    return sum(
        int(hashlib.md5(f"{i}:{t}".encode()).hexdigest()[:10], 16)
        for i, t in enumerate(tokens)
    )


@settings(**SETTINGS)
@given(
    toks=st.lists(
        st.text(
            alphabet=st.characters(
                codec="utf-8", exclude_characters=["\x00"]
            ),
            min_size=0,
            max_size=6,
        ),
        min_size=1,
        max_size=12,
    )
)
def test_position_salted_fp_three_way_and_sensitivity(spark, toks):
    """Spark fold == DuckDB SQL term == pure-Python md5 reference; and
    the fingerprint moves under single-token mutation, adjacent swap of
    unequal tokens, truncation, and extension (40-bit terms: a chance
    agreement on any sampled case would be a ~2**-40 event — treat a
    hit as a real bug)."""
    import duckdb

    from v3_polars_spark.datapipe import (
        position_salted_fp,
        salted_fp_term_sql,
    )
    from pyspark.sql import functions as F

    ref = _fp_py(toks)
    got = (
        spark.createDataFrame([(toks,)], ["tokens"])
        .select(position_salted_fp(F.col("tokens")).alias("fp"))
        .first()
        .fp
    )
    assert got == ref
    term = salted_fp_term_sql("CAST(i - 1 AS VARCHAR)", "t")
    duck = duckdb.connect().execute(
        f"""
        SELECT CAST(COALESCE(sum({term}), 0) AS BIGINT)
        FROM (SELECT unnest(?) AS t,
                     generate_subscripts(?, 1) AS i)
        """,
        [toks, toks],
    ).fetchone()[0]
    assert duck == ref
    # sensitivity: every structural perturbation moves the value
    assert _fp_py(toks + ["x"]) != ref
    assert _fp_py([t + "y" for t in toks[:1]] + toks[1:]) != ref
    if len(toks) > 1:
        assert _fp_py(toks[:-1]) != ref
        if toks[0] != toks[1]:
            assert _fp_py([toks[1], toks[0]] + toks[2:]) != ref


def test_position_salted_fp_exactness_bound(spark):
    """2048 max-weight terms stay exact: sum < 2**52 < 2**53 (double-
    safe) — the documented bound for 4096-token sequences."""
    n, max_term = 4096, (1 << 40) - 1
    assert n * max_term < (1 << 53)
