"""Generative differential fuzzing of the ops/ + datapipe/ COMPOSITIONS.

test_props and the hostile sweep fuzz per-op *inputs*; this fuzzes
*compositions* — random 3-5 stage pipelines drawn from a 16-stage
library (ops/: filter, derive, dedup_first/last, cumsum, lead, ffill,
tumbling + hopping resample, group-by+having, join-back-aggregate,
as-of join, sort+limit; datapipe/: exact text dedup, URL
canonicalization, hash-deterministic train/val/test split, char
chunking — random orders with random params/keys/nulls), executed by
Spark through the REAL operators and mirrored stage-by-stage into one
DuckDB SQL string, then compared with oracle_check's order-insensitive
compare.
Compositions are where the tiebreak/ordering contracts interact: a
dedup_last that silently depended on input order, a window frame that
differs on ties, an as-of join that drops unmatched rows — all invisible
to single-op tests over friendly inputs.

Determinism discipline (the library's documented contracts, enforced by
construction): every window/dedup ORDER includes the running frame's
unique-key tuple as the final tiebreak (total order per partition), and
order columns are always non-null (NULLS-ordering differs between the
engines and `dedup_last` requires non-null order). Aggregate SUMs use
int64 columns only — float sums are reduction-order-dependent in any
engine, so they can't be differentially compared (cumsum over a TOTAL
order is fine for either type; we still use ints).

Both engines read the SAME parquet files (written once per seed with
pyarrow), so null masks and timestamp encodings are bit-identical on
both sides — no pandas NaN-vs-NULL conversion ambiguity.

Failing seeds print (seed, stage list, final SQL); commit any found
failure as a pinned regression seed in _REGRESSION_SEEDS.

N defaults to 200 seeds (~3 min); override with SPARK_GRAFT_FUZZ_N.
Deep hunts: round 7 ran 1001/2501/5001 seeds over the 12-stage ops/
library — all green after the seed-317 DuckDB-ASOF barrier fix; round 8
ran 1001, 2501, and 5001 seeds over the extended 16-stage library
(datapipe dedup/url/split/chunk stages + text/url base columns) — all
green, no new seeds pinned; round 9 added st_bpe (nested-fold encode vs
its list_reduce SQL mirror) and ran 800 seeds over the 17-stage library
on final code — green AT THE TIME. Round 10's bpe hardening
(validate_merges) then made st_bpe's permuted merge pool raise on
inconsistent draws, turning the full suite red for two snapshots
(r10/r11 VERDICT): fixed in round 12 by passing strategy="expr",
validate=False (both sides of the parity check replay the same
rank-order fold, so caller-asserted consistency is exactly the
documented contract); round 12 re-ran the full fuzz tier green.
"""

from __future__ import annotations

import os
import sys
from dataclasses import dataclass, replace

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

pytestmark = pytest.mark.fuzz  # excluded from the fast gate (-m 'not fuzz')
from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
from oracle_check import compare  # noqa: E402

from v3_polars_spark.datapipe.chunking import chunk_documents  # noqa: E402
from v3_polars_spark.datapipe.dedup import dedup_exact  # noqa: E402
from v3_polars_spark.datapipe.sampling import split_train_val_test  # noqa: E402
from v3_polars_spark.datapipe.urls import canonicalize_url  # noqa: E402
from v3_polars_spark.ops.asof import asof_join  # noqa: E402
from v3_polars_spark.ops.dedup import dedup_first, dedup_last  # noqa: E402
from v3_polars_spark.ops.resample import resample  # noqa: E402
from v3_polars_spark.ops.windows import cumsum, ffill, lead_col  # noqa: E402

N_SEEDS = int(os.environ.get("SPARK_GRAFT_FUZZ_N", "200"))
# Seeds that ever failed get pinned here and always run first.
# 317 (found at N=1000, round 7): ffill -> filter -> FORWARD asof ->
#   filter(d0 % 4 != 0) -> cumsum returned 307 rows from DuckDB vs
#   Spark's 215. The ENGINE was right: DuckDB 1.0.0 pushes the
#   right-side-column filter below the ASOF LEFT JOIN, changing which
#   dim row is "nearest" (307) instead of filtering the join RESULT
#   (215). Verified by wrapping the same SQL in a MATERIALIZED CTE,
#   which returns 215 = Spark. st_asof now emits that barrier; the two
#   committed ASOF oracles (asof_join, price_frames) are unexposed —
#   the ASOF join is their final operation.
_REGRESSION_SEEDS: list[int] = [317]

_TS0 = 1_600_000_000


@dataclass(frozen=True)
class Col:
    name: str
    kind: str  # int | float | ts | str
    nullable: bool


@dataclass
class St:
    """Running pipeline state: the Spark frame, the equivalent DuckDB SQL
    (a full SELECT over the registered views), the column catalog, the
    columns whose tuple is unique per row (window tiebreak source), and
    per-pipeline flags."""

    df: object
    sql: str
    cols: list
    unique: tuple
    used_asof: bool = False
    i: int = 0

    def names(self):
        return [c.name for c in self.cols]

    def col(self, name):
        return next(c for c in self.cols if c.name == name)

    def pick(self, rng, pred):
        cands = [c for c in self.cols if pred(c)]
        return cands[rng.randint(len(cands))] if cands else None


_VOCAB = ["alpha", "Bravo", "charlie", "DELTA", "echo", "fox", "golf", "Hotel"]
_URL_SCHEMES = ["http://", "HTTPS://", "ftp://"]
_URL_HOSTS = ["Example.com", "example.com:80", "EXAMPLE.com:443", "other.ORG:8080"]
_URL_PATHS = ["/a/b", "/a/b/", "/c", ""]
_URL_QS = ["", "?utm_source=x&b=2&a=1", "?b=2&a=1", "?a=1&b=2&fbclid=z", "?gclid=1"]
_SCHEMELESS = ["relative/path?a=1", "mailto:x@y.z", "//protocol-relative/p"]


def _mk_text(rng, n):
    """Duplicate-heavy text: ~n/4 canonical token templates, each row a
    case/whitespace perturbation of its template — normalize-equal
    variants exercise the exact-dedup fingerprint path."""
    n_tmpl = max(3, n // 4)
    templates = [
        " ".join(
            _VOCAB[j]
            for j in rng.randint(0, len(_VOCAB), 3 + int(rng.randint(0, 8)))
        )
        for _ in range(n_tmpl)
    ]
    out = []
    for i in range(n):
        t = templates[int(rng.randint(n_tmpl))]
        r = rng.rand()
        if r < 0.2:
            t = t.upper()
        elif r < 0.4:
            t = t.replace(" ", "  ")
        elif r < 0.5:
            t = f"  {t} "
        out.append(t)
    return out


def _mk_urls(rng, n):
    out = []
    for i in range(n):
        if rng.rand() < 0.12:
            out.append(_SCHEMELESS[int(rng.randint(len(_SCHEMELESS)))])
            continue
        out.append(
            _URL_SCHEMES[int(rng.randint(3))]
            + _URL_HOSTS[int(rng.randint(4))]
            + _URL_PATHS[int(rng.randint(4))]
            + _URL_QS[int(rng.randint(5))]
            + ("#frag" if rng.rand() < 0.3 else "")
        )
    return out


def _write_tables(rng, tmpdir, seed):
    n = 300 + int(rng.randint(0, 300))
    pdf = pd.DataFrame(
        {
            "uid": np.arange(n, dtype=np.int64),
            "k": rng.randint(0, 8, n).astype(np.int64),
            "v": rng.randint(-100, 100, n).astype(np.int64),
            "ts": pd.to_datetime(
                _TS0 + rng.randint(0, 7 * 86400, n), unit="s"
            ),
            "x": np.round(rng.normal(0.0, 50.0, n), 6),
            "s": rng.choice(["red", "green", "blue", "amber"], n),
            "txt": _mk_text(rng, n),
            "url": _mk_urls(rng, n),
        }
    )
    pdf.loc[rng.rand(n) < 0.15, "x"] = np.nan
    rows = []
    for k in range(8):
        for t in np.unique(rng.randint(0, 7 * 86400, 12)):
            rows.append((k, _TS0 + int(t), int(rng.randint(0, 1000))))
    dim = pd.DataFrame(rows, columns=["k", "ts", "d0"]).astype(
        {"k": np.int64, "d0": np.int64}
    )
    dim["ts"] = pd.to_datetime(dim["ts"], unit="s")
    paths = {}
    for name, frame in (("base", pdf), ("dim", dim)):
        tbl = pa.Table.from_pandas(frame, preserve_index=False)
        tbl = tbl.cast(
            pa.schema(
                [
                    pa.field(f.name, pa.timestamp("us"))
                    if pa.types.is_timestamp(f.type)
                    else f
                    for f in tbl.schema
                ]
            )
        )
        paths[name] = os.path.join(tmpdir, f"{name}_{seed}.parquet")
        pq.write_table(tbl, paths[name])
    return paths


def _order_cols(state, rng, exclude=()):
    """A deterministic total order: one random non-null orderable column,
    then the unique tuple as final tiebreak."""
    lead = state.pick(
        rng,
        lambda c: not c.nullable
        and c.kind in ("int", "ts")
        and c.name not in exclude
        and c.name not in state.unique,
    )
    tail = [u for u in state.unique if u not in exclude]
    return ([lead.name] if lead else []) + tail


def _keys(state, rng):
    """1-2 low-cardinality grouping keys, if any are present."""
    cands = [
        c.name
        for c in state.cols
        if c.name in ("k", "s") or c.name.startswith("__g")
    ]
    if not cands:
        return None
    rng.shuffle(cands)
    return sorted(cands[: 1 + rng.randint(0, min(2, len(cands)))])


def _sel(names):
    return ", ".join(names)


# --- stage library: each returns a new St or None if not applicable -----


def st_filter(state, rng):
    c = state.pick(rng, lambda c: c.kind in ("int", "float", "str"))
    if c is None:
        return None
    if c.kind == "int":
        pred = [
            f"{c.name} % {int(rng.randint(2, 5))} != 0",
            f"{c.name} >= {int(rng.randint(-60, 10))}",
        ][rng.randint(2)]
    elif c.kind == "float":
        lit = round(float(rng.normal(0, 40)), 3)
        pred = [
            f"{c.name} > {lit}",
            f"{c.name} IS NOT NULL AND {c.name} <= {lit}",
            f"{c.name} IS NULL OR {c.name} > {lit}",
        ][rng.randint(3)]
    else:
        pred = [
            f"{c.name} <> 'green'",
            f"{c.name} IN ('red', 'blue', 'amber')",
        ][rng.randint(2)]
    return replace_state(
        state,
        df=state.df.filter(F.expr(pred)),
        sql=f"SELECT {_sel(state.names())} FROM ({state.sql}) f{state.i} "
        f"WHERE {pred}",
    )


def st_derive(state, rng):
    a = state.pick(rng, lambda c: c.kind == "int")
    b = state.pick(rng, lambda c: c.kind == "int")
    if a is None or b is None:
        return None
    x = state.pick(rng, lambda c: c.kind == "float")
    exprs = [
        (f"{a.name} * 3 + abs({b.name})", "int", a.nullable or b.nullable),
        (
            f"CASE WHEN {a.name} > {b.name} THEN {a.name} - {b.name} "
            f"ELSE {b.name} END",
            "int",
            a.nullable or b.nullable,
        ),
    ]
    if x is not None:
        exprs.append(
            (f"{x.name} * 1.5 + {a.name}", "float", True)
        )
    expr, kind, nullable = exprs[rng.randint(len(exprs))]
    name = f"__d{state.i}"
    return replace_state(
        state,
        df=state.df.withColumn(name, F.expr(expr)),
        sql=f"SELECT {_sel(state.names())}, {expr} AS {name} "
        f"FROM ({state.sql}) d{state.i}",
        cols=state.cols + [Col(name, kind, nullable)],
    )


def st_dedup(state, rng):
    keys = _keys(state, rng)
    if not keys or not all(k in state.names() for k in keys):
        return None
    order = _order_cols(state, rng, exclude=keys)
    if not order:
        return None
    last = bool(rng.randint(2))
    fn = dedup_last if last else dedup_first
    out_names = keys + [c.name for c in state.cols if c.name not in keys]
    d = "DESC" if last else "ASC"
    ob = ", ".join(f"{o} {d}" for o in order)
    return replace_state(
        state,
        df=fn(state.df, keys=keys, order=order),
        sql=f"SELECT {_sel(out_names)} FROM ("
        f"SELECT *, row_number() OVER (PARTITION BY {_sel(keys)} "
        f"ORDER BY {ob}) AS __rn FROM ({state.sql}) dd{state.i}"
        f") WHERE __rn = 1",
        cols=[state.col(n) for n in out_names],
        unique=tuple(keys),
    )


def st_cumsum(state, rng):
    c = state.pick(
        rng, lambda c: c.kind == "int" and not c.nullable
    )
    if c is None:
        return None
    by = _keys(state, rng) if rng.randint(2) else None
    order = _order_cols(state, rng, exclude=by or ())
    if not order:
        return None
    name = f"__c{state.i}"
    part = f"PARTITION BY {_sel(by)} " if by else ""
    ob = ", ".join(f"{o} ASC" for o in order)
    return replace_state(
        state,
        df=cumsum(state.df, c.name, order=order, by=by, out=name),
        sql=f"SELECT {_sel(state.names())}, SUM({c.name}) OVER ({part}"
        f"ORDER BY {ob} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        f" AS {name} FROM ({state.sql}) c{state.i}",
        cols=state.cols + [Col(name, "int", False)],
    )


def st_lead(state, rng):
    c = state.pick(rng, lambda c: c.kind in ("int", "float"))
    if c is None:
        return None
    by = _keys(state, rng) if rng.randint(2) else None
    order = _order_cols(state, rng, exclude=by or ())
    if not order:
        return None
    default = int(rng.randint(-5, 5)) if c.kind == "int" and rng.randint(2) else None
    name = f"__l{state.i}"
    part = f"PARTITION BY {_sel(by)} " if by else ""
    ob = ", ".join(f"{o} ASC" for o in order)
    expr = f"lead({c.name}, 1) OVER ({part}ORDER BY {ob})"
    if default is not None:
        expr = f"coalesce({expr}, {default})"
    return replace_state(
        state,
        df=lead_col(state.df, c.name, order=order, by=by, out=name, default=default),
        sql=f"SELECT {_sel(state.names())}, {expr} AS {name} "
        f"FROM ({state.sql}) l{state.i}",
        cols=state.cols + [Col(name, c.kind, default is None)],
    )


def st_ffill(state, rng):
    c = state.pick(rng, lambda c: c.nullable and c.kind in ("int", "float"))
    if c is None:
        return None
    by = _keys(state, rng) if rng.randint(2) else None
    order = _order_cols(state, rng, exclude=by or ())
    if not order:
        return None
    part = f"PARTITION BY {_sel(by)} " if by else ""
    ob = ", ".join(f"{o} ASC" for o in order)
    others = [n for n in state.names() if n != c.name]
    return replace_state(
        state,
        df=ffill(state.df, [c.name], order=order, by=by),
        sql=f"SELECT {_sel(others)}, last_value({c.name} IGNORE NULLS) "
        f"OVER ({part}ORDER BY {ob} ROWS BETWEEN UNBOUNDED PRECEDING AND "
        f"CURRENT ROW) AS {c.name} FROM ({state.sql}) ff{state.i}",
    )


def st_resample(state, rng):
    if "ts" not in state.names():
        return None
    c = state.pick(
        rng, lambda c: c.kind == "int" and not c.nullable and c.name != "uid"
    )
    if c is None:
        return None
    every, w = [("30m", 1800), ("1h", 3600), ("6h", 21600)][rng.randint(3)]
    n_name, s_name = f"__n{state.i}", f"__s{state.i}"
    aggs = [
        F.count(F.lit(1)).alias(n_name),
        F.sum(c.name).alias(s_name),
    ]
    df = (
        resample(state.df, "ts", every, aggs)
        .withColumn("bucket", F.unix_timestamp("bucket_ts").cast("long"))
        .drop("bucket_ts")
    )
    return replace_state(
        state,
        df=df,
        sql=f"SELECT count(*) AS {n_name}, SUM({c.name}) AS {s_name}, "
        f"CAST(floor(epoch(ts) / {w}) * {w} AS BIGINT) AS bucket "
        f"FROM ({state.sql}) r{state.i} GROUP BY bucket",
        cols=[
            Col(n_name, "int", False),
            Col(s_name, "int", False),
            Col("bucket", "int", False),
        ],
        unique=("bucket",),
    )


def st_groupby(state, rng):
    keys = _keys(state, rng)
    if not keys:
        return None
    c = state.pick(
        rng,
        lambda c: c.kind == "int" and not c.nullable and c.name not in keys,
    )
    if c is None:
        return None
    n_name, s_name, m_name = (
        f"__gn{state.i}",
        f"__gs{state.i}",
        f"__gm{state.i}",
    )
    having = rng.randint(2) == 1
    df = state.df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias(n_name),
        F.sum(c.name).alias(s_name),
        F.max(c.name).alias(m_name),
    )
    hav = f" HAVING count(*) >= 2" if having else ""
    if having:
        df = df.filter(F.col(n_name) >= 2)
    return replace_state(
        state,
        df=df,
        sql=f"SELECT {_sel(keys)}, count(*) AS {n_name}, "
        f"SUM({c.name}) AS {s_name}, MAX({c.name}) AS {m_name} "
        f"FROM ({state.sql}) g{state.i} GROUP BY {_sel(keys)}{hav}",
        cols=[state.col(k) for k in keys]
        + [
            Col(n_name, "int", False),
            Col(s_name, "int", False),
            Col(m_name, "int", False),
        ],
        unique=tuple(keys),
    )


def st_asof(state, rng):
    if state.used_asof or "ts" not in state.names() or "k" not in state.names():
        return None
    strategy = ["backward", "forward"][rng.randint(2)]
    op = ">=" if strategy == "backward" else "<="
    return replace_state(
        state,
        df=asof_join(state.df, state.dim_df, on="ts", by=["k"], strategy=strategy),
        # MATERIALIZED barrier: DuckDB 1.0.0 invalidly pushes later
        # filters on r.d0 below the ASOF LEFT JOIN (seed 317 above)
        sql=f"WITH __a{state.i} AS MATERIALIZED ("
        f"SELECT l.{', l.'.join(state.names())}, r.d0 "
        f"FROM ({state.sql}) l ASOF LEFT JOIN dim r "
        f"ON l.k = r.k AND l.ts {op} r.ts) SELECT * FROM __a{state.i}",
        cols=state.cols + [Col("d0", "int", True)],
        used_asof=True,
    )


def st_join_agg(state, rng):
    """Join a per-key aggregate of the running frame back onto it — the
    normalize / ratio-to-group shape (one agg shuffle + a broadcast-able
    dim join of at most #keys rows)."""
    keys = _keys(state, rng)
    if not keys:
        return None
    c = state.pick(
        rng,
        lambda c: c.kind == "int" and not c.nullable and c.name not in keys,
    )
    if c is None:
        return None
    s_name = f"__j{state.i}"
    agg = state.df.groupBy(*keys).agg(F.sum(c.name).alias(s_name))
    return replace_state(
        state,
        df=state.df.join(F.broadcast(agg), keys),
        sql=f"SELECT t.{', t.'.join(state.names())}, a.{s_name} "
        f"FROM ({state.sql}) t JOIN ("
        f"SELECT {_sel(keys)}, SUM({c.name}) AS {s_name} "
        f"FROM ({state.sql}) ga{state.i} GROUP BY {_sel(keys)}"
        f") a USING ({_sel(keys)})",
        cols=state.cols + [Col(s_name, "int", False)],
    )


def st_resample_sliding(state, rng):
    """Hopping-window aggregate: width = 2x hop, every event lands in two
    buckets (ops/resample slide=). Mirrors the committed resample_sliding
    oracle's hop-grid replication."""
    if "ts" not in state.names():
        return None
    c = state.pick(
        rng, lambda c: c.kind == "int" and not c.nullable and c.name != "uid"
    )
    if c is None:
        return None
    every, slide, w, h = [("1h", "30m", 3600, 1800), ("6h", "3h", 21600, 10800)][
        rng.randint(2)
    ]
    n_name, s_name = f"__hn{state.i}", f"__hs{state.i}"
    df = (
        resample(
            state.df,
            "ts",
            every,
            [F.count(F.lit(1)).alias(n_name), F.sum(c.name).alias(s_name)],
            slide=slide,
        )
        .withColumn("bucket", F.unix_timestamp("bucket_ts").cast("long"))
        .drop("bucket_ts")
    )
    return replace_state(
        state,
        df=df,
        sql=f"SELECT count(*) AS {n_name}, SUM({c.name}) AS {s_name}, "
        f"CAST(floor(epoch(ts) / {h}) * {h} - __hop * {h} AS BIGINT) AS bucket "
        f"FROM ({state.sql}) hr{state.i} "
        f"CROSS JOIN (SELECT unnest(range({w // h})) AS __hop) GROUP BY bucket",
        cols=[
            Col(n_name, "int", False),
            Col(s_name, "int", False),
            Col("bucket", "int", False),
        ],
        unique=("bucket",),
    )


def st_sort_limit(state, rng):
    order = _order_cols(state, rng)
    if not order:
        return None
    m = int(rng.randint(5, 80))
    return replace_state(
        state,
        df=state.df.orderBy(*[F.col(o).asc() for o in order]).limit(m),
        sql=f"SELECT {_sel(state.names())} FROM ({state.sql}) s{state.i} "
        f"ORDER BY {', '.join(f'{o} ASC' for o in order)} LIMIT {m}",
    )


# --- datapipe/ stages: text/url/sampling ops with expression-level SQL
# mirrors (the same mirrors the committed oracles use) --------------------

_TXT_NORM = "trim(regexp_replace(lower(txt), '\\s+', ' ', 'g'))"


def st_dedup_exact(state, rng):
    """datapipe.dedup.dedup_exact on the txt column: min-uid survivor per
    normalized text. Guarded on uid still being the frame's unique key —
    the implementation's final semi join is on uid alone, which is only
    equivalent to the partition-local min filter when uids are unique."""
    if "txt" not in state.names() or state.unique != ("uid",):
        return None
    return replace_state(
        state,
        df=dedup_exact(state.df, "txt", "uid"),
        sql=f"SELECT {_sel(state.names())} FROM ("
        f"SELECT *, min(uid) OVER (PARTITION BY md5({_TXT_NORM})) AS __kp "
        f"FROM ({state.sql}) de{state.i}) WHERE uid = __kp",
    )


def st_url_canon(state, rng):
    """datapipe.urls.canonicalize_url as a derived column (the dp_url_dedup
    oracle's expression mirror, parameterized on the running frame)."""
    if "url" not in state.names():
        return None
    name = f"__u{state.i}"
    qstr = (
        "array_to_string(list_sort(list_filter("
        "string_split(coalesce(regexp_extract(url, '\\?([^#]*)', 1), ''), '&'),"
        " x -> x <> '' AND NOT starts_with(x, 'utm_')"
        " AND NOT starts_with(x, 'fbclid') AND NOT starts_with(x, 'gclid')"
        " AND NOT starts_with(x, 'msclkid')"
        " AND NOT starts_with(x, 'ref_src'))), '&')"
    )
    canon = (
        "CASE WHEN lower(regexp_extract(url, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)) = ''"
        " THEN url ELSE"
        " lower(regexp_extract(url, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1))"
        " || '://'"
        " || regexp_replace(lower(regexp_extract(url,"
        " '^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#]*)', 2)), ':(80|443)$', '')"
        " || regexp_replace(regexp_extract(url,"
        " '^([a-zA-Z][a-zA-Z0-9+.-]*)://[^/?#]*([^?#]*)', 2), '/$', '')"
        " || (CASE WHEN __q <> '' THEN '?' || __q ELSE '' END) END"
    )
    return replace_state(
        state,
        df=state.df.withColumn(name, canonicalize_url(F.col("url"))),
        sql=f"SELECT {_sel(state.names())}, {canon} AS {name} FROM ("
        f"SELECT *, {qstr} AS __q FROM ({state.sql}) uc{state.i})",
        cols=state.cols + [Col(name, "url", False)],
    )


def st_split(state, rng):
    """datapipe.sampling.split_train_val_test: hash-deterministic 3-way
    split keyed on any non-null int column (pure function of (seed, key) —
    no uniqueness required)."""
    c = state.pick(rng, lambda c: c.kind == "int" and not c.nullable)
    if c is None:
        return None
    seed2 = int(rng.randint(0, 100))
    tf = [0.05, 0.1][rng.randint(2)]
    vf = [0.05, 0.2][rng.randint(2)]
    name = f"__sp{state.i}"
    u = (
        f"(('0x' || substr(md5('{seed2}:' || CAST({c.name} AS VARCHAR)), 1, 14))"
        f"::BIGINT / {float(1 << 56)!r})"
    )
    return replace_state(
        state,
        df=split_train_val_test(
            state.df,
            key_col=c.name,
            val_fraction=vf,
            test_fraction=tf,
            seed=seed2,
            out=name,
        ),
        sql=f"SELECT {_sel(state.names())}, "
        f"CASE WHEN {u} < {tf} THEN 'test' "
        f"WHEN {u} < {tf + vf} THEN 'val' ELSE 'train' END AS {name} "
        f"FROM ({state.sql}) sp{state.i}",
        cols=state.cols + [Col(name, "str", False)],
    )


def st_chunk(state, rng):
    """datapipe.chunking.chunk_documents (char unit): posexplode of the
    overlap-window start offsets; keeps only (uid, chunk_idx, chunk_text,
    chunk_len), chunk identity (uid, chunk_idx)."""
    if "txt" not in state.names() or state.unique != ("uid",):
        return None
    size, ov = [(24, 8), (16, 0), (40, 13)][rng.randint(3)]
    step = size - ov
    ct = f"substr(txt, __st + 1, {size})"
    return replace_state(
        state,
        df=chunk_documents(
            state.df, "txt", "uid", chunk_size=size, overlap=ov, unit="chars"
        ),
        sql=f"SELECT uid, CAST(__st // {step} AS INT) AS chunk_idx, "
        f"{ct} AS chunk_text, length({ct}) AS chunk_len FROM ("
        f"SELECT uid, txt, unnest(generate_series(0, "
        f"greatest(length(txt) - 1, 0), {step})) AS __st "
        f"FROM ({state.sql}) ch{state.i})",
        cols=[
            Col("uid", "int", False),
            Col("chunk_idx", "int", False),
            Col("chunk_text", "text", False),
            Col("chunk_len", "int", False),
        ],
        unique=("uid", "chunk_idx"),
    )


def st_bpe(state, rng):
    """datapipe.bpe.bpe_encode expression path over the txt column:
    rng-ordered merge list applied as nested greedy folds; emits token
    count + token-string fingerprint. The SQL mirror is the identical
    list_reduce fold (bpe_encode_sql)."""
    if "txt" not in state.names():
        return None
    from v3_polars_spark.datapipe import bpe_encode, bpe_encode_sql

    pool = [
        ("t", "h"), ("a", "n"), ("e", "r</w>"),
        ("o", "w</w>"), ("l", "o"), ("th", "e</w>"),
    ]
    k = 2 + int(rng.randint(0, 3))
    merges = [pool[i] for i in rng.permutation(len(pool))[:k]]
    n = f"__bt{state.i}_n"
    fpc = f"__bt{state.i}_fp"
    # The permuted pool can be INCONSISTENT (e.g. ('th','e</w>') drawn
    # before ('t','h')); that's fine HERE because both sides of this
    # parity check replay the same rank-order fold — bpe_encode_sql is
    # the expression path's literal SQL mirror. strategy="expr" +
    # validate=False is bpe_encode's documented caller-asserted
    # consistency escape (datapipe/bpe.py validate_merges docstring);
    # the default validate=True correctly REJECTS such tables for real
    # callers (pinned in test_datapipe_bpe).
    enc = bpe_encode(
        state.df, merges, text_col="txt", out_col="__toks",
        strategy="expr", validate=False,
    )
    df = (
        enc.withColumn(n, F.size("__toks").cast("int"))
        .withColumn(fpc, F.md5(F.array_join("__toks", " ")))
        .drop("__toks")
    )
    word_expr = bpe_encode_sql(merges)
    norm = "trim(regexp_replace(lower(txt), '\\s+', ' ', 'g'))"
    toks = (
        f"flatten(list_transform(list_filter(string_split({norm}, ' '),"
        f" w0 -> w0 <> ''), w -> {word_expr}))"
    )
    return replace_state(
        state,
        df=df,
        sql=f"SELECT {_sel(state.names())}, CAST(len({toks}) AS INT) AS {n},"
        f" md5(array_to_string({toks}, ' ')) AS {fpc}"
        f" FROM ({state.sql}) bt{state.i}",
        cols=state.cols + [Col(n, "int", False), Col(fpc, "str", False)],
    )


STAGES = [
    st_filter,
    st_derive,
    st_dedup,
    st_cumsum,
    st_lead,
    st_ffill,
    st_resample,
    st_resample_sliding,
    st_groupby,
    st_join_agg,
    st_asof,
    st_sort_limit,
    st_dedup_exact,
    st_url_canon,
    st_split,
    st_chunk,
    st_bpe,
]


def replace_state(state, **kw):
    new = replace(state, **{k: v for k, v in kw.items() if k != "df"})
    new.df = kw.get("df", state.df)
    new.i = state.i + 1
    return new


def _run_seed(spark, seed, tmpdir):
    rng = np.random.RandomState(seed)
    paths = _write_tables(rng, tmpdir, seed)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW base AS SELECT * FROM read_parquet('{paths['base']}')"
    )
    con.execute(
        f"CREATE VIEW dim AS SELECT * FROM read_parquet('{paths['dim']}')"
    )
    state = St(
        df=spark.read.parquet(paths["base"]),
        sql="SELECT * FROM base",
        cols=[
            Col("uid", "int", False),
            Col("k", "int", False),
            Col("v", "int", False),
            Col("ts", "ts", False),
            Col("x", "float", True),
            Col("s", "str", False),
            # kinds "text"/"url" keep these out of the generic str stages
            # (st_filter's color predicates) while the datapipe stages
            # target them explicitly
            Col("txt", "text", False),
            Col("url", "url", False),
        ],
        unique=("uid",),
    )
    state.dim_df = spark.read.parquet(paths["dim"])
    n_stages = 3 + int(rng.randint(0, 3))
    applied, attempts = [], 0
    while len(applied) < n_stages and attempts < 60:
        attempts += 1
        fn = STAGES[rng.randint(len(STAGES))]
        nxt = fn(state, rng)
        if nxt is not None:
            nxt.dim_df = state.dim_df
            state = nxt
            applied.append(fn.__name__)
    got = state.df.toPandas()
    exp = con.execute(state.sql).df()
    con.close()
    errs = compare(f"seed{seed}", got, exp)
    assert not errs, (
        f"seed={seed} stages={applied}\nSQL: {state.sql}\nerrs: {errs}"
    )
    return applied


def test_fuzz_pipeline_compositions(spark, tmp_path):
    tmpdir = str(tmp_path)
    stage_counts: dict[str, int] = {}
    for seed in _REGRESSION_SEEDS + list(range(N_SEEDS)):
        applied = _run_seed(spark, seed, tmpdir)
        for s in applied:
            stage_counts[s] = stage_counts.get(s, 0) + 1
    # coverage sanity: every stage in the library was exercised (skipped
    # on small debug runs, e.g. SPARK_GRAFT_FUZZ_N=0 for pinned seeds only)
    if N_SEEDS >= 50:
        missing = {f.__name__ for f in STAGES} - set(stage_counts)
        assert not missing, (
            f"stages never sampled across {N_SEEDS} seeds: {missing}"
        )
