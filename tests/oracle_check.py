"""Standalone harness mimicking the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at sf=0.01,
compare row count + column names + values (order-insensitive, exact).

The driver's own per-round gate records only the FIRST 50 ``queries()``
entries (observed: CORRECTNESS_r02.json has exactly the first 50 keys of a
71-entry dict), so this harness is the full-surface record: it writes
``CORRECTNESS_SELF.json`` at the repo root with the same per-query shape
(rows_match / schema_match / hash_match) covering EVERY entry, and that
file is committed each round.

Usage: python tests/oracle_check.py [sf_dir] [query ...]

Set ``SPARK_GRAFT_ISOLATE=1`` to run each named query in its OWN
subprocess (fresh Spark JVM + fresh DuckDB) and merge the per-query
records into one output file. Needed for scale-point audits where a
single process accumulates a Spark JVM heap + DuckDB buffers + pandas
results across queries and OOMs (observed: the 6-query /tmp/sf1span run
dies in DuckDB allocation while every query passes green in isolation).
"""

from __future__ import annotations

import json
import math
import os
import sys

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify for stable row sort; keep raw for value compare
    return df.sort_values(by=list(df.columns), key=lambda s: s.astype(str)).reset_index(
        drop=True
    )


def _values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return a == b


# Above this, the per-cell loop (O(rows x cols) Python) and the
# astype(str) lexsort stop being viable — switch to the vectorized
# order-insensitive row-hash multiset compare. 60 M-row results (sf1
# derived_math) compare in seconds instead of never. 200k (not 1M):
# driver-scale (sf0.01) results stay on the per-cell path with its
# detailed mismatch messages, while scale-point audits (500k-row
# array-typed results, e.g. dp_bpe_encode at /tmp/sf1span) take the
# vectorized path — measured ~20 min of single-core compare down to
# seconds, same exactness (a 64-bit hash collision can only MASK a
# diff, never invent one; odds documented on compare_hashed).
BIG_ROWS = int(os.environ.get("SPARK_ORACLE_BIG_ROWS", "200000"))


def _canon_pair(a: pd.Series, b: pd.Series):
    """Map the same logical column from the two engines onto one dtype so
    equal values hash equally (Spark int32 vs DuckDB int64, Decimal vs
    float, us- vs ns-timestamps, -0.0 vs 0.0, NaN bit patterns)."""
    import numpy as np

    def is_dt(s):
        return pd.api.types.is_datetime64_any_dtype(s)

    def to_int_ns(s):
        if getattr(s.dtype, "tz", None) is not None:
            s = s.dt.tz_convert("UTC").dt.tz_localize(None)
        return s.astype("datetime64[ns]").astype("int64")

    if is_dt(a) and is_dt(b):
        return to_int_ns(a), to_int_ns(b)
    # Spark DecimalType collects as object-dtype Decimal; if the other
    # engine returned a numeric dtype for the same column, bring both to
    # float64 (the equality the per-cell path applies: Decimal('1.50') ==
    # 1.5) instead of comparing str renderings ('1.50' != '1.5')
    def is_obj_num(s):
        return s.dtype == object and pd.api.types.is_numeric_dtype(
            pd.to_numeric(s.dropna().head(100), errors="coerce")
        ) and not pd.to_numeric(s.dropna().head(100), errors="coerce").isna().any()

    def canon_floats(x, y):
        out = []
        for s in (x, y):
            arr = s.astype("float64").to_numpy(
                dtype="float64", na_value=np.nan
            ) + 0.0
            arr[np.isnan(arr)] = np.nan  # one canonical NaN pattern
            out.append(pd.Series(arr))
        return out[0], out[1]

    if (pd.api.types.is_numeric_dtype(a) and is_obj_num(b)) or (
        pd.api.types.is_numeric_dtype(b) and is_obj_num(a)
    ):
        return canon_floats(a, b)
    num = (
        pd.api.types.is_numeric_dtype(a) and pd.api.types.is_numeric_dtype(b)
    )
    if num:
        if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
            return canon_floats(a, b)
        return a.astype("int64"), b.astype("int64")

    # sequence cells stringify engine-dependently (Spark toPandas gives
    # numpy arrays — "['a' 'b']" — where DuckDB gives lists — "['a',
    # 'b']"): canonicalize to tuples first so equal arrays hash equally
    def canon_cell(v):
        if isinstance(v, (list, tuple, np.ndarray)):
            return tuple(canon_cell(x) for x in v)
        # tuple repr uses element repr: a numpy scalar inside a Spark
        # array column stringifies as 'np.float64(1.0)' under numpy>=2
        # while DuckDB's plain-Python list element gives '1.0' — a
        # false hash mismatch. Unwrap to the Python scalar first
        # (ADVICE r11; latent under the env's numpy 1.26).
        if isinstance(v, np.generic):
            return v.item()
        return v

    def maybe_seq(s):
        head = s.dropna().head(20)
        return any(isinstance(v, (list, tuple, np.ndarray)) for v in head)

    if maybe_seq(a) or maybe_seq(b):
        return a.map(canon_cell).astype(str), b.map(canon_cell).astype(str)
    return a.astype(str), b.astype(str)


def compare_hashed(spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list[str]:
    """Order-insensitive exact multiset compare via per-row 64-bit hashes
    (vectorized, no Python loops). Collision masking odds at 60 M rows are
    ~1e-4 under the birthday bound — and a collision can only hide a diff,
    never invent one."""
    import numpy as np

    cols = sorted(spark_df.columns)
    canon_s, canon_d = {}, {}
    for c in cols:
        canon_s[c], canon_d[c] = _canon_pair(spark_df[c], duck_df[c])
    hashes = []
    for canon in (canon_s, canon_d):
        h = pd.util.hash_pandas_object(
            pd.DataFrame(canon), index=False
        ).to_numpy()
        h.sort()
        hashes.append(h)
    if not np.array_equal(hashes[0], hashes[1]):
        n_bad = int((hashes[0] != hashes[1]).sum())
        return [
            f"hashed multiset mismatch: {n_bad} of {len(hashes[0])} "
            "row-hash slots differ"
        ]
    return []


def compare(name: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list[str]:
    errs = []
    if len(spark_df) != len(duck_df):
        errs.append(f"rowcount spark={len(spark_df)} duck={len(duck_df)}")
    sc, dc = sorted(spark_df.columns), sorted(duck_df.columns)
    if sc != dc:
        errs.append(f"columns spark={sc} duck={dc}")
    if errs:
        return errs
    if len(spark_df) > BIG_ROWS:
        return compare_hashed(spark_df, duck_df)
    s, d = _normalize(spark_df), _normalize(duck_df)
    n_bad = 0
    for col in s.columns:
        sv, dv = s[col].tolist(), d[col].tolist()
        for i, (a, b) in enumerate(zip(sv, dv)):
            if not _values_equal(a, b):
                n_bad += 1
                if n_bad <= 3:
                    errs.append(f"value mismatch col={col} row={i}: spark={a!r} duck={b!r}")
    if n_bad > 3:
        errs.append(f"... {n_bad} total mismatched cells")
    return errs


def main_isolated(sf_dir: str, names: list[str]) -> int:
    """Run each query in a fresh subprocess and merge the records.

    Each child is this same script with SPARK_GRAFT_ISOLATE unset and
    SPARK_GRAFT_SELF_OUT pointed at a temp file — so the per-query
    semantics (compare, record shape) are byte-identical to the
    in-process path; only process lifetime differs.
    """
    import subprocess
    import tempfile

    merged: dict[str, dict] = {}
    failed = []
    for name in names:
        with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as tf:
            tmp = tf.name
        env = dict(os.environ)
        env.pop("SPARK_GRAFT_ISOLATE", None)
        env["SPARK_GRAFT_SELF_OUT"] = tmp
        rc = subprocess.call(
            [sys.executable, os.path.abspath(__file__), sf_dir, name], env=env
        )
        try:
            with open(tmp) as f:
                rec = json.load(f)["results"]
        except Exception as e:
            rec = {name: {
                "rows_match": False, "schema_match": False, "hash_match": False,
                "spark_rows": None, "oracle_rows": None,
                "err": f"subprocess produced no record (rc={rc}): {e}",
            }}
        finally:
            try:
                os.unlink(tmp)
            except OSError:
                pass
        merged.update(rec)
        if rc != 0 or any(v.get("err") for v in rec.values()):
            failed.append(name)
    out = os.environ.get("SPARK_GRAFT_SELF_OUT")
    if out:
        with open(out, "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "n_queries": len(merged),
                    "isolated": True,
                    "results": merged,
                },
                f,
                indent=1,
            )
        print(f"\nwrote {out}")
    print(f"{len(names) - len(failed)}/{len(names)} ok (isolated)")
    return 1 if failed else 0


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    if os.environ.get("SPARK_GRAFT_ISOLATE"):
        names = sys.argv[2:]
        if not names:
            # No names must NOT silently fall through to the
            # single-process full run — that is the exact OOM scenario
            # the flag exists to avoid (ADVICE r11). Expand to every
            # query instead.
            import __spark_entry__ as entrymod

            names = sorted(entrymod.queries().keys())
            print(
                f"SPARK_GRAFT_ISOLATE set with no query names: running "
                f"ALL {len(names)} queries subprocess-isolated"
            )
        return main_isolated(sf_dir, names)

    import __spark_entry__ as entrymod
    from v3_polars_spark.session import get_spark

    # The compare collects full results driver-side (that is the harness's
    # job, not an engine pattern): lift the collect cap so scale-point
    # audits (60 M-row results at sf1) reach the hashed compare instead of
    # dying at spark.driver.maxResultSize's 1g default.
    spark = get_spark(
        app_name="oracle-check",
        extra_conf={
            "spark.driver.maxResultSize": os.environ.get(
                "SPARK_ORACLE_MAX_RESULT", "8g"
            )
        },
    )
    con = duckdb.connect()
    # spill instead of dying on the big window-replay oracles: at the
    # /tmp/sf1span scale point the dp_substring_dedup replay (~90M hashed
    # windows + unspillable list-agg reassembly) OOMs under the default
    # no-temp-directory 32-thread config with a Spark JVM resident, and
    # completes in ~90s with a spill dir, an explicit 100GB limit, and
    # fewer threads (less per-thread buffering).
    con.execute("SET temp_directory='/tmp/duckspill'")
    con.execute(
        f"SET memory_limit='{os.environ.get('SPARK_ORACLE_DUCK_MEM', '100GB')}'"
    )
    con.execute("SET threads=16")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failed = []
    record: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            try:
                n = fn(spark, sf_dir).count()
                print(f"  {name:<24} ROWS-ONLY ({n} rows)")
                record[name] = {
                    "rows_match": None, "schema_match": None, "hash_match": None,
                    "spark_rows": n, "oracle_rows": None, "err": None,
                    "note": "no oracle_sql entry (rows-only)",
                }
            except Exception as e:
                print(f"✗ {name:<24} ROWS-ONLY FAILED: {e}")
                failed.append(name)
                record[name] = {
                    "rows_match": False, "schema_match": False, "hash_match": False,
                    "spark_rows": None, "oracle_rows": None,
                    "err": f"{type(e).__name__}: {str(e)[:200]}",
                }
            continue
        sdf = ddf = None
        try:
            sdf = fn(spark, sf_dir).toPandas()
            ddf = con.execute(oracles[name]).df()
            errs = compare(name, sdf, ddf)
        except Exception as e:
            errs = [f"exception: {type(e).__name__}: {str(e)[:300]}"]
        rows_ok = sdf is not None and ddf is not None and len(sdf) == len(ddf)
        schema_ok = (
            sdf is not None and ddf is not None
            and sorted(sdf.columns) == sorted(ddf.columns)
        )
        record[name] = {
            "rows_match": rows_ok,
            "schema_match": schema_ok,
            "hash_match": not errs,
            "spark_rows": None if sdf is None else len(sdf),
            "oracle_rows": None if ddf is None else len(ddf),
            "err": "; ".join(errs[:3]) if errs else None,
        }
        if errs:
            failed.append(name)
            print(f"✗ {name}")
            for e in errs[:5]:
                print(f"    {e}")
        else:
            print(f"✓ {name:<24} ({len(sdf)} rows)")

    out = None
    if not only:
        out = os.path.join(REPO, "CORRECTNESS_SELF.json")
    elif os.environ.get("SPARK_GRAFT_SELF_OUT"):
        # subset runs can still commit a record (e.g. the sfbig
        # cross-scale audit) by naming an explicit output path
        out = os.environ["SPARK_GRAFT_SELF_OUT"]
    if out:
        with open(out, "w") as f:
            json.dump(
                {"sf_dir": sf_dir, "n_queries": len(record), "results": record},
                f,
                indent=1,
            )
        print(f"\nwrote {out}")
    print(f"\n{len(qs) - len(failed)}/{len(qs)} ok" if not only else "")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
