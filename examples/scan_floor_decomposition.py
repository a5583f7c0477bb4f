"""Decompose the two sf1 rows that sit above 2x vs DuckDB
(groupby_having, series_pipeline) into SCAN time vs EVERYTHING-ELSE
(VERDICT r10 #1b: reconcile or prove the floor).

Method: for each query, time (min-of-N, alternating engines — the
bench.py pairing protocol) the FULL query and the bare COLUMN-PRUNED
SCAN of exactly the columns the query touches, in both engines. If
Spark's scan alone accounts for (nearly) the whole Spark-vs-DuckDB gap,
the row is a parquet-reader throughput constant of the engine pair at
single-node scale — not a plan defect — and the honest fix is the one
the repo already applies everywhere it matters (cache reuse, pruning,
one-exchange plans), not query surgery.

Prints one JSON line; committed numbers live in BENCH_NOTES round 11.

Usage: python examples/scan_floor_decomposition.py [sf_dir=/tmp/sf1] [trials=5]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
TRIALS = int(sys.argv[2]) if len(sys.argv) > 2 else 5


def main() -> None:
    import __spark_entry__ as entrymod
    from v3_polars_spark.session import get_spark

    spark = get_spark(app_name="scan-floor")
    con = duckdb.connect()
    con.execute("SET threads=32")
    for t in ("lineitem", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(SF, t + '.parquet')}')"
        )

    li = os.path.join(SF, "lineitem.parquet")
    ev = os.path.join(SF, "events.parquet")

    def spark_scan_lineitem():
        return spark.read.parquet(li).select(
            "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"
        )

    def spark_scan_events():
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return spark.read.parquet(ev).select("ts", "event_id")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    cases = {
        "groupby_having_full": (
            lambda: qs["groupby_having"](spark, SF),
            oracles["groupby_having"],
        ),
        "groupby_having_scan": (
            spark_scan_lineitem,
            "SELECT l_returnflag, l_linestatus, l_quantity, l_extendedprice "
            "FROM lineitem",
        ),
        "series_pipeline_full": (
            lambda: qs["series_pipeline"](spark, SF),
            oracles["series_pipeline"],
        ),
        "series_pipeline_scan": (
            spark_scan_events,
            "SELECT ts, event_id FROM events",
        ),
    }

    def force_spark(df):
        df.write.format("noop").mode("overwrite").save()

    def force_duck(sql):
        # aggregate to a scalar so the scan is fully executed but the
        # result transfer is one row (mirrors the noop sink)
        con.execute(f"SELECT count(*) FROM ({sql})").fetchall()

    # untimed warm pass per engine (steady-state protocol, like bench.py)
    for fn, sql in cases.values():
        force_spark(fn())
        force_duck(sql)

    out = {"sf_dir": SF, "trials": TRIALS}
    for name, (fn, sql) in cases.items():
        s_best = d_best = float("inf")
        for _ in range(TRIALS):
            t0 = time.time()
            force_spark(fn())
            s_best = min(s_best, time.time() - t0)
            t0 = time.time()
            force_duck(sql)
            d_best = min(d_best, time.time() - t0)
        out[name] = {
            "spark_sec": round(s_best, 4),
            "duckdb_sec": round(d_best, 4),
            "ratio": round(s_best / d_best, 2) if d_best else None,
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
