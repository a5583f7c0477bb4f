"""Generate the Zipf-skewed sf1 scale point at /tmp/sf1z.

The uniform sf1 point (every doc replicated exactly 100x — BENCH_NOTES)
proves volume; real crawled corpora are Zipfian, so this layout proves the
SKEW posture instead:

- ``documents``: each of the 5 000 sf0.1 base docs is duplicated
  ``max(1, round(C * rank^-1.2))`` times (Zipf s=1.2), scaled so the total
  is ~500 k rows — the hottest doc carries ~120 k exact copies while the
  tail keeps 1-4. Exercises the duplication-linear collapse path in
  datapipe/dedup.py under the distribution it was built for.
- ``embeddings``: same Zipf profile over the 2 000 base vectors (~200 k
  rows) for the ANN / embedding-near-dup family.
- ``events``: replicated 100x (10 M rows, unique event_ids), then 90% of
  rows are reassigned to ONE hot ``user_id`` — the classic hot-entity
  profile that makes an unsalted per-key shuffle put 9 M rows on a single
  reducer. Exercises AQE skew-split and ops/skew.salted_join.
- remaining tables are copied from sf0.1 unchanged (the skew families
  don't read them; oracle_check still needs the views to exist).

Every transformation is deterministic (no RNG): duplicate membership and
hot-row selection are modular-arithmetic functions of the ids, so Spark
and the DuckDB oracle see byte-identical parquet.

Usage::

    python examples/make_skewed_sf1.py [dst=/tmp/sf1z] [src=/root/testdata/sf0.1]
    SPARK_GRAFT_SF_DIR=/tmp/sf1z python tests/oracle_check.py /tmp/sf1z dp_dedup_exact ...
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

DOC_TOTAL = 500_000
EMB_TOTAL = 200_000
EVENT_REPL = 100
HOT_USER = 424242  # the 90%-hot key
ZIPF_S = 1.2


def zipf_scale(n: int, total: int, s: float = ZIPF_S) -> float:
    return total / sum(r**-s for r in range(1, n + 1))


def main() -> None:
    dst = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1z"
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    def zipf_copy(table: str, id_col: str, total: int, shift: int) -> None:
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{src}/{table}.parquet')"
        ).fetchone()[0]
        c = zipf_scale(n, total)
        # rank by id: rank 1 (smallest id) is the hottest — deterministic
        con.execute(
            f"""
            COPY (
              WITH b AS (
                SELECT *, row_number() OVER (ORDER BY {id_col}) AS rk
                FROM read_parquet('{src}/{table}.parquet')
              )
              SELECT b.{id_col} + u.k * {shift} AS {id_col},
                     b.* EXCLUDE ({id_col}, rk)
              FROM b, LATERAL (
                SELECT unnest(range(CAST(greatest(1,
                    round({c} * power(b.rk, -{ZIPF_S}))) AS BIGINT))) AS k
              ) u
            ) TO '{dst}/{table}.parquet' (FORMAT PARQUET)
            """
        )
        got = con.execute(
            f"SELECT count(*), count(DISTINCT {id_col}) FROM read_parquet('{dst}/{table}.parquet')"
        ).fetchone()
        print(f"{table}: {got[0]} rows ({got[1]} distinct {id_col}), "
              f"head dup ~{int(c)}", flush=True)

    zipf_copy("documents", "doc_id", DOC_TOTAL, 10_000_000)
    zipf_copy("embeddings", "vec_id", EMB_TOTAL, 10_000_000)

    # events: 100x replication with unique ids, then send 90% of rows to
    # one hot user. Hot membership = (event_id*31 + k) % 10 < 9 — a
    # deterministic uniform spread so both engines compute it identically.
    con.execute(
        f"""
        COPY (
          SELECT e.event_id + u.k * 100000000 AS event_id,
                 CASE WHEN (e.event_id * 31 + u.k) % 10 < 9
                      THEN {HOT_USER}
                      ELSE e.user_id + u.k * 1000000 END AS user_id,
                 e.* EXCLUDE (event_id, user_id)
          FROM read_parquet('{src}/events.parquet') e,
               LATERAL (SELECT unnest(range({EVENT_REPL})) AS k) u
        ) TO '{dst}/events.parquet' (FORMAT PARQUET)
        """
    )
    got = con.execute(
        f"""SELECT count(*),
                   sum(CASE WHEN user_id = {HOT_USER} THEN 1 ELSE 0 END)
            FROM read_parquet('{dst}/events.parquet')"""
    ).fetchone()
    print(f"events: {got[0]} rows, {got[1]} on hot user "
          f"({100.0 * got[1] / got[0]:.1f}%)", flush=True)

    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem"]:
        shutil.copyfile(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
    print(f"done -> {dst}", flush=True)


if __name__ == "__main__":
    main()
