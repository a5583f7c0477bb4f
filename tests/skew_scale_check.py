"""Zipf-skew supplement: dp_dedup_near / dp_dedup_best at /tmp/sf1z.

At the Zipf(1.2) scale point the hottest document carries ~107 k exact
copies, so ANY pair-materializing oracle — including the sf1 supplement's
"run the committed minhash oracle over the full corpus" path — is
duplication-quadratic (C(107k, 2) ≈ 5.7 B pairs for the head group alone)
and unrunnable by either engine. The per-document component outputs are
still exactly verifiable, because components are unions of whole
exact-duplicate groups:

1. collapse docs to exact-duplicate representatives (md5 of normalized
   text, rep = min doc_id) — the same collapse the engine applies
   internally (datapipe/dedup.py collapse_exact);
2. run the COMMITTED dp_minhash_lsh oracle SQL unchanged over the reps
   (a few thousand rows — trivially feasible);
3. Python union-find over the rep graph; a member doc's component
   label = its group rep's component label, and the component
   representative is the min doc_id over member groups' reps (each
   group's rep is already its min member);
4. dp_dedup_best: argsort (rep, n_chars desc, doc_id) and keep head —
   engine-independent.

Same order-insensitive hashed compare as oracle_check. Usage::

    python tests/skew_scale_check.py [sf_dir=/tmp/sf1z] [out_json]
"""

from __future__ import annotations

import json
import os
import sys

import duckdb
import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from oracle_check import compare  # noqa: E402
from scale_supplement_check import record, union_find  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1z"
OUT = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
    REPO, "CORRECTNESS_SF1Z_SUPPLEMENT.json"
)
NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


def main() -> int:
    import __spark_entry__ as entry
    from v3_polars_spark.session import get_spark

    oracles = entry.oracle_sql()
    qs = entry.queries()
    con = duckdb.connect()
    con.execute(f"SET temp_directory='{os.path.join(REPO, '.tmp')}'")
    con.execute(
        f"CREATE VIEW documents_raw AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    # exact-duplicate collapse, mirroring the engine's collapse_exact
    con.execute(f"""
        CREATE VIEW doc_grp AS
        SELECT doc_id, n_chars, md5({NORM}) AS gk FROM documents_raw
    """)
    con.execute("""
        CREATE VIEW doc_reps AS
        SELECT gk, min(doc_id) AS rep FROM doc_grp GROUP BY gk
    """)
    con.execute("""
        CREATE VIEW documents AS
        SELECT r.* FROM documents_raw r JOIN doc_reps g ON r.doc_id = g.rep
    """)
    print("duckdb: committed minhash oracle over exact-dup reps ...", flush=True)
    rep_pairs = con.execute(oracles["dp_minhash_lsh"]).df()
    reps = con.execute("SELECT rep FROM doc_reps ORDER BY rep").df()["rep"].to_numpy()
    rep_comp = union_find(
        reps, rep_pairs["id_a"].to_numpy(), rep_pairs["id_b"].to_numpy()
    )
    comp_of_rep = dict(zip(reps.tolist(), rep_comp.tolist()))

    members = con.execute(
        "SELECT d.doc_id, d.n_chars, g.rep FROM doc_grp d JOIN doc_reps g USING (gk)"
    ).df()
    members["comp"] = members["rep"].map(comp_of_rep)

    spark = get_spark(
        app_name="skew-scale-check",
        extra_conf={"spark.driver.maxResultSize": "16g"},
    )
    results: dict[str, dict] = {}
    note = (
        "committed dp_minhash_lsh oracle SQL unchanged over exact-duplicate"
        " reps + Python union-find; full pair expansion is C(107k,2) per "
        "head group under Zipf(1.2) — unmaterializable by any engine"
    )
    exp_near = pd.DataFrame(
        {"doc_id": members["doc_id"].to_numpy(),
         "rep": members["comp"].to_numpy()}
    )
    record(results, "dp_dedup_near",
           qs["dp_dedup_near"](spark, SF).toPandas(), exp_near, note)

    d2 = members[["doc_id", "n_chars", "comp"]].rename(columns={"comp": "rep"})
    d2 = d2.sort_values(["rep", "n_chars", "doc_id"],
                        ascending=[True, False, True])
    exp_best = d2.groupby("rep").head(1)[["doc_id", "n_chars"]].reset_index(drop=True)
    record(results, "dp_dedup_best",
           qs["dp_dedup_best"](spark, SF).toPandas(), exp_best, note)

    with open(OUT, "w") as f:
        json.dump({"sf_dir": SF, "results": results}, f, indent=1)
    print(f"wrote {OUT}")
    return 0 if all(r["hash_match"] for r in results.values()) else 1


if __name__ == "__main__":
    raise SystemExit(main())
