"""Whole-surface plan audit: one row of physical-plan accounting per
driver query, written to PLANS.md.

The scale review question — "how many shuffles, what broadcasts, did
pushdown hold?" — answered mechanically for EVERY query instead of the
handful pinned in tests. Run ``python -m v3_polars_spark.plans.audit``
after operator changes and commit the refreshed PLANS.md; a diff in that
file IS the plan regression.
"""

from __future__ import annotations

import os
import re
import sys

from .inspect import (
    count_exchanges_split,
    executed_plan_str,
    executed_scan_metrics,
)


def audit_queries(spark, sf_dir: str) -> list[dict]:
    import __spark_entry__ as em

    rows = []
    for name, fn in em.queries().items():
        try:
            df = fn(spark, sf_dir)
            # Audit the EXECUTED final plan: under AQE the pre-execution
            # explain is a placeholder (isFinalPlan=false, no codegen tags,
            # pre-coalesce exchange shapes). Running the query first makes
            # every column below describe what actually happened.
            plan = executed_plan_str(df)
            scans = executed_scan_metrics(df, run=False)
            # Attribute shuffles to where the cost is paid: `exchanges` is
            # what EVERY run of the query shuffles; `cache_exch` is the
            # one-time keyed-cache population repartition embedded in the
            # InMemoryRelation (amortized across the whole session, the
            # analog of writing a bucketed table once).
            split = count_exchanges_split(df, run=False)
            rows.append(
                {
                    "query": name,
                    "exchanges": split["query"],
                    "cache_exch": split["cache_build"],
                    "broadcasts": len(
                        re.findall(r"\(\d+\) BroadcastExchange\b", plan)
                    ),
                    "windows": len(re.findall(r"\(\d+\) Window\b", plan)),
                    "sorts": len(re.findall(r"\(\d+\) Sort\b", plan)),
                    "scans": len(scans),
                    # files the scans ACTUALLY opened (post partition/file
                    # pruning) — on a partitioned layout this is the
                    # pruning evidence; single-file bench tables show 1:1
                    "files_read": sum(int(s.get("numFiles", 0)) for s in scans),
                    "codegen": "codegen id" in plan,
                }
            )
        except Exception as e:  # a query that cannot even plan is a bug
            rows.append({"query": name, "error": f"{type(e).__name__}: {e}"[:120]})
    return rows


def audit_cold_path(spark, part_dir: str) -> list[dict]:
    """Cold-scan pruning evidence over the partitioned + Z-ordered resting
    layout (``examples/partitioned_layout_bench.py`` materializes it).

    Every driver query runs on the keyed working-set cache, so the main
    table's ``files_read`` column never exercises partition/file pruning
    (cached reads show 0 scans). This section scans the hive-partitioned
    layout COLD — cache cleared — and records, per access path, the files
    and hive partitions the executed scan actually opened versus the
    layout's totals. ``files_read < files_total`` is directory pruning at
    work; a Z-order range predicate keeps ``files_read`` flat but drops
    ``scan_rows`` via row-group stats skipping.
    """
    from pyspark.sql import functions as F

    ev_path = os.path.join(part_dir, "events")
    li_path = os.path.join(part_dir, "lineitem")
    if not (os.path.isdir(ev_path) and os.path.isdir(li_path)):
        return []

    def totals(df):
        m = executed_scan_metrics(df.agg(F.count(F.lit(1)).alias("n")))
        s = next(x for x in m if "parquet" in x["node"].lower())
        return int(s.get("numFiles", -1)), int(s.get("numPartitions", -1))

    spark.catalog.clearCache()
    ev = spark.read.parquet(ev_path)
    li = spark.read.parquet(li_path)
    ev_files, ev_parts = totals(ev)
    li_files, li_parts = totals(li)

    # Derive the Z-range predicates from the data's own bounds (~1/30 of
    # the span) so the rows stay meaningful when the testdata epoch moves.
    ev_lo, ev_hi = ev.agg(F.min("ts_day"), F.max("ts_day")).first()
    ts_span = max(1, (ev_hi - ev_lo) // 30)
    lo = F.lit(int(ev_lo + 2 * ts_span))
    hi = F.lit(int(ev_lo + 3 * ts_span))
    sd_lo, sd_hi = li.agg(F.min("ship_day"), F.max("ship_day")).first()
    sd_span = max(1, (sd_hi - sd_lo) // 30)
    ship_lo, ship_hi = int(sd_lo + 2 * sd_span), int(sd_lo + 3 * sd_span)
    cases = [
        (
            "cold_events_partition_pred",
            ev.filter(F.col("event_type") == "click").agg(
                F.count(F.lit(1)).alias("n"), F.sum("value").alias("s")
            ),
            ev_files,
            ev_parts,
        ),
        (
            "cold_events_zorder_range",
            ev.filter((F.col("ts_day") >= lo) & (F.col("ts_day") < hi)).agg(
                F.count(F.lit(1)).alias("n")
            ),
            ev_files,
            ev_parts,
        ),
        (
            "cold_events_both_preds",
            ev.filter(
                (F.col("event_type") == "click")
                & (F.col("ts_day") >= lo)
                & (F.col("ts_day") < hi)
            ).agg(F.sum("value").alias("s")),
            ev_files,
            ev_parts,
        ),
        (
            "cold_lineitem_flag_shiprange",
            li.filter(
                (F.col("l_returnflag") == "R")
                & (F.col("ship_day") >= ship_lo)
                & (F.col("ship_day") < ship_hi)
            ).agg(F.sum("l_quantity").alias("q")),
            li_files,
            li_parts,
        ),
    ]
    rows = []
    for name, df, f_total, p_total in cases:
        m = executed_scan_metrics(df)
        s = next(x for x in m if "parquet" in x["node"].lower())
        rows.append(
            {
                "query": name,
                "files_read": int(s.get("numFiles", -1)),
                "files_total": f_total,
                "parts_read": int(s.get("numPartitions", -1)),
                "parts_total": p_total,
                "scan_rows": int(s.get("numOutputRows", -1)),
            }
        )
    return rows


def write_markdown(
    rows: list[dict],
    path: str,
    sf_dir: str,
    cold_rows: list[dict] | None = None,
    part_dir: str | None = None,
) -> None:
    lines = [
        "# PLANS — physical-plan accounting for every driver query",
        "",
        f"Generated by `python -m v3_polars_spark.plans.audit` over `{sf_dir}`.",
        "Each query is EXECUTED first, so every column describes the final",
        "AQE plan (post-coalesce exchanges, runtime join switches, real",
        "`[codegen id]` tags) — not the isFinalPlan=false placeholder.",
        "Exchanges = shuffle exchanges PAID ON EVERY RUN of the query",
        "(broadcast excluded); cache_exch = shuffles embedded in the keyed",
        "working-set cache's one-time population (the InMemoryRelation's",
        "repartition — amortized across the session, the analog of writing",
        "a bucketed table once). Scans = scan nodes in the executed plan",
        "(cached-table reads show 0); files_read = files the scans actually",
        "opened AFTER partition/file pruning. Streaming queries (`stream_*`)",
        "are audited on their drained sink reads.",
        "",
        "| query | exchanges | cache_exch | broadcasts | windows | sorts | scans | files_read | codegen |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for r in sorted(rows, key=lambda r: r["query"]):
        if "error" in r:
            lines.append(f"| {r['query']} | ERROR: {r['error']} | | | | | | | |")
        else:
            lines.append(
                "| {query} | {exchanges} | {cache_exch} | {broadcasts} "
                "| {windows} | {sorts} | {scans} | {files_read} "
                "| {codegen} |".format(**r)
            )
    if cold_rows:
        lines += [
            "",
            "## Cold-path pruning (partitioned + Z-ordered layout)",
            "",
            f"Cold scans (cache cleared) over `{part_dir}` — the resting",
            "layout `examples/partitioned_layout_bench.py` materializes.",
            "files_read < files_total is hive-directory pruning actually",
            "executing; the Z-order range row keeps files_read flat but",
            "row-group stats skipping drops scan_rows (Spark's parquet",
            "source prunes files by directory, row groups by min/max).",
            "",
            "| query | files_read | files_total | parts_read | parts_total | scan_rows |",
            "|---|---|---|---|---|---|",
        ]
        for r in cold_rows:
            lines.append(
                "| {query} | {files_read} | {files_total} | {parts_read} "
                "| {parts_total} | {scan_rows} |".format(**r)
            )
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def main() -> None:
    repo = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    sys.path.insert(0, repo)
    from v3_polars_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    part_dir = os.environ.get("SPARK_GRAFT_PART_DIR", "/tmp/sfbig_part")
    spark = get_spark(app_name="plan-audit")
    rows = audit_queries(spark, sf_dir)
    cold_rows = audit_cold_path(spark, part_dir)
    out = os.path.join(repo, "PLANS.md")
    write_markdown(rows, out, sf_dir, cold_rows=cold_rows, part_dir=part_dir)
    n_err = sum(1 for r in rows if "error" in r)
    print(
        f"wrote {out}: {len(rows)} queries, {n_err} errors, "
        f"{len(cold_rows)} cold-path rows"
    )


if __name__ == "__main__":
    main()
