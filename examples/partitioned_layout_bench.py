"""Partitioned + Z-ordered layout: executed-plan pruning proof + cold-scan bench.

The bench tables are single parquet files repartitioned in memory, so the
100 TB story's partition/file pruning never executes there. This script
materializes the sfbig fact tables in the resting layout a cluster would
use — ``tables.write_partitioned_zorder`` (hive partition dirs + Morton
file stats) — and proves, from EXECUTED scan metrics (not explain
strings), that the three standard access paths prune:

- partition predicate → DIRECTORY pruning: numPartitions/numFiles drop
  (vanilla Spark's planning-time pruning unit is the hive directory);
- z-column range → ROW-GROUP pruning: numFiles stays (Spark's parquet
  source has no file-stats index — that is Delta/Iceberg territory) but
  the pushed min/max filter skips row groups, so the scan's
  numOutputRows drops toward the selected fraction;
- both → multiplicative (fewer dirs listed x fewer row groups decoded).

and that the pruned cold scans are faster in wall time than the same
queries on the flat single-file layout.

Usage: python examples/partitioned_layout_bench.py [src=/tmp/sfbig] [dst=/tmp/sfbig_part]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from v3_polars_spark.plans.inspect import executed_scan_metrics  # noqa: E402
from v3_polars_spark.session import (  # noqa: E402
    get_spark,
    quiet_expected_jvm_warnings,
)
from v3_polars_spark.tables import write_partitioned_zorder  # noqa: E402


def scan_stats(df) -> tuple[float, dict]:
    t0 = time.time()
    m = executed_scan_metrics(df)  # collects
    wall = time.time() - t0
    s = next(x for x in m if "parquet" in x["node"].lower())
    return wall, {
        "numFiles": int(s.get("numFiles", -1)),
        "numPartitions": int(s.get("numPartitions", -1)),
        "filesSize": int(s.get("filesSize", -1)),
        "scanOutputRows": int(s.get("numOutputRows", -1)),
    }


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfbig"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfbig_part"
    spark = get_spark(app_name="partitioned-layout-bench")
    quiet_expected_jvm_warnings(spark)

    ev_dst = f"{dst}/events"
    li_dst = f"{dst}/lineitem"
    if not os.path.exists(ev_dst):
        ev = spark.read.parquet(f"{src}/events.parquet").withColumn(
            "ts_day", F.unix_timestamp("ts")
        )
        write_partitioned_zorder(
            ev, ev_dst, partition_by=["event_type"],
            cols=["ts_day", "user_id"], num_files=64,
        )
    if not os.path.exists(li_dst):
        li = spark.read.parquet(f"{src}/lineitem.parquet").withColumn(
            "ship_day", F.datediff(F.col("l_shipdate"), F.lit("1992-01-01"))
        )
        write_partitioned_zorder(
            li, li_dst, partition_by=["l_returnflag"],
            cols=["ship_day", "l_orderkey"], num_files=64,
        )

    report = {}

    def run(name, part_df, flat_df):
        spark.catalog.clearCache()
        w_part, s_part = scan_stats(part_df)
        w_flat, s_flat = scan_stats(flat_df)
        report[name] = {
            "partitioned": {"wall_sec": round(w_part, 3), **s_part},
            "flat": {"wall_sec": round(w_flat, 3), **s_flat},
        }
        print(f"{name}: partitioned {w_part:.2f}s "
              f"files={s_part['numFiles']} parts={s_part['numPartitions']} "
              f"scanRows={s_part['scanOutputRows']} "
              f"| flat {w_flat:.2f}s files={s_flat['numFiles']} "
              f"scanRows={s_flat['scanOutputRows']}", flush=True)

    ev_p = spark.read.parquet(ev_dst)
    ev_f = spark.read.parquet(f"{src}/events.parquet")
    n_types = ev_p.select("event_type").distinct().count()
    ts_lo, ts_hi = "2024-01-10 00:00:00", "2024-01-12 00:00:00"
    lo = F.unix_timestamp(F.lit(ts_lo))
    hi = F.unix_timestamp(F.lit(ts_hi))

    run(
        "events_partition_pred",
        ev_p.filter(F.col("event_type") == "click").agg(
            F.count(F.lit(1)).alias("n"), F.sum("value").alias("s")
        ),
        ev_f.filter(F.col("event_type") == "click").agg(
            F.count(F.lit(1)).alias("n"), F.sum("value").alias("s")
        ),
    )
    run(
        "events_zrange_pred",
        ev_p.filter((F.col("ts_day") >= lo) & (F.col("ts_day") < hi)).agg(
            F.count(F.lit(1)).alias("n")
        ),
        ev_f.filter((F.col("ts") >= ts_lo) & (F.col("ts") < ts_hi)).agg(
            F.count(F.lit(1)).alias("n")
        ),
    )
    run(
        "events_both_preds",
        ev_p.filter(
            (F.col("event_type") == "click")
            & (F.col("ts_day") >= lo) & (F.col("ts_day") < hi)
        ).agg(F.sum("value").alias("s")),
        ev_f.filter(
            (F.col("event_type") == "click")
            & (F.col("ts") >= ts_lo) & (F.col("ts") < ts_hi)
        ).agg(F.sum("value").alias("s")),
    )

    li_p = spark.read.parquet(li_dst)
    li_f = spark.read.parquet(f"{src}/lineitem.parquet")
    run(
        "lineitem_flag_and_shiprange",
        li_p.filter(
            (F.col("l_returnflag") == "R")
            & (F.col("ship_day") >= 400) & (F.col("ship_day") < 430)
        ).agg(F.sum("l_quantity").alias("q")),
        li_f.filter(
            (F.col("l_returnflag") == "R")
            & (F.datediff(F.col("l_shipdate"), F.lit("1992-01-01")) >= 400)
            & (F.datediff(F.col("l_shipdate"), F.lit("1992-01-01")) < 430)
        ).agg(F.sum("l_quantity").alias("q")),
    )

    # sanity: the pruned counts must agree with the flat counts
    n_p = ev_p.filter(F.col("event_type") == "click").count()
    n_f = ev_f.filter(F.col("event_type") == "click").count()
    assert n_p == n_f, (n_p, n_f)
    report["_meta"] = {"event_types": n_types, "src": src, "dst": dst}
    print(json.dumps(report))


if __name__ == "__main__":
    main()
