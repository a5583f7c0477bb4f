"""Small-files evidence for streaming IVF index compaction.

A long-lived streaming index accretes one inverted-list segment per
trigger; after thousands of triggers every probe unions thousands of
tiny parquet files — the classic small-files scale-killer. This script
measures the fix: drain the odd-id embeddings through
``streaming_ivf_assign`` in N single-file triggers, probe the index and
record the scan's EXECUTED ``numFiles`` (plans.inspect ground truth, not
a directory listing), then ``compact_ivf_index`` and probe again.

    python examples/ivf_compaction_files.py [sf_dir=/tmp/sf1] [n_triggers=32]

Pass = post-compaction files_read collapses to ~total_rows /
target_rows_per_file while the probe's result rows are identical.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from v3_polars_spark.datapipe.similarity import ivf_search
from v3_polars_spark.plans.inspect import executed_scan_metrics
from v3_polars_spark.session import get_spark, tune_shuffle_partitions
from v3_polars_spark.streaming import (
    compact_ivf_index,
    read_ivf_index,
    seed_ivf_index,
    streaming_ivf_assign,
)

SF = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
N_TRIGGERS = int(sys.argv[2]) if len(sys.argv) > 2 else 32


def probe(spark, root, queries):
    centroids, assigned = read_ivf_index(spark, root)
    out = ivf_search(centroids, assigned, queries, k=10, n_probe=4)
    t0 = time.perf_counter()
    rows = sorted(
        (r["query_id"], r["vec_id"], r["rank"]) for r in out.collect()
    )
    wall = time.perf_counter() - t0
    files = sum(
        int(m.get("numFiles", 0) or 0)
        for m in executed_scan_metrics(out, run=False)
    )
    return rows, files, wall


def main() -> None:
    spark = get_spark(app_name="ivf-compaction-files")
    tune_shuffle_partitions(
        spark, os.path.getsize(os.path.join(SF, "embeddings.parquet"))
    )
    work = tempfile.mkdtemp(prefix="ivfc_")
    try:
        e = spark.read.parquet(os.path.join(SF, "embeddings.parquet"))
        seed = e.filter(F.col("vec_id") % 2 == 0)
        odd = e.filter(F.col("vec_id") % 2 == 1)

        # one source file per trigger, distinct mtimes so AvailableNow
        # cannot batch them together
        src = os.path.join(work, "src")
        n_odd = odd.count()
        per = -(-n_odd // N_TRIGGERS)
        odd.withColumn(
            "__g", (F.col("vec_id") / 2 % N_TRIGGERS).cast("int")
        ).repartition(N_TRIGGERS, "__g").write.partitionBy("__g").parquet(src)
        base = time.time() - 7200
        k = 0
        for root_dir, _, names in sorted(os.walk(src)):
            for nm in sorted(names):
                os.utime(os.path.join(root_dir, nm), (base + k, base + k))
                k += 1

        root = os.path.join(work, "idx")
        seed_ivf_index(seed, root, n_centroids=16, iters=1)
        stream = (
            spark.readStream.schema(odd.drop("__g").schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src + "/__g=*")
        )
        t0 = time.perf_counter()
        streaming_ivf_assign(stream, root, os.path.join(work, "ckpt"))
        drain_wall = time.perf_counter() - t0

        queries = seed.limit(64).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        rows_before, files_before, wall_before = probe(spark, root, queries)
        stats = compact_ivf_index(spark, root)
        rows_after, files_after, wall_after = probe(spark, root, queries)

        print(
            {
                "sf": SF,
                "n_triggers": N_TRIGGERS,
                "rows_indexed": n_odd,
                "segments_before": stats["segments_before"],
                "probe_files_read_before": files_before,
                "probe_files_read_after": files_after,
                "probe_wall_before_s": round(wall_before, 3),
                "probe_wall_after_s": round(wall_after, 3),
                "drain_wall_s": round(drain_wall, 1),
                "probe_identical": rows_before == rows_after,
            }
        )
        assert rows_before == rows_after
        assert files_after < files_before
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
