"""Incremental-ingest dedup: process a fresh crawl batch against the
corpus already kept, in the textbook order —

    1. exact self-dedup of the batch        (dedup_exact)
    2. exact cross-dedup vs the corpus      (dedup_against, md5 anti join)
    3. NEAR cross-dedup vs the corpus       (dedup_against_near, LSH
                                             band-bucket fresh x ref join)

The ordering is the scale contract: steps 1-2 are hash anti-joins that
collapse exact duplication FIRST, so the near pass's candidate join never
sees duplicate groups (candidates within a d-fold duplicate group grow
d^2 — at the Zipf scale point /tmp/sf1z the head doc carries ~107 k exact
copies, which the exact passes reduce to one row before LSH runs).

Odd doc_ids play the fresh batch, even the kept corpus — the same split
the dp_dedup_cross* driver queries use.

    python examples/incremental_dedup.py [sf_dir=/root/testdata/sf0.01]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from v3_polars_spark.datapipe import (
    dedup_against,
    dedup_against_near,
    dedup_exact,
)
from v3_polars_spark.session import get_spark

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def main() -> None:
    spark = get_spark(app_name="incremental-dedup")
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    fresh = docs.filter(F.col("doc_id") % 2 == 1)
    corpus = docs.filter(F.col("doc_id") % 2 == 0).cache()

    t0 = time.time()
    n0 = fresh.count()
    print(f"fresh batch:                  {n0} docs")

    s1 = dedup_exact(fresh).cache()
    print(f"1. exact self-dedup:          -> {s1.count()} docs")

    s2 = dedup_against(s1, corpus).cache()
    print(f"2. exact cross vs corpus:     -> {s2.count()} docs")

    s3 = dedup_against_near(s2, corpus, verify_threshold=0.5)
    print(f"3. near cross vs corpus:      -> {s3.count()} docs")
    print(f"total wall: {time.time() - t0:.1f} s")

    spark.stop()


if __name__ == "__main__":
    main()
