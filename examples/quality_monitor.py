"""Runnable tour of the data-quality monitoring operators: distribution
drift (PSI), robust outliers (median/MAD), and embedding-space drift —
the checks a continuously-ingesting 100 TB corpus runs between crawls.

    python examples/quality_monitor.py [sf_dir]

Each monitor is one or two hash aggregations over one scan; everything
downstream of the scans is bins-or-groups sized, so the same plans run
unchanged against the full corpus.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from v3_polars_spark.datapipe import centroid_drift, mad_outliers
from v3_polars_spark.ops import bin_counts, psi_drift, psi_from_counts
from v3_polars_spark.session import get_spark
from v3_polars_spark.streaming import read_bin_counts, streaming_bin_counts


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="quality-monitor-example")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))

    # 1. PSI: has the length distribution of the "new crawl" (odd ids)
    #    drifted against the accepted baseline (even ids)?
    base = docs.filter(F.col("doc_id") % 2 == 0)
    cur = docs.filter(F.col("doc_id") % 2 == 1)
    psi = psi_drift(base, cur, "n_chars", lo=0.0, hi=600.0, n_bins=10)
    total = psi.agg(F.sum("psi_contrib").alias("psi")).first().psi
    print(f"PSI(n_chars, new vs baseline): {total:.4f} "
          f"({'stable' if total < 0.1 else 'shifted'})")

    # 2. Robust outliers: per-language docs whose length is extreme under
    #    the median/MAD score (heavy-tail-safe, unlike plain z-scores).
    flagged = mad_outliers(docs, "n_chars", ["lang"]).filter("is_outlier")
    print(f"MAD-flagged docs: {flagged.count()}")

    # 3. Embedding-space drift: pairwise cosine between per-label
    #    centroids — furthest-apart corpus slices first.
    drift = centroid_drift(emb, by="label").orderBy("cosine")
    print("most-diverged label pairs (centroid cosine):")
    for r in drift.limit(3).collect():
        print(f"  label {r.a} vs {r.b}: {r.cosine:+.4f}")

    # 4. The streaming twin: maintain the bin counts incrementally from a
    #    file stream, then diff the maintained state against the baseline
    #    without re-reading the corpus.
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "incoming")
        cur.write.parquet(src)
        stream = spark.readStream.schema(cur.schema).parquet(src)
        streaming_bin_counts(
            stream, "n_chars", 0.0, 600.0, 10,
            state_path=os.path.join(tmp, "state"),
            checkpoint_path=os.path.join(tmp, "ckpt"),
        )
        via_stream = psi_from_counts(
            bin_counts(base, "n_chars", 0.0, 600.0, 10),
            read_bin_counts(spark, os.path.join(tmp, "state")),
            0.0, 600.0, 10,
        ).agg(F.sum("psi_contrib").alias("psi")).first().psi
    print(f"PSI from stream-maintained state: {via_stream:.4f} "
          f"(== batch: {abs(via_stream - total) < 1e-12})")


if __name__ == "__main__":
    main()
