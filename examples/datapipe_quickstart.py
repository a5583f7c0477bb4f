"""Runnable tour of the training-data pipeline operators: clean → dedup →
substring-scrub → chunk → pack over the synthetic documents/embeddings tables.

    python examples/datapipe_quickstart.py [sf_dir]

Every stage is a pure DataFrame transformation — the whole pipeline is one
lazily-composed plan per output, and each operator keeps its documented
shuffle budget at 100 TB (see COVERAGE.md's datapipe table).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from v3_polars_spark.datapipe import (
    chunk_documents,
    dedup_exact,
    dedup_substrings,
    language_id,
    minhash_lsh_pairs,
    pack_offsets,
    quality_score,
    token_counts,
    zscore_outliers,
)
from v3_polars_spark.session import get_spark

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def main() -> None:
    spark = get_spark(app_name="datapipe-quickstart")
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    n0 = docs.count()

    # 1. quality + language signals (single scan, zero shuffles)
    scored = quality_score(language_id(docs))
    kept = scored.filter((F.col("quality") > 0.3) & (F.col("lang_pred") != "und"))
    print(f"quality/language filter: {n0} -> {kept.count()} docs")

    # 2. length-outlier guard (per-source z-score, broadcast stats join)
    sane = zscore_outliers(kept, "n_chars", ["source"]).filter(~F.col("is_outlier"))
    print(f"outlier guard:           -> {sane.count()} docs")

    # 3. exact dedup (fingerprint -> min-id -> semi join; one shuffle)
    unique = dedup_exact(sane, text_col="text", id_col="doc_id")
    print(f"exact dedup:             -> {unique.count()} docs")

    # 4. near-dup candidates (MinHash + banded LSH, bucket join only)
    pairs = minhash_lsh_pairs(unique, text_col="text", id_col="doc_id")
    print(f"near-dup candidates:     {pairs.count()} pairs above threshold")

    # 5. substring-level dedup: remove duplicated >=8-token spans that
    # survive document-level dedup (boilerplate, quoted passages)
    scrubbed = dedup_substrings(unique, k=8)
    n_rm = scrubbed.agg(F.sum("n_removed")).first()[0] or 0
    clean = (
        unique.drop("text")
        .join(scrubbed.select("doc_id", F.col("text_clean").alias("text")), "doc_id")
    )
    print(f"substring dedup:         removed {n_rm} duplicated-span tokens")

    # 6. chunk for a 512-char context with 64 overlap (map stage only)
    chunks = chunk_documents(clean, chunk_size=512, overlap=64)
    print(f"chunking:                {chunks.count()} chunks")

    # 7. token counting + sequence packing to a 4096-token context
    with_counts = token_counts(clean).select(
        "doc_id", "source", "n_tokens_bpe_est"
    )
    packed = pack_offsets(
        with_counts, "n_tokens_bpe_est", order_cols=["doc_id"],
        max_len=4096, by=["source"],
    )
    n_seqs = packed.agg(F.countDistinct("source", "last_seq")).first()[0]
    print(f"packing:                 ~{n_seqs} packed 4096-token sequences")

    spark.stop()


if __name__ == "__main__":
    main()
