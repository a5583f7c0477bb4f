"""Skewed-SHARD evidence for the streaming packer + batch minhash/IVF
families (VERDICT r11 #7): the committed `by=` packer curve
(BENCH_NOTES r11) used ~uniform source shards; real crawls are
source-skewed — one source (a big crawl dump) can carry 90% of the
docs. This script measures that failure mode and its documented
mitigation, plus the batch families on the Zipf-duplicated corpus.

A) Shard-keyed packer under source skew (token_pack_batch_fn(by=...)):
   - uniform: source = 's0'..'s4', ~20% each (the committed-curve shape)
   - hot: 90% of docs on ONE source — the per-shard rank window of the
     hot shard is a single task, so the packer degrades toward the
     global-mode single-task profile exactly as pack_stream.py's
     docstring predicts ("bounded partition label" contract);
   - hot_bucketed: the mitigation — the shard label is
     source#hash-bucket (8 buckets), still bounded, restoring width
     parallelism. Each bucket is its own packed stream, which is the
     semantic a sharded training-data layout wants anyway (files per
     source get N independent shards).
   Walls per doubling trigger (n/16 ... n/2 docs) and us/doc, same
   schedule as examples/streaming_pack_by_scaling.py.

B) Batch IVF (ivf_build + ivf_topk) on uniform (/tmp/sf1 embeddings,
   200k x100 replicas) vs Zipf (/tmp/sf1z, head vector ~x43k) — bucket
   skew is centroid-assignment skew for IVF.

C) Batch near-dup clustering (minhash candidate pipeline inside
   near_dup_components, duplication-linear collapse) on uniform vs Zipf
   documents — the collapse is exactly the machinery the Zipf head
   stresses (BENCH_NOTES r7 measured the INCREMENTAL path; this is the
   batch path).

Usage: python examples/skew_shard_evidence.py [sf=/tmp/sf1] [sfz=/tmp/sf1z] [sections=pack,ivf,neardup]
Prints one JSON line per measurement; summary at the end.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from v3_polars_spark.session import (
    get_spark,
    quiet_expected_jvm_warnings,
    tune_shuffle_partitions,
)

SF = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
SFZ = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1z"
SECTIONS = set(
    (sys.argv[3] if len(sys.argv) > 3 else "pack,ivf,neardup").split(",")
)
MAX_LEN = 2048
FRACTIONS = [1 / 16, 1 / 8, 1 / 4, 1 / 2]
BUCKETS = 8


def pack_walls(spark, enc, shard_col, pack_root):
    """Drive token_pack_batch_fn over the doubling trigger schedule on
    the given shard label column; returns [(ndocs, wall_sec), ...]."""
    from v3_polars_spark.streaming.pack_stream import token_pack_batch_fn

    cum = [sum(FRACTIONS[: i + 1]) for i in range(len(FRACTIONS) - 1)]
    bounds = enc.select(
        F.percentile("doc_id", F.array(*[F.lit(c) for c in cum])).alias("b")
    ).collect()[0]["b"]
    fn = token_pack_batch_fn(
        spark, pack_root, MAX_LEN, sep_token="</doc>",
        by=shard_col, tokens_col="bpe_tokens",
    )
    out = []
    for b in range(len(FRACTIONS)):
        lo = None if b == 0 else bounds[b - 1]
        hi = None if b == len(FRACTIONS) - 1 else bounds[b]
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (F.col("doc_id") > lo)
        if hi is not None:
            cond = cond & (F.col("doc_id") <= hi)
        batch = enc.filter(cond)
        ndocs = batch.count()  # outside the timed window
        t0 = time.monotonic()
        fn(batch, b)
        wall = time.monotonic() - t0
        out.append((ndocs, wall))
    return out


def main() -> None:
    import __spark_entry__ as entry

    from v3_polars_spark.datapipe import bpe_encode

    spark = get_spark(app_name="skew-shard-evidence")
    quiet_expected_jvm_warnings(spark)
    tune_shuffle_partitions(
        spark, os.path.getsize(os.path.join(SF, "documents.parquet"))
    )
    work = tempfile.mkdtemp(prefix="skewshard_")
    summary: dict = {}

    # ---------------------------------------------------- A: packer
    if "pack" in SECTIONS:
        docs = spark.read.parquet(
            os.path.join(SF, "documents.parquet")
        ).select("doc_id", "text")
        # deterministic shard assignments (no RNG): uniform 5-way; hot =
        # 90% on one label; hot_bucketed = hot label sub-bucketed 8 ways
        hot = F.when(F.col("doc_id") % 10 < 9, F.lit("hot")).otherwise(
            F.concat(F.lit("s"), (F.col("doc_id") % 4).cast("string"))
        )
        enc = (
            bpe_encode(docs, entry._BPE_MERGES, strategy="kernel")
            .select(
                "doc_id",
                "bpe_tokens",
                F.concat(
                    F.lit("s"), (F.col("doc_id") % 5).cast("string")
                ).alias("shard_uniform"),
                hot.alias("shard_hot"),
                F.concat(
                    hot, F.lit("#"),
                    F.pmod(F.xxhash64("doc_id"), F.lit(BUCKETS)).cast(
                        "string"
                    ),
                ).alias("shard_hot_bucketed"),
            )
        )
        enc.write.parquet(os.path.join(work, "enc"))
        enc = spark.read.parquet(os.path.join(work, "enc"))
        n = enc.count()

        for label in ("shard_uniform", "shard_hot", "shard_hot_bucketed"):
            walls = pack_walls(
                spark, enc, label, os.path.join(work, f"pack_{label}")
            )
            per_doc = [round(w / max(d, 1) * 1e6, 1) for d, w in walls]
            print(
                json.dumps(
                    {
                        "family": "pack_by",
                        "shards": label,
                        "n_docs": n,
                        "trigger_docs": [d for d, _ in walls],
                        "wall_sec": [round(w, 2) for _, w in walls],
                        "us_per_doc": per_doc,
                    }
                ),
                flush=True,
            )
            summary[f"pack/{label}/us_per_doc_last"] = per_doc[-1]

    # ---------------------------------------------------- B: IVF
    from v3_polars_spark.datapipe import ivf_index, ivf_search

    for tag, sfdir in (("uniform", SF), ("zipf", SFZ)) if "ivf" in SECTIONS else ():
        e = spark.read.parquet(os.path.join(sfdir, "embeddings.parquet"))
        nvec = e.count()
        t0 = time.monotonic()
        centroids, assigned = ivf_index(e, n_centroids=8, iters=1)
        q = e.filter(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        k = ivf_search(centroids, assigned, q, k=10, n_probe=3).count()
        wall = time.monotonic() - t0
        print(
            json.dumps(
                {
                    "family": "ivf",
                    "corpus": tag,
                    "n_vectors": nvec,
                    "build_plus_topk_sec": round(wall, 2),
                    "topk_rows": k,
                }
            ),
            flush=True,
        )
        summary[f"ivf/{tag}_sec"] = round(wall, 2)

    # ---------------------------------------------------- C: near-dup
    from v3_polars_spark.datapipe import near_dup_components

    for tag, sfdir in (("uniform", SF), ("zipf", SFZ)) if "neardup" in SECTIONS else ():
        d = spark.read.parquet(os.path.join(sfdir, "documents.parquet")).select(
            "doc_id", "text"
        )
        nd = d.count()
        t0 = time.monotonic()
        comp = near_dup_components(
            d, n=3, num_hashes=16, bands=4, verify_threshold=0.5
        )
        ncomp = comp.count()
        wall = time.monotonic() - t0
        print(
            json.dumps(
                {
                    "family": "near_dup_components",
                    "corpus": tag,
                    "n_docs": nd,
                    "wall_sec": round(wall, 2),
                    "labeled_rows": ncomp,
                }
            ),
            flush=True,
        )
        summary[f"neardup/{tag}_sec"] = round(wall, 2)

    print(json.dumps({"summary": summary}))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
