"""Trigger-size scaling of the streaming packer: global vs shard-keyed.

The round-10 change (`token_pack_batch_fn(by=...)`) exists because the
global path ranks every trigger with ONE row_number() task — per-trigger
wall therefore tracks trigger size ~linearly no matter how many cores
are free. The shard-keyed path partitions the rank window, the pack, and
the carry by shard, so a bigger trigger spreads across the cluster and
the wall grows SUBLINEARLY until cores saturate.

This script drives both variants over a doubling trigger schedule
(n/16, n/8, n/4, n/2 docs per trigger) on the sf corpus and prints the
wall per trigger plus the wall/doc ratio — the by-keyed ratio should
FALL as triggers double (parallelism absorbing size), the global ratio
should stay ~constant (single-task rank).

    python examples/streaming_pack_by_scaling.py [sf_dir=/tmp/sf1] [by=source]
"""

from __future__ import annotations

import json
import os
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
from v3_polars_spark.streaming.pack_stream import token_pack_batch_fn

SF = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
BY = sys.argv[2] if len(sys.argv) > 2 else "source"
MAX_LEN = 2048
FRACTIONS = [1 / 16, 1 / 8, 1 / 4, 1 / 2]  # doubling trigger sizes


def main() -> None:
    import __spark_entry__ as entry
    from v3_polars_spark.datapipe import bpe_encode

    spark = get_spark(app_name="streaming-pack-by-scaling")
    quiet_expected_jvm_warnings(spark)
    tune_shuffle_partitions(
        spark, os.path.getsize(os.path.join(SF, "documents.parquet"))
    )
    root = tempfile.mkdtemp(prefix="spbs_")
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet")).select(
        "doc_id", BY, "text"
    )
    enc = bpe_encode(docs, entry._BPE_MERGES, strategy="kernel").select(
        "doc_id", BY, "bpe_tokens"
    )
    enc.write.parquet(os.path.join(root, "enc"))
    enc = spark.read.parquet(os.path.join(root, "enc"))
    n = enc.count()

    # doubling-population doc_id cuts: trigger b covers FRACTIONS[b] of docs
    cum = [sum(FRACTIONS[: i + 1]) for i in range(len(FRACTIONS) - 1)]
    bounds = enc.select(
        F.percentile("doc_id", F.array(*[F.lit(c) for c in cum])).alias("b")
    ).collect()[0]["b"]

    out: dict = {"sf": SF, "by": BY, "n_docs": n, "max_len": MAX_LEN}
    for label, by in (("global", None), ("by", BY)):
        fn = token_pack_batch_fn(
            spark, os.path.join(root, f"pack_{label}"), MAX_LEN,
            sep_token="</doc>", by=by,
        )
        walls, sizes = [], []
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
            if ndocs == 0:
                # skewed/tiny corpora can leave a percentile bucket empty;
                # an empty trigger has no per-doc cost to report
                print(f"{label:7s} trigger {b}: empty bucket, skipped", flush=True)
                continue
            t0 = time.time()
            fn(batch, b)
            walls.append(time.time() - t0)
            sizes.append(ndocs)
            print(
                f"{label:7s} trigger {b}: {ndocs:8d} docs  "
                f"{walls[-1]:6.2f}s  {walls[-1] / ndocs * 1e6:7.1f} us/doc",
                flush=True,
            )
        out[f"{label}_walls_sec"] = [round(w, 2) for w in walls]
        out[f"{label}_docs"] = sizes
        if walls:
            out[f"{label}_wall_ratio_last_first"] = round(walls[-1] / walls[0], 2)
            out[f"{label}_usdoc_ratio_last_first"] = round(
                (walls[-1] / sizes[-1]) / (walls[0] / sizes[0]), 2
            )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
