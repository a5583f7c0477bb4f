"""Per-trigger cost curve of the streaming training-shard packer.

The scale claim of `streaming/pack_stream.py` is that a trigger costs
O(batch tokens), not O(shard store): each batch reads ONE carry row
(< max_len tokens), packs only remainder+batch, and commits one new
dir — committed shards are never re-read. This script measures it:
BPE-encode the documents table (memoized kernel), split it into N equal
micro-batches, drive the foreachBatch function directly, and print each
trigger's wall clock as the store grows; then compact and show the
store read cost (files) dropping while probe rows stay identical. A
flat trigger curve is the pass; growth tracking the store would mean a
hidden store rescan.

    python examples/streaming_pack_throughput.py [sf_dir=/tmp/sf1] [n_batches=8]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from v3_polars_spark.session import get_spark, tune_shuffle_partitions
from v3_polars_spark.streaming import (
    compact_packed_shards,
    read_pack_carry,
    read_packed_shards,
)
from v3_polars_spark.streaming.pack_stream import token_pack_batch_fn

SF = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
N_BATCHES = int(sys.argv[2]) if len(sys.argv) > 2 else 8
MAX_LEN = 2048


def main() -> None:
    from v3_polars_spark.datapipe import bpe_encode

    # frozen demo merge table (the gate query's)
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entry

    spark = get_spark(app_name="streaming-pack-throughput")
    tune_shuffle_partitions(
        spark, os.path.getsize(os.path.join(SF, "documents.parquet"))
    )
    root = tempfile.mkdtemp(prefix="spt_")
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet")).select(
        "doc_id", "text"
    )
    n = docs.count()
    enc = bpe_encode(docs, entry._BPE_MERGES, strategy="kernel").select(
        "doc_id", "bpe_tokens"
    )
    enc.write.parquet(os.path.join(root, "enc"))
    enc = spark.read.parquet(os.path.join(root, "enc"))

    fn = token_pack_batch_fn(
        spark, os.path.join(root, "pack"), MAX_LEN, sep_token="</doc>"
    )
    # equal-POPULATION id boundaries (ids may be sparse/shifted), so
    # every trigger carries ~n/N_BATCHES docs
    bounds = enc.select(
        F.percentile(
            "doc_id", F.array(*[F.lit(i / N_BATCHES) for i in range(1, N_BATCHES)])
        ).alias("b")
    ).collect()[0]["b"]
    walls = []
    for b in range(N_BATCHES):
        lo = None if b == 0 else bounds[b - 1]
        hi = None if b == N_BATCHES - 1 else bounds[b]
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (F.col("doc_id") > lo)
        if hi is not None:
            cond = cond & (F.col("doc_id") <= hi)
        batch = enc.filter(cond)
        t0 = time.time()
        fn(batch, b)
        walls.append(time.time() - t0)
        seq0, rem = read_pack_carry(spark, os.path.join(root, "pack"))
        print(
            f"trigger {b}: {walls[-1]:.2f}s  store={seq0} seqs  carry={len(rem)} tok",
            flush=True,
        )
    print("per-trigger walls:", " ".join(f"{w:.2f}" for w in walls))
    print(
        f"flatness: last/first = {walls[-1] / walls[0]:.2f} "
        f"(max/min = {max(walls) / min(walls):.2f})"
    )

    store = read_packed_shards(spark, os.path.join(root, "pack"))
    rows_before = store.count()
    t0 = time.time()
    stats = compact_packed_shards(spark, os.path.join(root, "pack"))
    rows_after = read_packed_shards(spark, os.path.join(root, "pack")).count()
    print(
        f"compaction: files {stats['files_before']} -> {stats['files_after']} "
        f"in {time.time() - t0:.2f}s; rows {rows_before} -> {rows_after} "
        f"({'identical' if rows_before == rows_after else 'MISMATCH'})"
    )
    spark.stop()


if __name__ == "__main__":
    main()
