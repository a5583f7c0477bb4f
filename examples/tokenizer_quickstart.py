"""Runnable tour of the BPE tokenizer family: train → encode → token ids
→ packed fixed-length training shards, over the synthetic documents table.

    python examples/tokenizer_quickstart.py [sf_dir] [num_merges] [max_len]

Training iterates on the distinct-word table (vocabulary-sized working
set); encoding is a pure nested column expression for merge lists up to
``expr_max_merges`` (no Python in the plan, no shuffle) and an
Arrow-batched memoized kernel beyond; packing materializes the
concatenate-and-split layout with one token-level explode and one hash
aggregation per sequence. See COVERAGE.md (BPE tokenizer row) and
tests/test_bpe.py for the parity pins.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from v3_polars_spark.datapipe import (
    bpe_encode,
    bpe_pair_counts,
    bpe_train,
    pack_sequences,
    token_id_map,
)
from v3_polars_spark.session import get_spark

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
NUM_MERGES = int(sys.argv[2]) if len(sys.argv) > 2 else 24
MAX_LEN = int(sys.argv[3]) if len(sys.argv) > 3 else 64


def main() -> None:
    spark = get_spark(app_name="tokenizer-quickstart")
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet")).select(
        "doc_id", "text"
    )
    n_docs = docs.count()

    t0 = time.monotonic()
    merges = bpe_train(docs, NUM_MERGES)
    t_train = time.monotonic() - t0
    print(f"trained {len(merges)} merges over {n_docs} docs in {t_train:.2f}s")
    print("first merges:", merges[:8])

    top = bpe_pair_counts(docs, merges=merges).orderBy(
        F.desc("pair_count"), "a", "b"
    )
    print("top residual pairs after training:")
    top.show(5, truncate=False)

    t0 = time.monotonic()
    enc = bpe_encode(docs, merges)
    stats = enc.agg(
        F.sum(F.size("bpe_tokens")).alias("total_tokens"),
        F.avg(F.size("bpe_tokens")).alias("avg_tokens"),
    ).collect()[0]
    t_enc = time.monotonic() - t0
    print(
        f"encoded {stats.total_tokens} tokens "
        f"({stats.avg_tokens:.1f}/doc) in {t_enc:.2f}s "
        f"[{stats.total_tokens / max(t_enc, 1e-9) / 1e6:.2f} M tok/s]"
    )

    t0 = time.monotonic()
    shards = pack_sequences(
        enc, "bpe_tokens", ["doc_id"], max_len=MAX_LEN, sep_token="</doc>"
    )
    vocab = token_id_map(shards, "tokens")
    packed = (
        shards.select("seq", F.posexplode("tokens").alias("p", "token"))
        .join(F.broadcast(vocab), "token")
        .groupBy("seq")
        .agg(F.count(F.lit(1)).alias("n_tokens"))
    )
    dist = packed.groupBy("n_tokens").count().orderBy(F.desc("count")).collect()
    t_pack = time.monotonic() - t0
    n_seq = sum(r["count"] for r in dist)
    full = sum(r["count"] for r in dist if r["n_tokens"] == MAX_LEN)
    print(
        f"packed into {n_seq} sequences of {MAX_LEN} "
        f"({full} full, {n_seq - full} ragged tail) in {t_pack:.2f}s; "
        f"vocab size {vocab.count()}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
