"""Streaming incremental corpus dedup — the production LLM-ingest shape.

examples/incremental_dedup.py shows ONE crawl batch deduped against the
corpus with the direct functions; this is the same flow maintained as
resumable streaming state (streaming/dedup_stream.py): crawl segments
land as files, each micro-batch is deduped exact + near against
PERSISTED corpus state (fingerprints, LSH band buckets, shingle sets —
the corpus text is never re-read), and survivors commit as a new corpus
batch with atomic per-batch directories (exactly-once under crashes;
see tests/test_streaming.py). Reference analog: the segmented
incremental ingest loop, data_update.py:191-292.

The demo splits the documents table into 4 doc_id-range "crawl
segments", seeds the corpus with the even-id docs, then drains the odd
segments one micro-batch each. Rerunning with the same work dir resumes
from the checkpoint and processes nothing.

    python examples/streaming_corpus_dedup.py [sf_dir=/root/testdata/sf0.01]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from v3_polars_spark.session import get_spark
from v3_polars_spark.streaming import (
    read_corpus,
    seed_corpus,
    streaming_corpus_dedup,
)

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
N_SEGMENTS = 4


def main() -> None:
    spark = get_spark(app_name="streaming-corpus-dedup")
    work = tempfile.mkdtemp(prefix="stream_corpus_demo_")
    src = os.path.join(work, "crawl")
    root = os.path.join(work, "corpus")
    ckpt = os.path.join(work, "ckpt")

    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    lo, hi = docs.agg(F.min("doc_id"), F.max("doc_id")).first()
    span = (hi - lo + 1) // N_SEGMENTS + 1

    # the corpus you already trained on, installed with its dedup state
    corpus0 = docs.filter(F.col("doc_id") % 2 == 0)
    seed_corpus(corpus0, root)
    print(f"seeded corpus: {corpus0.count()} docs")

    # crawl segments land as files; increasing mtimes = arrival order
    base = time.time() - 3600
    for k in range(N_SEGMENTS):
        seg = docs.filter(
            (F.col("doc_id") % 2 == 1)
            & (F.col("doc_id") >= lo + k * span)
            & (F.col("doc_id") < lo + (k + 1) * span)
        )
        d = os.path.join(src, f"seg{k}")
        seg.coalesce(1).write.parquet(d)
        for f in os.listdir(d):
            os.utime(os.path.join(d, f), (base + k, base + k))

    t0 = time.time()
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(src, "seg*"))
    )
    streaming_corpus_dedup(stream, root, ckpt)
    kept = read_corpus(spark, root)
    streamed = kept.filter(F.col("batch") >= 0)
    per_batch = streamed.groupBy("batch").count().orderBy("batch").collect()
    for r in per_batch:
        print(f"  batch {r['batch']}: {r['count']} survivors")
    print(
        f"corpus after drain: {kept.count()} docs "
        f"({streamed.count()} streamed in, {time.time() - t0:.1f} s)"
    )

    # resume on the same checkpoint: nothing new to process
    t1 = time.time()
    streaming_corpus_dedup(
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(src, "seg*")),
        root,
        ckpt,
    )
    print(
        f"re-drain on same checkpoint: still {read_corpus(spark, root).count()}"
        f" docs ({time.time() - t1:.1f} s, no batch reprocessed)"
    )

    shutil.rmtree(work)
    spark.stop()


if __name__ == "__main__":
    main()
