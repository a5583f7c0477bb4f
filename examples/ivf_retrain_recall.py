"""Quantizer refresh end-to-end on the real embeddings table: drift →
detect → retrain → atomic root swap → resumed drain → recall recovery.

Scenario: the serving index was seeded on the even-id embeddings. The
corpus then drifts — the streamed odd-id vectors are a deterministic
transform of the originals that concentrates them around 8 "topic"
directions the uniform era never had, so the fixed seed quantizer's
centroids stop describing the incoming data. The script

1. drains the drifted stream into the seeded index,
2. detects the drift with ``centroid_drift`` (seed segment vs streamed
   batches),
3. measures recall@10 of ``ivf_search`` against brute-force ground truth
   on drifted queries (``ann_recall_check``),
4. ``retrain_ivf_index`` into a fresh root (re-assigns every indexed
   vector under fresh centroids), ``set_current_ivf_root`` atomic swap,
5. re-measures recall on the new root.

    python examples/ivf_retrain_recall.py [sf_dir] [n_queries] [pull]

Pass = drift cosine visibly below 1, recall_after > recall_before, and
recall_after above the 0.95 corpus-scale SLO at sf1.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from v3_polars_spark.datapipe.similarity import (
    ann_recall_check,
    centroid_drift,
    cosine_topk,
    ivf_search,
)
from v3_polars_spark.session import get_spark, tune_shuffle_partitions
from v3_polars_spark.streaming import (
    current_ivf_root,
    read_ivf_index,
    retrain_ivf_index,
    seed_ivf_index,
    set_current_ivf_root,
    streaming_ivf_assign,
)

SF = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
N_QUERIES = int(sys.argv[2]) if len(sys.argv) > 2 else 64
PULL = float(sys.argv[3]) if len(sys.argv) > 3 else 1.0


def drifted(df):
    """Deterministic distribution shift: the corpus concentrates around 8
    emergent "topic" directions (each unit vector pulled toward axis
    vec_id%8 with weight 1.0 — strong enough to cluster, weak enough that
    within-topic variance still straddles old-centroid boundaries) — the
    classic post-launch drift where new content clusters in ways the
    training sample never had. The seed quantizer's centroids
    (trained on the uniform era) cut straight through the new clusters,
    splitting each topic's neighbors across many inverted lists; a
    retrained quantizer aligns with them. Ids offset so both eras
    coexist."""
    topic = F.pmod(F.col("vec_id"), F.lit(8)).cast("int")
    return df.select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"),
        F.transform(
            F.col("embedding"),
            lambda x, i: x + F.when(i == topic, F.lit(PULL)).otherwise(0.0),
        ).alias("embedding"),
    )


def recall(spark, root, queries, corpus):
    centroids, assigned = read_ivf_index(spark, root)
    approx = ivf_search(centroids, assigned, queries, k=10, n_probe=4)
    exact = cosine_topk(corpus, queries, k=10)
    return ann_recall_check(approx, exact, k=10).collect()[0]["mean_recall"]


def main() -> None:
    spark = get_spark(app_name="ivf-retrain-recall")
    tune_shuffle_partitions(
        spark, os.path.getsize(os.path.join(SF, "embeddings.parquet"))
    )
    work = tempfile.mkdtemp(prefix="ivfr_")
    try:
        e = spark.read.parquet(os.path.join(SF, "embeddings.parquet"))
        # distinct base vectors only: the replicated scale dirs duplicate
        # each vector ~100x, and a duplicated corpus makes ANY recall
        # scenario degenerate — a query's true top-k is its own copies,
        # co-assigned with it by construction (measured recall 1.0 at sf1
        # regardless of quantizer quality). Recall is a property of the
        # direction set, so the evidence runs on the deduplicated set.
        e = e.groupBy("embedding").agg(F.min("vec_id").alias("vec_id"))
        seed = e.filter(F.col("vec_id") % 2 == 0).select("vec_id", "embedding")
        drift = drifted(e.filter(F.col("vec_id") % 2 == 1)).persist()
        drift_src = os.path.join(work, "src")
        drift.write.parquet(drift_src)

        base = os.path.join(work, "serving")
        root1 = os.path.join(work, "idx1")
        seed_ivf_index(seed, root1, n_centroids=16, iters=2)
        set_current_ivf_root(base, root1)

        stream = spark.readStream.schema(
            spark.read.parquet(drift_src).schema
        ).parquet(drift_src)
        streaming_ivf_assign(
            stream, current_ivf_root(base), os.path.join(work, "ckpt")
        )

        # drift detection: seed segment vs streamed batches
        _, assigned = read_ivf_index(spark, current_ivf_root(base))
        labeled = assigned.select(
            F.when(F.col("batch") < 0, "seed").otherwise("stream").alias("era"),
            F.col("__v").alias("embedding"),
        )
        drift_cos = labeled.transform(
            lambda d: centroid_drift(d, "era")
        ).collect()[0]["cosine"]

        queries = drift.limit(N_QUERIES).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        corpus = seed.union(drift)
        r_before = recall(spark, current_ivf_root(base), queries, corpus)

        root2 = os.path.join(work, "idx2")
        retrain_ivf_index(
            spark, current_ivf_root(base), root2, n_centroids=16, iters=2
        )
        set_current_ivf_root(base, root2)
        r_after = recall(spark, current_ivf_root(base), queries, corpus)

        print(
            {
                "sf": SF,
                "n_queries": N_QUERIES,
                "drift_cosine": round(drift_cos, 4),
                "recall_before": round(r_before, 4),
                "recall_after": round(r_after, 4),
            }
        )
        assert r_after > r_before
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
