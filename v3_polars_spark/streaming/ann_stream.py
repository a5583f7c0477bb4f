"""Streaming IVF index maintenance: keep an ANN index current as an
embedding stream lands, without ever re-scanning the indexed corpus —
the serving-side twin of ``dedup_stream``'s ingest discipline (reference
analog: the same segmented incremental loop, data_update.py:191-292,
applied to the vector store a 100 TB embedding pipeline keeps beside its
documents).

Per micro-batch (``foreachBatch``):

1. assign the batch's vectors to their nearest centroid
   (``datapipe.similarity.ivf_assign`` — broadcast centroid table,
   one scan of the batch, NO shuffle of vectors)
2. append the assignments as a new committed batch dir under the index
   root (``state_store`` atomic tmp-rename protocol)

The coarse quantizer is FIXED at seed time (``seed_ivf_index`` trains it
on the corpus you already have, exactly like FAISS trains on a sample
and then adds vectors forever): per-trigger cost is O(batch), the index
never rebuilds, and every committed batch is immediately probe-able —
``read_ivf_index`` + ``datapipe.similarity.ivf_search`` serve queries
against the union of all committed inverted-list segments. Assignment is
a pure per-vector function of (vector, centroids), so streamed ≡ batch
``ivf_assign`` row-for-row (the oracle replays exactly that), and the
exactly-once story needs only the single-dir commit: a replayed batch
whose dir exists is a no-op; a crash mid-write leaves an invisible
dot-tmp dir the replay sweeps.

When drift monitoring (``datapipe.similarity.centroid_drift`` over the
per-batch assignment means) says the quantizer has gone stale, retrain
with ``seed_ivf_index`` into a fresh root and re-drain — the rebuild
decision is a policy knob, not an operator concern.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..datapipe.similarity import ivf_assign, ivf_build
from .state_store import batch_dir, commit_write, data_dirs, tmp_glob

_CENTROIDS = "centroids"
_ASSIGNED = "assigned"


def seed_ivf_index(
    corpus: DataFrame,
    index_root: str,
    n_centroids: int = 16,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Train the coarse quantizer on ``corpus`` and install it (batch -1)
    together with the corpus's own assignments — streamed batches extend
    the inverted lists from the first trigger. Centroids are written
    LAST: the assign path reads them, so a half-seeded root (assignments
    without centroids) is treated as unseeded by :func:`read_ivf_index`
    rather than served with a torn quantizer."""
    centroids = ivf_build(corpus, n_centroids, iters, id_col, vec_col)
    c = corpus.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v")
    )
    commit_write(
        ivf_assign(c, centroids), batch_dir(index_root, _ASSIGNED, -1)
    )
    commit_write(centroids, batch_dir(index_root, _CENTROIDS, -1))


def read_ivf_index(spark, index_root: str) -> tuple[DataFrame, DataFrame]:
    """(centroids, assigned) for ``datapipe.similarity.ivf_search``:
    the fixed quantizer plus the union of every committed assignment
    segment, with the ``batch`` provenance partition column (seed is
    batch -1)."""
    cdirs = data_dirs(index_root, _CENTROIDS)
    if not cdirs:
        raise FileNotFoundError(f"no seeded IVF index under {index_root}")
    centroids = spark.read.parquet(*cdirs)
    adirs = data_dirs(index_root, _ASSIGNED)
    assigned = spark.read.option(
        "basePath", os.path.join(index_root, _ASSIGNED)
    ).parquet(*adirs)
    return centroids, assigned


def ivf_assign_batch_fn(
    spark,
    index_root: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """The ``foreachBatch`` function :func:`streaming_ivf_assign` runs —
    exposed so tests can wrap it with failure injection."""
    centroids = None

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        nonlocal centroids
        out_dir = batch_dir(index_root, _ASSIGNED, batch_id)
        if os.path.isdir(out_dir):
            return  # replay of a committed batch: exactly-once no-op
        for leftover in glob.glob(tmp_glob(out_dir)):
            shutil.rmtree(leftover, ignore_errors=True)
        if centroids is None:
            centroids = spark.read.parquet(
                batch_dir(index_root, _CENTROIDS, -1)
            ).cache()
        c = batch_df.select(
            F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v")
        )
        commit_write(ivf_assign(c, centroids), out_dir)

    return _apply


def streaming_ivf_assign(
    stream_df: DataFrame,
    index_root: str,
    checkpoint_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    timeout_sec: int = 600,
) -> None:
    """Drain ``stream_df`` (AvailableNow) into the IVF index under
    ``index_root`` (seed it first with :func:`seed_ivf_index`).
    Resumable: rerunning with the same ``checkpoint_path`` picks up
    after the last committed batch. Read the probe-ready index with
    :func:`read_ivf_index`."""
    fn = ivf_assign_batch_fn(
        stream_df.sparkSession, index_root, id_col=id_col, vec_col=vec_col
    )
    q = (
        stream_df.writeStream.foreachBatch(fn)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    if q.isActive:
        q.stop()
