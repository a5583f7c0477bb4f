"""Streaming snapshot maintenance: keep a keyed latest-state table up to
date from an event stream with ``foreachBatch`` + the relational MERGE.

The batch path derives snapshots by re-aggregating the full log
(``ops.dedup.dedup_last``); at 100 TB the log re-read is the cost you
stop paying — instead each micro-batch is collapsed to its final state
per key (dedup_last over the batch) and MERGEd into the persisted
snapshot (``ops.merge.merge_upsert``). Per trigger that is one join
against the snapshot, whose size is bounded by live keys, not log
length. Checkpointing makes the maintenance resumable; the rewrite is
atomic per micro-batch (write new snapshot dir, swap).

Equivalence with the batch derivation (stream-maintained snapshot ==
dedup_last over the whole log) is pinned in tests/test_streaming.py.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame

from ..ops.dedup import dedup_last
from ..ops.merge import merge_upsert


def streaming_snapshot_upsert(
    stream_df: DataFrame,
    snapshot_path: str,
    checkpoint_path: str,
    keys: list[str],
    order: list[str],
    timeout_sec: int = 300,
) -> None:
    """Maintain ``snapshot_path`` (parquet) as the latest row per ``keys``
    (ties broken by ``order``, same contract as ``dedup_last``) from
    ``stream_df``, draining what is currently available (AvailableNow).

    Within one micro-batch the batch is first collapsed with
    ``dedup_last``; rows already in the snapshot lose to any batch row
    for the same key (micro-batches arrive in order for a file-source
    log — the reference ingest's append discipline)."""
    spark = stream_df.sparkSession

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        latest = dedup_last(batch_df, keys=keys, order=order)
        if os.path.exists(snapshot_path):
            target = spark.read.parquet(snapshot_path)
            merged = merge_upsert(target, latest.select(target.columns), keys)
        else:
            merged = latest
        tmp = f"{snapshot_path}__tmp_{uuid.uuid4().hex[:8]}"
        merged.write.mode("overwrite").parquet(tmp)
        if os.path.exists(snapshot_path):
            shutil.rmtree(snapshot_path)
        os.rename(tmp, snapshot_path)

    q = (
        stream_df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    if q.isActive:
        q.stop()
