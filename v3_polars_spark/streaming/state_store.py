"""Atomic per-batch state directories for foreachBatch pipelines.

The shared commit protocol of the streaming state maintainers
(``dedup_stream``, ``ann_stream``): every micro-batch's output is one
directory per state kind, written to a dot-prefixed tmp dir OUTSIDE the
``batch=*`` namespace and renamed into place — the rename is the commit,
so readers (which list only completed ``batch=*`` dirs) can never see a
torn write, and a crashed attempt's leftovers are both invisible and
sweepable on replay. foreachBatch is at-least-once; the committed-dir
existence check makes each batch idempotent.
"""

from __future__ import annotations

import glob
import os
import uuid

from pyspark.sql import DataFrame


def batch_dir(root: str, kind: str, batch_id: int) -> str:
    return os.path.join(root, kind, f"batch={batch_id}")


def tmp_glob(final_dir: str) -> str:
    """Glob matching every tmp dir a crashed :func:`commit_write` to
    ``final_dir`` may have left behind."""
    parent, base = os.path.split(final_dir)
    return os.path.join(parent, f".tmp-{base}-*")


def commit_write(df: DataFrame, final_dir: str) -> None:
    """Write ``df`` to a tmp dir and atomically rename into place. The
    rename is the commit: readers list only completed batch dirs, so a
    crash mid-write leaves nothing visible. Tmp dirs live OUTSIDE the
    ``batch=*`` namespace (dot-prefixed ``.tmp-batch=<id>-<hex>``) so the
    committed-dir glob in :func:`data_dirs` can never match a dead
    attempt's leftovers, and the dot prefix keeps Hadoop file listings
    from picking them up either."""
    parent, base = os.path.split(final_dir)
    os.makedirs(parent, exist_ok=True)
    tmp = os.path.join(parent, f".tmp-{base}-{uuid.uuid4().hex[:8]}")
    df.write.mode("overwrite").parquet(tmp)
    os.rename(tmp, final_dir)


def data_dirs(root: str, kind: str) -> list[str]:
    """Committed batch dirs of one kind that contain data files (an
    empty batch commits a dir with only _SUCCESS — zero rows, skipped so
    multi-dir reads always have schema-bearing files)."""
    return [
        d
        for d in sorted(glob.glob(os.path.join(root, kind, "batch=*")))
        if glob.glob(os.path.join(d, "part-*"))
    ]


def read_state(spark, root: str, kind: str, like: DataFrame) -> DataFrame:
    """Union of all committed state dirs of ``kind``; an empty frame with
    ``like``'s schema when no batch has landed data yet."""
    dirs = data_dirs(root, kind)
    if not dirs:
        return spark.createDataFrame([], like.schema)
    return spark.read.parquet(*dirs)
