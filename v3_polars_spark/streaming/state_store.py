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
import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame

_COVERS = "_covers.json"


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


def batch_id_of(d: str) -> int:
    return int(os.path.basename(d).split("=", 1)[1])


def covers_of(d: str) -> list[int]:
    """Batch ids a compacted segment dir supersedes (empty for normal
    per-trigger segments). The covers manifest travels INSIDE the dir, so
    the commit rename atomically both publishes the compacted data and
    retires its sources from every subsequent listing."""
    p = os.path.join(d, _COVERS)
    if not os.path.isfile(p):
        return []
    with open(p) as f:
        return json.load(f)


def commit_compacted(df: DataFrame, final_dir: str, covered: list[int]) -> None:
    """:func:`commit_write` plus a covers manifest: one rename publishes
    the compacted segment AND excludes the ``covered`` batch ids from
    :func:`data_dirs` — there is no window where a reader sees the data
    twice or not at all. The covered dirs become dead weight to be
    reclaimed by :func:`gc_covered`; a crash before that GC only leaves
    invisible garbage. The underscore filename keeps Spark's parquet
    reader from treating the manifest as data."""
    parent, base = os.path.split(final_dir)
    os.makedirs(parent, exist_ok=True)
    tmp = os.path.join(parent, f".tmp-{base}-{uuid.uuid4().hex[:8]}")
    df.write.mode("overwrite").parquet(tmp)
    with open(os.path.join(tmp, _COVERS), "w") as f:
        json.dump(sorted(int(i) for i in covered), f)
    os.rename(tmp, final_dir)


def gc_covered(root: str, kind: str) -> int:
    """Delete covered (superseded) dirs still on disk; returns the count
    removed. Deletion is bottom-up: a covered dir that is itself a
    compacted segment has its own sources deleted FIRST, then itself —
    so a crash at any point leaves every surviving source still covered
    by a surviving manifest (deleting the manifest-bearing dir first
    would resurrect its sources). Idempotent; safe to call at the start
    of every compaction as the retry path."""
    alldirs = {
        batch_id_of(d): d
        for d in glob.glob(os.path.join(root, kind, "batch=*"))
    }
    covered: set[int] = set()
    for d in alldirs.values():
        covered.update(covers_of(d))

    def _rm(bid: int) -> int:
        d = alldirs.get(bid)
        if d is None or not os.path.isdir(d):
            return 0
        n = 0
        for sub in covers_of(d):
            n += _rm(sub)
        shutil.rmtree(d)
        return n + 1

    return sum(_rm(bid) for bid in sorted(covered))


def data_dirs(root: str, kind: str) -> list[str]:
    """Committed batch dirs of one kind that contain data files (an
    empty batch commits a dir with only _SUCCESS — zero rows, skipped so
    multi-dir reads always have schema-bearing files). Dirs superseded by
    a compacted segment's covers manifest are excluded — compaction's
    commit rename flips them invisible atomically even before
    :func:`gc_covered` reclaims the disk."""
    dirs = sorted(glob.glob(os.path.join(root, kind, "batch=*")))
    covered: set[int] = set()
    for d in dirs:
        covered.update(covers_of(d))
    return [
        d
        for d in dirs
        if batch_id_of(d) not in covered
        and glob.glob(os.path.join(d, "part-*"))
    ]


def read_state(spark, root: str, kind: str, like: DataFrame) -> DataFrame:
    """Union of all committed state dirs of ``kind``; an empty frame with
    ``like``'s schema when no batch has landed data yet."""
    dirs = data_dirs(root, kind)
    if not dirs:
        return spark.createDataFrame([], like.schema)
    return spark.read.parquet(*dirs)
