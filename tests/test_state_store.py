"""Pure-filesystem unit tests for the state_store covers protocol — the
invariants the streaming compactors rely on, checkable without a Spark
session (fuzz/integration coverage lives in test_streaming.py and
test_fuzz_streaming.py)."""

import json
import os

import pytest

from v3_polars_spark.streaming.state_store import (
    _COVERS,
    batch_id_of,
    covers_of,
    data_dirs,
    gc_covered,
)


def _mk(root, kind, bid, covers=None, data=True):
    d = os.path.join(root, kind, f"batch={bid}")
    os.makedirs(d)
    if data:
        open(os.path.join(d, "part-00000"), "w").write("x")
    if covers is not None:
        json.dump(covers, open(os.path.join(d, _COVERS), "w"))
    return d


def test_covered_dirs_excluded_even_before_gc(tmp_path):
    root = str(tmp_path)
    _mk(root, "k", -1)
    _mk(root, "k", 0)
    _mk(root, "k", 1)
    _mk(root, "k", -2, covers=[-1, 0, 1])
    assert [batch_id_of(d) for d in data_dirs(root, "k")] == [-2]


def test_covers_chain_stays_sound_after_partial_gc(tmp_path):
    """-3 covers {-2, 2}; -2 covers {-1, 0, 1}. Even with EVERY covered
    dir still on disk (no GC ran), only -3 and uncovered newer triggers
    are visible — exclusion is the union of all manifests."""
    root = str(tmp_path)
    for b in (-1, 0, 1):
        _mk(root, "k", b)
    _mk(root, "k", -2, covers=[-1, 0, 1])
    _mk(root, "k", 2)
    _mk(root, "k", -3, covers=[-2, 2])
    _mk(root, "k", 3)  # new trigger after the second compaction
    assert [batch_id_of(d) for d in data_dirs(root, "k")] == [-3, 3]


def test_gc_bottom_up_never_resurrects_sources(tmp_path):
    """gc_covered must delete a covered compacted dir's OWN sources
    before the dir itself: deleting -2 first would drop the only
    manifest excluding -1/0/1 and resurrect them as visible duplicates.
    After a full GC only the live head remains."""
    root = str(tmp_path)
    for b in (-1, 0, 1):
        _mk(root, "k", b)
    _mk(root, "k", -2, covers=[-1, 0, 1])
    _mk(root, "k", -3, covers=[-2])
    n = gc_covered(root, "k")
    assert n == 4  # -2 and its three sources
    assert [batch_id_of(d) for d in data_dirs(root, "k")] == [-3]
    # idempotent
    assert gc_covered(root, "k") == 0


def test_empty_marker_dirs_survive_gc_and_listing(tmp_path):
    """A zero-row committed batch (dir without part files) is invisible
    to readers but is an exactly-once marker — GC of unrelated covers
    must not touch it."""
    root = str(tmp_path)
    _mk(root, "k", 0)
    _mk(root, "k", 1, data=False)  # empty marker
    _mk(root, "k", -2, covers=[0])
    gc_covered(root, "k")
    assert os.path.isdir(os.path.join(root, "k", "batch=1"))
    assert [batch_id_of(d) for d in data_dirs(root, "k")] == [-2]


def test_sql_macro_error_branches():
    from v3_polars_spark.sql import asof_join_sql, resample_sql

    with pytest.raises(ValueError, match="strategy"):
        asof_join_sql("l", "r", "ts", ["k"], ["v"], ["c"], strategy="nearest")
    with pytest.raises(ValueError, match="dialect"):
        asof_join_sql("l", "r", "ts", ["k"], ["v"], ["c"], dialect="mysql")
    with pytest.raises(ValueError, match="divide"):
        resample_sql("t", "ts", 7, {"n": "COUNT(*)"})
