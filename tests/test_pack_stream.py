"""Streaming training-shard packer: stream ≡ batch pack_sequences under
multi-trigger arrival, exactly-once replay, carry boundary edges,
crash-window sweep, and compaction probe-identity + resumed drain."""

import glob
import os

import pytest

# Deterministic but minutes-long: every test spins real structured-
# streaming drains / state-store rebuilds (measured ~10 min for this
# module on an idle local[32] — durations in BENCH_NOTES r11 gate note).
# Third tier: excluded from the per-change gate, always in the
# per-round gate (pytest -m 'not fuzz').
pytestmark = pytest.mark.slow
from pyspark.sql import functions as F
from pyspark.sql import types as T

from v3_polars_spark.datapipe import pack_sequences
from v3_polars_spark.streaming import (
    compact_packed_shards,
    read_pack_carry,
    read_packed_shards,
    streaming_token_shards,
)
from v3_polars_spark.streaming.pack_stream import token_pack_batch_fn
from v3_polars_spark.streaming.state_store import data_dirs

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("bpe_tokens", T.ArrayType(T.StringType())),
    ]
)

DOCS = [
    (0, ["a", "b", "c"]),
    (1, ["d", "e", "f", "g", "h"]),
    (2, []),
    (3, ["i"] * 9),
    (4, ["j", "k"]),
    (5, ["l", "m", "n", "o"]),
]


def shard_map(df):
    return {r.seq: (tuple(r.tokens), r.n_tokens) for r in df.collect()}


def batch_reference(spark, docs, max_len, sep="<s>"):
    ref = pack_sequences(
        spark.createDataFrame(docs, SCHEMA),
        "bpe_tokens",
        ["doc_id"],
        max_len=max_len,
        by=None,
        sep_token=sep,
    )
    # the stream emits only CLOSED (full) sequences; the batch tail stays
    # in the carry
    return {
        r.seq: (tuple(r.tokens), r.n_tokens)
        for r in ref.collect()
        if r.n_tokens == max_len
    }


def test_stream_matches_batch_across_triggers_and_resume(spark, tmp_path):
    src = str(tmp_path / "src")
    root = str(tmp_path / "pack")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    # three arrival waves, ids strictly increasing => arrival order is
    # doc_id order and the batch op over all docs is the exact reference
    waves = [DOCS[:2], DOCS[2:4], DOCS[4:]]
    seen = []
    for wave in waves:
        seen += wave
        spark.createDataFrame(wave, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        stream = spark.readStream.schema(SCHEMA).parquet(src)
        streaming_token_shards(
            stream, root, ckpt, max_len=4, sep_token="<s>"
        )
        got = shard_map(read_packed_shards(spark, root))
        assert got == batch_reference(spark, seen, 4)
    seq0, rem = read_pack_carry(spark, root)
    total = sum(len(t) + 1 for _, t in DOCS)
    assert seq0 == total // 4 and len(rem) == total % 4


def test_exactly_once_replay_and_crash_sweep(spark, tmp_path):
    root = str(tmp_path / "pack")
    fn = token_pack_batch_fn(spark, root, max_len=3, sep_token=None)
    b0 = spark.createDataFrame(DOCS[:2], SCHEMA)
    fn(b0, 0)
    first = shard_map(read_packed_shards(spark, root))
    carry0 = read_pack_carry(spark, root)
    # replay of the committed batch: byte-identical state
    fn(b0, 0)
    assert shard_map(read_packed_shards(spark, root)) == first
    assert read_pack_carry(spark, root) == carry0
    # a crashed attempt's tmp dir is swept before the next commit
    dead = os.path.join(root, "packed", ".tmp-batch=1-deadbeef")
    os.makedirs(dead)
    fn(spark.createDataFrame(DOCS[2:4], SCHEMA), 1)
    assert not os.path.isdir(dead)
    assert len(glob.glob(os.path.join(root, "packed", "batch=*"))) == 2


def test_carry_exact_boundary_empties(spark, tmp_path):
    root = str(tmp_path / "pack")
    fn = token_pack_batch_fn(spark, root, max_len=4, sep_token=None)
    fn(spark.createDataFrame([(0, ["a"] * 8)], SCHEMA), 0)
    seq0, rem = read_pack_carry(spark, root)
    assert (seq0, rem) == (2, [])
    # next batch continues on the boundary
    fn(spark.createDataFrame([(1, ["b"] * 5)], SCHEMA), 1)
    got = shard_map(read_packed_shards(spark, root))
    assert got[2] == (("b",) * 4, 4)
    assert read_pack_carry(spark, root) == (3, ["b"])


def test_empty_batch_keeps_carry(spark, tmp_path):
    root = str(tmp_path / "pack")
    fn = token_pack_batch_fn(spark, root, max_len=4, sep_token=None)
    fn(spark.createDataFrame([(0, ["a", "b", "c", "d", "e"])], SCHEMA), 0)
    before = read_pack_carry(spark, root)
    fn(spark.createDataFrame([], SCHEMA), 1)
    assert read_pack_carry(spark, root) == before


def test_compaction_probe_identical_then_drain_continues(spark, tmp_path):
    root = str(tmp_path / "pack")
    fn = token_pack_batch_fn(spark, root, max_len=3, sep_token="<s>")
    for i, d in enumerate(DOCS):
        fn(spark.createDataFrame([d], SCHEMA), i)
    before = shard_map(read_packed_shards(spark, root))
    carry_before = read_pack_carry(spark, root)
    stats = compact_packed_shards(spark, root)
    assert stats["dirs_before"] >= 2
    assert shard_map(read_packed_shards(spark, root)) == before
    assert read_pack_carry(spark, root) == carry_before
    # compaction retired its sources in the listing
    assert any("batch=-2" in d for d in data_dirs(root, "packed"))
    # the drain continues against the compacted store
    fn(spark.createDataFrame([(9, ["z"] * 7)], SCHEMA), len(DOCS))
    after = shard_map(read_packed_shards(spark, root))
    assert before.items() <= after.items() and len(after) > len(before)


def test_stream_composes_with_bpe_encode(spark, tmp_path):
    """bpe_encode's expression path is stateless — the composed
    stream (encode -> pack) equals batch encode -> batch pack."""
    from v3_polars_spark.datapipe import bpe_encode

    src = str(tmp_path / "src")
    root = str(tmp_path / "pack")
    ckpt = str(tmp_path / "ckpt")
    texts = [(i, f"doc {i} low lower lowest newer") for i in range(6)]
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    df.coalesce(1).write.parquet(src)
    merges = [("l", "o"), ("lo", "w</w>"), ("e", "r</w>")]

    stream = bpe_encode(
        spark.readStream.schema(df.schema).parquet(src), merges
    )
    streaming_token_shards(stream, root, ckpt, max_len=8, sep_token="</doc>")
    got = shard_map(read_packed_shards(spark, root))
    ref = pack_sequences(
        bpe_encode(df, merges), "bpe_tokens", ["doc_id"], 8,
        sep_token="</doc>",
    )
    want = {
        r.seq: (tuple(r.tokens), r.n_tokens)
        for r in ref.collect()
        if r.n_tokens == 8
    }
    assert got == want


def test_full_compaction_of_quiesced_drain_preserves_live_carry(spark, tmp_path):
    root = str(tmp_path / "pack")
    fn = token_pack_batch_fn(spark, root, max_len=3, sep_token=None)
    for i, d in enumerate(DOCS[:4]):
        fn(spark.createDataFrame([d], SCHEMA), i)
    before = shard_map(read_packed_shards(spark, root))
    carry = read_pack_carry(spark, root)
    compact_packed_shards(spark, root, exclude_newest=False)
    assert glob.glob(os.path.join(root, "packed", "batch=-*"))
    assert shard_map(read_packed_shards(spark, root)) == before
    assert read_pack_carry(spark, root) == carry
    # a fresh drain epoch continues from the preserved carry
    fn(spark.createDataFrame([DOCS[4]], SCHEMA), 100)
    seq0, rem = read_pack_carry(spark, root)
    total = sum(len(t) for _, t in DOCS[:5])
    assert seq0 == total // 3 and len(rem) == total % 3


# ---------------------------------------------------------------------------
# shard-keyed packer (round 10): per-shard rank/pack/seq/carry
# ---------------------------------------------------------------------------

SCHEMA_BY = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("src", T.StringType()),
        T.StructField("bpe_tokens", T.ArrayType(T.StringType())),
    ]
)

DOCS_BY = [
    (0, "x", ["a", "b", "c"]),
    (1, "y", ["d", "e", "f", "g", "h"]),
    (2, "x", []),
    (3, "y", ["i"] * 9),
    (4, "x", ["j", "k"]),
    (5, "z", ["l", "m", "n", "o"]),
    (6, "x", ["p", "q", "r"]),
    (7, "z", ["s"]),
]


def sharded_map(df):
    return {
        (r.shard, r.seq): (tuple(r.tokens), r.n_tokens) for r in df.collect()
    }


def batch_reference_by(spark, docs, max_len, sep="<s>", full_only=True):
    ref = pack_sequences(
        spark.createDataFrame(docs, SCHEMA_BY).withColumn(
            "shard", F.col("src")
        ),
        "bpe_tokens",
        ["doc_id"],
        max_len=max_len,
        by=["shard"],
        sep_token=sep,
    )
    return {
        (r.shard, r.seq): (tuple(r.tokens), r.n_tokens)
        for r in ref.collect()
        if (not full_only) or r.n_tokens == max_len
    }


def test_sharded_stream_matches_batch_by_across_triggers(spark, tmp_path):
    """Per-shard streamed packing across waves (with shards absent from
    some waves) equals ONE batch pack_sequences(by=) over the full
    corpus; carries per shard match the batch tails."""
    from v3_polars_spark.streaming import read_pack_carries

    src = str(tmp_path / "src")
    root = str(tmp_path / "pack")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    waves = [DOCS_BY[:2], DOCS_BY[2:5], DOCS_BY[5:]]
    seen = []
    for wave in waves:
        seen += wave
        spark.createDataFrame(wave, SCHEMA_BY).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        stream = spark.readStream.schema(SCHEMA_BY).parquet(src)
        streaming_token_shards(
            stream, root, ckpt, max_len=4, sep_token="<s>", by="src"
        )
        got = sharded_map(read_packed_shards(spark, root))
        assert got == batch_reference_by(spark, seen, 4)
    # final carries == batch tails per shard
    carries = read_pack_carries(spark, root)
    ref_all = batch_reference_by(spark, seen, 4, full_only=False)
    for shard in {d[1] for d in DOCS_BY}:
        total = sum(len(t) + 1 for _, s, t in DOCS_BY if s == shard)
        seq0, rem = carries[shard]
        assert seq0 == total // 4 and len(rem) == total % 4
        if rem:
            assert ref_all[(shard, seq0)] == (tuple(rem), len(rem))


def test_sharded_carry_forward_untouched_shards(spark, tmp_path):
    """A trigger containing only shard-y docs must carry shard-x's
    state forward unchanged (the O(1) newest-dir fast path depends on
    the full live carry set being in every commit)."""
    from v3_polars_spark.streaming import read_pack_carries
    from v3_polars_spark.streaming.pack_stream import token_pack_batch_fn

    root = str(tmp_path / "pack")
    fn = token_pack_batch_fn(
        spark, root, max_len=3, sep_token=None, by="src"
    )
    fn(spark.createDataFrame(DOCS_BY[:1], SCHEMA_BY), 0)  # only shard x
    cx = read_pack_carries(spark, root)["x"]
    fn(spark.createDataFrame(DOCS_BY[1:2], SCHEMA_BY), 1)  # only shard y
    after = read_pack_carries(spark, root)
    assert after["x"] == cx
    assert after["y"] == (1, ["g", "h"])  # 5 tokens, max_len 3
    # exactly-once: replaying batch 1 changes nothing
    before = sharded_map(read_packed_shards(spark, root))
    fn(spark.createDataFrame(DOCS_BY[1:2], SCHEMA_BY), 1)
    assert sharded_map(read_packed_shards(spark, root)) == before
    assert read_pack_carries(spark, root) == after


def test_sharded_compaction_preserves_per_shard_carries(spark, tmp_path):
    from v3_polars_spark.streaming import read_pack_carries
    from v3_polars_spark.streaming.pack_stream import token_pack_batch_fn

    root = str(tmp_path / "pack")
    fn = token_pack_batch_fn(spark, root, max_len=3, sep_token="<s>", by="src")
    for i, wave in enumerate([DOCS_BY[:3], DOCS_BY[3:6], DOCS_BY[6:]]):
        fn(spark.createDataFrame(wave, SCHEMA_BY), i)
    before_shards = sharded_map(read_packed_shards(spark, root))
    before_carries = read_pack_carries(spark, root)
    compact_packed_shards(spark, root, exclude_newest=True)
    assert sharded_map(read_packed_shards(spark, root)) == before_shards
    assert read_pack_carries(spark, root) == before_carries
    # full compaction of a quiesced drain: fallback per-shard recovery
    compact_packed_shards(spark, root, exclude_newest=False)
    assert sharded_map(read_packed_shards(spark, root)) == before_shards
    assert read_pack_carries(spark, root) == before_carries
    # drain continues from the compacted store
    extra = [(8, "y", ["z", "z", "z", "z"])]
    fn(spark.createDataFrame(extra, SCHEMA_BY), 3)
    got = sharded_map(read_packed_shards(spark, root))
    ref = batch_reference_by(spark, DOCS_BY + extra, 3)
    assert got == ref


def test_sharded_empty_batch_and_empty_store(spark, tmp_path):
    from v3_polars_spark.streaming import read_pack_carries
    from v3_polars_spark.streaming.pack_stream import token_pack_batch_fn

    root = str(tmp_path / "pack")
    assert read_pack_carries(spark, root) == {}
    assert read_packed_shards(spark, root, sharded=True).columns == [
        "shard", "seq", "tokens", "n_tokens",
    ]
    fn = token_pack_batch_fn(spark, root, max_len=3, sep_token=None, by="src")
    fn(spark.createDataFrame([], SCHEMA_BY), 0)  # empty first trigger
    assert read_pack_carries(spark, root) == {}
    fn(spark.createDataFrame(DOCS_BY[:1], SCHEMA_BY), 1)
    fn(spark.createDataFrame([], SCHEMA_BY), 2)  # empty mid-drain
    assert read_pack_carries(spark, root) == {"x": (1, [])}
