"""The composed pretraining pipeline (quality → exact dedup → keep-best
near dedup → BPE encode → packed shards) equals the SAME operators run
one stage at a time — in both execution modes.

Why this pin exists (VERDICT r11 #5): every stage ships and is oracle-
checked separately; an adopter's first move is to chain them. The chain
must not depend on materialization barriers between stages (batch mode:
one lazy plan == staged parquet round-trips), and the streaming drain's
incremental state composition must reproduce the direct functions'
staged arithmetic (dedup hop) and the batch packer's layout (pack hop).

Semantics note pinned here too: batch `dedup_near_best` clusters
GLOBALLY and keeps the best doc per cluster; the streaming drain keeps
first-seen vs the corpus so far. The streaming assertions therefore
compare against a staged INCREMENTAL replay (dedup_exact +
dedup_against + dedup_near + dedup_against_near per segment), not
against the batch composition.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

# deterministic but minutes-long (full dedup + streaming drains at
# sf0.001): slow tier, like the other streaming composition families
pytestmark = pytest.mark.slow

from v3_polars_spark.datapipe import (
    bpe_encode,
    dedup_against,
    dedup_against_near,
    dedup_exact,
    dedup_near,
    dedup_near_best,
    language_id,
    pack_sequences,
    quality_score,
)

DEDUP = dict(n=3, num_hashes=16, bands=4, verify_threshold=0.05)
MERGES = [
    ("t", "h"), ("th", "e</w>"), ("a", "n"), ("i", "n"), ("o", "n</w>"),
    ("e", "r"), ("an", "d</w>"), ("in", "g</w>"), ("o", "u"), ("s", "t"),
]
MAX_LEN = 32


def quality_keep(df):
    scored = quality_score(language_id(df))
    return scored.filter(
        F.col("lang_pred").isin("en", "de", "fr", "es")
        & (F.col("n_words") >= 10)
        & (F.col("quality") >= 0.5)
    ).select(*df.columns)


def rows(df, *order):
    return [tuple(r) for r in df.orderBy(*order).collect()]


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id", "text", "n_chars")
        .cache()
    )


def test_batch_composition_equals_staged(spark, docs, tmp_path):
    """ONE lazy plan over all six stages == each stage materialized to
    parquet and re-read before the next (no hidden dependence on
    materialization barriers, caching, or recomputation)."""
    composed = pack_sequences(
        bpe_encode(
            dedup_near_best(
                dedup_exact(quality_keep(docs)), "n_chars", **DEDUP
            ).select("doc_id", "text"),
            MERGES,
        ),
        "bpe_tokens",
        ["doc_id"],
        max_len=MAX_LEN,
        sep_token="</doc>",
    )

    def checkpoint(df, name):
        p = str(tmp_path / name)
        df.write.parquet(p)
        return spark.read.parquet(p)

    staged = checkpoint(quality_keep(docs), "q")
    staged = checkpoint(dedup_exact(staged), "x")
    staged = checkpoint(
        dedup_near_best(staged, "n_chars", **DEDUP), "n"
    )
    staged = checkpoint(
        bpe_encode(staged.select("doc_id", "text"), MERGES), "e"
    )
    staged = pack_sequences(
        staged, "bpe_tokens", ["doc_id"], max_len=MAX_LEN, sep_token="</doc>"
    )

    got = rows(composed.select("seq", "tokens", "n_tokens"), "seq")
    want = rows(staged.select("seq", "tokens", "n_tokens"), "seq")
    assert got == want and len(got) > 0


def _segments(docs, n_segments):
    ids = [r[0] for r in docs.select("doc_id").orderBy("doc_id").collect()]
    step = max(1, (len(ids) + n_segments - 1) // n_segments)
    bounds = [ids[i] for i in range(0, len(ids), step)] + [ids[-1] + 1]
    return [
        docs.filter(
            (F.col("doc_id") >= bounds[i]) & (F.col("doc_id") < bounds[i + 1])
        )
        for i in range(len(bounds) - 1)
    ]


def test_streaming_composition_equals_staged(spark, docs, tmp_path):
    """The chained streaming drain (quality filter in-stream →
    streaming_corpus_dedup → packer stream tailing the corpus dirs) ==
    the staged direct-function replay of the same incremental
    semantics, segment by segment."""
    from v3_polars_spark.streaming import (
        read_corpus,
        read_pack_carry,
        read_packed_shards,
        seed_corpus,
        streaming_corpus_dedup,
        streaming_token_shards,
    )

    n_segments = 3
    segs = _segments(docs, n_segments)
    crawl = str(tmp_path / "crawl")
    for i, seg in enumerate(segs[1:], start=1):
        seg.coalesce(1).write.parquet(os.path.join(crawl, f"seg={i}"))

    corpus = str(tmp_path / "corpus")
    seed = dedup_near(dedup_exact(quality_keep(segs[0])), **DEDUP)
    seed_corpus(
        seed, corpus, n=DEDUP["n"], num_hashes=DEDUP["num_hashes"],
        bands=DEDUP["bands"],
    )

    stream = quality_keep(
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(crawl, "seg=*"))
    )
    streaming_corpus_dedup(
        stream, corpus, str(tmp_path / "ckpt_dedup"),
        near=True, near_self=True, **DEDUP,
    )

    # staged incremental replay with the direct functions
    corpus_sofar = seed.select("doc_id", "text", "n_chars")
    expected = [corpus_sofar]
    for seg in segs[1:]:
        batch = dedup_near(dedup_exact(quality_keep(seg)), **DEDUP)
        batch = dedup_against(batch, corpus_sofar)
        batch = dedup_against_near(
            batch, corpus_sofar, **DEDUP
        ).select("doc_id", "text", "n_chars")
        expected.append(batch)
        corpus_sofar = corpus_sofar.unionByName(batch)

    got_corpus = read_corpus(spark, corpus).select(
        "doc_id", "text", "n_chars"
    )
    want_corpus = expected[0]
    for e in expected[1:]:
        want_corpus = want_corpus.unionByName(e)
    assert rows(got_corpus, "doc_id") == rows(want_corpus, "doc_id")

    # hop 2: packer stream tails the corpus batch dirs. Segments are
    # contiguous ascending doc_id ranges and dedup only drops rows, so
    # arrival order (trigger timestamp order, doc_id within trigger) ==
    # global doc_id order — compare with the batch pack_sequences over
    # doc_id order directly.
    pack_root = str(tmp_path / "packed")
    enc_stream = bpe_encode(
        spark.readStream.schema(got_corpus.schema).parquet(
            os.path.join(corpus, "docs", "batch=*")
        ),
        MERGES,
    )
    streaming_token_shards(
        enc_stream, pack_root, str(tmp_path / "ckpt_pack"),
        max_len=MAX_LEN, sep_token="</doc>",
    )

    enc_batch = bpe_encode(got_corpus.select("doc_id", "text"), MERGES)
    want_shards = pack_sequences(
        enc_batch, "bpe_tokens", ["doc_id"],
        max_len=MAX_LEN, sep_token="</doc>",
    )

    got_full = rows(
        read_packed_shards(spark, pack_root).select(
            "seq", "tokens", "n_tokens"
        ),
        "seq",
    )
    seq0, carry = read_pack_carry(spark, pack_root)
    want_all = rows(want_shards.select("seq", "tokens", "n_tokens"), "seq")
    if carry:
        # the staged batch pack emits the ragged tail as its last row;
        # the stream holds it as carry state instead
        *want_full, want_tail = want_all
        assert (seq0, carry, len(carry)) == want_tail
    else:
        want_full = want_all
    assert got_full == want_full and len(got_full) > 0
