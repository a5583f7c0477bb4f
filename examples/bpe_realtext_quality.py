"""Batched-BPE quality on a REAL-SHAPE text distribution (VERDICT r10 #4).

The round-10 cost curve (52 min / 32k merges, ~57x over sequential) and
its quality wash were measured on a synthetic 4-syllable corpus built to
MAXIMIZE merge cascades — the adversarial case for batched selection.
This harness re-measures quality where it matters: the span corpus's
word distribution (``examples/make_spanned_sf1.py``), which is the
closest real-web-text shape in the testdata family — a Zipf head of
natural words, a heavy unique tail (replica uniquifier tokens — exactly
the role typos/ids/URLs play in web text), and the hostile-Unicode packs
(NBSP/FS inside words, combining marks, astral-plane chars, CJK-prefixed
merge-collision words) in ~20% of documents.

Protocol: deterministic doc sample (``new_id % sample_mod == 0``), ONE
``word_counts`` table reused by every trainer (the 100 TB posture), then

- sequential Sennrich (:func:`bpe_train`) at ``n_merges`` — the quality
  anchor;
- batched k=64, k=256, and the default ``batch_k='auto'`` policy;

and for each table: tokens/word over the sampled corpus (occurrence-
weighted, driver-side :func:`encode_word_py` priority-loop encode — the
kernel-path semantics), merge-set overlap and longest common prefix vs
sequential. Prints one JSON line; the committed numbers live in
BENCH_NOTES ("Batched BPE on the real-shape corpus").

Usage::

    python examples/bpe_realtext_quality.py [sf_dir=/tmp/sf1span] \
        [sample_mod=50] [n_merges=1000]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from v3_polars_spark.session import get_spark  # noqa: E402
from v3_polars_spark.datapipe.bpe import (  # noqa: E402
    bpe_train,
    bpe_train_batched,
    encode_word_py,
    validate_merges,
    word_counts,
)


def tokens_per_word(words: list[tuple[str, int]], merges) -> float:
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    toks = 0
    occ = 0
    for w, c in words:
        toks += len(encode_word_py(w, ranks)) * c
        occ += c
    return toks / occ


def common_prefix_len(a, b) -> int:
    n = 0
    for x, y in zip(a, b):
        if x != y:
            break
        n += 1
    return n


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1span"
    sample_mod = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    n_merges = int(sys.argv[3]) if len(sys.argv) > 3 else 1000

    spark = get_spark(app_name="bpe-realtext-quality")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    sample = docs.filter(F.col("doc_id") % sample_mod == 0)
    wdf = word_counts(sample, "text").persist()
    n_distinct = wdf.count()
    n_occ = wdf.agg(F.sum("wcount")).collect()[0][0]
    print(f"sample: {n_distinct} distinct words, {n_occ} occurrences", flush=True)

    # collected once for the driver-side quality metric (distinct words
    # only — the sampled table, not the corpus)
    words = [(r.word, int(r.wcount)) for r in wdf.collect()]

    results = {}
    tables = {}
    t0 = time.time()
    tables["sequential"] = bpe_train(None, n_merges, words_df=wdf)
    results["sequential_sec"] = round(time.time() - t0, 1)
    for label, k in (("k64", 64), ("k256", 256), ("auto", "auto")):
        t0 = time.time()
        tables[label] = bpe_train_batched(
            None, n_merges, batch_k=k, words_df=wdf
        )
        results[f"{label}_sec"] = round(time.time() - t0, 1)

    seq = tables["sequential"]
    for label, tab in tables.items():
        validate_merges(tab)
        results[f"{label}_n_merges"] = len(tab)
        results[f"{label}_tokens_per_word"] = round(
            tokens_per_word(words, tab), 5
        )
        if label != "sequential":
            results[f"{label}_prefix_vs_seq"] = common_prefix_len(seq, tab)
            results[f"{label}_overlap_vs_seq"] = len(
                set(map(tuple, seq)) & set(map(tuple, tab))
            )
    out = {
        "sf_dir": sf_dir,
        "sample_mod": sample_mod,
        "n_merges": n_merges,
        "n_distinct_words": n_distinct,
        "n_word_occurrences": int(n_occ),
        **results,
    }
    print(json.dumps(out))
    wdf.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
