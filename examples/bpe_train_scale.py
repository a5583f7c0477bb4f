"""BPE training cost curve at realistic vocabulary scale.

Round-9 shipped a trainer only ever driven at ~5k distinct words and
small merge counts; a production tokenizer is 32k merges over millions
of distinct words. This script measures exactly that claim on a
>=1.2M-distinct-word synthetic corpus:

- **sequential** (``bpe_train``): one pair-count job + 1-row argmax
  collect PER MERGE — measured at small merge counts and extrapolated
  (the per-merge cost is flat by design: every step is the same agg
  over the same-sized symbol table), demonstrating why 32k sequential
  driver round-trips is the wrong shape;
- **batched** (``bpe_train_batched``, batch_k=256): one pair-count job
  + one top-N collect + one combined-pass rewrite per ROUND of up to
  256 mutually disjoint merges — measured END-TO-END at 1k/8k/32k
  merges;
- **agreement**: fraction of the sequential table's merges present in
  the batched table at equal merge count (selection is the documented
  batched approximation; application is exact either way).

Corpus: 1.2M distinct 4-syllable words (50-syllable alphabet => heavy
substring sharing, the structure BPE exists for) with Zipf-ish counts
floor(3e6 / (id+1)), passed as a precomputed ``words_df`` — the 100 TB
posture where the (word, wcount) table is built once by the pipeline
and the trainer never rescans text.

Usage::

    python examples/bpe_train_scale.py [out_json=/tmp/bpe_train_scale.json]

Writes one JSON object with per-point wall seconds; paste the table
into BENCH_NOTES.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bpe_train_scale.json"

N_WORDS = 1_200_000
SYLLABLES = [
    "ba", "be", "bi", "bo", "bu", "ca", "ce", "ci", "co", "cu",
    "da", "de", "di", "do", "du", "fa", "fe", "fi", "fo", "fu",
    "ga", "ge", "gi", "go", "gu", "ka", "ke", "ki", "ko", "ku",
    "la", "le", "li", "lo", "lu", "ma", "me", "mi", "mo", "mu",
    "na", "ne", "ni", "no", "nu", "ra", "re", "ri", "ro", "rya",
]


def make_words_df(spark):
    from pyspark.sql import functions as F

    syl = F.array(*[F.lit(s) for s in SYLLABLES])
    ids = spark.range(N_WORDS)
    k = len(SYLLABLES)
    word = F.concat(
        F.element_at(syl, (F.col("id") % k + 1).cast("int")),
        F.element_at(syl, ((F.col("id") / k) % k + 1).cast("int")),
        F.element_at(syl, ((F.col("id") / (k * k)) % k + 1).cast("int")),
        F.element_at(syl, ((F.col("id") / (k * k * k)) % k + 1).cast("int")),
    )
    wcount = F.greatest(
        F.lit(2), F.floor(F.lit(3_000_000) / (F.col("id") + 1))
    ).cast("long")
    return ids.select(word.alias("word"), wcount.alias("wcount"))


def main() -> None:
    from v3_polars_spark.datapipe.bpe import (
        bpe_train,
        bpe_train_batched,
        validate_merges,
    )
    from v3_polars_spark.session import get_spark, quiet_expected_jvm_warnings

    spark = get_spark(app_name="bpe-train-scale")
    quiet_expected_jvm_warnings(spark)
    words = make_words_df(spark).persist()
    n_distinct = words.count()
    print(f"distinct words: {n_distinct}", flush=True)
    results: dict = {"n_distinct_words": n_distinct, "batch_k": 256}

    # -- sequential cost curve (small points; per-merge cost is flat) --
    seq_tables: dict[int, list] = {}
    for m in (64, 256):
        t0 = time.perf_counter()
        seq_tables[m] = bpe_train(None, m, words_df=words)
        dt = time.perf_counter() - t0
        results[f"sequential_{m}_sec"] = round(dt, 1)
        results[f"sequential_{m}_sec_per_merge"] = round(dt / m, 3)
        print(f"sequential {m} merges: {dt:.1f}s ({dt/m:.3f} s/merge)",
              flush=True)
    per_merge = results["sequential_256_sec_per_merge"]
    results["sequential_32768_extrapolated_hours"] = round(
        per_merge * 32768 / 3600, 2
    )

    # -- batched end-to-end at 1k / 8k / 32k merges --
    batched_tables: dict[int, list] = {}
    for m in (1024, 8192, 32768):
        t0 = time.perf_counter()
        tab = bpe_train_batched(
            None, m, batch_k=256, words_df=words, materialize_every=8
        )
        dt = time.perf_counter() - t0
        validate_merges(tab)
        batched_tables[m] = tab
        results[f"batched_{m}_sec"] = round(dt, 1)
        results[f"batched_{m}_merges_learned"] = len(tab)
        results[f"batched_{m}_sec_per_merge"] = round(dt / max(len(tab), 1), 4)
        print(
            f"batched {m}: {dt:.1f}s, learned {len(tab)} "
            f"({dt/max(len(tab),1)*1000:.1f} ms/merge)",
            flush=True,
        )

    # -- agreement vs sequential at 256 merges (selection approximation) --
    seq256 = set(map(tuple, seq_tables[256]))
    bat_prefix = set(map(tuple, batched_tables[1024][:256]))
    results["agreement_first256"] = round(
        len(seq256 & bat_prefix) / 256, 4
    )
    print(f"agreement vs sequential @256: {results['agreement_first256']}",
          flush=True)

    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
