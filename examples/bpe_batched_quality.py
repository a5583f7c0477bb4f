"""Vocabulary QUALITY of batched vs sequential BPE training.

`bpe_train_batched` trades merge-selection fidelity for wall clock
(examples/bpe_train_scale.py: 50 h extrapolated sequential vs 52 min
batched at 32k merges). Set-agreement with sequential Sennrich is the
wrong quality metric on cascade-heavy corpora — what a tokenizer is FOR
is compression, so this script measures the metric that matters:
**weighted tokens/word** on the corpus (sum over distinct words of
wcount * len(encode(word)) / sum wcount), for the sequential 256-merge
table and batched tables at batch_k in {16, 64, 256}, plus the
merge-set agreement for context.

Expected shape: tokens/word nearly identical across k (the batch picks
the same high-mass pairs, just in a different interleaving), agreement
rising as k shrinks, k=1 identical by construction (pinned in pytest).

    python examples/bpe_batched_quality.py [out_json=/tmp/bpe_quality.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bpe_quality.json"
N_MERGES = 256


def main() -> None:
    from pyspark.sql import functions as F

    from bpe_train_scale import make_words_df  # same corpus, same seed-free build
    from v3_polars_spark.datapipe.bpe import (
        bpe_encode_kernel,
        bpe_train,
        bpe_train_batched,
    )
    from v3_polars_spark.session import get_spark, quiet_expected_jvm_warnings

    sys.path.insert(0, os.path.join(REPO, "examples"))
    spark = get_spark(app_name="bpe-batched-quality")
    quiet_expected_jvm_warnings(spark)
    words = make_words_df(spark).persist()
    words.count()

    def tokens_per_word(merges) -> float:
        enc = bpe_encode_kernel(words, merges, text_col="word", out_col="t")
        row = enc.agg(
            (
                F.sum(F.size("t") * F.col("wcount")) / F.sum("wcount")
            ).alias("tpw")
        ).collect()[0]
        return float(row.tpw)

    out: dict = {"n_merges": N_MERGES}
    t0 = time.perf_counter()
    seq = bpe_train(None, N_MERGES, words_df=words)
    out["sequential_sec"] = round(time.perf_counter() - t0, 1)
    out["sequential_tokens_per_word"] = round(tokens_per_word(seq), 4)
    base = tokens_per_word([])
    out["unmerged_tokens_per_word"] = round(base, 4)
    print(f"sequential: {out}", flush=True)

    seq_set = set(map(tuple, seq))
    for k in (16, 64, 256):
        t0 = time.perf_counter()
        bat = bpe_train_batched(None, N_MERGES, batch_k=k, words_df=words)
        sec = round(time.perf_counter() - t0, 1)
        tpw = round(tokens_per_word(bat), 4)
        agree = round(len(seq_set & set(map(tuple, bat))) / N_MERGES, 4)
        out[f"batched_k{k}"] = {
            "sec": sec, "tokens_per_word": tpw, "merge_set_agreement": agree,
        }
        print(f"batched k={k}: {out[f'batched_k{k}']}", flush=True)

    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
