"""Generate the adversarial SPAN-structured sf1 scale point at /tmp/sf1span.

/tmp/sf1 and /tmp/sf1z duplicate WHOLE documents — the regime where
exact-duplicate collapse carries the dedup families. Substring-level
dedup (`datapipe.dedup.dedup_substrings`, query `dp_substring_dedup`)
exists for the regime collapse can't touch: every document is UNIQUE at
whole-doc level, but shared boilerplate SPANS repeat across the corpus
with Zipf frequencies. This layout builds that regime at sf1 scale
(500 k docs):

- each sf0.1 base doc is replicated 100x, and every replica's body is
  made globally unique by interleaving a replica-specific token before
  every 4th body token — no 8 consecutive body tokens repeat anywhere,
  so at the driver query's k=8 NO body window is a duplicate, and
  whole-doc collapse finds nothing to collapse;
- 0-3 boilerplate spans (12 fixed tokens each, from a 100 000-span pool)
  are injected mid-doc, pool ranks drawn log-uniformly (frequency ~
  1/rank, Zipf s=1): the head span lands in tens of thousands of docs
  while thousands of deep-tail ranks appear exactly ONCE — a
  single-occurrence span's windows are not duplicated, so the operator
  must KEEP it (the pool is sized so singletons exist: ~375 k draws over
  100 k log-uniform ranks leaves the tail below one expected hit);
- docs with >= 2 spans inject them ADJACENT, so windows crossing the
  junction are duplicated exactly when the same ordered (a, b) pair
  repeats corpus-wide — overlapping covered regions that stress the
  k-fold cover explode + (id, idx) distinct.

Round 10 adds a HOSTILE-UNICODE pack for the tokenizer/pack family
(dp_bpe_pairs/encode, dp_token_shards, stream_token_shards[_by]): every
doc with ``new_id % 5 == 2`` (~20% of the corpus, ~100 k docs) gets six
adversarial tokens spliced in near the head —

- ``par<NBSP>er`` / ``s<FS>can``: NON-ASCII whitespace INSIDE a word
  (U+00A0, U+001C — Java/RE2 ``\\s`` must NOT split these; the exact
  regression class the round-10 kernel-normalization fix closed),
- ``e<COMBINING ACUTE>r``: decomposed combining mark (both engines
  split by code point — verified, pinned in tests),
- ``<MUSICAL SYMBOL G CLEF>ar``: astral-plane (surrogate-pair) symbol,
- ``scan`` / ``中文er``: merge-collision words — ``scan`` chains 3 of
  the frozen _BPE_MERGES ranks; CJK prefix on a merge suffix.

The pack is 6 tokens (< the k=8 substring-dedup window), so it never
forms a full duplicate window by itself and the span-family semantics
above are unchanged.

All draws are modular-arithmetic functions of the new doc_id — no RNG —
so regeneration is byte-identical. Other tables are copied from sf0.1
(oracle_check needs the views; the span families don't read them).

Usage::

    python examples/make_spanned_sf1.py [dst=/tmp/sf1span] [src=/root/testdata/sf0.1]
    SPARK_GRAFT_SELF_OUT=CORRECTNESS_SF1SPAN.json \\
        python tests/oracle_check.py /tmp/sf1span dp_substring_dedup \\
            dp_bpe_pairs dp_bpe_encode dp_token_shards \\
            stream_token_shards stream_token_shards_by
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

REPL = 100          # replicas per base doc (~500 k total)
POOL = 100_000      # boilerplate pool size (tail ranks are singletons)
BP_TOKENS = 12      # tokens per boilerplate span (> k=8 driver window)
MIX = 2654435761    # Knuth multiplicative hash constant
ID_SHIFT = 10_000_000


def main() -> None:
    dst = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1span"
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    def zipf_rank(j: int) -> str:
        # log-uniform rank in [1, POOL]: frequency ~ 1/rank (Zipf s=1)
        u = f"(((new_id * {MIX} + {j * 97}) % 1048576) / 1048576.0)"
        return f"CAST(least({POOL}, 1 + floor(power({POOL}.0, {u}))) AS INT)"

    def bp(rank_expr: str) -> str:
        return f"[concat('b', {rank_expr}, 'w', j) for j in range(0, {BP_TOKENS})]"

    con.execute(
        f"""
        COPY (
        WITH rep AS (
            SELECT doc_id + u.k * {ID_SHIFT} AS new_id, text, lang, source
            FROM read_parquet('{src}/documents.parquet'),
                 LATERAL (SELECT unnest(range({REPL})) AS k) u
        ),
        toks AS (
            SELECT new_id, lang, source,
                   list_filter(string_split_regex(text, '\\s+'),
                               t -> t <> '') AS t0
            FROM rep
        ),
        -- body uniqueness: a replica-specific token before every 4th body
        -- token => max run of shared body tokens is 4 < k=8
        mut AS (
            SELECT new_id, lang, source,
                   flatten([CASE WHEN (i - 1) % 4 = 0
                                 THEN [concat('u', new_id, 'x', i), t0[i]]
                                 ELSE [t0[i]] END
                            for i in range(1, len(t0) + 1)]) AS t1
            FROM toks
        ),
        spans AS (
            SELECT *, new_id % 4 AS nbp,
                   greatest(2, len(t1) // 3) AS p,
                   greatest(3, (2 * len(t1)) // 3) AS q,
                   {zipf_rank(0)} AS r1, {zipf_rank(1)} AS r2,
                   {zipf_rank(2)} AS r3
            FROM mut
        ),
        asm0 AS (
            SELECT new_id, lang, source,
                   CASE nbp
                     WHEN 0 THEN t1
                     WHEN 1 THEN t1[1:p] || {bp("r1")} || t1[p+1:len(t1)]
                     WHEN 2 THEN t1[1:p] || {bp("r1")} || {bp("r2")}
                                 || t1[p+1:len(t1)]
                     ELSE t1[1:p] || {bp("r1")} || {bp("r2")}
                          || t1[p+1:q] || {bp("r3")} || t1[q+1:len(t1)]
                   END AS t2
            FROM spans
        ),
        -- hostile-Unicode pack (6 tokens < k=8: never a duplicate
        -- window by itself): NBSP/FS inside words, decomposed combining
        -- mark, astral-plane char, merge-collision words
        asm AS (
            SELECT new_id, lang, source,
                   CASE WHEN new_id % 5 = 2
                        THEN t2[1:1]
                             || ['par' || chr(160) || 'er',
                                 's' || chr(28) || 'can',
                                 'e' || chr(769) || 'r',
                                 chr(119070) || 'ar',
                                 'scan',
                                 chr(20013) || chr(25991) || 'er']
                             || t2[2:len(t2)]
                        ELSE t2
                   END AS t2
            FROM asm0
        )
        SELECT new_id AS doc_id,
               array_to_string(t2, ' ') AS text,
               lang, source,
               CAST(length(array_to_string(t2, ' ')) AS BIGINT) AS n_chars
        FROM asm
        ) TO '{dst}/documents.parquet' (FORMAT PARQUET)
        """
    )
    n, nd = con.execute(
        f"SELECT count(*), count(DISTINCT md5(text)) "
        f"FROM read_parquet('{dst}/documents.parquet')"
    ).fetchone()
    print(f"documents: {n} rows, {nd} distinct texts (must be equal)", flush=True)
    assert n == nd, "span corpus must have NO whole-doc duplicates"

    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "embeddings"]:
        shutil.copyfile(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
    print(f"done -> {dst}", flush=True)


if __name__ == "__main__":
    main()
