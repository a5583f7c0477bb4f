"""Byte-pair-encoding tokenizer: distributed training + pure-expression encode.

Beyond-reference training-data-pipeline surface (the reference stops at
token *counting* — ``/root/reference/v3/helpers/`` has no tokenizer).
This module implements the classic BPE algorithm (Sennrich, Haddow &
Birch 2016, "Neural Machine Translation of Rare Words with Subword
Units", ACL) Spark-first:

- **Training** iterates on the *distinct-word* frequency table, never
  the corpus: one hash aggregation collapses the corpus to
  ``(word, count)`` rows (size = vocabulary, orders of magnitude below
  corpus size at 100 TB), and every merge step is a single pair-count
  aggregation over that cached table plus a 1-row argmax collect. The
  token arrays are rewritten in place by a JVM-side fold expression;
  lineage is truncated by a tiny parquet round-trip every
  ``materialize_every`` merges so the plan never grows unboundedly.
  For corpora whose raw text is too large even to hash-aggregate
  comfortably, pass a pre-sampled frame (``sampling.sample_fraction``
  is shuffle-free) — sampling the *training* corpus is standard
  practice (SentencePiece does the same) and does not affect encode.

- **Encoding** applies the learned merges **in rank order** — for
  BPE this is equivalent to the lowest-rank-first priority loop,
  because once merge *k* is processed every earlier merge is already
  fully applied (Sennrich's reference implementation applies merges
  the same way). Each merge is one greedy left-to-right pass,
  expressed as an ``F.aggregate`` fold over the token array:

      acc[-1] = a AND x = b  ->  replace acc tail with ab
      otherwise              ->  append x

  For merge lists up to ``expr_max_merges`` the WHOLE encode is a
  nested column expression — no Python in the plan, no shuffle, scan
  speed — and the identical fold replays in DuckDB via ``list_reduce``
  (``bpe_encode_sql``), which is what makes the operator
  oracle-checkable end-to-end. Longer merge lists switch to an
  Arrow-batched ``mapInPandas`` kernel with per-word memoization
  (the documented vectorized escape hatch; parity-pinned in tests).

Symbol conventions: words are whitespace tokens of the normalized text
(lowercase, collapsed whitespace — the same normalization every other
text operator here uses); a word's initial symbols are its characters
with the end-of-word marker ``</w>`` appended to the LAST character
(``low -> [l, o, w</w>]``), so word-final and word-internal units are
distinct — the Sennrich convention.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from typing import Iterable, Iterator, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .text import normalize_text

EOW = "</w>"

__all__ = [
    "EOW",
    "bpe_encode",
    "bpe_encode_kernel",
    "bpe_encode_sql",
    "bpe_pair_counts",
    "bpe_train",
    "bpe_train_batched",
    "encode_word_py",
    "load_merges",
    "merge_fold",
    "merge_fold_multi",
    "save_merges",
    "token_id_map",
    "validate_merges",
    "word_counts",
    "word_symbols",
]


# --------------------------------------------------------------------------
# column-expression building blocks (JVM-side, shared by train + encode)
# --------------------------------------------------------------------------


def word_symbols(word: Column) -> Column:
    """Initial BPE symbols of one word: characters, with ``</w>``
    appended to the last one. ``low -> [l, o, w</w>]``.

    Defensive: ``F.split(word, '')`` on the pinned Spark emits no
    trailing empty element, but Java ``Pattern.split`` has produced a
    trailing ``''`` on other versions — filter empties so a Spark
    upgrade can't silently turn the last symbol into a bare ``</w>``
    (also pinned loudly by the canary test in test_bpe)."""
    cs = F.filter(F.split(word, ""), lambda c: c != F.lit(""))
    return F.when(
        F.size(cs) <= 1, F.array(F.concat(word, F.lit(EOW)))
    ).otherwise(
        F.concat(
            F.slice(cs, F.lit(1), F.size(cs) - 1),
            F.array(F.concat(F.element_at(cs, -1), F.lit(EOW))),
        )
    )


def merge_fold(col: Column, a: str, b: str) -> Column:
    """One BPE merge ``(a, b) -> ab`` as a greedy left-to-right fold
    over a token array. Pure Catalyst expression (ArrayAggregate)."""

    def step(acc: Column, x: Column) -> Column:
        return F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(F.lit(a + b))
            ),
        ).otherwise(F.concat(acc, F.array(x)))

    return F.aggregate(col, F.expr("cast(array() as array<string>)"), step)


def _apply_merges(col: Column, merges: Sequence[tuple[str, str]]) -> Column:
    for a, b in merges:
        col = merge_fold(col, a, b)
    return col


def merge_fold_multi(col: Column, batch: Sequence[tuple[str, str]]) -> Column:
    """Apply a MUTUALLY-DISJOINT merge batch in ONE greedy left-to-right
    pass (a single ArrayAggregate regardless of batch size — constant
    expression depth, unlike one nested fold per merge).

    Disjointness contract (what :func:`bpe_train_batched` admits): no
    two batch pairs share an operand symbol, and no pair's operand
    equals another pair's concatenation. Under it, one combined pass is
    exactly equivalent to applying the batch's folds sequentially in
    any order: a merged tail symbol ``ab`` can never be the left
    operand of another batch pair, and no batch merge can create or
    destroy occurrences of another.

    Lookup is a literal map keyed by the LENGTH-PREFIXED pair
    ``"len(a):a+b"`` — unambiguous even when symbols contain ``:`` or
    each other (the prefix fixes where ``a`` ends). ``try_element_at``
    keeps absent keys (and the NULL key from an empty accumulator)
    NULL instead of an ANSI error."""
    entries: list[Column] = []
    for a, b in batch:
        entries.append(F.lit(f"{len(a)}:{a}{b}"))
        entries.append(F.lit(a + b))
    m = F.create_map(*entries)

    def step(acc: Column, x: Column) -> Column:
        last = F.element_at(acc, -1)
        key = F.concat(F.length(last).cast("string"), F.lit(":"), last, x)
        hit = F.try_element_at(m, key)
        return F.when(
            (F.size(acc) > 0) & hit.isNotNull(),
            F.concat(F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(hit)),
        ).otherwise(F.concat(acc, F.array(x)))

    return F.aggregate(col, F.expr("cast(array() as array<string>)"), step)


def _words(text: Column) -> Column:
    return F.filter(
        F.split(normalize_text(text), " "), lambda w: w != F.lit("")
    )


def _sym_pairs(syms: Column) -> Column:
    """Adjacent symbol pairs of one token array as structs (a, b).
    Guarded: ``F.sequence(1, 0)`` would DESCEND, so single-symbol
    arrays short-circuit to an empty pair list."""
    return F.when(
        F.size(syms) > 1,
        F.transform(
            F.sequence(F.lit(1), F.size(syms) - 1),
            lambda i: F.struct(
                F.element_at(syms, i).alias("a"),
                F.element_at(syms, i + 1).alias("b"),
            ),
        ),
    ).otherwise(F.expr("cast(array() as array<struct<a:string,b:string>>)"))


# --------------------------------------------------------------------------
# training
# --------------------------------------------------------------------------


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct-word frequency table ``(word, wcount)`` — the working
    set every training step operates on (vocabulary-sized, not
    corpus-sized)."""
    return (
        df.select(F.explode(_words(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wcount"))
    )


def bpe_pair_counts(
    df: DataFrame,
    text_col: str = "text",
    merges: Sequence[tuple[str, str]] = (),
) -> DataFrame:
    """Corpus-wide adjacent-pair frequencies ``(a, b, pair_count)``
    after applying ``merges`` (empty = the character-level statistics
    that seed training). One word-count aggregation + one pair
    aggregation; the pair explode runs over the distinct-word table."""
    wc = word_counts(df, text_col)
    syms = _apply_merges(word_symbols(F.col("word")), list(merges))
    pairs = wc.select(
        F.col("wcount"), F.explode(_sym_pairs(syms)).alias("p")
    )
    return pairs.groupBy(
        F.col("p.a").alias("a"), F.col("p.b").alias("b")
    ).agg(F.sum("wcount").alias("pair_count"))


def _symbol_table(
    df: DataFrame | None, text_col: str, words_df: DataFrame | None
) -> DataFrame:
    """The trainer's working set ``(syms, wcount)``. ``words_df`` — a
    precomputed ``(word, wcount)`` frame — short-circuits the corpus
    aggregation: at 100 TB the word-count table is built ONCE (or
    incrementally by the ingest pipeline) and reused across training
    runs, so the trainer never rescans raw text."""
    if words_df is None:
        if df is None:
            raise ValueError("pass a corpus df or a words_df")
        words_df = word_counts(df, text_col)
    return words_df.select(
        word_symbols(F.col("word")).alias("syms"),
        F.col("wcount").cast("long").alias("wcount"),
    )


def bpe_train(
    df: DataFrame | None,
    num_merges: int,
    text_col: str = "text",
    min_pair_count: int = 2,
    materialize_every: int = 8,
    work_dir: str | None = None,
    words_df: DataFrame | None = None,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from a corpus.

    Per merge: one pair-count hash aggregation over the cached
    distinct-word table, one 1-row argmax collect (count DESC, then
    (a, b) ASC — fully deterministic across partitionings), one fold
    rewrite of the symbol arrays. Stops early when no pair reaches
    ``min_pair_count``. The symbol table round-trips through parquet
    every ``materialize_every`` merges to keep the plan flat.

    Cost is ``num_merges`` SEQUENTIAL Spark jobs — exact Sennrich
    semantics, right for small/medium merge counts. For
    production-sized vocabularies (32k merges) the per-merge driver
    round-trip dominates; use :func:`bpe_train_batched` (measured cost
    curves in BENCH_NOTES).
    """
    spark = (df if df is not None else words_df).sparkSession
    tmp = work_dir or tempfile.mkdtemp(prefix="bpe_train_")
    own_tmp = work_dir is None
    words = _symbol_table(df, text_col, words_df).persist()
    merges: list[tuple[str, str]] = []
    try:
        cur = words
        for step in range(num_merges):
            pairs = cur.select(
                "wcount", F.explode(_sym_pairs(F.col("syms"))).alias("p")
            )
            best = (
                pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
                .agg(F.sum("wcount").alias("c"))
                .orderBy(F.desc("c"), F.asc("a"), F.asc("b"))
                .limit(1)
                .collect()
            )
            if not best or best[0]["c"] < min_pair_count:
                break
            a, b = best[0]["a"], best[0]["b"]
            merges.append((a, b))
            cur = cur.select(
                merge_fold(F.col("syms"), a, b).alias("syms"), "wcount"
            )
            if (step + 1) % materialize_every == 0:
                path = os.path.join(tmp, f"it{step + 1}")
                cur.write.mode("overwrite").parquet(path)
                cur = spark.read.parquet(path)
        return merges
    finally:
        words.unpersist()
        if own_tmp:
            shutil.rmtree(tmp, ignore_errors=True)


def _admit_disjoint(
    cands: list[tuple[str, str, int]], batch_k: int
) -> list[tuple[str, str]]:
    """Greedy batch admission in (count DESC, a, b) order, keeping only
    pairs MUTUALLY DISJOINT from everything already admitted this round:

    - no shared operand symbol (``used``): applying one merge must not
      create/destroy occurrences of another — (x,a) occurrences die
      when (a,b) fires on ``x a b``;
    - operand not equal to an admitted concatenation (``made``): merge
      products must not feed another batch member's matches;
    - concatenation not equal to an admitted operand: firing (a,b) must
      not mint new operand symbols for an already-admitted pair.

    Under these rules every admitted pair's pre-round count is its true
    count at its (virtual) sequential turn, and one combined pass
    (:func:`merge_fold_multi`) applies the batch exactly."""
    used: set[str] = set()
    made: set[str] = set()
    batch: list[tuple[str, str]] = []
    for a, b, _c in cands:
        if len(batch) >= batch_k:
            break
        if a in used or b in used or a in made or b in made:
            continue
        if (a + b) in used:
            continue
        batch.append((a, b))
        used.update((a, b))
        made.add(a + b)
    return batch


# --- batch_k="auto" policy constants (measured: BENCH_NOTES round-10/11
# cost+quality curves). 64 is the largest k measured ≈ sequential quality
# (tokens/word within 1%); 256 is the bulk setting (5.8% worse tokens/word
# on the cascade-maximizing corpus, within noise on natural text); fill
# below 50% means admission kept rejecting candidates as non-disjoint —
# the cascade-heavy region where batched selection lags sequential.
_AUTO_K_START = 64
_AUTO_K_MIN = 8
_AUTO_K_MAX = 256
_AUTO_FILL_HALVE = 0.5


def _next_batch_k(
    k: int, admitted: int, want: int, full_streak: int
) -> tuple[int, int]:
    """One step of the default ``batch_k="auto"`` policy.

    Returns ``(next_k, next_full_streak)``:

    - admitted fill < ``_AUTO_FILL_HALVE`` of the ask → HALVE ``k``
      (floor ``_AUTO_K_MIN``): low fill means the top of the count
      distribution is cascade-coupled (pairs share operands / feed each
      other), exactly where batched selection diverges from sequential
      — smaller rounds track the sequential argmax more closely AND
      stop wasting the over-fetched candidate collect;
    - two CONSECUTIVE fully-admitted rounds → DOUBLE ``k`` (cap
      ``_AUTO_K_MAX``): full admission means the top pairs are mutually
      disjoint (the natural-text regime, where batched == sequential
      exactly), so larger rounds only amortize driver round-trips;
    - otherwise hold.

    Pure function so the policy itself is unit-pinned; the trainer
    threads the streak through rounds."""
    if admitted < want * _AUTO_FILL_HALVE:
        return max(k // 2, _AUTO_K_MIN), 0
    if admitted == want:
        full_streak += 1
        if full_streak >= 2:
            return min(k * 2, _AUTO_K_MAX), 0
        return k, full_streak
    return k, 0


def bpe_train_batched(
    df: DataFrame | None,
    num_merges: int,
    text_col: str = "text",
    batch_k: int | str = "auto",
    min_pair_count: int = 2,
    topn_factor: int = 8,
    materialize_every: int = 8,
    work_dir: str | None = None,
    words_df: DataFrame | None = None,
) -> list[tuple[str, str]]:
    """Learn BPE merges with up to ``batch_k`` merges admitted per
    Spark round — the scale path for production vocabularies, where
    :func:`bpe_train`'s one-job-per-merge design means 32k sequential
    driver round-trips.

    Per ROUND (not per merge): one pair-count hash aggregation over the
    symbol table, one ``topn_factor * batch_k``-row collect (ordered
    count DESC, a, b — same deterministic argmax stream as the
    sequential trainer), greedy driver-side admission of a mutually
    disjoint prefix (:func:`_admit_disjoint`), one combined-pass rewrite
    (:func:`merge_fold_multi` — constant expression depth per round).
    ``batch_k=1`` admits exactly the sequential argmax, reproducing
    :func:`bpe_train` merge-for-merge.

    ``batch_k="auto"`` (the default) adapts the round size instead of
    making the caller pick between the ≈-sequential-quality setting
    (k≤64) and the bulk setting (k=256, measured 5.8% worse tokens/word
    on a cascade-maximizing corpus) blindly: start at 64, HALVE (floor
    8) when the admitted fill drops below 50% of the ask — the
    cascade-coupled regime where batching lags sequential selection —
    and DOUBLE (cap 256) after two consecutive fully-admitted rounds —
    the disjoint-top regime where batched selection equals sequential
    exactly. Policy step is :func:`_next_batch_k` (unit-pinned).

    Semantics: APPLICATION is exact (disjointness makes the combined
    pass equal to sequential folds, so the returned table is consistent
    — :func:`validate_merges` passes and both encode strategies agree).
    SELECTION is the standard batched approximation: merges admitted in
    one round cannot see pairs the round itself creates, so against
    sequential Sennrich a product pair (e.g. ``(aa, aa)``) enters one
    round later than its count might warrant. Where the top-k pairs are
    naturally disjoint — the overwhelmingly common case on real text,
    where top pairs come from different words — the batched and
    sequential tables agree exactly (pinned in tests); measured
    agreement and cost curves live in BENCH_NOTES.

    Stops early when no pair reaches ``min_pair_count``. The symbol
    table round-trips through parquet every ``materialize_every``
    ROUNDS to keep plan depth bounded.
    """
    if batch_k != "auto" and (not isinstance(batch_k, int) or batch_k < 1):
        raise ValueError(f"batch_k must be 'auto' or a positive int, got {batch_k!r}")
    auto = batch_k == "auto"
    cur_k = _AUTO_K_START if auto else batch_k
    full_streak = 0
    spark = (df if df is not None else words_df).sparkSession
    tmp = work_dir or tempfile.mkdtemp(prefix="bpe_train_batched_")
    own_tmp = work_dir is None
    words = _symbol_table(df, text_col, words_df).persist()
    merges: list[tuple[str, str]] = []
    try:
        cur = words
        rounds = 0
        while len(merges) < num_merges:
            want = min(cur_k, num_merges - len(merges))
            pairs = cur.select(
                "wcount", F.explode(_sym_pairs(F.col("syms"))).alias("p")
            )
            top = (
                pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
                .agg(F.sum("wcount").alias("c"))
                .filter(F.col("c") >= min_pair_count)
                .orderBy(F.desc("c"), F.asc("a"), F.asc("b"))
                .limit(max(topn_factor * want, want))
                .collect()
            )
            batch = _admit_disjoint(
                [(r["a"], r["b"], r["c"]) for r in top], want
            )
            if not batch:
                break
            merges.extend(batch)
            if auto:
                cur_k, full_streak = _next_batch_k(
                    cur_k, len(batch), want, full_streak
                )
            cur = cur.select(
                merge_fold_multi(F.col("syms"), batch).alias("syms"),
                "wcount",
            )
            rounds += 1
            if rounds % materialize_every == 0:
                path = os.path.join(tmp, f"round{rounds}")
                cur.write.mode("overwrite").parquet(path)
                cur = spark.read.parquet(path)
        return merges
    finally:
        words.unpersist()
        if own_tmp:
            shutil.rmtree(tmp, ignore_errors=True)


# --------------------------------------------------------------------------
# encoding
# --------------------------------------------------------------------------


def validate_merges(merges: Sequence[tuple[str, str]]) -> None:
    """Check a merge table is CONSISTENT: every operand of merge *k* is
    a base symbol (one character, or one character + ``</w>``) or the
    concatenation produced by an earlier merge.

    Consistency is the precondition under which the expression path's
    rank-order single-pass application equals the kernel path's
    lowest-rank-first priority loop (Sennrich's learn_bpe output always
    satisfies it; both trainers here produce it by construction).
    ``load_merges`` accepts arbitrary external tables, so an
    inconsistent table — e.g. ``[('ab','c'), ('a','b')]``, where
    ``'ab'`` is never produced — would otherwise diverge SILENTLY
    between the two strategies. Raises ``ValueError`` naming the first
    offending rank."""

    def is_base(s: str) -> bool:
        return len(s) == 1 or (len(s) == len(EOW) + 1 and s.endswith(EOW))

    produced: set[str] = set()
    for rank, (a, b) in enumerate(merges):
        for side, s in (("a", a), ("b", b)):
            if not (is_base(s) or s in produced):
                raise ValueError(
                    f"inconsistent merge table: merge {rank} ({a!r}, {b!r}) "
                    f"operand {side}={s!r} is neither a base symbol nor the "
                    f"product of an earlier merge; rank-order (expr) and "
                    f"priority-loop (kernel) application would diverge. "
                    f"Reorder the table, or pass validate=False to accept "
                    f"priority-loop (kernel) semantics only — bpe_encode's "
                    f"'auto' strategy resolves to the kernel path under "
                    f"validate=False (strategy='expr' without validation is "
                    f"caller-asserted consistency)."
                )
        produced.add(a + b)


def bpe_encode(
    df: DataFrame,
    merges: Sequence[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    expr_max_merges: int = 48,
    strategy: str = "auto",
    validate: bool = True,
) -> DataFrame:
    """Tokenize ``text_col`` with a learned merge list.

    Two parity-pinned implementations:

    - ``"expr"`` — pure nested column expression (per word: char
      symbols, then each merge as one greedy fold). JVM-side,
      shuffle-free, stateless (runs on readStream unchanged), and
      DuckDB-replayable via :func:`bpe_encode_sql` — the verification
      and portability path. Cost is per token OCCURRENCE (interpreted
      ArrayAggregate): ~50-100k tokens/s/core.
    - ``"kernel"`` — Arrow-batched ``mapInPandas`` with per-batch
      per-word memoization: cost is per DISTINCT word per batch, which
      on natural (repetitive) text is orders of magnitude less work —
      measured ~2.3M tokens/s/core on the 100x-duplicated sf1 corpus,
      ~50x the expression path (BENCH_NOTES). The throughput path for
      bulk encoding.

    ``"auto"`` picks the expression path while the merge list fits
    ``expr_max_merges`` (small alphabets/demos, streaming, oracle
    verification) and the kernel beyond; under ``validate=False`` it
    always picks the kernel (skipping validation opts into
    priority-loop semantics, and the two paths are only proven equal on
    VALIDATED-consistent tables). For production-sized merge tables
    (10k+) the kernel is always the right call."""
    merges = list(merges)
    if strategy not in ("auto", "expr", "kernel"):
        raise ValueError(f"unknown strategy {strategy!r}")
    if validate and strategy != "kernel":
        validate_merges(merges)
    if strategy == "expr" and len(merges) > expr_max_merges:
        # One nested ArrayAggregate per merge: past the threshold the
        # expression tree overflows the JVM stack at real plan sizes —
        # and on a STREAMING thread (smaller stack than main) it dies as
        # a raw StackOverflowError mid-trigger (BENCH_NOTES lesson).
        # Fail fast with the fix instead.
        raise ValueError(
            f"strategy='expr' with {len(merges)} merges exceeds "
            f"expr_max_merges={expr_max_merges}: the nested-fold "
            f"expression would risk a JVM StackOverflowError at plan "
            f"build/codegen time (worse on streaming threads). Use "
            f"strategy='kernel' (the bulk path, parity-pinned) or "
            f"explicitly raise expr_max_merges if you control the "
            f"driver/executor thread stack size."
        )
    # validate=False means the caller opted into priority-loop (kernel)
    # semantics for a possibly-inconsistent table: 'auto' must not route
    # to the rank-order expression path unvalidated — that is exactly the
    # divergence validation exists to block (ADVICE r10). An explicit
    # strategy='expr' with validate=False is caller-asserted consistency.
    use_expr = strategy == "expr" or (
        strategy == "auto" and validate and len(merges) <= expr_max_merges
    )
    if use_expr:
        toks = F.flatten(
            F.transform(
                _words(F.col(text_col)),
                lambda w: _apply_merges(word_symbols(w), merges),
            )
        )
        return df.withColumn(out_col, toks)
    return bpe_encode_kernel(df, merges, text_col=text_col, out_col=out_col)


def encode_word_py(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Pure-Python reference encode of ONE word (lowest-rank-first
    priority loop — the GPT-2-style formulation, equivalent to
    rank-order application; used by the kernel and as the test oracle
    for the expression path)."""
    syms = list(word[:-1]) + [word[-1] + EOW] if word else []
    while len(syms) > 1:
        best_rank = None
        best = None
        for pair in zip(syms, syms[1:]):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best = r, pair
        if best is None:
            break
        a, b = best
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_encode_kernel(
    df: DataFrame,
    merges: Sequence[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Arrow-batched encode for large merge lists: ``mapInPandas`` with
    a per-batch word memo (web text repeats words heavily, so the
    Python loop runs once per distinct word per batch, not per
    occurrence). The merge table is closure-captured (broadcast with
    the task), never shuffled."""
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    fields = [f for f in df.schema.fields]
    out_schema = T.StructType(
        fields + [T.StructField(out_col, T.ArrayType(T.StringType()))]
    )

    eow = EOW  # captured constant: `run` below must be SELF-CONTAINED
    # (no references to module-level functions), so cloudpickle
    # serializes it by value and a Python worker that cannot import
    # v3_polars_spark (driver launched outside the repo, no --py-files)
    # still runs it; referencing encode_word_py would pickle it by
    # MODULE REFERENCE and die with ModuleNotFoundError at task start.

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import re

        # Match normalize_text's Java regex EXACTLY: Java \s is the
        # ASCII class [ \t\n\x0B\f\r] == Python \s under re.ASCII.
        # Python str.split() (Unicode whitespace: \xa0, \x85, \x1c-\x1f,
        #  ...) would silently diverge from the expression path on
        # any corpus containing non-ASCII whitespace — NBSP is
        # ubiquitous in real web text. strip(' ') likewise: Spark's
        # trim removes only 0x20, Python's bare strip() is Unicode-wide.
        ws = re.compile(r"\s+", flags=re.ASCII)
        memo: dict[str, list[str]] = {}

        def enc_word(word: str) -> list[str]:
            # inlined encode_word_py (lowest-rank-first priority loop);
            # kept in lockstep by tests/test_bpe.py's kernel-vs-oracle
            # parity pins
            syms = list(word[:-1]) + [word[-1] + eow] if word else []
            while len(syms) > 1:
                best_rank = None
                best = None
                for pair in zip(syms, syms[1:]):
                    r = ranks.get(pair)
                    if r is not None and (best_rank is None or r < best_rank):
                        best_rank, best = r, pair
                if best is None:
                    break
                a, b = best
                out: list[str] = []
                i = 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            return syms

        def enc_text(text: str | None) -> list[str]:
            if text is None:
                return []
            norm = ws.sub(" ", str(text).lower()).strip(" ")
            toks: list[str] = []
            for w in norm.split(" "):
                if not w:
                    continue
                got = memo.get(w)
                if got is None:
                    got = memo[w] = enc_word(w)
                toks.extend(got)
            return toks

        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = [enc_text(t) for t in pdf[text_col]]
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def save_merges(
    spark: SparkSession, merges: Sequence[tuple[str, str]], path: str
) -> None:
    """Persist a learned merge table as parquet ``(rank, a, b)`` — the
    artifact a training job ships to every encode job."""
    rows = [(i, a, b) for i, (a, b) in enumerate(merges)]
    schema = T.StructType(
        [
            T.StructField("rank", T.LongType()),
            T.StructField("a", T.StringType()),
            T.StructField("b", T.StringType()),
        ]
    )
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)


def load_merges(
    spark: SparkSession, path: str, validate: bool = True
) -> list[tuple[str, str]]:
    """Load a merge table saved by :func:`save_merges`, rank order.
    External tables are :func:`validate_merges`-checked by default —
    an inconsistent table would make the expr and kernel encode paths
    silently diverge (pass ``validate=False`` to accept one with
    kernel/priority-loop semantics only)."""
    rows = spark.read.parquet(path).orderBy("rank").collect()
    merges = [(r.a, r.b) for r in rows]
    if validate:
        validate_merges(merges)
    return merges


def token_id_map(df: DataFrame, tokens_col: str = "bpe_tokens") -> DataFrame:
    """Deterministic vocabulary table ``(token, token_id)``: ids are
    dense-ranked by token string ascending, so the mapping is a pure
    function of the token SET — stable under reruns, partitioning, and
    row order, and replayable in SQL. The global rank window runs over
    the distinct-token table (vocabulary-sized, bounded — never corpus-
    sized), the same posture as the trainer's working set."""
    from pyspark.sql import Window

    toks = df.select(F.explode(tokens_col).alias("token")).distinct()
    w = Window.orderBy("token")
    return toks.withColumn(
        "token_id", (F.row_number().over(w) - 1).cast("long")
    )


# --------------------------------------------------------------------------
# oracle replay (DuckDB dialect)
# --------------------------------------------------------------------------


def _sql_quote(s: str) -> str:
    return s.replace("'", "''")


def bpe_encode_sql(
    merges: Sequence[tuple[str, str]], word_sql: str = "w"
) -> str:
    """DuckDB expression producing the token list of one word column —
    the literal replay of the expression path (``list_reduce`` is the
    fold; tokens are lifted to single-element lists because DuckDB 1.x
    pins the reduce accumulator to the element type)."""
    expr = (
        f"CASE WHEN len(string_split({word_sql}, '')) = 1 "
        f"THEN [{word_sql} || '{EOW}'] "
        f"ELSE string_split({word_sql}, '')[:-2] || "
        f"[string_split({word_sql}, '')[-1] || '{EOW}'] END"
    )
    for a, b in merges:
        al, bl, abl = _sql_quote(a), _sql_quote(b), _sql_quote(a + b)
        expr = (
            f"list_reduce(list_transform({expr}, tk0 -> [tk0]), "
            f"(acc, x) -> CASE WHEN acc[-1] = '{al}' AND x[1] = '{bl}' "
            f"THEN acc[:-2] || ['{abl}'] ELSE acc || x END)"
        )
    return expr
