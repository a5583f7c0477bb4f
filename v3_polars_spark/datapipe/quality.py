"""Corpus-quality operators for training-data curation: repetition
signals, benchmark-contamination checks, PII scrubbing, TF-IDF term
weighting, and corpus vocabulary.

These are the standard public curation filters (repetition rules per
Gopher/MassiveText, Rae et al. 2021 §A1.1; regex PII scrubbing per
C4, Raffel et al. 2019 §2.2; train/test n-gram decontamination per the
GPT-3 appendix C methodology) re-expressed as Spark column pipelines:

- per-document signals are single-scan column expressions (zero shuffles);
- corpus-level statistics (document frequency, vocabulary, benchmark
  overlap) are hash aggregates / broadcast joins that scale as one or two
  bounded exchanges — never a window over the whole corpus.

Everything is engine-portable arithmetic (md5-prefix hashes, integer
counts, rational idf — no transcendentals), so SQL oracles replay every
operator bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import POLY_B, POLY_MOD, _token_hash
from .text import normalize_text

# ---------------------------------------------------------------------------
# repetition signals (Gopher-style quality rules)
# ---------------------------------------------------------------------------


def repetition_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document repetition metrics (the Gopher §A1.1 filter family):

    - ``dup_word_frac``: 1 - distinct_tokens/tokens (word-level repetition);
    - ``dup_line_frac``: 1 - distinct_lines/lines (copy-pasted line blocks);
    - ``top_bigram_frac``: occurrences of the most frequent word bigram /
      total bigrams (a document looping one phrase scores near 1).

    The word/line signals are pure array expressions (no shuffle). The
    bigram signal hashes each bigram (md5-prefix token hashes + modular
    polynomial combine — the ``shingle_hash_sets`` construction, NOT
    distinct) and takes max(count)/sum(count) per document: one explode
    plus two map-side-combinable aggregates on the document id, then a
    join back — all keyed on ``id_col``, skew-free at any corpus size."""
    base = df.select(
        F.col(id_col),
        F.col(text_col),
        F.split(normalize_text(F.col(text_col)), " ").alias("__toks"),
    )
    toks = F.col("__toks")
    n_tok = F.size(toks)
    dup_word = F.when(
        n_tok > 0, 1.0 - F.size(F.array_distinct(toks)) / n_tok
    ).otherwise(F.lit(0.0))

    lines = F.split(F.col(text_col), "\n")
    n_lines = F.size(lines)
    dup_line = F.when(
        n_lines > 0, 1.0 - F.size(F.array_distinct(lines)) / n_lines
    ).otherwise(F.lit(0.0))

    per_doc = base.select(
        F.col(id_col),
        dup_word.alias("dup_word_frac"),
        dup_line.alias("dup_line_frac"),
    )

    # hashed bigrams, NON-distinct (frequency matters here)
    hashed = base.select(
        F.col(id_col), F.transform(toks, _token_hash).alias("__th")
    )
    th = F.col("__th")
    n_bg = F.size(th) - 1
    idx = F.when(n_bg > 0, F.sequence(F.lit(0), n_bg - 1)).otherwise(
        F.array().cast("array<int>")
    )
    bigram = F.transform(
        idx,
        lambda i: (F.get(th, i) % F.lit(POLY_MOD) * F.lit(POLY_B) + F.get(th, i + 1))
        % F.lit(POLY_MOD),
    )
    grams = hashed.select(F.col(id_col), F.explode(bigram).alias("g"))
    counts = grams.groupBy(id_col, "g").agg(F.count(F.lit(1)).alias("c"))
    top = counts.groupBy(id_col).agg(
        (F.max("c") / F.sum("c")).alias("top_bigram_frac")
    )
    return per_doc.join(top, id_col, "left").withColumn(
        "top_bigram_frac", F.coalesce(F.col("top_bigram_frac"), F.lit(0.0))
    )


# ---------------------------------------------------------------------------
# benchmark contamination (n-gram overlap decontamination)
# ---------------------------------------------------------------------------


def contamination_check(
    df: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    max_overlap_frac: float = 0.1,
) -> DataFrame:
    """Flag training documents whose n-gram sets overlap a benchmark corpus
    (the GPT-3 appendix-C decontamination test, hash-based).

    Output: one row per input document with ``n_ngrams``,
    ``n_contaminated`` (n-grams also present anywhere in ``benchmark``),
    ``overlap_frac``, and ``contaminated`` (frac > ``max_overlap_frac``).

    Scale shape: the benchmark's distinct hashed n-grams are a SMALL
    relation (benchmarks are KBs, corpora are TBs) — Spark broadcasts it;
    the training side is one explode + one aggregate keyed on the document
    id. No part of the corpus is ever collected or shuffled on n-grams."""
    from .dedup import shingle_hash_sets

    doc_sets = shingle_hash_sets(df, text_col, id_col, n)
    bench_grams = (
        shingle_hash_sets(benchmark, text_col, id_col, n)
        .select(F.explode("shset").alias("g"))
        .distinct()
    )
    doc_grams = doc_sets.select(F.col(id_col), F.explode("shset").alias("g"))
    hits = (
        doc_grams.join(bench_grams, "g", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )
    out = (
        doc_sets.select(F.col(id_col), F.size("shset").alias("n_ngrams"))
        .join(hits, id_col, "left")
        .withColumn("n_contaminated", F.coalesce(F.col("n_contaminated"), F.lit(0)))
    )
    frac = F.when(
        F.col("n_ngrams") > 0, F.col("n_contaminated") / F.col("n_ngrams")
    ).otherwise(F.lit(0.0))
    return out.withColumn("overlap_frac", frac).withColumn(
        "contaminated", F.col("overlap_frac") > F.lit(max_overlap_frac)
    )


# ---------------------------------------------------------------------------
# PII scrubbing (C4-style regex redaction)
# ---------------------------------------------------------------------------

# Lookaround-free ASCII patterns that parse and match identically under
# java.util.regex (Spark) and RE2 (DuckDB oracle).
#
# Every quantifier is BOUNDED. An unbounded `[...]+` before a required
# literal is quadratic under a backtracking engine: on a multi-megabyte
# run of word characters (a real crawl artifact — see tests/test_hostile.py)
# `[A-Za-z0-9._%+-]+@` costs O(run) per start position, O(run^2) total —
# measured minutes per row at 2 MB. The bounds are the RFC limits anyway
# (local part <= 64, domain <= 255, TLD <= 24), so matches on actual PII
# are unchanged and the worst-case scan is O(n * 64).
#
# Known edge: a local part LONGER than 64 chars (not a deliverable address
# per RFC 5321) matches only its trailing 64 chars, so pii_scrub leaves the
# over-long prefix unredacted. Accepted: full-span scrubbing of over-RFC
# tokens would need an unbounded quantifier or lookbehind, reintroducing
# the quadratic scan / RE2-compat problems this bound exists to fix.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]{1,64}@[A-Za-z0-9.-]{1,255}\.[A-Za-z]{2,24}",
    "ipv4": r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
    "phone": r"(\+?[0-9]{1,3}[-. (]{1,2})?[0-9]{3}[-. )]{1,2}[0-9]{3}[-. ]?[0-9]{4}\b",
}


def pii_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact emails / IPv4 addresses / phone numbers and count each kind.

    Adds ``n_email``/``n_ipv4``/``n_phone`` (match counts on the original
    text) and ``text_scrubbed`` (each match replaced by ``<EMAIL>`` etc.).
    Pure per-row regex column expressions — a single scan, no shuffle, and
    the patterns are RE2-safe so the oracle replays them exactly."""
    t = F.col(text_col)
    out = df
    for kind, pat in PII_PATTERNS.items():
        out = out.withColumn(f"n_{kind}", F.regexp_count(t, F.lit(pat)))
    scrubbed = t
    for kind, pat in PII_PATTERNS.items():
        scrubbed = F.regexp_replace(scrubbed, pat, f"<{kind.upper()}>")
    return out.withColumn("text_scrubbed", scrubbed)


# ---------------------------------------------------------------------------
# TF-IDF and vocabulary
# ---------------------------------------------------------------------------


def tf_idf_top_terms(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 5
) -> DataFrame:
    """Top-k characteristic terms per document by tf-idf.

    idf uses the BM25 rational form idf = (N - df + 0.5)/(df + 0.5) —
    monotone-equivalent to the log form for ranking, but pure integer
    arithmetic and IEEE division, so any engine computes bit-identical
    scores (log/ln rounding differs across libm builds).

    Plan: token explode → per-(doc,term) count (one shuffle, map-side
    combined) → document frequency per term (second bounded aggregate) →
    broadcast-join idf back → per-doc top-k window PARTITIONED BY the
    document id (never a global sort). Ties break on the term string."""
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("term"),
    ).filter(F.col("term") != "")
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = df.select(F.count(F.lit(1)).alias("n_docs"))
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    idf = df_t.crossJoin(F.broadcast(n_docs)).select(
        "term",
        ((F.col("n_docs") - F.col("df_t") + 0.5) / (F.col("df_t") + 0.5)).alias("idf"),
    )
    scored = tf.join(idf, "term").withColumn("tf_idf", F.col("tf") * F.col("idf"))
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(F.desc("tf_idf"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(F.col(id_col), "term", "tf", "tf_idf", "rnk")
    )


def vocabulary(
    df: DataFrame, text_col: str = "text", min_count: int = 1
) -> DataFrame:
    """Corpus vocabulary: (term, count, n_docs) for every distinct token
    with total count >= ``min_count``. One explode + one hash aggregate —
    the canonical map-side-combinable corpus statistic."""
    toks = df.select(
        F.col("doc_id") if "doc_id" in df.columns else F.monotonically_increasing_id().alias("doc_id"),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("term"),
    ).filter(F.col("term") != "")
    return (
        toks.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("count"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .filter(F.col("count") >= min_count)
    )


# ---------------------------------------------------------------------------
# cross-document boilerplate (global line-level dedup)
# ---------------------------------------------------------------------------


def boilerplate_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 3,
) -> DataFrame:
    """Lines that recur across >= ``min_docs`` DISTINCT documents —
    headers, footers, nav chrome (the MassiveText/RefinedWeb global
    line-dedup signal; within-doc repetition is ``repetition_signals``).

    Output: (line, n_docs). Lines are compared whitespace-normalized and
    lowercased. One explode + one hash aggregate — the count per line is
    map-side combinable; no window over the corpus."""
    lines = df.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), "\n")).alias("__raw"),
    ).select(
        F.col(id_col),
        F.trim(F.regexp_replace(F.lower(F.col("__raw")), "\\s+", " ")).alias("line"),
    ).filter(F.col("line") != "")
    return (
        lines.groupBy("line")
        .agg(F.countDistinct(id_col).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def strip_boilerplate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 3,
) -> DataFrame:
    """Remove cross-document boilerplate lines from every document.

    Plan: posexplode lines (keeping each line's position) → left-anti
    join against ``boilerplate_lines`` (the boilerplate set is tiny and
    broadcasts) → reassemble with sort_array(collect_list(struct(pos,
    line))) + array_join — deterministic, order-preserving, one shuffle
    on the doc id. Documents whose every line is boilerplate survive with
    empty text. Output: (id_col, ``text_col`` cleaned, n_lines_kept,
    n_lines_removed)."""
    bp = boilerplate_lines(df, text_col, id_col, min_docs).select("line")
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("__pos", "__raw"),
    ).withColumn(
        "line",
        F.trim(F.regexp_replace(F.lower(F.col("__raw")), "\\s+", " ")),
    )
    tagged = lines.join(bp.withColumn("__bp", F.lit(1)), "line", "left")
    keep_flag = F.col("__bp").isNull() & (F.col("line") != "")
    return (
        tagged.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(keep_flag, F.struct("__pos", "__raw"))
                        )
                    ),
                    lambda s: s.getField("__raw"),
                ),
                "\n",
            ).alias(text_col),
            F.sum(F.when(keep_flag, 1).otherwise(0)).alias("n_lines_kept"),
            F.sum(F.when(~keep_flag, 1).otherwise(0)).alias("n_lines_removed"),
        )
    )
