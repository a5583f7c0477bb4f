"""Text-analysis operators for large-scale training-data pipelines:
language ID, quality scoring, token counting, document fingerprinting.

Everything here is pure column expressions (JVM-side, whole-stage codegen)
— no Python UDFs anywhere. Each operator is embarrassingly parallel per
row: at 100 TB these pipelines are a single scan with zero shuffles, so
throughput is bounded by parquet decode, not by Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Per-language marker (stop)words for the n-gram/stopword heuristic.
# Deliberately tiny and high-precision: function words that rarely occur
# cross-language.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "with", "for"],
    "de": ["der", "die", "und", "ist", "das", "nicht", "ein", "mit", "auf", "sich"],
    "fr": ["le", "la", "les", "et", "est", "une", "dans", "que", "pour", "pas"],
    "es": ["el", "los", "las", "es", "una", "que", "para", "con", "por", "del"],
}

STOPWORDS_EN = LANG_MARKERS["en"] + ["a", "an", "as", "at", "by", "on", "or", "be"]


def _marker_score_sql(col_sql: str, words: list[str]) -> str:
    """SQL text for the marker-word score (0/1 per word, summed over the
    ' '-padded lowercase body so ' word ' containment = whole-word hit).

    Built as ONE generated expression string handed to ``F.expr`` rather
    than a loop of Column operations: every Column call is a py4j round
    trip (~ms each), so a 40-word loop costs ~0.5 s of driver latency per
    query build, while parsing one string is sub-millisecond. The parsed
    tree is identical either way. Marker words are plain ASCII [a-z], so
    no SQL escaping is needed."""
    pad = f"(' ' || lower({col_sql}) || ' ')"
    terms = " + ".join(
        f"CASE WHEN contains({pad}, ' {w} ') THEN 1 ELSE 0 END" for w in words
    )
    return f"({terms})"


def _marker_score(col_sql: str, words: list[str]) -> Column:
    """Number of marker words present — see ``_marker_score_sql``."""
    return F.expr(_marker_score_sql(col_sql, words))


def language_id(df: DataFrame, text_col: str = "text", out: str = "lang_pred") -> DataFrame:
    """Heuristic language ID: CJK char presence → zh; else the language with
    the most marker-word hits (ties broken by fixed precedence en>de>fr>es);
    no hits → 'und'."""
    c = f"`{text_col}`"
    scores = {
        lang: _marker_score_sql(c, ws) for lang, ws in LANG_MARKERS.items()
    }
    best = f"greatest({', '.join(scores.values())})"
    pred = F.expr(
        f"""CASE WHEN {c} RLIKE '[\\\\u4e00-\\\\u9fff]' THEN 'zh'
             WHEN {best} = 0 THEN 'und'
             WHEN {scores['en']} = {best} THEN 'en'
             WHEN {scores['de']} = {best} THEN 'de'
             WHEN {scores['fr']} = {best} THEN 'fr'
             ELSE 'es' END"""
    )
    return df.withColumn(out, pred)


# GPT-2-style pre-tokenizer regex, lookahead-free so java.util.regex (Spark)
# and RE2 (DuckDB oracle) count identically: contractions | space+letters |
# space+digits | space+other | whitespace runs
BPE_SPLIT_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting three ways:
    - n_tokens_ws: whitespace split count;
    - n_tokens_bpe: matches of a BPE-ish pre-tokenizer regex (the GPT-2
      pre-split classes — the real subword-piece upper-bound structure);
    - n_tokens_bpe_est: the chars/4 rule of thumb."""
    t = F.col(text_col)
    ws = F.size(F.split(F.trim(t), "\\s+"))
    n_chars = F.length(t)
    bpe = F.regexp_count(t, F.lit(BPE_SPLIT_PATTERN))
    bpe_est = F.ceil(n_chars / F.lit(4)).cast("long")
    return (
        df.withColumn("n_tokens_ws", ws.cast("long"))
        .withColumn("n_tokens_bpe", bpe.cast("long"))
        .withColumn("n_tokens_bpe_est", bpe_est)
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword quality signals (the standard
    pre-training quality filters):
      - n_chars, n_words
      - mean_word_len
      - punct_ratio: punctuation chars / chars
      - stopword_ratio: fraction of the EN stopword list present
      - quality: a [0,1] composite (monotone in signals; cheap filter)."""
    t = F.col(text_col)
    n_chars = F.length(t).cast("double")
    n_words = F.size(F.split(F.trim(t), "\\s+")).cast("double")
    mean_word_len = F.when(n_words > 0, (n_chars - (n_words - 1)) / n_words).otherwise(
        F.lit(0.0)
    )
    n_punct = (
        n_chars - F.length(F.regexp_replace(t, "[.,;:!?'\"()\\[\\]{}-]", ""))
    ).cast("double")
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    sw_hits = _marker_score(f"`{text_col}`", STOPWORDS_EN).cast("double")
    stopword_ratio = sw_hits / F.lit(float(len(STOPWORDS_EN)))
    quality = (
        F.when((n_words >= 5) & (n_words <= 100000), 0.4).otherwise(0.0)
        + F.when((mean_word_len >= 2) & (mean_word_len <= 12), 0.3).otherwise(0.0)
        + F.when(punct_ratio <= 0.2, 0.1).otherwise(0.0)
        + stopword_ratio * 0.2
    )
    return (
        df.withColumn("n_chars", n_chars.cast("long"))
        .withColumn("n_words", n_words.cast("long"))
        .withColumn("mean_word_len", mean_word_len)
        .withColumn("punct_ratio", punct_ratio)
        .withColumn("stopword_ratio", stopword_ratio)
        .withColumn("quality", quality)
    )


def normalize_text(col: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, collapse whitespace."""
    return F.trim(F.regexp_replace(F.lower(col), "\\s+", " "))


def fingerprint_md5(df: DataFrame, text_col: str = "text", out: str = "fp") -> DataFrame:
    """Content fingerprint: md5 of the normalized text. Stable across
    engines and runs — the exact-dedup key."""
    return df.withColumn(out, F.md5(normalize_text(F.col(text_col))))


def fingerprint_rolling(
    df: DataFrame, text_col: str = "text", out: str = "fp64", mod: int = 9007199254740881
) -> DataFrame:
    """Rolling (polynomial) hash over normalized-text characters:
    h = sum(c_i * B^(n-1-i)) mod M, B=131, M = largest prime < 2^53 (so
    acc*B never overflows int64 under ANSI mode). Computed with F.aggregate
    over the char array — pure column expressions, still no UDF. Used where
    an integer fingerprint is needed (e.g. partition-range assignment)
    instead of a hex digest."""
    chars = F.split(normalize_text(F.col(text_col)), "")
    h = F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * F.lit(131) + F.ascii(c)) % F.lit(mod),
    )
    return df.withColumn(out, h)


def unigram_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 5,
) -> DataFrame:
    """Unigram-LM familiarity signals per document — the log-prob-free
    core of an LM-based quality filter.

    Tokens (whitespace words of the normalized text) join against the
    corpus unigram table built from the same frame; per document:

    - ``n_tokens``; ``n_oov`` — tokens whose corpus count < ``min_count``;
    - ``sum_freq`` — sum of corpus counts over tokens (exact int64);
    - ``mean_freq`` — ``sum_freq / n_tokens`` (one exact-int division);
    - ``lm_logprob`` — add-one-smoothed unigram log-probability
      ``sum(ln((c+1)/(N+V)))``. NOTE: float log sums are NOT
      bit-reproducible across engines/summation orders; use the exact
      integer columns for cross-engine verification and treat
      ``lm_logprob`` as a ranking signal.

    The corpus is tokenized ONCE: both the vocab aggregate and the probe
    side consume the same persisted per-(doc, token) count aggregate
    (exchange reuse alone cannot share it — column pruning gives the two
    consumers different canonical outputs), and the join input shrinks
    by the average within-doc token multiplicity before it ever reaches
    the vocab join. That join broadcasts under the session cap and
    degrades to a shuffle join when the vocabulary outgrows it — the
    100 TB shape. The persisted intermediate is tracked; call
    ``release_intermediates()`` to free executor storage.
    """
    from .dedup import _track

    toks = df.select(
        F.col(id_col), F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("__tok")
    ).filter(F.col("__tok") != "")
    # per-(doc, token) counts: the one pass over raw tokens; persisted so
    # the vocab branch and the probe branch share one tokenization
    doc_tok = _track(
        toks.groupBy(id_col, "__tok").agg(F.count(F.lit(1)).alias("__k"))
    )
    # vocab persisted: it has two consumers (the probe-side broadcast
    # build and the totals aggregate), each of which would otherwise
    # re-run the full token-count aggregate over doc_tok (measured at
    # sf1: ~0.6-1.0 s per re-run on the 11.6 M-row frame)
    vocab = _track(doc_tok.groupBy("__tok").agg(F.sum("__k").alias("__c")))
    totals = vocab.agg(
        F.sum("__c").alias("__n"), F.count(F.lit(1)).alias("__v")
    )
    scored = (
        doc_tok.join(vocab, "__tok")
        .crossJoin(F.broadcast(totals))
        .groupBy(id_col)
        .agg(
            F.sum("__k").alias("n_tokens"),
            F.sum(
                F.col("__k") * (F.col("__c") < min_count).cast("long")
            ).alias("n_oov"),
            F.sum(F.col("__k") * F.col("__c")).alias("sum_freq"),
            F.sum(
                F.col("__k")
                * F.log(
                    (F.col("__c") + 1).cast("double") / (F.col("__n") + F.col("__v"))
                )
            ).alias("lm_logprob"),
        )
        .withColumn(
            "mean_freq", F.col("sum_freq").cast("double") / F.col("n_tokens")
        )
    )
    return scored
