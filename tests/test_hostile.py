"""Adversarial-input robustness sweep of the datapipe surface.

The driver-gate correctness record is built on well-formed synthetic
text; this suite feeds the text / URL / dedup operators the hostile
shapes real crawls contain — multi-MB single tokens, astral-plane
unicode, embedded null bytes, pathological duplication (100 k copies of
one key), and URLs with nested encodings / missing schemes — and pins
(a) no crash, (b) deterministic output across runs, (c) the documented
semantics on the edge rows. The codec byte-soup analog lives in
test_codecs.py (round 4); this is the same posture for the text side.
"""

import pytest
from pyspark.sql import functions as F

from v3_polars_spark.datapipe.chunking import chunk_documents
from v3_polars_spark.datapipe.dedup import (
    dedup_exact,
    dedup_near,
    minhash_lsh_pairs,
    near_dup_components,
    simhash,
)
from v3_polars_spark.datapipe.quality import (
    boilerplate_lines,
    pii_scrub,
    repetition_signals,
)
from v3_polars_spark.datapipe.text import (
    fingerprint_md5,
    fingerprint_rolling,
    language_id,
    quality_score,
    token_counts,
    unigram_stats,
)
from v3_polars_spark.datapipe.urls import canonicalize_url, dedup_by_url

MB_TOKEN = "a" * 2_000_000  # one 2 MB word, no whitespace
ASTRAL = "\U0001d518\U0001d52b\U0001d526 \U0001f680\U0001f525 \U00010348 text"
NULL_BYTES = "before\x00middle\x00after and the end"
REGEX_META = r"C:\path\(x)[y]{z} .*+?^$| the (end)"
COMBINING = "e\u0301\u0301\u0301 מלון שלום بسم الله"
FOOTER = "copyright 2026 example corp all rights reserved"

HOSTILE_ROWS = [
    (1, "the quick brown fox jumps over the lazy dog and it is fine"),
    (2, ""),
    (3, None),
    (4, " \t\n\r  \t "),
    (5, MB_TOKEN),
    (6, ASTRAL),
    (7, NULL_BYTES),
    (8, REGEX_META),
    (9, "这是一个中文句子 它应该被识别为中文"),
    (10, COMBINING),
    (11, "line one\r\nline two\nline one\n" + FOOTER),
    (12, "!!!??? ... ;;; ((( ))) %%% &&&"),
    (13, ("spam " * 2000).strip()),  # 2000 copies of one token
    (14, "short\n" + FOOTER),
    (15, "also short\n" + FOOTER),
    # near-dup pair with hostile chars inside
    (20, "alpha beta gamma delta epsilon zeta " + ASTRAL),
    (21, "alpha beta gamma delta epsilon zeta " + ASTRAL),
]


@pytest.fixture(scope="module")
def hostile(spark):
    df = spark.createDataFrame(HOSTILE_ROWS, "doc_id long, text string")
    return df.cache()


def _rows_by_id(rows, col):
    return {r["doc_id"]: r[col] for r in rows}


class TestHostileText:
    def test_text_ops_no_crash_deterministic(self, hostile):
        out = fingerprint_rolling(
            fingerprint_md5(
                language_id(quality_score(token_counts(hostile)))
            )
        )
        a = out.orderBy("doc_id").collect()
        b = out.orderBy("doc_id").collect()
        assert [r.asDict() for r in a] == [r.asDict() for r in b]
        lang = _rows_by_id(a, "lang_pred")
        assert lang[1] == "en"
        assert lang[9] == "zh"
        assert lang[12] == "und"
        # null text: marker CASEs map the null containment to 0 hits, so
        # the prediction is 'und' (defined + deterministic), not null
        assert lang[3] == "und"
        ws = _rows_by_id(a, "n_tokens_ws")
        assert ws[5] == 1  # a 2 MB word is still one token
        assert ws[13] == 2000
        # fingerprints defined for every non-null text, distinct for
        # distinct NORMALIZED content (empty and whitespace-only docs
        # collapse to the same empty-string fingerprint by design), equal
        # for the duplicate pair
        fp = _rows_by_id(a, "fp")
        assert fp[3] is None
        assert fp[20] == fp[21]
        assert fp[2] == fp[4]  # '' and whitespace-only: same normal form
        import re as _re

        def norm(t):
            return _re.sub(r"\s+", " ", t.lower()).strip()

        non_null = [v for k, v in fp.items() if v is not None]
        assert len(set(non_null)) == len(
            {norm(t) for _, t in HOSTILE_ROWS if t is not None}
        )
        fr = _rows_by_id(a, "fp64")
        assert fr[20] == fr[21] and fr[3] is None

    def test_quality_score_edges(self, hostile):
        rows = quality_score(hostile).orderBy("doc_id").collect()
        q = _rows_by_id(rows, "quality")
        for k, v in q.items():
            if v is not None:
                assert 0.0 <= v <= 1.0
        pr = _rows_by_id(rows, "punct_ratio")
        assert pr[12] is not None and pr[12] > 0.5  # punctuation soup

    def test_unigram_stats_hostile(self, hostile):
        rows = unigram_stats(hostile).collect()
        got = {r["doc_id"]: r for r in rows}
        # doc 13: 2000 copies of 'spam' -> n_tokens 2000, all one term
        assert got[13]["n_tokens"] == 2000
        assert got[13]["sum_freq"] == 2000 * 2000
        # empty/whitespace/null docs produce no token rows at all
        assert 2 not in got and 3 not in got and 4 not in got

    def test_repetition_and_pii(self, hostile):
        rows = repetition_signals(hostile).collect()
        rep = {r["doc_id"]: r for r in rows}
        assert rep[13]["dup_word_frac"] == pytest.approx(1 - 1 / 2000)
        assert rep[1]["dup_word_frac"] < 0.2
        scrubbed = pii_scrub(hostile).collect()
        assert len(scrubbed) == len(HOSTILE_ROWS)

    def test_boilerplate_across_hostile_docs(self, hostile):
        lines = boilerplate_lines(hostile, min_docs=3).collect()
        assert FOOTER in {r["line"] for r in lines}

    def test_chunking_mb_token(self, hostile):
        big = hostile.filter(F.col("doc_id") == 5)
        chunks = chunk_documents(big, chunk_size=4096, overlap=0)
        n, total = chunks.agg(
            F.count("*"), F.sum(F.length("chunk_text"))
        ).first()
        assert n == (len(MB_TOKEN) + 4095) // 4096
        assert total == len(MB_TOKEN)  # zero-overlap chunks tile exactly

    def test_simhash_deterministic(self, hostile):
        a = simhash(hostile).orderBy("doc_id").collect()
        b = simhash(hostile).orderBy("doc_id").collect()
        assert a == b
        sh = _rows_by_id(a, "simhash")
        assert sh[20] == sh[21]


class TestHostileDedup:
    def test_minhash_pairs_on_hostile_corpus(self, hostile):
        pairs = minhash_lsh_pairs(hostile, verify_threshold=0.9).collect()
        got = {(r["id_a"], r["id_b"]) for r in pairs}
        assert (20, 21) in got
        jac = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
        assert jac[(20, 21)] == pytest.approx(1.0)

    def test_dedup_exact_hostile(self, hostile):
        kept = dedup_exact(hostile)
        # distinct normalized texts: null rows always survive (null fp
        # groups to one key but null text is its own degenerate class)
        ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
        assert 20 in ids and 21 not in ids  # exact dup -> min id kept
        assert 5 in ids and 6 in ids and 7 in ids and 8 in ids

    def test_100k_single_key_corpus(self, spark):
        """Pathological duplication: 100 k copies of ONE document must be
        duplication-linear — the collapse path runs LSH on a single
        representative and never expands a quadratic pair list."""
        dup = spark.range(100_000).select(
            F.col("id").alias("doc_id"),
            F.lit("the quick brown fox jumps over the lazy dog again").alias(
                "text"
            ),
        )
        assert dedup_exact(dup).count() == 1
        comp = near_dup_components(dup)
        n_labels, n_reps, min_rep = comp.agg(
            F.count("*"), F.countDistinct("rep"), F.min("rep")
        ).first()
        assert (n_labels, n_reps, min_rep) == (100_000, 1, 0)
        survivors = dedup_near(dup).collect()
        assert len(survivors) == 1 and survivors[0]["doc_id"] == 0

    def test_pair_expansion_exact_count(self, spark):
        """300-fold duplication: the reconstructed pair list is exactly
        the 300-choose-2 clique at jaccard 1.0."""
        dup = spark.range(300).select(
            F.col("id").alias("doc_id"),
            F.lit("pack my box with five dozen liquor jugs today").alias("text"),
        )
        pairs = minhash_lsh_pairs(dup)
        n, bad = pairs.agg(
            F.count("*"), F.sum((F.col("jaccard") < 1.0).cast("long"))
        ).first()
        assert n == 300 * 299 // 2 and bad == 0


CANON_CASES = [
    # (raw, expected canonical)
    (
        "HTTPS://Example.COM:443/path/?utm_source=x&b=2&a=1#frag",
        "https://example.com/path?a=1&b=2",
    ),
    ("http://ex.com:80/", "http://ex.com"),
    ("http://ex.com:8080/x", "http://ex.com:8080/x"),  # non-default port kept
    # nested/percent encodings are NOT decoded: %3F is data, not a query
    ("https://ex.com/a%2Fb%3Fc=d", "https://ex.com/a%2Fb%3Fc=d"),
    # scheme-less inputs pass through unchanged (never merge to '://')
    ("example.com/path", "example.com/path"),
    ("/relative/only", "/relative/only"),
    ("javascript:alert(1)", "javascript:alert(1)"),
    ("mailto:a@b.com", "mailto:a@b.com"),
    ("", ""),
    # unicode host + path survive untouched apart from lowercasing
    ("https://例え.JP/パス?b=2&a=1", "https://例え.jp/パス?a=1&b=2"),
    # uppercase tracking prefix is data (prefix match is case-sensitive)
    ("https://ex.com/?UTM_SOURCE=x", "https://ex.com?UTM_SOURCE=x"),
    ("https://ex.com/?fbclid=abc&gclid=d&msclkid=e&ref_src=f", "https://ex.com"),
]


class TestHostileUrls:
    def test_canonical_cases(self, spark):
        df = spark.createDataFrame(
            [(i, raw) for i, (raw, _) in enumerate(CANON_CASES)],
            "doc_id long, url string",
        )
        got = [
            r["c"]
            for r in df.select(canonicalize_url(F.col("url")).alias("c"))
            .orderBy("doc_id")
            .collect()
        ]
        assert got == [want for _, want in CANON_CASES]

    def test_null_url(self, spark):
        df = spark.createDataFrame([(1, None)], "doc_id long, url string")
        assert df.select(canonicalize_url(F.col("url"))).first()[0] is None

    def test_long_query_string(self, spark):
        raw = "https://ex.com/p?" + "&".join(
            f"k{i:04d}=v{i}" for i in range(5000, 0, -1)
        )
        df = spark.createDataFrame([(1, raw)], "doc_id long, url string")
        canon = df.select(canonicalize_url(F.col("url")).alias("c")).first()["c"]
        params = canon.split("?", 1)[1].split("&")
        assert len(params) == 5000
        assert params == sorted(params)

    def test_100k_single_url_dedup(self, spark):
        base = spark.range(100_000).select(
            F.col("id").alias("doc_id"),
            F.lit("https://hot.example.com/page?utm_source=x").alias("url"),
            F.col("id").alias("score"),
        )
        extra = spark.createDataFrame(
            [(200_001 + i, f"https://cold{i}.example.com/", 0) for i in range(5)],
            "doc_id long, url string, score long",
        )
        kept = dedup_by_url(
            base.unionByName(extra), "url", "doc_id", prefer_col="score"
        ).collect()
        assert len(kept) == 6
        hot = [r for r in kept if "hot" in r["url_canon"]]
        assert len(hot) == 1 and hot[0]["doc_id"] == 99_999  # max score wins


class TestHostileSubstringDedup:
    def test_substring_dedup_hostile_corpus(self, hostile):
        from v3_polars_spark.datapipe import dedup_substrings

        out = {
            r["doc_id"]: (r["text_clean"], r["n_tokens"], r["n_removed"])
            for r in dedup_substrings(hostile, k=3).collect()
        }
        # 2 MB single token: 1 token < k -> no windows, passes through
        assert out[5] == (MB_TOKEN, 1, 0)
        # null text == empty doc, not size(null)=-1 poison
        assert out[3] == ("", 0, 0)
        assert out[4] == ("", 0, 0)
        # identical hostile-unicode docs >= k tokens: both fully removed
        assert out[20] == ("", 10, 10)
        assert out[21] == ("", 10, 10)
        # 2000x one token: every window is "spam spam spam" -> all removed
        assert out[13] == ("", 2000, 2000)
        # regex metacharacters survive tokenization untouched
        assert out[8] == (REGEX_META, 4, 0)


class TestHostileCrossNear:
    def test_dedup_against_near_self_reference(self, hostile):
        """Fresh batch == reference corpus: every doc with a non-empty
        shingle set is (trivially) a verified near-dup of itself in the
        reference, so only degenerate docs survive — empty/null/
        whitespace text, and single-token docs shorter than the shingle
        width (no shingles -> no buckets -> Jaccard undefined -> keep;
        the exact pass is documented to run first and catches those)."""
        from v3_polars_spark.datapipe import dedup_against_near

        kept = sorted(
            r["doc_id"]
            for r in dedup_against_near(hostile, hostile)
            .select("doc_id")
            .collect()
        )
        # exactly the docs with < n=3 normalized tokens: 2=empty, 3=null,
        # 4=whitespace-only, 5=one 2MB token, 9=two CJK tokens
        assert kept == [2, 3, 4, 5, 9]
