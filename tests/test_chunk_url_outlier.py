"""Round-3 datapipe additions: chunking, URL canonicalization/dedup,
z-score outlier scoring."""

import os

import pytest
from pyspark.sql import functions as F

from v3_polars_spark.datapipe import (
    canonicalize_url,
    chunk_documents,
    dedup_by_url,
    zscore_outliers,
)

SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


# -- chunking ---------------------------------------------------------------


def test_chunk_reassembly_chars(spark, docs):
    """Dropping each chunk's first `overlap` chars (after the first chunk)
    and concatenating reconstructs the document exactly — no characters
    lost or duplicated by the windowing."""
    size, overlap = 128, 32
    ch = chunk_documents(docs.limit(50), chunk_size=size, overlap=overlap)
    rebuilt = (
        ch.withColumn(
            "piece",
            F.when(F.col("chunk_idx") == 0, F.col("chunk_text")).otherwise(
                F.expr(f"substring(chunk_text, {overlap + 1})")
            ),
        )
        .groupBy("doc_id")
        .agg(
            F.concat_ws(
                "", F.array_sort(F.collect_list(F.struct("chunk_idx", "piece")))["piece"]
            ).alias("rebuilt")
        )
    )
    joined = docs.limit(50).join(rebuilt, "doc_id").collect()
    assert joined
    for r in joined:
        assert r.rebuilt == r.text


def test_chunk_bounds_and_short_docs(spark):
    rows = [(1, "tiny"), (2, "x" * 300), (3, "")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    ch = chunk_documents(df, chunk_size=100, overlap=10).collect()
    by_doc = {}
    for r in ch:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc[1]) == 1 and by_doc[1][0].chunk_text == "tiny"
    assert len(by_doc[3]) == 1 and by_doc[3][0].chunk_text == ""
    # 300 chars, step 90: starts 0..299 -> 0,90,180,270 -> 4 chunks
    assert len(by_doc[2]) == 4
    assert all(r.chunk_len <= 100 for r in by_doc[2])


def test_chunk_tokens_unit(spark):
    df = spark.createDataFrame([(1, " ".join(str(i) for i in range(25)),)],
                               ["doc_id", "text"])
    ch = chunk_documents(df, chunk_size=10, overlap=2, unit="tokens").collect()
    # 25 tokens, step 8: starts 0,8,16,24 -> 4 chunks
    assert len(ch) == 4
    words = [r.chunk_text.split(" ") for r in sorted(ch, key=lambda r: r.chunk_idx)]
    assert words[0] == [str(i) for i in range(10)]
    assert words[1][:2] == ["8", "9"]  # overlap region repeats
    assert words[-1] == ["24"]


def test_chunk_rejects_bad_overlap(docs):
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_size=10, overlap=10)


# -- URL canonicalization / dedup ------------------------------------------


CASES = [
    ("HTTPS://WWW.Example.COM:443/a/b/?utm_source=x&b=2&a=1#frag",
     "https://www.example.com/a/b?a=1&b=2"),
    ("http://host.com:80/path", "http://host.com/path"),
    ("http://host.com:8080/path", "http://host.com:8080/path"),
    ("https://h.io/p?fbclid=abc&gclid=d&msclkid=e&ref_src=tw", "https://h.io/p"),
    ("https://h.io/", "https://h.io"),
    ("https://h.io/p?z=1&a=2&m=3", "https://h.io/p?a=2&m=3&z=1"),
]


def test_canonicalize_url_cases(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], ["url"])
    got = [r.c for r in df.select(canonicalize_url(F.col("url")).alias("c")).collect()]
    assert got == [want for _, want in CASES]


def test_dedup_by_url_keeps_best(spark):
    rows = [
        (1, "https://h.io/p?utm_source=a", 10),
        (2, "HTTPS://h.io:443/p/", 99),   # same canonical URL, higher quality
        (3, "https://h.io/p#x", 99),      # tie on quality -> lower id wins
        (4, "https://h.io/other", 5),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "url", "quality"])
    out = {r.url_canon: r for r in
           dedup_by_url(df, "url", "doc_id", prefer_col="quality").collect()}
    assert len(out) == 2
    assert out["https://h.io/p"].doc_id == 2
    assert out["https://h.io/other"].doc_id == 4


def test_dedup_by_url_no_preference_lowest_id(spark):
    rows = [(7, "https://h.io/p"), (3, "https://h.io/p/")]
    df = spark.createDataFrame(rows, ["doc_id", "url"])
    out = dedup_by_url(df, "url", "doc_id").collect()
    assert len(out) == 1 and out[0].doc_id == 3


# -- outlier scoring --------------------------------------------------------


def test_zscore_matches_pandas(docs):
    got = zscore_outliers(docs, "n_chars", ["lang"]).select(
        "doc_id", "lang", "zscore"
    ).toPandas()
    pdf = docs.select("doc_id", "lang", "n_chars").toPandas()
    g = pdf.groupby("lang")["n_chars"]
    expect = (pdf["n_chars"] - g.transform("mean")) / g.transform("std")
    merged = got.set_index("doc_id").join(
        pdf.assign(expect=expect).set_index("doc_id")[["expect"]]
    )
    assert ((merged["zscore"] - merged["expect"]).abs() < 1e-9).all()


def test_zscore_flags_synthetic_outlier(spark, docs):
    extreme = spark.createDataFrame(
        [(999_999, "x" * 5, "en", "src0", 10_000_000)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    out = zscore_outliers(docs.unionByName(extreme), "n_chars", ["lang"], z=3.0)
    flagged = [r.doc_id for r in out.filter("is_outlier").collect()]
    assert 999_999 in flagged


def test_zscore_singleton_group_not_flagged(spark):
    df = spark.createDataFrame([(1, "a", 100), (2, "b", 5), (3, "b", 6)],
                               ["id", "g", "v"])
    out = {r.id: r for r in zscore_outliers(df, "v", ["g"]).collect()}
    assert out[1].group_std is None
    assert out[1].is_outlier is False


# -- unigram LM stats -------------------------------------------------------


def test_unigram_stats_tiny_corpus(spark):
    from v3_polars_spark.datapipe import unigram_stats

    rows = [(1, "a a b"), (2, "a b c"), (3, "A  a")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in unigram_stats(df, min_count=2).collect()}
    # corpus counts: a=5 (case-folded), b=2, c=1
    assert out[1].n_tokens == 3 and out[1].sum_freq == 5 + 5 + 2
    assert out[1].n_oov == 0
    assert out[2].n_oov == 1  # c below min_count
    assert out[3].n_tokens == 2 and out[3].sum_freq == 10
    # logprob is a ranking signal: all-common doc 3 beats rare-token doc 2
    assert out[3].lm_logprob / out[3].n_tokens > out[2].lm_logprob / out[2].n_tokens


def test_corr_exact_matches_numpy(spark, docs):
    import numpy as np

    from v3_polars_spark.datapipe import corr_exact

    pdf = docs.select("lang", "n_chars").toPandas()
    pdf["n2"] = (pdf["n_chars"] * 3 + (pdf["n_chars"] % 7)).astype(float)
    df = spark.createDataFrame(pdf.assign(n_chars=pdf.n_chars.astype(float)))
    got = {r.lang: r.corr for r in
           corr_exact(df, "n_chars", "n2", ["lang"]).collect()}
    for lang, grp in pdf.groupby("lang"):
        want = np.corrcoef(grp["n_chars"], grp["n2"])[0, 1]
        assert abs(got[lang] - want) < 1e-9


def test_corr_exact_degenerate_groups(spark):
    from v3_polars_spark.datapipe import corr_exact

    df = spark.createDataFrame(
        [("a", 1.0, 2.0), ("b", 1.0, 3.0), ("b", 1.0, 4.0)], ["g", "x", "y"]
    )
    out = {r.g: r for r in corr_exact(df, "x", "y", ["g"]).collect()}
    assert out["a"].corr is None   # n < 2
    assert out["b"].corr is None   # zero x-variance
