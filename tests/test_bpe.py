"""BPE tokenizer: distributed train parity vs the pure-Python Sennrich
reference, three-way encode parity (column expression / mapInPandas
kernel / per-word Python oracle), the DuckDB replay used by the gate
oracle, and the no-Python no-shuffle plan pin for the expression path."""

import collections
import random

import duckdb
import pytest
from pyspark.sql import functions as F

from v3_polars_spark.datapipe.bpe import (
    EOW,
    bpe_encode,
    bpe_encode_kernel,
    bpe_encode_sql,
    bpe_pair_counts,
    bpe_train,
    encode_word_py,
)

TEXTS = [
    "the lowest lower low low low",
    "newer newest new news the the the",
    "widest wide wider new lower the a",
    "aaa baa abab the low newer",
    "  MIXED   Case  Whitespace the low ",
]


def ref_train(texts, num_merges, min_pair_count=2):
    """Sennrich et al. 2016 reference trainer (learn_bpe.py semantics:
    argmax pair by count with deterministic (a, b) tiebreak, replace all
    occurrences greedily left-to-right, iterate)."""
    wc = collections.Counter()
    for t in texts:
        for w in " ".join(t.lower().split()).split(" "):
            if w:
                wc[w] += 1
    vocab = {tuple(list(w[:-1]) + [w[-1] + EOW]): c for w, c in wc.items()}
    merges = []
    for _ in range(num_merges):
        pairs = collections.Counter()
        for syms, c in vocab.items():
            for p in zip(syms, syms[1:]):
                pairs[p] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        a, b = best[0]
        merges.append((a, b))
        nv = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nv[tuple(out)] = nv.get(tuple(out), 0) + c
        vocab = nv
    return merges


def py_encode_text(text, merges):
    ranks = {m: i for i, m in enumerate(merges)}
    norm = " ".join(text.lower().split())
    return [t for w in norm.split(" ") if w for t in encode_word_py(w, ranks)]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)], ["doc_id", "text"])


@pytest.fixture(scope="module")
def merges(corpus):
    return bpe_train(corpus, 12, materialize_every=5)


def test_train_matches_sennrich_reference(merges):
    assert merges == ref_train(TEXTS, 12)
    assert len(merges) == 12


def test_train_early_stop(corpus):
    # a huge min_pair_count leaves nothing to merge
    assert bpe_train(corpus, 5, min_pair_count=10**9) == []


def test_encode_three_way_parity(corpus, merges):
    expr = {r.doc_id: r.bpe_tokens for r in bpe_encode(corpus, merges).collect()}
    kern = {r.doc_id: r.bpe_tokens for r in bpe_encode_kernel(corpus, merges).collect()}
    for i, t in enumerate(TEXTS):
        py = py_encode_text(t, merges)
        assert expr[i] == kern[i] == py, (t, expr[i], kern[i], py)


def test_encode_dispatches_to_kernel_above_threshold(corpus, merges):
    out = bpe_encode(corpus, merges, expr_max_merges=3)
    # kernel path: plan contains a Python map stage
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan


def test_expression_plan_is_jvm_only_no_shuffle(corpus, merges):
    from v3_polars_spark.plans import explain_str

    out = bpe_encode(corpus, merges)
    plan = explain_str(out)
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "Exchange"):
        assert marker not in plan, plan


def test_overlap_and_edge_words(spark):
    rows = [(0, "aaa aaaa aa a"), (1, ""), (2, "   "), (3, "x"), (4, "héllo café")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    merges = [("a", "a"), ("aa", "aa"), ("a", f"a{EOW}")]
    got = {r.doc_id: r.bpe_tokens for r in bpe_encode(df, merges).collect()}
    kern = {r.doc_id: r.bpe_tokens for r in bpe_encode_kernel(df, merges).collect()}
    for i, t in rows:
        assert got[i] == kern[i] == py_encode_text(t, merges), (t, got[i])
    # greedy left-to-right with rank-order application:
    # 'aaa'  = [a,a,a</w>]   -(a,a)-> [aa, a</w>]
    # 'aaaa' = [a,a,a,a</w>] -(a,a)-> [aa, a, a</w>] -(a,a</w>)-> [aa, aa</w>]
    assert got[0][:2] == ["aa", f"a{EOW}"]
    assert got[0][2:4] == ["aa", f"aa{EOW}"]
    assert got[3] == [f"x{EOW}"]
    assert got[1] == [] and got[2] == []


def test_duckdb_replay_matches_expression(corpus, merges):
    word_expr = bpe_encode_sql(merges)
    q = f"""
        SELECT doc_id,
               flatten(list_transform(
                   list_filter(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
                               w0 -> w0 <> ''),
                   w -> {word_expr}
               )) AS toks
        FROM corpus ORDER BY doc_id
    """
    con = duckdb.connect()
    con.register("corpus", corpus.toPandas())
    duck = {r[0]: r[1] for r in con.execute(q).fetchall()}
    spark_out = {r.doc_id: r.bpe_tokens for r in bpe_encode(corpus, merges).collect()}
    assert duck == spark_out


def test_pair_counts_match_reference(corpus):
    got = {
        (r.a, r.b): r.pair_count
        for r in bpe_pair_counts(corpus).collect()
    }
    ref = collections.Counter()
    for t in TEXTS:
        for w in " ".join(t.lower().split()).split(" "):
            if not w:
                continue
            syms = list(w[:-1]) + [w[-1] + EOW]
            for p in zip(syms, syms[1:]):
                ref[p] += 1
    assert got == dict(ref)


def test_pair_counts_after_merges(corpus, merges):
    # applying the full learned merge list and recounting must match the
    # reference trainer's final-state pair statistics
    got = {
        (r.a, r.b): r.pair_count for r in bpe_pair_counts(corpus, merges=merges).collect()
    }
    wc = collections.Counter()
    for t in TEXTS:
        for w in " ".join(t.lower().split()).split(" "):
            if w:
                wc[w] += 1
    ranks = {m: i for i, m in enumerate(merges)}
    ref = collections.Counter()
    for w, c in wc.items():
        syms = encode_word_py(w, ranks)
        for p in zip(syms, syms[1:]):
            ref[p] += c
    assert got == dict(ref)


def test_fuzz_random_corpus_parity(spark):
    rng = random.Random(1234)
    alpha = "abcx"
    texts = [
        " ".join(
            "".join(rng.choice(alpha) for _ in range(rng.randint(1, 6)))
            for _ in range(rng.randint(1, 10))
        )
        for _ in range(30)
    ]
    merges = ref_train(texts, 10)
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])
    assert bpe_train(df, 10, materialize_every=4) == merges
    expr = {r.doc_id: r.bpe_tokens for r in bpe_encode(df, merges).collect()}
    for i, t in enumerate(texts):
        assert expr[i] == py_encode_text(t, merges), (t, expr[i])


# ---------------------------------------------------------------------------
# pack_sequences + token_id_map (the dp_token_shards building blocks)
# ---------------------------------------------------------------------------


def test_pack_sequences_reassembly_and_lengths(spark):
    from v3_polars_spark.datapipe import pack_sequences

    rows = [
        (0, ["a", "b", "c"]),
        (1, []),                       # empty doc -> just the separator
        (2, ["d"] * 7),
        (3, ["e", "f"]),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "toks"])
    out = pack_sequences(df, "toks", ["doc_id"], max_len=5, sep_token="<s>").collect()
    by_seq = {r.seq: r for r in out}
    # expected stream: a b c <s> <s> d d d d d d d <s> e f <s>
    stream = []
    for _, t in rows:
        stream += t + ["<s>"]
    exp = {i: stream[i * 5:(i + 1) * 5] for i in range((len(stream) + 4) // 5)}
    assert {k: v.tokens for k, v in by_seq.items()} == exp
    for k, v in by_seq.items():
        assert v.n_tokens == len(exp[k])
        if k < max(exp):
            assert v.n_tokens == 5  # every non-final sequence is full


def test_pack_sequences_by_group_independent_streams(spark):
    from v3_polars_spark.datapipe import pack_sequences

    rows = [("x", 0, ["a", "b", "c"]), ("x", 1, ["d", "e"]),
            ("y", 0, ["p", "q", "r", "s"])]
    df = spark.createDataFrame(rows, ["grp", "doc_id", "toks"])
    out = pack_sequences(df, "toks", ["doc_id"], max_len=3, by=["grp"]).collect()
    got = {(r.grp, r.seq): r.tokens for r in out}
    assert got == {
        ("x", 0): ["a", "b", "c"],
        ("x", 1): ["d", "e"],
        ("y", 0): ["p", "q", "r"],
        ("y", 1): ["s"],
    }


def test_token_id_map_deterministic_dense(spark):
    from v3_polars_spark.datapipe import token_id_map

    df = spark.createDataFrame([(0, ["b", "a", "b"]), (1, ["c", "a"])], ["i", "toks"])
    vocab = {r.token: r.token_id for r in token_id_map(df, "toks").collect()}
    assert vocab == {"a": 0, "b": 1, "c": 2}
    # pure function of the token set: repartitioned input, same mapping
    vocab2 = {
        r.token: r.token_id
        for r in token_id_map(df.repartition(7), "toks").collect()
    }
    assert vocab2 == vocab


def test_bpe_encode_streams_unchanged(spark, tmp_path):
    """The expression encode is stateless, so the SAME bpe_encode call
    runs on a readStream source; availableNow drain ≡ batch."""
    src = str(tmp_path / "docs")
    sink = str(tmp_path / "enc_sink")
    ckpt = str(tmp_path / "enc_ckpt")
    rows = [(i, t) for i, t in enumerate(TEXTS)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    df.write.parquet(src)
    merges = [("t", "h"), ("th", "e</w>"), ("l", "o")]

    stream = spark.readStream.schema(df.schema).parquet(src)
    q = (
        bpe_encode(stream, merges)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        r.doc_id: r.bpe_tokens for r in spark.read.parquet(sink).collect()
    }
    want = {r.doc_id: r.bpe_tokens for r in bpe_encode(df, merges).collect()}
    assert got == want


def test_strategy_param_dispatch_and_parity(corpus, merges):
    expr = bpe_encode(corpus, merges, strategy="expr")
    kern = bpe_encode(corpus, merges, strategy="kernel")
    assert "MapInPandas" not in expr._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in kern._jdf.queryExecution().executedPlan().toString()
    a = {r.doc_id: r.bpe_tokens for r in expr.collect()}
    b = {r.doc_id: r.bpe_tokens for r in kern.collect()}
    assert a == b
    with pytest.raises(ValueError):
        bpe_encode(corpus, merges, strategy="nope")


def test_sql_replay_with_quote_bearing_tokens(spark):
    """Apostrophes in words/merges must survive the literal emission in
    bpe_encode_sql (escaped, not injected)."""
    rows = [(0, "don't can't o'clock don't")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    merges = [("'", "t</w>"), ("n", "'t</w>"), ("o", "n't</w>")]
    spark_out = {r.doc_id: r.bpe_tokens for r in bpe_encode(df, merges).collect()}
    assert spark_out[0][:2] == ["d", "on't</w>"]
    word_expr = bpe_encode_sql(merges)
    q = f"""
        SELECT doc_id,
               flatten(list_transform(
                   list_filter(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
                               w0 -> w0 <> ''),
                   w -> {word_expr}
               )) AS toks
        FROM corpus
    """
    con = duckdb.connect()
    con.register("corpus", df.toPandas())
    duck = {r[0]: r[1] for r in con.execute(q).fetchall()}
    assert duck == spark_out


def test_save_load_merges_roundtrip(spark, tmp_path, merges):
    from v3_polars_spark.datapipe.bpe import load_merges, save_merges

    p = str(tmp_path / "merges")
    save_merges(spark, merges, p)
    assert load_merges(spark, p) == list(merges)


# ---------------------------------------------------------------------------
# round-10 hardening: Unicode-whitespace parity, merge-table validation,
# expr-depth guard, split('') canary
# ---------------------------------------------------------------------------


def test_encode_parity_non_ascii_whitespace(spark):
    """Java \\s is ASCII-only: NBSP (\\xa0), FS (\\x1c), NEL (\\x85),
    thin space (\\u2009) are NOT word separators. The kernel path must
    agree with the expression path (and the DuckDB replay) on corpora
    containing them — regression for the str.split() Unicode-whitespace
    divergence ('x\\x1cy' used to kernel-encode as two words)."""
    rows = [
        (0, "x\x1cy"),
        (1, "a\xa0b a b"),
        (2, "thin space the"),
        (3, "nel\x85sep low"),
        (4, "\xa0lead and trail\xa0"),
        (5, "tab\tand\nnewline\x0bvt\fff\rcr"),  # ASCII \s: ALL separators
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    merges = [("t", "h"), ("th", "e</w>"), ("l", "o"), ("a", "n")]
    expr = {r.doc_id: r.bpe_tokens for r in bpe_encode(df, merges).collect()}
    kern = {r.doc_id: r.bpe_tokens for r in bpe_encode_kernel(df, merges).collect()}
    assert expr == kern, (expr, kern)
    # spot-check the semantics, not just agreement: \x1c stays inside
    # the word; \t \n \x0b \f \r all split
    assert expr[0] == ["x", "\x1c", "y</w>"]
    assert expr[5] == [
        "t", "a", "b</w>", "an", "d</w>", "n", "e", "w", "l", "i", "n",
        "e</w>", "v", "t</w>", "f", "f</w>", "c", "r</w>",
    ]


def test_validate_merges_rejects_inconsistent_table(spark):
    from v3_polars_spark.datapipe.bpe import (
        load_merges,
        save_merges,
        validate_merges,
    )

    # 'ab' is never produced before rank 0: the expr path (rank order)
    # would leave [ab, c</w>] while the kernel priority loop reaches
    # [abc</w>] — the exact silent-divergence shape validation blocks
    bad = [("ab", "c</w>"), ("a", "b")]
    with pytest.raises(ValueError, match="inconsistent merge table"):
        validate_merges(bad)
    df = spark.createDataFrame([(0, "abc")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="inconsistent merge table"):
        bpe_encode(df, bad)
    # kernel semantics are well-defined for any table: explicit opt-outs
    out = bpe_encode(df, bad, strategy="kernel").collect()
    assert out[0].bpe_tokens == ["abc</w>"]  # priority loop fully merges
    got = bpe_encode(df, bad, strategy="kernel", validate=False)
    assert got.collect()[0].bpe_tokens == ["abc</w>"]
    # load_merges validates external tables by default
    import tempfile

    p = tempfile.mkdtemp(prefix="bad_merges_") + "/m"
    save_merges(spark, bad, p)
    with pytest.raises(ValueError, match="inconsistent merge table"):
        load_merges(spark, p)
    assert load_merges(spark, p, validate=False) == bad
    # consistent tables pass: EOW bases and products of earlier merges
    validate_merges([("'", "t</w>"), ("n", "'t</w>"), ("o", "n't</w>")])
    # ADVICE r10: validate=False with the DEFAULT strategy must NOT
    # silently route a small inconsistent table through the rank-order
    # expr path — 'auto' resolves to the kernel under validate=False,
    # so the opt-out really does give priority-loop semantics
    auto_out = bpe_encode(df, bad, validate=False).collect()
    assert auto_out[0].bpe_tokens == ["abc</w>"]


def test_expr_strategy_merge_depth_guard(spark):
    """strategy='expr' past expr_max_merges raises a clear error instead
    of a raw JVM StackOverflowError mid-plan (worst on stream threads);
    explicitly raising the ceiling is the documented override."""
    df = spark.createDataFrame([(0, "ab")], ["doc_id", "text"])
    merges = [("a", "b</w>")] * 50  # depth 50 > default ceiling 48
    with pytest.raises(ValueError, match="expr_max_merges"):
        bpe_encode(df, merges, strategy="expr")
    # auto silently takes the kernel at this depth — no error
    plan = (
        bpe_encode(df, merges)._jdf.queryExecution().executedPlan().toString()
    )
    assert "MapInPandas" in plan
    # explicit override still builds the expression plan
    out = bpe_encode(df, merges, strategy="expr", expr_max_merges=64)
    assert out.collect()[0].bpe_tokens == ["ab</w>"]


def test_split_empty_string_canary(spark):
    """word_symbols depends on split(word, '') emitting no trailing ''
    element; the builder filters empties defensively, and this canary
    fails loudly if a Spark upgrade changes the underlying split."""
    row = spark.range(1).select(F.split(F.lit("abc"), "").alias("cs")).first()
    assert row.cs == ["a", "b", "c"]
    from v3_polars_spark.datapipe.bpe import word_symbols

    syms = (
        spark.range(1)
        .select(word_symbols(F.lit("abc")).alias("s"))
        .first()
        .s
    )
    assert syms == ["a", "b", "c</w>"]


# ---------------------------------------------------------------------------
# batched trainer (round 10): exact application, batch_k=1 == sequential,
# disjoint-top-k == sequential, consistency of the output table
# ---------------------------------------------------------------------------


def test_auto_batch_k_policy_steps():
    """Pin the batch_k='auto' policy function (VERDICT r10 #5): halve
    (floor 8) below 50% fill, double (cap 256) after two consecutive
    full rounds, hold otherwise."""
    from v3_polars_spark.datapipe.bpe import _next_batch_k

    # low fill halves and resets the streak
    assert _next_batch_k(64, 31, 64, 1) == (32, 0)
    assert _next_batch_k(64, 0, 64, 0) == (32, 0)
    # floor
    assert _next_batch_k(8, 1, 8, 0) == (8, 0)
    # exactly-half fill is NOT low (threshold is strict <)
    assert _next_batch_k(64, 32, 64, 0) == (64, 0)
    # partial-but-decent fill holds and resets the streak
    assert _next_batch_k(64, 50, 64, 1) == (64, 0)
    # first full round arms the streak, second doubles
    assert _next_batch_k(64, 64, 64, 0) == (64, 1)
    assert _next_batch_k(64, 64, 64, 1) == (128, 0)
    # cap
    assert _next_batch_k(256, 256, 256, 1) == (256, 0)
    # a short final ask (want < k) still counts as full when filled
    assert _next_batch_k(64, 10, 10, 1) == (128, 0)


def test_train_batched_auto_default_works_and_validates(spark):
    """batch_k defaults to 'auto': training runs the adaptive policy
    end-to-end, returns a consistent table, and on a disjoint-top corpus
    (every round fully admitted) equals the explicit-k table."""
    from v3_polars_spark.datapipe.bpe import bpe_train_batched, validate_merges

    tiers = list(zip("abcdefgh", [12, 11, 10, 9, 8, 7, 6, 5]))
    texts = [c * 2 for c, n in tiers for _ in range(n)]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = bpe_train_batched(df, 8, materialize_every=1)  # default auto
    validate_merges(got)
    assert got == bpe_train_batched(df, 8, batch_k=64, materialize_every=1)
    with pytest.raises(ValueError, match="batch_k"):
        bpe_train_batched(df, 8, batch_k=0)


def test_train_batched_k1_equals_sequential(corpus, merges):
    from v3_polars_spark.datapipe.bpe import bpe_train_batched

    got = bpe_train_batched(corpus, 12, batch_k=1, materialize_every=5)
    assert got == list(merges) == ref_train(TEXTS, 12)


def test_train_batched_disjoint_topk_equals_sequential(spark):
    """Non-cascading corpus (each word collapses to one terminal symbol,
    no merge creates a new pair): every round's top-k pairs are mutually
    disjoint and the batched table equals sequential Sennrich
    merge-for-merge across two full rounds (8 merges, k=4)."""
    from v3_polars_spark.datapipe.bpe import bpe_train_batched

    tiers = list(zip("abcdefgh", [12, 11, 10, 9, 8, 7, 6, 5]))
    texts = [c * 2 for c, n in tiers for _ in range(n)]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    seq = ref_train(texts, 8)
    assert bpe_train(df, 8) == seq
    got = bpe_train_batched(df, 8, batch_k=4, materialize_every=1)
    assert got == seq == [(c, f"{c}{EOW}") for c, _n in tiers]


def test_train_batched_cascade_is_the_documented_approximation(spark):
    """The known divergence shape, pinned: merging (a,a</w>) mints
    (aa,aa</w>) at full count mid-round, which sequential Sennrich takes
    IMMEDIATELY but a batch cannot see until the next round. Both tables
    must still contain the same merges for this corpus — only the order
    differs — and both must be consistent tables."""
    from v3_polars_spark.datapipe.bpe import bpe_train_batched, validate_merges

    texts = ["aaaa"] * 12 + ["bbbb"] * 11 + ["cccc"] * 10 + ["dddd"] * 9
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    seq = ref_train(texts, 8)
    got = bpe_train_batched(df, 8, batch_k=4, materialize_every=1)
    assert got != seq  # selection approximation, by design
    validate_merges(got)
    # round 1 agrees with sequential merges 1-4 (the char tier); the
    # cascade products land in round 2 instead of interleaved
    assert got[:4] == seq[:4] == [
        ("a", "a"), ("b", "b"), ("c", "c"), ("d", "d")
    ]
    assert len(got) == 8
    # sequential interleaves the minted products immediately:
    # seq[5] == (aa, aa</w>); the batch defers them one round
    assert seq[5] == ("aa", f"aa{EOW}")
    assert got[4:] == [
        ("a", f"a{EOW}"), ("b", f"b{EOW}"),
        ("c", f"c{EOW}"), ("d", f"d{EOW}"),
    ]


def test_train_batched_output_is_consistent_and_encodes_parity(corpus):
    """Whatever the batched trainer returns must be a CONSISTENT merge
    table (validate_merges passes) and encode identically via expr,
    kernel, and the pure-Python priority loop."""
    from v3_polars_spark.datapipe.bpe import bpe_train_batched, validate_merges

    got = bpe_train_batched(corpus, 12, batch_k=4, materialize_every=2)
    assert len(got) == 12
    validate_merges(got)
    expr = {r.doc_id: r.bpe_tokens for r in bpe_encode(corpus, got).collect()}
    kern = {
        r.doc_id: r.bpe_tokens for r in bpe_encode_kernel(corpus, got).collect()
    }
    for i, t in enumerate(TEXTS):
        assert expr[i] == kern[i] == py_encode_text(t, got), (t, expr[i])


def test_train_batched_accepts_precomputed_word_counts(spark, corpus):
    """words_df short-circuits the corpus scan — the 100 TB posture
    where the (word, wcount) table is built once by the pipeline."""
    from v3_polars_spark.datapipe.bpe import bpe_train_batched, word_counts

    wc = word_counts(corpus)
    got = bpe_train_batched(None, 6, batch_k=3, words_df=wc)
    assert got == bpe_train_batched(corpus, 6, batch_k=3)
    assert bpe_train(None, 6, words_df=wc) == bpe_train(corpus, 6)


def test_merge_fold_multi_equals_sequential_folds(spark):
    """Random disjoint batches: one combined pass == sequential
    per-merge folds, including symbols containing ':' (the map key is
    length-prefixed) and an (x, x) self-pair."""
    from v3_polars_spark.datapipe.bpe import merge_fold, merge_fold_multi

    rows = [
        (0, ["a", "b", "c", "d", "a", "b"]),
        (1, ["x", "x", "x", "y:", ":z", "q</w>"]),
        (2, ["a", "a", "b", "b", "c", "d"]),
        (3, []),
        (4, ["d"]),
    ]
    batch = [("a", "b"), ("c", "d"), ("x", "x"), ("y:", ":z")]
    df = spark.createDataFrame(rows, ["i", "syms"])
    multi = {
        r.i: r.out
        for r in df.select(
            "i", merge_fold_multi(F.col("syms"), batch).alias("out")
        ).collect()
    }
    col = F.col("syms")
    for a, b in batch:
        col = merge_fold(col, a, b)
    seq = {r.i: r.out for r in df.select("i", col.alias("out")).collect()}
    assert multi == seq
    assert multi[0] == ["ab", "cd", "ab"]
    assert multi[1] == ["xx", "x", "y::z", "q</w>"]


def test_admit_disjoint_rules(spark):
    from v3_polars_spark.datapipe.bpe import _admit_disjoint

    cands = [
        ("a", "b", 100),   # admitted
        ("b", "c", 90),    # shares operand b -> skipped
        ("ab", "x", 80),   # operand 'ab' == admitted concat -> skipped
        ("c", "d", 70),    # admitted
        ("e", "cd", 60),   # operand == admitted concat -> skipped
        ("e", "f", 50),    # admitted
        ("g", "h", 40),    # beyond batch_k=3 -> cut
    ]
    assert _admit_disjoint(cands, 3) == [("a", "b"), ("c", "d"), ("e", "f")]
    # concat minting an admitted operand is blocked: admitted ('ab','c')
    # first, then ('a','b') would CREATE new 'ab' symbols -> skipped
    cands2 = [("ab", "c", 100), ("a", "b", 90), ("x", "y", 80)]
    assert _admit_disjoint(cands2, 3) == [("ab", "c"), ("x", "y")]
