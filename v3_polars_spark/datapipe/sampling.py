"""Deterministic sampling and source-mixing operators for training-data
pipelines.

Random sampling is the wrong primitive at 100 TB: reruns must reproduce
the same corpus byte-for-byte, samples must not depend on partitioning or
row order, and an auditor must be able to verify membership of any single
row without rerunning the job. Every operator here is therefore HASH
deterministic — a row's fate is a pure function of its id and the seed:

- ``hash_u01``: uniform [0,1) from the md5 prefix of (seed, key) — the
  same engine-portable 56-bit construction the dedup family uses, so SQL
  oracles replay selections exactly.
- ``sample_fraction``: keep rows with u01 < fraction. Shuffle-free (a
  filter over the scan); composes with any downstream op.
- ``sample_stratified``: per-stratum exact-count sampling — rank rows
  within each stratum by hash and keep the first n (or ceil(fraction *
  stratum size)). One shuffle on the strata keys; the rank window
  partitions by stratum, so no global sort.
- ``source_mix``: weighted multi-epoch mixing (the Dolma/LLM-mix recipe):
  weight 2.4 on a source means every row appears twice and a
  hash-selected 40% appear a third time. Emits (row, epoch) so downstream
  shuffling/packing can interleave epochs; explode of a per-row epoch
  array — no join, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DENOM = float(1 << 56)


def hash_u01(key: Column, seed: int = 0) -> Column:
    """Deterministic uniform [0,1): 56-bit md5-prefix int of (seed, key),
    divided by 2^56. Engine-portable (md5 + hex->int + divide)."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{seed}:"), key.cast("string"))), 1, 14
        ),
        16,
        10,
    ).cast("long")
    return h / F.lit(_DENOM)


def sample_fraction(
    df: DataFrame, fraction: float, key_col: str = "doc_id", seed: int = 0
) -> DataFrame:
    """Keep ~fraction of rows, hash-deterministically: a row survives iff
    u01(seed, key) < fraction. Reruns, re-partitions, and other engines
    select the IDENTICAL rows. Pure filter — no shuffle, pushes past
    column pruning."""
    return df.filter(hash_u01(F.col(key_col), seed) < F.lit(float(fraction)))


def sample_stratified(
    df: DataFrame,
    strata: list[str],
    n_per_stratum: int | None = None,
    fraction: float | None = None,
    key_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Exact per-stratum sampling: within each ``strata`` group, rank rows
    by (hash, key) and keep the first ``n_per_stratum`` (or
    ceil(fraction * stratum_size) with ``fraction``). Deterministic and
    order-independent; ties impossible (the key breaks them).

    Scale shape: ONE shuffle on the strata keys for the rank window (and
    a count window over the same partition when ``fraction`` is used —
    same exchange, no extra shuffle). Skewed strata parallelize no worse
    than the data itself."""
    if (n_per_stratum is None) == (fraction is None):
        raise ValueError("pass exactly one of n_per_stratum / fraction")
    from pyspark.sql import Window

    w = Window.partitionBy(*strata).orderBy(
        hash_u01(F.col(key_col), seed).asc(), F.col(key_col).asc()
    )
    ranked = df.withColumn("__rk", F.row_number().over(w))
    if n_per_stratum is not None:
        keep = F.col("__rk") <= F.lit(int(n_per_stratum))
    else:
        wc = Window.partitionBy(*strata)
        ranked = ranked.withColumn("__n", F.count(F.lit(1)).over(wc))
        keep = F.col("__rk") <= F.ceil(F.col("__n") * F.lit(float(fraction)))
    return ranked.filter(keep).drop("__rk", "__n")


def source_mix(
    df: DataFrame,
    weights: dict[str, float],
    source_col: str = "source",
    key_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Weighted multi-epoch source mixing: a source with weight w emits
    floor(w) full copies of every row plus one extra copy for the
    hash-selected frac(w) of rows. Sources absent from ``weights`` default
    to 1.0. Output: input columns + ``epoch`` (0-based copy index).

    This is the standard LLM-mix recipe (upweight books, downsample web)
    expressed as per-row column math + one explode — no join, no shuffle,
    and the SAME rows get the extra epoch on every run and engine."""
    whole = F.lit(None).cast("int")
    frac = F.lit(None).cast("double")
    for src, w in weights.items():
        whole = F.when(F.col(source_col) == src, F.lit(int(w))).otherwise(whole)
        frac = F.when(F.col(source_col) == src, F.lit(float(w) - int(w))).otherwise(
            frac
        )
    whole = F.coalesce(whole, F.lit(1))
    frac = F.coalesce(frac, F.lit(0.0))
    n_copies = whole + F.when(
        hash_u01(F.col(key_col), seed) < frac, F.lit(1)
    ).otherwise(F.lit(0))
    out = df.withColumn(
        "epoch",
        F.explode(
            F.when(
                n_copies > 0, F.sequence(F.lit(0), n_copies - 1)
            ).otherwise(F.array().cast("array<int>"))
        ),
    )
    return out.withColumn("epoch", F.col("epoch").cast("long"))


def pack_offsets(
    df: DataFrame,
    tokens_col: str,
    order_cols: list[str],
    max_len: int,
    by: list[str] | None = None,
) -> DataFrame:
    """Sequence-packing layout (the GPT-style concatenate-and-split
    recipe): documents are laid out contiguously in ``order_cols`` order
    and the token stream is cut into fixed ``max_len`` sequences; a
    document may span a cut. Emits per document: ``start_offset`` /
    ``end_offset`` in the token stream, ``first_seq`` / ``last_seq``
    (which packed sequences contain it) and ``offset_in_seq``.

    Scale shape: one prefix-sum window partitioned by ``by`` (the shard
    key — packing is per output shard, so there is NO global order and no
    single-task stage; pass by=None only for small corpora). All integer
    column math — exact on every engine."""
    from pyspark.sql import Window

    by = by or []
    w = (
        Window.partitionBy(*by)
        .orderBy(*[F.col(c).asc() for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    t = F.col(tokens_col).cast("long")
    start = F.coalesce(F.sum(t).over(w), F.lit(0).cast("long"))
    out = df.withColumn("start_offset", start).withColumn(
        "end_offset", F.col("start_offset") + t
    )
    first_seq = F.floor(F.col("start_offset") / F.lit(max_len)).cast("long")
    last_seq = F.floor((F.col("end_offset") - 1) / F.lit(max_len)).cast("long")
    return (
        out.withColumn("first_seq", first_seq)
        .withColumn("last_seq", F.when(t > 0, last_seq).otherwise(first_seq))
        .withColumn(
            "offset_in_seq",
            F.col("start_offset") - F.col("first_seq") * F.lit(max_len),
        )
    )


def split_train_val_test(
    df: DataFrame,
    key_col: str = "doc_id",
    val_fraction: float = 0.05,
    test_fraction: float = 0.05,
    seed: int = 0,
    out: str = "split",
) -> DataFrame:
    """Hash-deterministic 3-way split: a row's split is a pure function
    of (seed, key), so the assignment survives reruns, repartitioning,
    and incremental appends (a new row never moves an old one — the
    property random splits lack). Disjoint and exhaustive by
    construction: u < test → 'test', u < test+val → 'val', else 'train'.
    """
    u = hash_u01(F.col(key_col), seed)
    return df.withColumn(
        out,
        F.when(u < F.lit(float(test_fraction)), F.lit("test"))
        .when(u < F.lit(float(test_fraction + val_fraction)), F.lit("val"))
        .otherwise(F.lit("train")),
    )


def shuffle_rows(df: DataFrame, key_col: str = "doc_id", seed: int = 0) -> DataFrame:
    """Deterministic global 'shuffle' for training order: sort by the
    hash of (seed, key). Reproducible across runs and engines; different
    seeds give independent orders. One range-partitioned sort — the same
    cost as any total order; for shard-local orders sort within
    partitions instead (sortWithinPartitions on the same key)."""
    return df.orderBy(hash_u01(F.col(key_col), seed), F.col(key_col))


def sample_weighted(
    df: DataFrame,
    weight_col: str,
    k: int,
    key_col: str = "doc_id",
    by: list[str] | None = None,
    seed: int = 0,
) -> DataFrame:
    """Deterministic weight-proportional sampling without replacement
    (Efraimidis–Spirtsis A-ES): rank rows by u01^(1/w) descending and
    keep the top k (per ``by`` group when given). Hash-deterministic like
    every sampler here, so reruns select identical rows; rows with
    non-positive weight are never selected. One window over the group
    (global k uses a TakeOrdered-style sort-limit)."""
    from pyspark.sql import Window

    u = hash_u01(F.col(key_col), seed)
    w = F.col(weight_col).cast("double")
    # log-domain A-ES key: ln(u)/w is monotone in u^(1/w), avoids pow()
    es_key = F.when(w > 0, F.log(u) / w)
    if by:
        win = Window.partitionBy(*by).orderBy(
            es_key.desc_nulls_last(), F.col(key_col)
        )
        return (
            df.withColumn("__rk", F.row_number().over(win))
            .filter((F.col("__rk") <= k) & w.isNotNull() & (w > 0))
            .drop("__rk")
        )
    return (
        df.filter(w > 0)
        .orderBy(es_key.desc_nulls_last(), F.col(key_col))
        .limit(k)
    )


def pack_sequences(
    df: DataFrame,
    tokens_col: str,
    order_cols: list[str],
    max_len: int,
    by: list[str] | None = None,
    sep_token: str | None = None,
    out_col: str = "tokens",
) -> DataFrame:
    """Materialize the fixed-length packed sequences that
    :func:`pack_offsets` lays out — the final LLM-pretraining data
    layout: documents concatenated in ``order_cols`` order (optionally
    ``sep_token``-terminated), the token stream cut every ``max_len``
    tokens, one output row per packed sequence ``(by..., seq, tokens,
    n_tokens)``. Every sequence is exactly ``max_len`` long except the
    ragged final one per ``by`` group (no padding is inserted — emit
    ``sep_token`` ids downstream if a pad id is wanted).

    Scale shape: the prefix-sum window of ``pack_offsets`` (partitioned
    by ``by`` — pass a shard key at scale so there is no global-order
    single task), one token-level explode (materializing shards IS
    token-volume work), and ONE hash aggregation per sequence via
    sorted-struct collect — the assemble_sequences pattern, no second
    window. All integer math, engine-exact.
    """
    from pyspark.sql import Window  # noqa: F401  (pack_offsets uses it)

    by = by or []
    toks = F.col(tokens_col)
    if sep_token is not None:
        toks = F.concat(toks, F.array(F.lit(sep_token)))
    d = df.withColumn("__ptoks", toks).withColumn(
        "__n", F.size("__ptoks").cast("long")
    )
    laid = pack_offsets(d, "__n", order_cols, max_len, by=by)
    if not by:
        # the global prefix-sum window leaves the frame in ONE partition;
        # redistribute the doc-level rows (cheap — pre-explode) so the
        # token-level explode below runs wide, not in a single task
        laid = laid.repartitionByRange(*order_cols)
    tok = laid.select(
        *by,
        F.col("start_offset"),
        F.posexplode("__ptoks").alias("__pos", "__tok"),
    )
    offset = F.col("start_offset") + F.col("__pos")
    seq = F.floor(offset / F.lit(max_len)).cast("long")
    pos_in_seq = (offset - seq * F.lit(max_len)).cast("long")
    placed = tok.select(
        *by,
        seq.alias("seq"),
        F.struct(pos_in_seq.alias("p"), F.col("__tok").alias("t")).alias("__pt"),
    )
    return (
        placed.groupBy(*by, "seq")
        .agg(
            F.transform(
                F.array_sort(F.collect_list("__pt")), lambda s: s["t"]
            ).alias(out_col)
        )
        .withColumn("n_tokens", F.size(out_col).cast("long"))
    )
