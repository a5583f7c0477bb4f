"""Streaming training-shard packer: turn a tokenized document stream
into fixed-length packed sequences incrementally, with exactly-once
state.

The batch side (``datapipe.sampling.pack_sequences``) materializes the
concatenate-and-split layout in one job; a 100 TB ingest pipeline wants
the same layout maintained AS DOCUMENTS LAND, without repacking the
corpus per trigger. Per micro-batch (``foreachBatch``):

1. read the carry state: the next sequence index plus the (< max_len)
   remainder tokens left by the previous trigger — ONE tiny row, never
   the shard store;
2. lay the batch's token arrays (deterministic ``id_col`` order within
   the batch — packing order is ARRIVAL order, which is the semantics of
   streaming packing) after the remainder and cut full ``max_len``
   sequences with the same ``pack_sequences`` fold the batch op uses;
3. commit the full sequences PLUS the new carry row as ONE
   ``state_store`` batch dir — a single rename, so shards and carry can
   never diverge (no window where one is visible without the other), and
   a replayed batch whose dir exists is an exactly-once no-op.

Per-trigger cost is O(batch tokens): the carry is at most ``max_len - 1``
tokens, committed shard dirs are never re-read, and the remainder math
keeps the carry offset on a ``max_len`` boundary so sequence indices are
a pure function of the arrival-ordered token stream — streamed shards
are row-identical to one batch ``pack_sequences`` over the same arrival
order (pinned in tests for in-order splits, any schedule).

``compact_packed_shards`` rewrites accumulated per-trigger dirs into
right-sized segments on the shared covers-manifest protocol
(``state_store.commit_compacted``); stale carry rows (only the newest
batch's carry is live, and the newest batch is excluded) are dropped at
compaction.

Upstream tokenization composes freely: ``datapipe.bpe.bpe_encode``'s
expression path is stateless, so ``bpe_encode(readStream(...), merges)``
feeds this packer without any extra state.

**Shard-keyed mode** (``by=`` — the 100 TB posture, mirroring
``pack_sequences(by=...)``): without a shard key every trigger ranks the
batch with a GLOBAL ``row_number()`` window, so one task materializes
every token array in the batch before the pack redistributes — fine for
the oracle-scale stream, a single-task bottleneck at cluster scale.
With ``by=<col>`` the rank window, the pack layout, the sequence
numbering, and the CARRY are all per shard: each shard is an
independent packed stream ``(shard, seq, tokens)`` and every stage runs
width-parallel. Carry state is one row PER LIVE SHARD, carried forward
in every trigger commit (so the newest trigger dir always holds the
full carry set — the O(1) fast path needs no store scan); the shard key
must therefore be a BOUNDED partition label (hash bucket, source tag,
tenant id — never a row id). Fallback carry recovery stays
provenance-free per shard: (seq, n_tokens) is monotone within a shard
for the same reason it is globally.

Measured crossover (BENCH_NOTES "shard-keyed packer trigger-size
scaling", sf1, doubling triggers 31k→281k docs): ``by=`` is ~2x
cheaper per trigger at every size with only 5 shards, and its per-doc
cost falls monotonically as triggers grow (206 → 123 us/doc) while the
global mode keeps a single-task rank/pack premium (417 → 157 us/doc).
Guidance: the global mode is fine at oracle/test scale (its rank task
is small and the code path is simpler); from ~10^4 docs per trigger,
or whenever a bounded shard label exists anyway, use ``by=`` — never
slower in the measured range, advantage widens with trigger size and
shard count.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .state_store import (
    batch_dir,
    batch_id_of,
    commit_compacted,
    commit_write,
    data_dirs,
    gc_covered,
    tmp_glob,
)

_PACKED = "packed"

_SCHEMA = T.StructType(
    [
        T.StructField("seq", T.LongType()),
        T.StructField("tokens", T.ArrayType(T.StringType())),
        T.StructField("n_tokens", T.LongType()),
        T.StructField("is_carry", T.BooleanType()),
    ]
)

# shard-keyed stores prepend the shard label (cast to string — the
# canonical partition-label type; the key is a bounded label, not data)
_SCHEMA_BY = T.StructType(
    [T.StructField("shard", T.StringType())] + list(_SCHEMA.fields)
)


def read_packed_shards(spark, pack_root: str, sharded: bool = False) -> DataFrame:
    """All committed full sequences (seq, tokens, n_tokens; plus
    ``shard`` for a ``by=``-keyed store) — carry rows excluded.
    Readable mid-drain; every committed trigger is final. ``sharded``
    only fixes the schema of an EMPTY store (a non-empty store's files
    carry their own)."""
    dirs = data_dirs(pack_root, _PACKED)
    if not dirs:
        schema = _SCHEMA_BY if sharded else _SCHEMA
        return spark.createDataFrame([], schema).drop("is_carry")
    return (
        spark.read.parquet(*dirs)
        .filter(~F.col("is_carry"))
        .drop("is_carry")
    )


def _newest_carry_dirs(pack_root: str) -> list[str]:
    """Fast-path dir set for the carry readers: the newest trigger dir
    that actually CONTAINS data files. An empty trigger can commit a
    _SUCCESS-only dir (same class data_dirs guards against); globbing
    the raw newest dir would either fail the parquet read or silently
    return an empty carry set and reset every shard's seq/remainder.
    Falls back to the full committed-store scan when no trigger dir
    carries data (e.g. after a full compaction)."""
    trig = [
        d
        for d in glob.glob(os.path.join(pack_root, _PACKED, "batch=*"))
        if batch_id_of(d) >= 0 and glob.glob(os.path.join(d, "part-*"))
    ]
    return [max(trig, key=batch_id_of)] if trig else data_dirs(
        pack_root, _PACKED
    )


def read_pack_carry(spark, pack_root: str) -> tuple[int, list[str]]:
    """The live carry: (next sequence index, remainder tokens).

    Fast path: mid-drain, the newest trigger dir (every commit carries
    exactly one carry row) is read alone — O(1) per trigger regardless
    of store size. Fallback (no trigger dirs left, e.g. after a full
    ``exclude_newest=False`` compaction of a quiesced drain): scan the
    committed store for carry rows. Selection there is provenance-free —
    across triggers the carry's ``(seq, n_tokens)`` is monotonically
    nondecreasing (a trigger either closes sequences, seq strictly
    grows, or extends the remainder in place), so the LIVE carry is the
    max by that key."""
    dirs = _newest_carry_dirs(pack_root)
    if not dirs:
        return 0, []
    rows = (
        spark.read.parquet(*dirs)
        .filter(F.col("is_carry"))
        .orderBy(F.desc("seq"), F.desc("n_tokens"))
        .limit(1)
        .collect()
    )
    if not rows:  # no trigger has committed yet
        return 0, []
    r = rows[0]
    return int(r.seq), list(r.tokens)


def read_pack_carries(spark, pack_root: str) -> dict[str, tuple[int, list[str]]]:
    """Live carries of a SHARD-KEYED store: ``{shard: (next seq index,
    remainder tokens)}``.

    Fast path: the newest trigger dir alone — every trigger commits the
    FULL live carry set (untouched shards carried forward), so this is
    O(#shards) per trigger regardless of store size. Fallback (no
    trigger dirs, e.g. after a full compaction): scan committed carry
    rows and take the per-shard max by (seq, n_tokens) — monotone
    within a shard for the same reason the global carry is."""
    dirs = _newest_carry_dirs(pack_root)
    if not dirs:
        return {}
    w = Window.partitionBy("shard").orderBy(
        F.desc("seq"), F.desc("n_tokens")
    )
    rows = (
        spark.read.parquet(*dirs)
        .filter(F.col("is_carry"))
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .collect()
    )
    return {r.shard: (int(r.seq), list(r.tokens)) for r in rows}


def token_pack_batch_fn(
    spark,
    pack_root: str,
    max_len: int,
    id_col: str = "doc_id",
    tokens_col: str = "bpe_tokens",
    sep_token: str | None = None,
    by: str | None = None,
):
    """The ``foreachBatch`` function :func:`streaming_token_shards`
    runs — exposed so tests can wrap it with failure injection.
    ``by=<col>`` switches to the shard-keyed layout (see module
    docstring): per-shard rank window, per-shard sequence numbering,
    one carry row per live shard."""
    from ..datapipe.sampling import pack_sequences

    if by is not None:
        return _token_pack_batch_fn_by(
            spark, pack_root, max_len, by,
            id_col=id_col, tokens_col=tokens_col, sep_token=sep_token,
        )

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        out_dir = batch_dir(pack_root, _PACKED, batch_id)
        if os.path.isdir(out_dir):
            return  # replay of a committed batch: exactly-once no-op
        for leftover in glob.glob(tmp_glob(out_dir)):
            shutil.rmtree(leftover, ignore_errors=True)

        seq0, rem = read_pack_carry(spark, pack_root)

        toks = F.col(tokens_col)
        if sep_token is not None:
            toks = F.concat(toks, F.array(F.lit(sep_token)))
        ranked = batch_df.select(
            F.row_number()
            .over(Window.orderBy(id_col))
            .cast("long")
            .alias("__rk"),
            toks.alias("__toks"),
        )
        rem_row = spark.createDataFrame(
            [(0, rem)],
            T.StructType(
                [
                    T.StructField("__rk", T.LongType()),
                    T.StructField("__toks", T.ArrayType(T.StringType())),
                ]
            ),
        )
        allr = rem_row.unionByName(ranked)
        packed = pack_sequences(allr, "__toks", ["__rk"], max_len).select(
            (F.col("seq") + F.lit(seq0)).alias("seq"),
            F.col("tokens"),
            F.col("n_tokens"),
        )
        # the carry offset is always a max_len boundary, so the number of
        # FULL sequences this trigger closes is total // max_len
        n_total = len(rem) + int(
            ranked.agg(
                F.coalesce(F.sum(F.size("__toks")), F.lit(0))
            ).collect()[0][0]
        )
        next_seq0 = seq0 + n_total // max_len
        full = packed.filter(F.col("seq") < F.lit(next_seq0)).withColumn(
            "is_carry", F.lit(False)
        )
        tail = packed.filter(F.col("seq") >= F.lit(next_seq0)).collect()
        new_rem = list(tail[0].tokens) if tail else []
        carry_row = spark.createDataFrame(
            [(next_seq0, new_rem, len(new_rem), True)], _SCHEMA
        )
        commit_write(full.unionByName(carry_row), out_dir)

    return _apply


def _token_pack_batch_fn_by(
    spark,
    pack_root: str,
    max_len: int,
    by: str,
    id_col: str = "doc_id",
    tokens_col: str = "bpe_tokens",
    sep_token: str | None = None,
):
    """Shard-keyed trigger body: every stage — rank window, pack
    layout, sequence numbering, carry — is per shard, so no single
    task ever holds the whole trigger. Driver state per trigger is
    O(#live shards): the per-shard token totals (a bounded collect) and
    the <max_len-token tails.

    The trigger runs THREE actions (totals collect, data write, tails
    collect); the ranked projection is persisted so all three see ONE
    materialization of the row_number ranks — without it, duplicate
    ``id_col`` values within a shard could tie-break differently across
    recomputations and commit a carry inconsistent with the written
    sequences (token loss/duplication). ``id_col`` should still be
    unique per shard, as for the global path: ranks of genuinely tied
    ids are pinned by the persist here, but cross-TRIGGER arrival order
    of tied ids is inherently undefined."""
    from ..datapipe.sampling import pack_sequences

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        out_dir = batch_dir(pack_root, _PACKED, batch_id)
        if os.path.isdir(out_dir):
            return  # replay of a committed batch: exactly-once no-op
        for leftover in glob.glob(tmp_glob(out_dir)):
            shutil.rmtree(leftover, ignore_errors=True)

        carries = read_pack_carries(spark, pack_root)

        toks = F.col(tokens_col)
        if sep_token is not None:
            toks = F.concat(toks, F.array(F.lit(sep_token)))
        w = Window.partitionBy("shard").orderBy(id_col)
        ranked = (
            batch_df.select(
                F.col(by).cast("string").alias("shard"),
                F.col(id_col),
                toks.alias("__toks"),
            )
            .select(
                "shard",
                F.row_number().over(w).cast("long").alias("__rk"),
                "__toks",
            )
        )
        rem_schema = T.StructType(
            [
                T.StructField("shard", T.StringType()),
                T.StructField("__rk", T.LongType()),
                T.StructField("__toks", T.ArrayType(T.StringType())),
            ]
        )
        rem_rows = [
            (shard, 0, rem) for shard, (_s0, rem) in carries.items() if rem
        ]
        allr = (
            spark.createDataFrame(rem_rows, rem_schema)
            .unionByName(ranked)
            .persist()
        )

        try:
            # per-shard token totals: bounded collect (#shards rows), fixes
            # how many FULL sequences each shard closes this trigger
            totals = {
                r.shard: int(r.n)
                for r in allr.groupBy("shard")
                .agg(F.coalesce(F.sum(F.size("__toks")), F.lit(0)).alias("n"))
                .collect()
            }
            offs = [
                (
                    shard,
                    carries.get(shard, (0, []))[0],
                    totals[shard] // max_len,
                )
                for shard in totals
            ]
            offs_schema = T.StructType(
                [
                    T.StructField("shard", T.StringType()),
                    T.StructField("__seq0", T.LongType()),
                    T.StructField("__nfull", T.LongType()),
                ]
            )
            packed = (
                pack_sequences(allr, "__toks", ["__rk"], max_len, by=["shard"])
                .join(
                    F.broadcast(spark.createDataFrame(offs, offs_schema)),
                    "shard",
                )
            )
            full = packed.filter(F.col("seq") < F.col("__nfull")).select(
                "shard",
                (F.col("seq") + F.col("__seq0")).alias("seq"),
                "tokens",
                "n_tokens",
                F.lit(False).alias("is_carry"),
            )
            tails = {
                r.shard: list(r.tokens)
                for r in packed.filter(F.col("seq") >= F.col("__nfull")).collect()
            }
            # carry set = every shard this trigger touched, at its new state,
            # plus every untouched live shard carried forward unchanged
            new_carries = {
                shard: (
                    carries.get(shard, (0, []))[0] + totals[shard] // max_len,
                    tails.get(shard, []),
                )
                for shard in totals
            }
            for shard, state in carries.items():
                new_carries.setdefault(shard, state)
            carry_rows = spark.createDataFrame(
                [
                    (shard, s0, rem, len(rem), True)
                    for shard, (s0, rem) in sorted(new_carries.items())
                ],
                _SCHEMA_BY,
            )
            commit_write(full.unionByName(carry_rows), out_dir)
        finally:
            allr.unpersist()

    return _apply


def streaming_token_shards(
    stream_df: DataFrame,
    pack_root: str,
    checkpoint_path: str,
    max_len: int,
    id_col: str = "doc_id",
    tokens_col: str = "bpe_tokens",
    sep_token: str | None = None,
    timeout_sec: int = 600,
    by: str | None = None,
) -> None:
    """Drain ``stream_df`` (AvailableNow) into the packed-shard store
    under ``pack_root``. Resumable: rerunning with the same
    ``checkpoint_path`` continues from the committed carry. Read the
    store with :func:`read_packed_shards` at any point. ``by=<col>``
    packs each shard as an independent stream (the scale posture — see
    module docstring)."""
    fn = token_pack_batch_fn(
        stream_df.sparkSession,
        pack_root,
        max_len,
        id_col=id_col,
        tokens_col=tokens_col,
        sep_token=sep_token,
        by=by,
    )
    q = (
        stream_df.writeStream.foreachBatch(fn)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    if q.isActive:
        q.stop()


def compact_packed_shards(
    spark,
    pack_root: str,
    target_rows_per_file: int = 2_000_000,
    exclude_newest: bool = True,
) -> dict:
    """Rewrite accumulated per-trigger shard dirs into right-sized
    segments (covers-manifest protocol — one rename publishes the
    compacted segment and retires its sources; crash-safe bottom-up GC).
    Stale carry rows are dropped; the LIVE carry (max by (seq,
    n_tokens) — see :func:`read_pack_carry`) is preserved in the
    compacted segment, so a resume works even after a full
    ``exclude_newest=False`` compaction of a quiesced drain. The newest
    trigger is excluded by default, exactly like the corpus/IVF
    compactors (its dir is the exactly-once replay marker). Run one
    compactor at a time; the drain itself is not paused."""
    gc_covered(pack_root, _PACKED)
    for leftover in glob.glob(os.path.join(pack_root, _PACKED, ".tmp-*")):
        shutil.rmtree(leftover, ignore_errors=True)
    trig_ids = [
        batch_id_of(d)
        for d in glob.glob(os.path.join(pack_root, _PACKED, "batch=*"))
        if batch_id_of(d) >= 0
    ]
    skip = {max(trig_ids)} if (exclude_newest and trig_ids) else set()
    dirs = [
        d for d in data_dirs(pack_root, _PACKED) if batch_id_of(d) not in skip
    ]
    files_before = sum(len(glob.glob(os.path.join(d, "part-*"))) for d in dirs)
    stats = {
        "dirs_before": len(dirs),
        "files_before": files_before,
        "files_after": files_before,
    }
    if len(dirs) <= 1:
        return stats
    allrows = spark.read.parquet(*dirs)
    if "shard" in allrows.columns:
        # shard-keyed store: one live carry PER SHARD (max by the same
        # monotone (seq, n_tokens) key, per shard)
        w = Window.partitionBy("shard").orderBy(
            F.desc("seq"), F.desc("n_tokens")
        )
        live_carry = (
            allrows.filter(F.col("is_carry"))
            .withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") == 1)
            .drop("__rk")
        )
    else:
        live_carry = (
            allrows.filter(F.col("is_carry"))
            .orderBy(F.desc("seq"), F.desc("n_tokens"))
            .limit(1)
        )
    df = allrows.filter(~F.col("is_carry")).unionByName(live_carry)
    n = df.count()
    if n == 0:
        return stats
    ids = [batch_id_of(d) for d in dirs]
    gen = min(-1, *ids) - 1
    floor = min(
        spark.sparkContext.defaultParallelism, max(1, -(-n // 50_000))
    )
    n_files = max(-(-n // int(target_rows_per_file)), floor)
    commit_compacted(
        df.repartition(n_files), batch_dir(pack_root, _PACKED, gen), ids
    )
    gc_covered(pack_root, _PACKED)
    stats["files_after"] = sum(
        len(glob.glob(os.path.join(d, "part-*")))
        for d in data_dirs(pack_root, _PACKED)
    )
    return stats
