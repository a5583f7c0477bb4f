"""Order-insensitive exact-integer content fingerprints.

The position-salted sum fingerprint is the oracle-infrastructure hash
used to compare token SEQUENCES across engines without ordered
aggregation on either side: each (position, value) pair hashes to a
40-bit integer (md5-prefix of ``"pos:value"``), and the sequence
fingerprint is the plain SUM of those terms — an unordered hash
aggregation, no per-group sort or ordered string_agg buffering (the
``string_agg`` form OOM'd the DuckDB yardstick at sf1), yet any token
change, position change, insertion, or deletion moves it.

Why 40 bits / why a sum is sound:

- **Exactness.** Terms are < 2**40; a sequence of n terms sums below
  n * 2**40, so for n <= 2**12 (4096-token sequences) the sum stays
  below 2**52 — exact in int64 AND in IEEE double (< 2**53), so an
  engine that sums in floating point cannot drift. (General bound:
  exact while n <= 2**23 in int64, n <= 2**13 in double.)
- **Collision probability.** Model each term as iid uniform on
  [0, 2**40) (md5 prefix). Two DIFFERENT (position, value) multisets
  collide when their term sums coincide: the difference includes at
  least one fresh uniform term, so P[collision] <= 2**-40 per compared
  pair. An oracle compare of S sequences matched by key therefore
  misses a real difference with probability <= S * 2**-40 — at the sf1
  gate scale (S ~ 1.5M sequences) that is ~1.4e-6 per full run.
  (Adversarial inputs could engineer collisions — md5 is not a PRF —
  but the oracle corpus is fixed before hashing; this is a
  verification checksum, not a security boundary.)
- **Salting by position** makes the unordered sum order-SENSITIVE:
  without the salt, any permutation of the tokens would collide by
  construction; with it, a swap of unequal tokens at positions i != j
  replaces two distinct uniform terms and collides with prob 2**-40.

Both engines compute the identical bytes: Spark via
:func:`salted_fp_term` / :func:`position_salted_fp`, DuckDB via the
literal SQL the ``*_sql`` builders emit (md5 of the same ``pos:value``
string, same 10-hex-char prefix).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "FP_BITS",
    "FP_HEX_CHARS",
    "position_salted_fp",
    "position_salted_fp_sum_sql",
    "salted_fp_term",
    "salted_fp_term_sql",
]

FP_HEX_CHARS = 10
FP_BITS = 4 * FP_HEX_CHARS  # 40


def salted_fp_term(salt: Column, value: Column) -> Column:
    """One 40-bit fingerprint term: the first 10 hex chars of
    ``md5("<salt>:<value>")`` as a long. Sum terms with an unordered
    aggregate (``F.sum`` across rows, or ``F.aggregate`` over an
    array) to fingerprint a keyed collection."""
    return F.conv(
        F.substring(
            F.md5(
                F.concat_ws(":", salt.cast("string"), value.cast("string"))
            ),
            1,
            FP_HEX_CHARS,
        ),
        16,
        10,
    ).cast("long")


def position_salted_fp(arr: Column) -> Column:
    """Fingerprint of one ARRAY column in place: sum of
    :func:`salted_fp_term` with each element's 0-based index as the
    salt. Pure fold (transform-with-index + aggregate) — no explode, no
    shuffle; exact for arrays up to 2**12 elements even if an engine
    sums in double (see module docstring)."""
    return F.aggregate(
        F.transform(arr, lambda x, i: salted_fp_term(i, x)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def salted_fp_term_sql(salt_sql: str, value_sql: str) -> str:
    """DuckDB replay of :func:`salted_fp_term`: identical md5 input
    string, identical 40-bit prefix. ``salt_sql`` / ``value_sql`` must
    already render as strings (CAST in the caller if needed)."""
    return (
        f"(('0x' || substr(md5({salt_sql} || ':' || {value_sql}), "
        f"1, {FP_HEX_CHARS}))::BIGINT)"
    )


def position_salted_fp_sum_sql(salt_sql: str, value_sql: str) -> str:
    """DuckDB aggregate term for a GROUP BY fingerprint:
    ``CAST(sum(<term>) AS BIGINT)`` over :func:`salted_fp_term_sql`."""
    return f"CAST(sum({salted_fp_term_sql(salt_sql, value_sql)}) AS BIGINT)"
