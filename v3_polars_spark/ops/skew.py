"""Skew mitigation: salted joins.

AQE's skew-join split (enabled in session.py) handles most skew at
runtime by splitting oversized partitions, but it only applies to
sort-merge joins and only AFTER a skewed exchange materializes. Salting
restructures the plan itself: the skewed side spreads each hot key over
``n_salt`` sub-keys, the other side replicates each row ``n_salt`` times,
and the join runs on (key, salt) — no single reducer ever owns a whole
hot key. The classic trade: replication multiplies the build side by
n_salt, so pick n_salt ~ (hottest-key rows / target partition rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str] | str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed``'s key distribution is hot: salt the
    skewed side deterministically (hash of the whole row's join-key +
    a spreading column set is unnecessary — any uniform assignment works,
    so we hash the partition-local row id), replicate ``other`` across
    all salt values, join on keys + salt. Result rows are identical to
    the unsalted join (pinned in tests); only the shuffle layout changes.

    ``how`` supports inner/left (the salted side preserved); for
    right/full joins swap the arguments."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner'|'left'")
    keys = [on] if isinstance(on, str) else list(on)
    # deterministic uniform salt: hash of join keys + a per-partition row
    # sequence — rows of one hot key land in n_salt different buckets
    salted = skewed.withColumn(
        _SALT,
        F.pmod(
            F.xxhash64(*[F.col(k) for k in keys], F.monotonically_increasing_id()),
            F.lit(n_salt),
        ).cast("int"),
    )
    replicated = other.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)).cast("array<int>"))
    )
    return salted.join(replicated, keys + [_SALT], how).drop(_SALT)
