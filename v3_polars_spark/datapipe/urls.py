"""URL canonicalization and URL-keyed deduplication.

Web-crawl corpora carry one URL per document; the first dedup pass is
almost always by canonical URL (orders of magnitude cheaper than any
content hash) before MinHash/SimHash touch the text. Canonicalization is
pure column expressions — regex field extraction + array ops — so it is
portable SQL (the DuckDB oracle mirrors it expression-for-expression)
and runs at scan speed with zero shuffles; the dedup itself is one hash
aggregate on the canonical key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# query parameters that never affect content identity
TRACKING_PARAM_PREFIXES = ["utm_", "fbclid", "gclid", "msclkid", "ref_src"]

_SCHEME = r"^([a-zA-Z][a-zA-Z0-9+.-]*):\/\/"
_HOST = _SCHEME + r"([^\/?#]*)"
_PATH = _SCHEME + r"[^\/?#]*([^?#]*)"
_QUERY = r"\?([^#]*)"


def canonicalize_url(url: Column) -> Column:
    """Canonical form: lowercase scheme+host, default ports stripped,
    fragment dropped, tracking query params removed, remaining params
    sorted, trailing slash on a bare path removed.

    Implemented with regexp field extraction rather than ``parse_url`` so
    the exact same expressions exist in ANSI/DuckDB SQL for verification.

    Inputs with no ``scheme://`` prefix (relative paths, ``mailto:`` /
    ``javascript:`` pseudo-URLs, garbage) pass through UNCHANGED rather
    than all collapsing to the empty-field concat ``'://'`` — a
    scheme-less crawl record must never merge with every other
    scheme-less record under URL dedup.
    """
    scheme = F.lower(F.regexp_extract(url, _SCHEME, 1))
    host = F.lower(F.regexp_extract(url, _HOST, 2))
    host = F.regexp_replace(host, r":(80|443)$", "")
    path = F.regexp_extract(url, _PATH, 2)
    path = F.regexp_replace(path, r"\/$", "")
    query = F.regexp_extract(url, _QUERY, 1)
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "")
            & ~sum(
                (p.startswith(pref).cast("int") for pref in TRACKING_PARAM_PREFIXES),
                F.lit(0),
            ).cast("boolean"),
        )
    )
    qstr = F.array_join(kept, "&")
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qstr != "", F.concat(F.lit("?"), qstr)).otherwise(F.lit("")),
    )
    return F.when(scheme == "", url).otherwise(canon)


def dedup_by_url(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    prefer_col: str | None = None,
) -> DataFrame:
    """Keep one document per canonical URL.

    Winner per key: highest ``prefer_col`` (e.g. a quality score), ties
    and the no-preference case broken by lowest ``id_col`` — the same
    deterministic max-over-ordered-struct hash aggregate as
    ``ops.dedup.dedup_last`` (one shuffle, no window, duplicate-agnostic).
    Output keeps all input columns plus ``url_canon``.
    """
    canon = df.withColumn("url_canon", canonicalize_url(F.col(url_col)))
    others = [c for c in canon.columns if c != "url_canon"]
    rank = [
        (F.col(prefer_col) if prefer_col else F.lit(0)).alias("__r0"),
        (-F.col(id_col)).alias("__r1"),
    ]
    packed = F.struct(*rank, *[F.col(c) for c in others])
    won = canon.groupBy("url_canon").agg(F.max(packed).alias("__w"))
    return won.select(
        "url_canon", *[F.col(f"__w.{c}").alias(c) for c in others]
    )
