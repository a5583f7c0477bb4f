"""LLM-training-data pipeline operators: dedup, similarity search, text
analysis, multimodal columns — all designed for 100 TB inputs (no driver
collects, bounded shuffles, pure column expressions where possible)."""

from .dedup import (
    connected_components,
    dedup_exact,
    dedup_near,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    shingle_sets,
    shingles,
    simhash,
    simhash_near_pairs,
)
from .multimodal import (
    IMAGE_FEATURES_SCHEMA,
    MEDIA_SCHEMA,
    decode_image_features,
    frame_sample_plan,
    make_fake_media,
)
from .similarity import (
    cosine_topk,
    cosine_topk_lsh,
    embedding_near_dup_lsh,
    embedding_near_dup_pairs,
    ivf_assign,
    ivf_build,
    ivf_topk,
    lsh_bucket,
    with_cosine,
)
from .text import (
    LANG_MARKERS,
    fingerprint_md5,
    fingerprint_rolling,
    language_id,
    normalize_text,
    quality_score,
    token_counts,
)

__all__ = [
    "IMAGE_FEATURES_SCHEMA",
    "LANG_MARKERS",
    "MEDIA_SCHEMA",
    "cosine_topk",
    "cosine_topk_lsh",
    "decode_image_features",
    "connected_components",
    "dedup_exact",
    "dedup_near",
    "embedding_near_dup_lsh",
    "embedding_near_dup_pairs",
    "fingerprint_md5",
    "ivf_assign",
    "ivf_build",
    "ivf_topk",
    "fingerprint_rolling",
    "frame_sample_plan",
    "language_id",
    "lsh_bucket",
    "make_fake_media",
    "minhash_lsh_pairs",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "normalize_text",
    "quality_score",
    "shingle_sets",
    "shingles",
    "simhash",
    "simhash_near_pairs",
    "token_counts",
    "with_cosine",
]
