"""Runnable tour of the multimodal pipeline on REAL media bytes: encode →
decode features → perceptual near-dup → resize → audio windows.

    python examples/multimodal_quickstart.py

Everything here runs with zero extra dependencies — the JPEG/PNG/WAV
kernels are the pure-numpy spec implementations in ``datapipe.codecs``
(Pillow is picked up automatically when installed). Corrupt payloads are
part of the tour: ``on_error="skip"`` drops them instead of failing the
stage, the posture a crawled corpus needs.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from v3_polars_spark.datapipe import (
    audio_window_features,
    decode_image_features,
    make_real_media,
    perceptual_hash,
    resize_images,
)
from v3_polars_spark.datapipe.dedup import hamming_near_pairs
from v3_polars_spark.datapipe.multimodal import MEDIA_SCHEMA
from v3_polars_spark.session import get_spark


def main() -> None:
    spark = get_spark(app_name="multimodal-quickstart")

    # real payloads: JPEG + PNG twins of synthetic images, WAV tones
    media = make_real_media(spark, n=24, seed=7)
    # plus one corrupt file, as any crawled corpus would have
    corrupt = spark.createDataFrame(
        [(999, "image", bytearray(b"\xff\xd8not really a jpeg"),
          "image/jpeg", 8, 8, None)],
        MEDIA_SCHEMA,
    )
    media = media.unionByName(corrupt)
    imgs = media.filter(F.col("kind") == "image")

    feats = decode_image_features(imgs, dim=16, on_error="skip")
    n_in, n_out = imgs.count(), feats.count()
    print(f"image features:   {n_out}/{n_in} decoded "
          f"({n_in - n_out} corrupt payload(s) skipped)")

    sig = perceptual_hash(imgs, on_error="skip")
    pairs = hamming_near_pairs(
        sig, id_col="media_id", hash_col="phash64", max_hamming=3
    )
    print(f"near-dup pairs:   {pairs.count()} "
          "(each JPEG found as a near-dup of its PNG twin)")

    resized = resize_images(imgs, 16, 12, on_error="skip")
    sizes = {len(bytes(r.payload)) for r in resized.collect()}
    print(f"resize:           {resized.count()} images -> 16x12 PNG "
          f"({min(sizes)}-{max(sizes)} bytes each)")

    audio = audio_window_features(media, window_ms=1000, dim=8)
    print(f"audio windows:    {audio.count()} rows of 8-band log energies")
    audio.orderBy("media_id", "window_idx").show(4, truncate=False)


if __name__ == "__main__":
    main()
