"""Measure real-image decode throughput (VERDICT r4 item 1).

Two numbers, printed as one JSON line:

- ``kernel_*``: single-core throughput of the decode kernel itself
  (``codecs.decode_image`` on JPEG bytes) — the per-row cost an executor
  core pays inside mapInPandas. Reported for the pure-numpy path and,
  when Pillow is installed, the PIL path (the ``multimodal`` extra in
  pyproject.toml).
- ``spark_*``: end-to-end images/s through ``decode_image_features``
  (Arrow-batched mapInPandas) on local[$SPARK_GRAFT_CPUS] — parallel
  scaling of the same kernel plus the batching/feature overhead.

Usage: python examples/decode_throughput.py [n_images] [w] [h]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    h = int(sys.argv[3]) if len(sys.argv) > 3 else 48

    from v3_polars_spark.datapipe import codecs as C

    rng = np.random.default_rng(7)
    # smooth-ish content (random DC + gentle gradients) so the JPEG streams
    # have realistic entropy-coded length, not noise-maximal worst case
    xs = np.linspace(0, 4 * np.pi, w)[None, :, None]
    ys = np.linspace(0, 4 * np.pi, h)[:, None, None]
    payloads = []
    for i in range(n):
        base = rng.uniform(40, 215, size=(1, 1, 3))
        img = np.clip(
            base + 40 * np.sin(xs + i) + 40 * np.cos(ys + 0.7 * i), 0, 255
        ).astype(np.uint8)
        payloads.append(C.encode_jpeg(img, quality=90))
    total_mb = sum(len(p) for p in payloads) / 1e6
    px = n * w * h

    out: dict = {
        "metric": "decode_throughput",
        "n_images": n,
        "dims": f"{w}x{h}",
        "corpus_mb": round(total_mb, 3),
    }

    for label, pure in [("pure", True)] + (
        [("pil", False)] if C._PILImage is not None else []
    ):
        t0 = time.perf_counter()
        for p in payloads:
            C.decode_image(p, pure=pure)
        dt = time.perf_counter() - t0
        out[f"kernel_{label}_img_per_s"] = round(n / dt, 1)
        out[f"kernel_{label}_mb_per_s"] = round(total_mb / dt, 3)
        out[f"kernel_{label}_mpx_per_s"] = round(px / dt / 1e6, 3)

    # Spark end-to-end
    from v3_polars_spark.datapipe import decode_image_features
    from v3_polars_spark.session import get_spark

    spark = get_spark(app_name="decode-throughput")
    rows = [(i, bytearray(p), "image") for i, p in enumerate(payloads)]
    df = spark.createDataFrame(rows, "media_id long, payload binary, kind string")
    df = df.repartition(int(os.environ.get("SPARK_GRAFT_CPUS", "32"))).persist()
    df.count()
    feats = decode_image_features(df, dim=16)
    feats.write.format("noop").mode("overwrite").save()  # warm
    t0 = time.perf_counter()
    feats.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    out["spark_img_per_s"] = round(n / dt, 1)
    out["spark_mb_per_s"] = round(total_mb / dt, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
