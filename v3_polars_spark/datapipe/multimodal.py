"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata, processed through Arrow-batched ``mapInPandas`` pipelines.

The decode kernels are REAL: ``datapipe.codecs`` implements baseline
JPEG, PNG, and WAV against the public format specs in pure numpy/stdlib
(Pillow is soft-imported as the fast path when installed), so
``fake=False`` — the default — decodes actual media bytes. ``fake=True``
keeps the previous deterministic sha-based stand-ins so plumbing tests
and the SQL-replayable oracle queries run with zero codec involvement.

Scale design: payloads stay in executor memory one Arrow batch at a time
(``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds peak memory per
task); metadata-only transformations never touch the binary column thanks
to parquet column pruning; and ``repartition`` before the UDF controls
decode parallelism independently of file layout.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("duration_ms", LongType()),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sha256", StringType()),
        StructField("n_bytes", LongType()),
        StructField("feature", ArrayType(DoubleType())),
    ]
)


def _check_on_error(on_error: str) -> None:
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")


def _fake_decode(payload: bytes, dim: int) -> list[float]:
    """Deterministic fake 'decoder': derive `dim` floats in [0,1) from the
    sha256 of the payload. Stands in for a real image/audio model so the
    distributed plumbing is exercised end-to-end."""
    out: list[float] = []
    counter = 0
    while len(out) < dim:
        h = hashlib.sha256(payload + counter.to_bytes(4, "big")).digest()
        out.extend(b / 255.0 for b in h)
        counter += 1
    return out[:dim]


def _thumb_features(payload: bytes, dim: int, codecs, pure: bool = False) -> list[float]:
    """Real visual feature: decode, grayscale, bilinear-resize to the
    smallest k×k grid with k² >= dim, flatten, scale to [0,1]."""
    import math as _math

    k = _math.ceil(_math.sqrt(dim))
    img = codecs.decode_image(payload, pure=pure)
    thumb = codecs.resize_bilinear(codecs.to_gray(img), k, k)
    return [float(v) / 255.0 for v in thumb.flatten()[:dim]]


def decode_image_features(
    df: DataFrame,
    dim: int = 16,
    fake: bool = False,
    batch_size_hint: int | None = None,
    on_error: str = "raise",
    pure: bool = False,
) -> DataFrame:
    """payload → feature vector via mapInPandas (Arrow-batched).

    ``fake=False`` (default) REALLY decodes: PNG/JPEG bytes via
    ``datapipe.codecs`` (Pillow-preferred soft import), then a
    ceil(sqrt(dim))² luma thumbnail flattened to ``dim`` floats in [0,1]
    — a deterministic, engine-independent visual embedding. Swap in a
    learned encoder by replacing ``_thumb_features``. ``fake=True`` keeps
    the sha-based stand-in (identical schema/batching, no codec).

    ``on_error``: a crawled 100 TB corpus ALWAYS contains corrupt
    payloads; ``"raise"`` (default) fails the task on the first bad
    image, ``"skip"`` drops those rows (mapInPandas output is
    variable-length, so the row simply doesn't exist downstream —
    count inputs vs outputs to monitor the drop rate).

    ``pure=True`` pins the pure-numpy decoders even where Pillow is
    installed, making output values cluster-independent (the
    mm_real_codec correctness query uses this so its tolerance margins
    cannot flip when a Pillow-equipped cluster runs the same plan)."""
    _check_on_error(on_error)
    if batch_size_hint:
        df.sparkSession.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size_hint)
        )

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not fake:
            from . import codecs
        for pdf in batches:
            keep, feats = [], []
            for i, p in enumerate(pdf["payload"]):
                b = bytes(p) if p is not None else b""
                try:
                    feats.append(
                        _fake_decode(b, dim) if fake
                        else _thumb_features(b, dim, codecs, pure=pure)
                    )
                    keep.append(i)
                except ValueError:
                    if on_error == "raise":
                        raise
            sub = pdf.iloc[keep].reset_index(drop=True)
            yield pd.DataFrame(
                {
                    "media_id": sub["media_id"],
                    "sha256": [
                        hashlib.sha256(bytes(p) if p is not None else b"").hexdigest()
                        for p in sub["payload"]
                    ],
                    "n_bytes": [len(p) if p is not None else 0 for p in sub["payload"]],
                    "feature": pd.Series(feats, dtype="object"),
                }
            )

    return df.select("media_id", "payload").mapInPandas(process, IMAGE_FEATURES_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per (media_id, frame_ts).
    The timestamps come from metadata only (duration_ms) — no payload reads
    — so this stage prunes the binary column entirely; the downstream
    decode joins payloads back for just the sampled rows."""
    return df.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest((F.col("duration_ms") / every_ms).cast("long") - 1, F.lit(0)),
            )
        ).alias("frame_idx"),
    ).withColumn("frame_ts_ms", F.col("frame_idx") * every_ms)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
    ]
)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    fake: bool = False,
    on_error: str = "raise",
    pure: bool = False,
) -> DataFrame:
    """payload → resized payload via mapInPandas — the write-side twin of
    ``decode_image_features``: binary in, binary out, metadata updated.

    ``fake=False`` (default) REALLY resizes: decode PNG/JPEG, bilinear
    resample (``codecs.resize_bilinear``), re-encode as lossless PNG so
    the output payload is a deterministic pure function of (input bytes,
    target dims). ``fake=True`` keeps the size-proportional byte
    resample stand-in (no codec touched)."""

    _check_on_error(on_error)

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = max(width * height // 8, 1)  # fake: bytes proportional to area
        if not fake:
            from . import codecs
        for pdf in batches:
            keep, outs = [], []
            for i, p in enumerate(pdf["payload"]):
                b = bytes(p) if p is not None else b""
                if not fake:
                    try:
                        resized = codecs.resize_bilinear(
                            codecs.decode_image(b, pure=pure), width, height
                        )
                    except ValueError:
                        if on_error == "raise":
                            raise
                        continue
                    outs.append(bytearray(codecs.encode_png(resized)))
                    keep.append(i)
                    continue
                if len(b) >= target:
                    step = len(b) // target
                    b = b[:: step][:target]
                else:
                    b = (b * (target // max(len(b), 1) + 1))[:target]
                outs.append(bytearray(b))
                keep.append(i)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].iloc[keep].reset_index(drop=True),
                    "payload": pd.Series(outs, dtype="object"),
                    "width": [width] * len(keep),
                    "height": [height] * len(keep),
                }
            )

    return df.filter(F.col("kind") == "image").select(
        "media_id", "payload"
    ).mapInPandas(process, RESIZED_SCHEMA)


AUDIO_WINDOW_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("window_idx", LongType()),
        StructField("start_ms", LongType()),
        StructField("feature", ArrayType(DoubleType())),
    ]
)


def audio_window_features(
    df: DataFrame,
    window_ms: int = 1000,
    dim: int = 8,
    fake: bool = False,
    on_error: str = "raise",
) -> DataFrame:
    """Audio → per-window feature rows, two-stage like the video path:
    (1) a metadata-only window plan (explode duration into window starts —
    binary column pruned, no payload reads), (2) payloads joined back for
    exactly the planned windows and decoded Arrow-batch-wise.
    ``fake=False`` (default) REALLY decodes WAV bytes (``codecs.decode_wav``)
    and emits ``dim`` log band energies of the window's samples — swap in
    a learned audio encoder by replacing ``codecs.audio_band_energies``.
    ``fake=True`` keeps the sha-based stand-in."""
    plan = df.filter(F.col("kind") == "audio").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(
                    (F.col("duration_ms") / window_ms).cast("long") - 1, F.lit(0)
                ),
            )
        ).alias("window_idx"),
    ).withColumn("start_ms", F.col("window_idx") * window_ms)
    with_payload = plan.join(
        df.select("media_id", "payload"), "media_id"
    )

    _check_on_error(on_error)

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not fake:
            from . import codecs
        for pdf in batches:
            keep, feats = [], []
            if fake:
                feats = [
                    _fake_decode(
                        (bytes(p) if p is not None else b"")
                        + int(i).to_bytes(4, "big"),
                        dim,
                    )
                    for p, i in zip(pdf["payload"], pdf["window_idx"])
                ]
                keep = list(range(len(pdf)))
            else:
                decoded: dict = {}  # media_id -> (samples, rate); one
                # decode per FILE per batch, not per planned window row
                for i, (mid, p, start) in enumerate(
                    zip(pdf["media_id"], pdf["payload"], pdf["start_ms"])
                ):
                    try:
                        if mid not in decoded:
                            decoded[mid] = codecs.decode_wav(
                                bytes(p) if p is not None else b""
                            )
                    except ValueError:
                        if on_error == "raise":
                            raise
                        decoded[mid] = None
                    if decoded[mid] is None:
                        continue
                    samples, rate = decoded[mid]
                    lo = int(start) * rate // 1000
                    hi = lo + window_ms * rate // 1000
                    feats.append(
                        codecs.audio_band_energies(samples[lo:hi], dim)
                    )
                    keep.append(i)
            sub = pdf.iloc[keep].reset_index(drop=True)
            yield pd.DataFrame(
                {
                    "media_id": sub["media_id"],
                    "window_idx": sub["window_idx"],
                    "start_ms": sub["start_ms"],
                    "feature": pd.Series(feats, dtype="object"),
                }
            )

    return with_payload.mapInPandas(process, AUDIO_WINDOW_SCHEMA)


def make_fake_media(spark, n: int = 64, seed: int = 7) -> DataFrame:
    """Deterministic fake media table for tests (payload = seeded bytes).

    Payloads are ASCII hex bytes (not raw digests) so a SQL oracle can
    regenerate them with string functions and hash the identical bytes —
    the column is still BinaryType and the decode path treats it as opaque."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = (hashlib.sha256(f"{seed}:{i}".encode()).hexdigest() * 4).encode()
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                64 if kind == "image" else None,
                48 if kind == "image" else None,
                5000 if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _synth_image(seed: int, i: int, w: int = 64, h: int = 48):
    """Deterministic smooth 'natural' test image: seeded low-res noise
    bilinearly upsampled (band-limited, so pHash/DCT features are stable
    — pure gradients or white noise would put most low-frequency DCT
    coefficients at the median and make perceptual bits degenerate)."""
    import numpy as np

    from . import codecs

    rng = np.random.default_rng(seed * 100003 + i)
    # 12x16 base: enough spatial detail that the 64 low-frequency DCT
    # coefficients spread away from the median (flatter images leave
    # perceptual bits metastable under recompression)
    base = rng.integers(0, 256, (12, 16, 3)).astype("uint8")
    return codecs.resize_bilinear(base, w, h)


def make_real_media(spark, n: int = 24, seed: int = 7) -> DataFrame:
    """Media table with REAL payloads: JPEG and PNG encodings of
    deterministic synthetic images plus 16-bit PCM WAV tones, round-robin
    — the end-to-end fixture for the non-fake decode/resize/pHash/audio
    paths. Triples (3g, 3g+1) are the same image as JPEG vs PNG (a
    planted near-duplicate pair for the perceptual pipeline); 3g+2 is a
    two-tone WAV whose frequencies vary with g."""
    import numpy as np

    from . import codecs

    rows = []
    for i in range(n):
        g, r = divmod(i, 3)
        if r < 2:
            img = _synth_image(seed, g)
            mime = "image/jpeg" if r == 0 else "image/png"
            payload = codecs.encode_image(img, mime, quality=90)
            rows.append(
                (i, "image", bytearray(payload), mime,
                 img.shape[1], img.shape[0], None)
            )
        else:
            rate = 8000
            t = np.arange(rate * 2) / rate  # 2 s
            f1, f2 = 200 + 37 * g, 900 + 61 * g
            s = 0.4 * np.sin(2 * np.pi * f1 * t) + 0.2 * np.sin(2 * np.pi * f2 * t)
            rows.append(
                (i, "audio", bytearray(codecs.encode_wav(s, rate)),
                 "audio/wav", None, None, 2000)
            )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


PHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("phash64", LongType()),
    ]
)

_FAKE_BRIGHT = set(b"89abcdef")


def perceptual_hash(
    df: DataFrame,
    fake: bool = False,
    id_col: str = "media_id",
    payload_col: str = "payload",
    on_error: str = "raise",
    pure: bool = False,
) -> DataFrame:
    """payload → 64-bit perceptual hash via mapInPandas (Arrow-batched).

    ``fake=False`` (default) is the REAL pHash: decode PNG/JPEG, 32x32
    luma, 2-D DCT-II, median-threshold the 8x8 low-frequency block
    (``codecs.phash64`` — the pHash/imagehash construction, stable under
    recompression and brightness shifts). The ``fake=True`` stand-in
    keeps the defining property — *small payload perturbations flip few
    bits* — by treating the ASCII-hex payload as a coarse brightness
    map: bit j is 1 iff hex digit j of the payload is >= 8. Both emit
    the signed two's-complement int64, the same signature shape as
    ``dedup.simhash``, so ``dedup.hamming_near_pairs`` runs unchanged
    on media."""

    _check_on_error(on_error)

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not fake:
            from . import codecs
        for pdf in batches:
            keep, out = [], []
            for i, p in enumerate(pdf[payload_col]):
                b = bytes(p) if p is not None else b""
                if not fake:
                    try:
                        out.append(codecs.phash64(codecs.decode_image(b, pure=pure)))
                        keep.append(i)
                    except ValueError:
                        if on_error == "raise":
                            raise
                    continue
                v = 0
                for j, byte in enumerate(b[:64]):
                    if byte in _FAKE_BRIGHT:
                        v |= 1 << j
                if v >= 1 << 63:
                    v -= 1 << 64
                out.append(v)
                keep.append(i)
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].iloc[keep].reset_index(drop=True),
                    "phash64": pd.array(out, dtype="int64"),
                }
            )

    return df.select(
        F.col(id_col).alias(id_col), F.col(payload_col).alias(payload_col)
    ).mapInPandas(process, PHASH_SCHEMA)


_FLIP_MAP = str.maketrans("0123456789abcdef", "89abcdef01234567")


def make_fake_media_pairs(spark, n: int = 96, seed: int = 7) -> DataFrame:
    """Fake media table with PLANTED near-duplicates for the perceptual
    near-dup pipeline: media 2g and 2g+1 share a base payload, with the
    odd member perturbed at ``g % 5`` deterministic positions (each
    perturbation toggles the high bit of one hex digit — exactly one
    pHash bit under the fake kernel). Pair distances therefore sweep
    0..4: some pairs sit inside a hamming<=3 threshold, some just
    outside. ASCII-hex payloads, so a SQL oracle regenerates them."""
    rows = []
    for i in range(n):
        g = i // 2
        s = hashlib.sha256(f"{seed}:{g}".encode()).hexdigest()
        if i % 2 == 1:
            chars = list(s)
            for j in range(g % 5):
                pos = (g * 7 + j * 13) % 64
                chars[pos] = chars[pos].translate(_FLIP_MAP)
            s = "".join(chars)
        rows.append(
            (i, "image", bytearray((s * 4).encode()), "image/png", 64, 48, None)
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
