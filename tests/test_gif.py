"""GIF89a codec roundtrips (datapipe/gif.py).

The decoder is written from the spec's decoder side (string-table
reconstruction incl. the code==len(table) self-reference case), so an
encode→decode match is evidence of correctness, not of two mirrored
bugs. Hypothesis drives random frame stacks through the roundtrip.
"""

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from v3_polars_spark.datapipe.gif import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
)

PALETTE = np.array(
    [[0, 0, 0], [255, 255, 255], [200, 60, 40], [40, 120, 220]], dtype=np.uint8
)


def test_lzw_roundtrip_simple():
    data = bytes([0, 1, 2, 3] * 100 + [3, 3, 3, 3] * 50)
    enc = _lzw_encode(data, 2)
    assert _lzw_decode(enc, 2, len(data)) == data


def test_lzw_roundtrip_table_overflow():
    """>4096 dict entries forces a mid-stream CLEAR; both sides must
    resynchronize."""
    rng = np.random.default_rng(7)
    data = rng.integers(0, 8, size=60_000, dtype=np.uint8).tobytes()
    enc = _lzw_encode(data, 3)
    assert _lzw_decode(enc, 3, len(data)) == data


def test_gif_roundtrip_two_frames():
    f0 = np.zeros((9, 13), dtype=np.uint8)
    f0[2:5, 3:9] = 2
    f1 = np.full((9, 13), 1, dtype=np.uint8)
    f1[6:8, 1:4] = 3
    blob = encode_gif(np.stack([f0, f1]), PALETTE, delay_cs=25)
    assert blob[:6] == b"GIF89a"
    w, h = struct.unpack_from("<HH", blob, 6)
    assert (w, h) == (13, 9)
    frames, pal = decode_gif(blob)
    assert frames.shape == (2, 9, 13)
    np.testing.assert_array_equal(frames[0], f0)
    np.testing.assert_array_equal(frames[1], f1)
    np.testing.assert_array_equal(pal[: len(PALETTE)], PALETTE)


def test_gif_deterministic():
    f = (np.arange(64, dtype=np.uint8).reshape(8, 8)) % 4
    assert encode_gif(f, PALETTE) == encode_gif(f, PALETTE)


def test_gif_rejects_bad_inputs():
    with pytest.raises(ValueError):
        encode_gif(np.full((4, 4), 9, np.uint8), PALETTE)  # index > palette
    with pytest.raises(ValueError):
        encode_gif(np.zeros((2, 2), np.uint8), np.zeros((300, 3), np.uint8))
    with pytest.raises(ValueError):
        decode_gif(b"NOTAGIF")


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(1, 4),
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    k=st.integers(2, 256),
    seed=st.integers(0, 2**31 - 1),
)
def test_gif_roundtrip_random(n, h, w, k, seed):
    rng = np.random.default_rng(seed)
    frames = rng.integers(0, k, size=(n, h, w), dtype=np.uint8)
    palette = rng.integers(0, 256, size=(k, 3), dtype=np.uint8)
    got, pal = decode_gif(encode_gif(frames, palette))
    np.testing.assert_array_equal(got, frames)
    np.testing.assert_array_equal(pal[:k], palette)


def test_gif_truncated_raises_valueerror():
    """Every truncation point raises the documented ValueError, never a raw
    IndexError from walking past end-of-buffer (ADVICE r6)."""
    f = (np.arange(64, dtype=np.uint8).reshape(8, 8)) % 4
    g = encode_gif(np.stack([f, f.T]), PALETTE)
    for cut in range(3, len(g)):
        try:
            decode_gif(g[:cut])
        except ValueError:
            pass  # the documented failure mode
        except IndexError:  # pragma: no cover
            raise AssertionError(f"raw IndexError at truncation {cut}")


def test_gif_no_image_blocks_raises():
    f = (np.arange(64, dtype=np.uint8).reshape(8, 8)) % 4
    g = encode_gif(f, PALETTE)
    # header + global palette, straight to trailer: no image descriptor
    headerless = g[:13 + 3 * len(PALETTE)] + b"\x3b"
    with pytest.raises(ValueError, match="no image blocks"):
        decode_gif(headerless)
