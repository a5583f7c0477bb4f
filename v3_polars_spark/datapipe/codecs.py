"""Real media codecs with zero non-baked dependencies.

The multimodal operators (``datapipe.multimodal``) need actual
decode/encode kernels, but this container has no PIL/libjpeg/librosa.
These are REAL codecs, not stubs, written against the public format
specifications using only numpy + the stdlib:

- **PNG** (ISO/IEC 15948): full 8-bit-depth decode (gray / gray+alpha /
  RGB / RGBA / palette, all five scanline filters) and encode, using
  stdlib ``zlib`` for the DEFLATE layer.
- **Baseline JPEG** (ITU-T T.81): sequential-DCT decode (multi-table
  huffman, restart markers, 4:4:4 / 4:2:2 / 4:2:0 chroma subsampling)
  and a 4:4:4 encoder with the Annex-K quantization/huffman tables —
  the interchange-format subset virtually every camera JPEG uses.
- **WAV** (RIFF): PCM 8/16/32-bit and IEEE-float decode/encode.
- **Bilinear resize**, **luma grayscale**, and the **DCT-II perceptual
  hash** (32x32 luma -> 2-D DCT -> 8x8 low-frequency block -> median
  threshold, the imagehash/pHash construction).

``PIL`` is soft-imported as the preferred image path when it exists
(``decode_image``/``encode_image`` route through it); the pure
implementations are the always-available fallback, so a cluster with
Pillow gets libjpeg-turbo speed and a bare container still decodes
correctly. The pure JPEG path is O(pixels) Python-loop huffman — right
for correctness and tests; install Pillow on real 100-TB image runs.

No counterpart in the reference repo (blockchain analytics has no media
columns); this implements the builder-brief multimodal requirement.
"""

from __future__ import annotations

import io
import math
import struct
import zlib

import numpy as np

try:  # pragma: no cover - exercised only where Pillow is installed
    from PIL import Image as _PILImage
except ImportError:  # the baked container has no Pillow
    _PILImage = None


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# Allocation guard for untrusted headers: PNG/JPEG dimensions are
# attacker-controlled 16/32-bit fields, and the decoders size their output
# arrays from them BEFORE touching pixel data. Without a cap, an 8-byte
# crafted header demands a multi-GB np.zeros -> MemoryError, which is NOT a
# ValueError and so would sail past the multimodal on_error='skip' boundary
# and kill the whole task. 2^26 px (64 Mpx ~ 8Kx8K, 192 MB RGB f8) is far
# above any sane training-corpus image and far below task memory.
_MAX_PIXELS = 1 << 26


def _check_dims(w: int, h: int, fmt: str) -> None:
    if w == 0 or h == 0:
        raise ValueError(f"corrupt {fmt}: zero width/height")
    if w * h > _MAX_PIXELS:
        raise ValueError(
            f"corrupt or hostile {fmt} header: {w}x{h} exceeds the "
            f"{_MAX_PIXELS}-pixel decode cap"
        )


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    crc = zlib.crc32(tag + body) & 0xFFFFFFFF
    return struct.pack(">I", len(body)) + tag + body + struct.pack(">I", crc)


def encode_png(arr: np.ndarray) -> bytes:
    """Encode an (H,W) or (H,W,C) uint8 array as an 8-bit PNG (filter 0)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), a.reshape(h, w * c)], axis=1
    ).tobytes()
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> np.ndarray:
    """Decode an 8-bit-depth, non-interlaced PNG to (H,W,C) uint8.
    Truncated or corrupt streams raise ValueError, never a raw
    IndexError/KeyError/zlib.error."""
    try:
        return _decode_png(data)
    except (IndexError, KeyError, struct.error, zlib.error):
        raise ValueError("truncated or corrupt PNG stream") from None


def _decode_png(data: bytes) -> np.ndarray:
    if not data.startswith(_PNG_SIG):
        raise ValueError("not a PNG (bad signature)")
    pos, idat, plte = len(_PNG_SIG), [], b""
    w = h = ctype = None
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise ValueError(f"unsupported PNG bit depth {depth}")
            if interlace:
                raise ValueError("interlaced PNG not supported")
        elif tag == b"PLTE":
            plte = body
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    _check_dims(w, h, "PNG")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    stride = w * channels
    # Bounded inflate: a zlib bomb in IDAT could otherwise expand to GBs.
    # The pixel stream's exact size is known from the header — ask for
    # exactly that and reject short or over-long streams.
    expected = h * (stride + 1)
    dec = zlib.decompressobj()
    raw = dec.decompress(b"".join(idat), expected)
    if len(raw) < expected:
        raise ValueError("truncated PNG pixel data")
    # Enforce the exact-size contract: the zlib stream must end cleanly
    # right after the header-derived byte count. A stream that inflates
    # past it, or an IDAT with trailing bytes after the zlib terminator,
    # is corrupt — not merely truncated to `expected`.
    if dec.unconsumed_tail and dec.decompress(dec.unconsumed_tail, 1):
        raise ValueError("over-long PNG pixel data")
    if not dec.eof or dec.unused_data:
        raise ValueError("trailing garbage in PNG pixel data")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    bpp = channels
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).copy()
        if ftype == 1:  # Sub
            for x in range(bpp, stride):
                line[x] = (line[x] + line[x - bpp]) & 0xFF
        elif ftype == 2:  # Up
            line = (line.astype(np.int32) + prev).astype(np.uint8)
        elif ftype == 3:  # Average
            for x in range(stride):
                left = int(line[x - bpp]) if x >= bpp else 0
                line[x] = (line[x] + (left + int(prev[x])) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                left = int(line[x - bpp]) if x >= bpp else 0
                ul = int(prev[x - bpp]) if x >= bpp else 0
                line[x] = (line[x] + _paeth(left, int(prev[x]), ul)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = line
        prev = line
    img = out.reshape(h, w, channels)
    if ctype == 3:  # palette -> RGB
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        img = pal[img[:, :, 0]]
    return img


# ---------------------------------------------------------------------------
# Baseline JPEG (ITU-T T.81 sequential DCT)
# ---------------------------------------------------------------------------

# Annex K.1/K.2 example quantization tables (the de-facto standard ones)
_QT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.float64,
)
_QT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.float64,
)

# Annex K.3 "typical" huffman tables: (BITS counts per code length, HUFFVAL)
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _zigzag_pairs() -> list[tuple[int, int]]:
    out = []
    for s in range(15):
        rows = list(range(max(0, s - 7), min(s, 7) + 1))
        if s % 2 == 0:
            rows.reverse()
        out.extend((r, s - r) for r in rows)
    return out


_ZZ = _zigzag_pairs()
_ZZ_ROWS = np.array([r for r, _ in _ZZ])
_ZZ_COLS = np.array([c for _, c in _ZZ])


def _dct_matrix(n: int = 8) -> np.ndarray:
    m = np.zeros((n, n))
    for k in range(n):
        for i in range(n):
            m[k, i] = math.cos((2 * i + 1) * k * math.pi / (2 * n)) * math.sqrt(
                2.0 / n
            )
    m[0, :] /= math.sqrt(2.0)
    return m


_C8 = _dct_matrix(8)
_C32 = _dct_matrix(32)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(code_length, code) -> symbol, per T.81 C.2 canonical assignment."""
    codes: dict[tuple[int, int], int] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return codes


class _JpegMarker(Exception):
    def __init__(self, marker: int):
        self.marker = marker


class _BitReader:
    """Entropy-segment bit reader: un-stuffs 0xFF00, surfaces markers."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.buf = 0
        self.n = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt != 0x00:
                raise _JpegMarker(nxt)
            self.pos += 2
        else:
            self.pos += 1
        self.buf = (self.buf << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.buf >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def align_to_marker(self) -> int:
        """Drop padding bits, consume the next marker, return its code."""
        self.buf, self.n = 0, 0
        while self.data[self.pos] != 0xFF or self.data[self.pos + 1] == 0x00:
            self.pos += 1
        marker = self.data[self.pos + 1]
        self.pos += 2
        return marker

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map a t-bit magnitude to its signed value."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline sequential-DCT JPEG to (H,W) or (H,W,3) uint8.

    Supports multi-table DQT/DHT, DRI restart markers, and any sampling
    grid (4:4:4, 4:2:2, 4:2:0); progressive (SOF2) is rejected; truncated
    or corrupt streams raise ValueError, never a raw IndexError."""
    try:
        return _decode_jpeg(data)
    except (IndexError, KeyError, ZeroDivisionError, struct.error):
        raise ValueError("truncated or corrupt JPEG stream") from None


def _decode_jpeg(data: bytes) -> np.ndarray:
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> code table
    comps: list[dict] = []
    w = h = 0
    restart_interval = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker == 0xFF:  # T.81 B.1.1.2: optional fill bytes before a marker
            pos += 1
            continue
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seg_len,) = struct.unpack_from(">H", data, pos)
        body = data[pos + 2 : pos + seg_len]
        pos += seg_len
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 15
                off += 1
                if pq:
                    vals = np.frombuffer(body, ">u2", 64, off).astype(np.float64)
                    off += 128
                else:
                    vals = np.frombuffer(body, "u1", 64, off).astype(np.float64)
                    off += 64
                tbl = np.zeros((8, 8))
                tbl[_ZZ_ROWS, _ZZ_COLS] = vals
                qt[tq] = tbl
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 15
                bits = list(body[off + 1 : off + 17])
                nvals = sum(bits)
                vals = list(body[off + 17 : off + 17 + nvals])
                huff[(tc, th)] = _canonical_codes(bits, vals)
                off += 17 + nvals
        elif marker in (0xC0, 0xC1):  # SOF0/1 baseline+extended sequential
            h, w = struct.unpack_from(">HH", body, 1)
            _check_dims(w, h, "JPEG")
            ncomp = body[5]
            if not 1 <= ncomp <= 4:
                raise ValueError(f"corrupt JPEG: {ncomp} components")
            comps = []
            for i in range(ncomp):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                sh, sv = hv >> 4, hv & 15
                # T.81 caps sampling factors at 4; anything else both
                # violates the spec and would scale the plane allocation.
                if not (1 <= sh <= 4 and 1 <= sv <= 4):
                    raise ValueError(f"corrupt JPEG: sampling factor {sh}x{sv}")
                comps.append({"id": cid, "h": sh, "v": sv, "tq": tq})
        elif marker == 0xC2:
            raise ValueError("progressive JPEG not supported (baseline only)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body)
        elif marker == 0xDA:  # SOS -> entropy-coded data follows
            ns = body[0]
            scan = {}
            for i in range(ns):
                cs, tt = body[1 + 2 * i], body[2 + 2 * i]
                scan[cs] = (tt >> 4, tt & 15)
            return _decode_scan(
                data, pos, w, h, comps, scan, qt, huff, restart_interval
            )
    raise ValueError("JPEG has no scan data")


def _decode_scan(data, pos, w, h, comps, scan, qt, huff, restart_interval):
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = [
        np.zeros((mcuy * 8 * c["v"], mcux * 8 * c["h"])) for c in comps
    ]
    reader = _BitReader(data, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    try:
        for my in range(mcuy):
            for mx in range(mcux):
                if (
                    restart_interval
                    and mcu_count
                    and mcu_count % restart_interval == 0
                ):
                    m = reader.align_to_marker()
                    if not 0xD0 <= m <= 0xD7:
                        raise ValueError(f"expected RST marker, got {m:#x}")
                    pred = [0] * len(comps)
                mcu_count += 1
                for ci, c in enumerate(comps):
                    dc_t, ac_t = scan[c["id"]]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            coef = np.zeros(64)
                            t = reader.decode_symbol(huff[(0, dc_t)])
                            pred[ci] += _extend(reader.bits(t), t)
                            coef[0] = pred[ci]
                            k = 0
                            while k < 63:
                                rs = reader.decode_symbol(huff[(1, ac_t)])
                                r, s = rs >> 4, rs & 15
                                if s == 0:
                                    if r == 15:
                                        k += 16
                                        continue
                                    break  # EOB
                                k += r + 1
                                if k > 63:
                                    raise ValueError("AC index out of range")
                                coef[k] = _extend(reader.bits(s), s)
                            block = np.zeros((8, 8))
                            block[_ZZ_ROWS, _ZZ_COLS] = coef
                            block *= qt[c["tq"]]
                            px = _C8.T @ block @ _C8 + 128.0
                            y0 = (my * c["v"] + by) * 8
                            x0 = (mx * c["h"] + bx) * 8
                            planes[ci][y0 : y0 + 8, x0 : x0 + 8] = px
    except _JpegMarker as m:
        if m.marker != 0xD9:  # EOI while mid-scan is fine at the tail
            raise ValueError(f"unexpected marker in scan: {m.marker:#x}")
    # upsample to full grid, crop
    full = []
    for c, plane in zip(comps, planes):
        plane = np.repeat(
            np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1
        )
        full.append(plane[:h, :w])
    if len(full) == 1:
        return np.clip(full[0] + 0.5, 0, 255).astype(np.uint8)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(rgb + 0.5, 0, 255).astype(np.uint8)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.buf = (self.buf << length) | code
        self.n += length
        while self.n >= 8:
            self.n -= 8
            byte = (self.buf >> self.n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> bytes:
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s
        return bytes(self.out)


def _encode_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), inverse of ``_canonical_codes``."""
    return {
        sym: (code, length)
        for (length, code), sym in _canonical_codes(bits, vals).items()
    }


def _scale_qt(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling (libjpeg jpeg_quality_scaling)."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - quality * 2
    return np.clip(np.floor((base * scale + 50) / 100), 1, 255)


def _encode_block(bw, block, q, dc_codes, ac_codes, pred):
    coef = _C8 @ block @ _C8.T
    qz = np.round(coef / q).astype(np.int64)
    zz = qz[_ZZ_ROWS, _ZZ_COLS]
    diff = int(zz[0]) - pred
    t = diff.bit_length() if diff else 0
    code, length = dc_codes[t]
    bw.write(code, length)
    if t:
        bw.write(diff if diff > 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = np.nonzero(zz[1:])[0]
    last = last_nz[-1] + 1 if len(last_nz) else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]
            bw.write(code, length)
            run -= 16
        s = abs(v).bit_length()
        code, length = ac_codes[(run << 4) | s]
        bw.write(code, length)
        bw.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        code, length = ac_codes[0x00]
        bw.write(code, length)
    return int(zz[0])


def encode_jpeg(arr: np.ndarray, quality: int = 90) -> bytes:
    """Encode (H,W) gray or (H,W,3) RGB uint8 as baseline JPEG (4:4:4,
    Annex-K huffman tables, IJG quality scaling)."""
    a = np.asarray(arr, dtype=np.float64)
    gray = a.ndim == 2
    h, w = a.shape[:2]
    qy = _scale_qt(_QT_LUMA, quality)
    qc = _scale_qt(_QT_CHROMA, quality)
    if gray:
        planes = [a - 128.0]
    else:
        r, g, b = a[:, :, 0], a[:, :, 1], a[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b
        planes = [y - 128.0, cb, cr]
    # pad to block multiples with edge replication
    ph, pw = (h + 7) & ~7, (w + 7) & ~7
    planes = [
        np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge") for p in planes
    ]

    buf = io.BytesIO()
    buf.write(b"\xff\xd8")

    def seg(marker: int, body: bytes) -> None:
        buf.write(struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body)

    for tq, q in [(0, qy)] + ([(1, qc)] if not gray else []):
        seg(0xDB, bytes([tq]) + bytes(q[_ZZ_ROWS, _ZZ_COLS].astype(np.uint8)))
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for i in range(ncomp):
        sof += bytes([i + 1, 0x11, 0 if i == 0 else 1])
    seg(0xC0, sof)
    tables = [
        (0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS),
        (1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS),
    ] + (
        []
        if gray
        else [
            (0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS),
            (1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS),
        ]
    )
    for tc, th, bits, vals in tables:
        seg(0xC4, bytes([(tc << 4) | th] + bits) + bytes(vals))
    sos = bytes([ncomp])
    for i in range(ncomp):
        sos += bytes([i + 1, 0x00 if i == 0 else 0x11])
    sos += bytes([0, 63, 0])
    seg(0xDA, sos)

    dc_y, ac_y = _encode_codes(_DC_LUMA_BITS, _DC_LUMA_VALS), _encode_codes(
        _AC_LUMA_BITS, _AC_LUMA_VALS
    )
    dc_c, ac_c = _encode_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS), _encode_codes(
        _AC_CHROMA_BITS, _AC_CHROMA_VALS
    )
    bw = _BitWriter()
    preds = [0] * ncomp
    for by in range(ph // 8):
        for bx in range(pw // 8):
            for ci in range(ncomp):
                q, dc, ac = (
                    (qy, dc_y, ac_y) if ci == 0 else (qc, dc_c, ac_c)
                )
                block = planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                preds[ci] = _encode_block(bw, block, q, dc, ac, preds[ci])
    buf.write(bw.flush())
    buf.write(b"\xff\xd9")
    return buf.getvalue()


# ---------------------------------------------------------------------------
# WAV (RIFF PCM / IEEE float)
# ---------------------------------------------------------------------------


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a RIFF/WAVE payload to (samples float64 in [-1,1] with shape
    (n_frames, n_channels), sample_rate). Truncated or corrupt streams
    raise ValueError, never raw struct.error/IndexError."""
    try:
        return _decode_wav(data)
    except (struct.error, IndexError, KeyError, ZeroDivisionError):
        raise ValueError("truncated or corrupt WAV stream") from None


def _decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV (bad RIFF header)")
    pos, fmt, raw = 12, None, None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)
        if tag == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body)
        elif tag == b"data":
            raw = body
    if fmt is None or raw is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, n_ch, rate, _, _, bits = fmt
    if audio_fmt == 3:  # IEEE float
        if bits not in (32, 64):
            # mirror the PCM branch: a stream declaring e.g. bits=16 with
            # format code 3 would otherwise be silently misparsed as f8
            raise ValueError(f"unsupported IEEE-float bit depth {bits}")
        x = np.frombuffer(raw, dtype="<f4" if bits == 32 else "<f8").astype(
            np.float64
        )
    elif audio_fmt == 1:  # PCM
        if bits == 8:
            x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128) / 128.0
        elif bits == 16:
            x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
        elif bits == 32:
            x = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
        else:
            raise ValueError(f"unsupported PCM bit depth {bits}")
    else:
        raise ValueError(f"unsupported WAV format code {audio_fmt}")
    if n_ch < 1:
        raise ValueError("corrupt WAV: zero channels")
    return x.reshape(-1, n_ch), rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """Encode float samples in [-1,1] (shape (n,) or (n,ch)) as 16-bit PCM."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    n_ch = x.shape[1]
    pcm = np.clip(np.round(x * 32767.0), -32768, 32767).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, n_ch, rate, rate * n_ch * 2, n_ch * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", len(body)) + body


# ---------------------------------------------------------------------------
# image transforms + perceptual hash
# ---------------------------------------------------------------------------


def to_gray(arr: np.ndarray) -> np.ndarray:
    """Luma (BT.601) grayscale as float64 (H,W)."""
    a = np.asarray(arr, dtype=np.float64)
    if a.ndim == 2:
        return a
    if a.shape[2] == 1:
        return a[:, :, 0]
    if a.shape[2] == 2:  # gray + alpha
        return a[:, :, 0]
    return 0.299 * a[:, :, 0] + 0.587 * a[:, :, 1] + 0.114 * a[:, :, 2]


def resize_bilinear(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Bilinear resize to (height, width); keeps dtype uint8 for uint8 in."""
    a = np.asarray(arr)
    was_u8 = a.dtype == np.uint8
    a = a.astype(np.float64)
    if a.ndim == 2:
        a = a[:, :, None]
        squeeze = True
    else:
        squeeze = False
    h, w = a.shape[:2]
    ys = np.clip((np.arange(height) + 0.5) * h / height - 0.5, 0, h - 1)
    xs = np.clip((np.arange(width) + 0.5) * w / width - 0.5, 0, w - 1)
    y0 = np.floor(ys).astype(int)
    x0 = np.floor(xs).astype(int)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = (ys - y0)[:, None, None]
    wx = (xs - x0)[None, :, None]
    out = (
        a[np.ix_(y0, x0)] * (1 - wy) * (1 - wx)
        + a[np.ix_(y1, x0)] * wy * (1 - wx)
        + a[np.ix_(y0, x1)] * (1 - wy) * wx
        + a[np.ix_(y1, x1)] * wy * wx
    )
    if squeeze:
        out = out[:, :, 0]
    if was_u8:
        out = np.clip(np.round(out), 0, 255).astype(np.uint8)
    return out


def phash64(arr: np.ndarray) -> int:
    """DCT perceptual hash (the pHash/imagehash construction): 32x32 luma
    -> 2-D DCT-II -> top-left 8x8 low-frequency block -> bit j = coeff >
    median. Returns a signed two's-complement int64, directly comparable
    with ``dedup.hamming_near_pairs``."""
    g = resize_bilinear(to_gray(arr), 32, 32)
    d = _C32 @ g @ _C32.T
    low = d[:8, :8].flatten()
    med = np.median(low)
    v = 0
    for j, c in enumerate(low):
        if c > med:
            v |= 1 << j
    return v - (1 << 64) if v >= (1 << 63) else v


# ---------------------------------------------------------------------------
# dispatchers (PIL-preferred soft path)
# ---------------------------------------------------------------------------


def decode_image(data: bytes, pure: bool = False) -> np.ndarray:
    """Decode PNG or JPEG bytes to (H,W[,C]) uint8, via Pillow when it is
    installed, else the pure decoders above (magic-byte dispatch).

    The Pillow path normalizes modes so both paths agree: palette ->
    RGB (matching the pure decoder's PLTE mapping), 16-bit/float ->
    8-bit, CMYK/YCbCr -> RGB — without this, the same image would hash
    and embed differently depending on which cluster decoded it.

    ``pure=True`` bypasses the Pillow dispatch entirely — for results
    that must be byte-identical regardless of which cluster decodes
    (e.g. the driver-verified mm_real_codec invariants, whose JPEG
    tolerance margins were measured against the pure IDCT)."""
    if _PILImage is not None and not pure:
        try:
            img = _PILImage.open(io.BytesIO(data))
            # header-bomb guard BEFORE any pixel decode, same cap as the
            # pure path (Image.open reads only the header): without this
            # the two paths would skip different rows, and PIL's own
            # DecompressionBombError (a plain Exception) would escape the
            # on_error='skip' handlers that catch ValueError
            _check_dims(img.size[0], img.size[1], img.format or "image")
            if img.mode in ("P", "CMYK", "YCbCr"):
                img = img.convert("RGB")
            elif img.mode in ("I", "I;16", "F"):
                img = img.convert("L")
            elif img.mode == "PA":
                img = img.convert("LA")
            out = np.asarray(img)
        except ValueError:
            raise
        except Exception as e:  # OSError/UnidentifiedImageError/Decompression...
            # normalize every Pillow failure to the decode boundary's
            # single exception type — the skip policy's contract
            raise ValueError(f"corrupt image: {e}") from None
    elif data[:8] == _PNG_SIG:
        out = decode_png(data)
    elif data[:2] == b"\xff\xd8":
        out = decode_jpeg(data)
    else:
        raise ValueError("unsupported image format (need PNG or JPEG bytes)")
    if out.shape[0] == 0 or out.shape[1] == 0:
        raise ValueError("corrupt image: zero width/height")
    return out


def encode_image(arr: np.ndarray, mime: str = "image/png", quality: int = 90) -> bytes:
    """Encode a uint8 array as PNG (lossless) or JPEG."""
    if mime == "image/png":
        return encode_png(arr)
    if mime == "image/jpeg":
        return encode_jpeg(arr, quality=quality)
    raise ValueError(f"unsupported target mime {mime!r}")


def audio_band_energies(
    samples: np.ndarray, dim: int = 8
) -> list[float]:
    """log1p energy in ``dim`` equal-width frequency bands of the mono
    mix — a real (if minimal) spectral feature via numpy rFFT."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 2:
        x = x.mean(axis=1)
    if len(x) == 0:
        return [0.0] * dim
    mag = np.abs(np.fft.rfft(x)) ** 2
    bands = np.array_split(mag, dim)
    return [float(np.log1p(b.sum())) for b in bands]
