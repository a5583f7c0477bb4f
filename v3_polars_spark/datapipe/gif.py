"""Animated-GIF (GIF89a) encode/decode in pure Python/NumPy.

Closes the one reference workload the engine did not yet render
end-to-end: ``Crosschain_Liquidity_GIF.ipynb`` cell 12 animates per-frame
liquidity distributions with matplotlib; this container has no
matplotlib/Pillow, so the animation step ships as a self-contained
GIF89a writer (examples/liquidity_gif.py rasterizes the
``liquidity_timeline`` frames and encodes them here). Same posture as
``datapipe.codecs``: a real, bounded, dependency-free codec — not a stub.

Scope: indexed-color (<=256) frames of identical size, full-frame
replacement disposal, infinite loop. ``decode_gif`` is an independent
decoder (written from the LZW decoder side of the spec, not by
inverting the encoder) used by tests to verify roundtrips and by
callers that want to sanity-check produced artifacts.
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_CODE = 4096  # 12-bit LZW ceiling (GIF spec)


# ---------------------------------------------------------------------------
# LZW (GIF variant: variable code width, CLEAR/END codes, 12-bit cap)
# ---------------------------------------------------------------------------


def _lzw_encode(data: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    codes: list[int] = [clear]
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    buf = b""
    for byte in data:
        probe = buf + bytes([byte])
        if probe in table:
            buf = probe
            continue
        codes.append(table[buf])
        if next_code < _MAX_CODE:
            table[probe] = next_code
            next_code += 1
        else:
            codes.append(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
        buf = bytes([byte])
    if buf:
        codes.append(table[buf])
    codes.append(end)

    # pack LSB-first with the code width growing in lockstep with the
    # DECODER's table: the first code after a CLEAR adds no entry there
    # (it has no previous string), every later code adds exactly one;
    # width grows when the table size reaches 1<<width (capped at 12)
    out = bytearray()
    acc = 0
    nbits = 0
    width = min_code_size + 1
    dec_len = end + 1
    first_after_clear = True
    for c in codes:
        acc |= c << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
        if c == clear:
            width = min_code_size + 1
            dec_len = end + 1
            first_after_clear = True
        elif c != end:
            if first_after_clear:
                first_after_clear = False
            elif dec_len < _MAX_CODE:
                dec_len += 1
            if dec_len == (1 << width) and width < 12:
                width += 1
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int, expected: int) -> bytes:
    """Spec-side LZW decoder (bounded by ``expected`` output bytes)."""
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    acc = 0
    nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = [bytes([i]) for i in range(clear)] + [b"", b""]
                width = min_code_size + 1
                prev = None
                continue
            if code == end:
                return bytes(out)
            if code < len(table):
                entry = table[code]
                if prev is not None and len(table) < _MAX_CODE:
                    table.append(prev + entry[:1])
            elif code == len(table) and prev is not None:
                entry = prev + prev[:1]
                if len(table) < _MAX_CODE:
                    table.append(entry)
            else:
                raise ValueError(f"corrupt LZW stream: code {code}")
            out += entry
            if len(out) > expected:
                raise ValueError("LZW output exceeds declared pixel count")
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
    return bytes(out)


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------


def _blocks(payload: bytes) -> bytes:
    """Split into <=255-byte sub-blocks with a zero terminator."""
    out = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif(
    frames: np.ndarray,
    palette: np.ndarray,
    delay_cs: int = 10,
    loop: bool = True,
) -> bytes:
    """Encode ``frames`` (uint8 array [n, h, w] of palette indices) with
    ``palette`` (uint8 [k, 3] RGB, k <= 256) into an animated GIF89a.

    ``delay_cs`` is per-frame delay in centiseconds. Deterministic output
    (no timestamps, no RNG) — same frames, same bytes.
    """
    frames = np.asarray(frames, dtype=np.uint8)
    if frames.ndim == 2:
        frames = frames[None, :, :]
    if frames.ndim != 3:
        raise ValueError("frames must be [n, h, w] palette indices")
    palette = np.asarray(palette, dtype=np.uint8)
    if palette.ndim != 2 or palette.shape[1] != 3 or not 1 <= len(palette) <= 256:
        raise ValueError("palette must be [k<=256, 3] uint8 RGB")
    if int(frames.max(initial=0)) >= len(palette):
        raise ValueError("frame index exceeds palette size")
    n, h, w = frames.shape

    # global color table size: next power of two >= len(palette), >= 2
    gct_bits = max(1, int(np.ceil(np.log2(max(len(palette), 2)))))
    gct = np.zeros(((1 << gct_bits), 3), dtype=np.uint8)
    gct[: len(palette)] = palette

    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HH", w, h)
    out.append(0x80 | ((gct_bits - 1) << 4) | (gct_bits - 1))  # GCT flag+size
    out += b"\x00\x00"  # background index, aspect
    out += gct.tobytes()
    if loop and n > 1:
        # application extension: NETSCAPE2.0 loop-forever (count 0)
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"

    min_code = max(2, gct_bits)
    for f in frames:
        # graphic control: disposal=1 (leave), delay, no transparency
        out += b"\x21\xf9\x04" + struct.pack("<BHB", 0x04, delay_cs, 0) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
        out.append(min_code)
        out += _blocks(_lzw_encode(f.tobytes(), min_code))
    out.append(0x3B)
    return bytes(out)


def decode_gif(data: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Decode a GIF produced by :func:`encode_gif` (single global palette,
    full-size frames): returns (frames [n, h, w] uint8 indices,
    palette [k, 3] uint8). Independent of the encoder's tables — the
    roundtrip test in tests/test_gif.py is meaningful."""
    n = len(data)

    def _need(upto: int) -> None:
        # every header/sub-block read is bounds-checked so truncated input
        # raises the documented ValueError, not a raw IndexError
        if upto > n:
            raise ValueError("truncated GIF")

    _need(13)
    if data[:6] not in (b"GIF89a", b"GIF87a"):
        raise ValueError("not a GIF")
    w, h = struct.unpack_from("<HH", data, 6)
    packed = data[10]
    pos = 13
    palette = np.zeros((2, 3), dtype=np.uint8)
    if packed & 0x80:
        k = 2 << (packed & 0x07)
        _need(pos + 3 * k)
        palette = np.frombuffer(data[pos:pos + 3 * k], dtype=np.uint8).reshape(k, 3)
        pos += 3 * k
    frames = []
    while pos < n:
        b = data[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: skip sub-blocks
            pos += 2
            _need(pos + 1)
            while data[pos] != 0:
                pos += 1 + data[pos]
                _need(pos + 1)
            pos += 1
        elif b == 0x2C:  # image descriptor
            _need(pos + 11)
            fx, fy, fw, fh = struct.unpack_from("<HHHH", data, pos + 1)
            if (fx, fy, fw, fh) != (0, 0, w, h):
                raise ValueError("partial frames unsupported")
            flags = data[pos + 9]
            if flags & 0x80:
                raise ValueError("local color tables unsupported")
            pos += 10
            min_code = data[pos]
            pos += 1
            payload = bytearray()
            _need(pos + 1)
            while data[pos] != 0:
                ln = data[pos]
                _need(pos + 1 + ln)
                payload += data[pos + 1:pos + 1 + ln]
                pos += 1 + ln
                _need(pos + 1)
            pos += 1
            px = _lzw_decode(bytes(payload), min_code, w * h)
            if len(px) != w * h:
                raise ValueError(f"frame pixel count {len(px)} != {w * h}")
            frames.append(
                np.frombuffer(px, dtype=np.uint8).reshape(h, w)
            )
        else:
            raise ValueError(f"unknown block 0x{b:02x} at {pos}")
    if not frames:
        raise ValueError("GIF contains no image blocks")
    return np.stack(frames), palette
