"""Pure-stdlib PNG codec (zlib inflate + scanline unfiltering).

The container ships no imaging libraries, but PNG itself needs none: the
format is zlib-compressed scanlines, each prefixed by one of five filter
bytes (RFC 2083 §6). This module implements enough of the spec to make the
OCR path run on REAL image bytes — 8-bit greyscale and truecolor, no
interlace — proving the "plumbing is identical" claim for the media branch
(the reference feeds real page images to its OCR APIs,
`backend.py:177-205`). Baseline JPEG decodes through kernels/jpeg.py; other
raster bytes pass through the pipeline unchanged via the decodability
predicate in operators/drm.py.

Decode is numpy-vectorized for filters None/Sub/Up (Sub's left-neighbor
recurrence is a per-channel uint8 cumulative sum — wrap-around mod 256 is
exactly the spec); Average/Paeth carry an up+left dependency and run as a
per-row pixel loop — acceptable because real fast encoders (and this
module's encoder) prefer the vectorized filters for synthetic page scans,
and deployments with imaging libraries swap them in behind the same
function signature.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(gray: np.ndarray, filters: tuple[int, ...] = (0, 1, 2)) -> bytes:
    """8-bit greyscale ndarray (H, W) → PNG bytes.

    Filter types rotate over ``filters`` by scanline (deterministic — no
    randomness). The default (None/Sub/Up) matches what fast encoders emit
    for synthetic black-on-white pages AND keeps decode fully vectorized;
    pass (0, 1, 2, 3, 4) to exercise the Average/Paeth decode paths too
    (the codec tests do)."""
    img = np.ascontiguousarray(gray, dtype=np.uint8)
    h, w = img.shape
    raw = bytearray()
    prev = np.zeros(w, dtype=np.uint8)
    for y in range(h):
        line = img[y]
        ftype = filters[y % len(filters)]
        if ftype == 0:      # None
            enc = line
        elif ftype == 1:    # Sub
            left = np.concatenate(([0], line[:-1])).astype(np.uint8)
            enc = (line.astype(np.int16) - left).astype(np.uint8)
        elif ftype == 2:    # Up
            enc = (line.astype(np.int16) - prev).astype(np.uint8)
        elif ftype == 3:    # Average
            left = np.concatenate(([0], line[:-1])).astype(np.int16)
            enc = (line.astype(np.int16) - (left + prev.astype(np.int16)) // 2).astype(np.uint8)
        else:               # Paeth
            left = np.concatenate(([0], line[:-1])).astype(np.int16)
            up = prev.astype(np.int16)
            ul = np.concatenate(([0], prev[:-1])).astype(np.int16)
            p = left + up - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
            pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, ul))
            enc = (line.astype(np.int16) - pred).astype(np.uint8)
        raw.append(ftype)
        raw.extend(enc.tobytes())
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # 8-bit gray, no interlace
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → 8-bit greyscale ndarray (H, W).

    Supports bit depth 8, color types 0 (grey) and 2 (RGB), no interlace —
    the envelope real scanned-page exports use. RGB reduces to BT.601 luma.
    Raises ValueError on anything else (caller routes those bytes to the
    pass-through arm, never a crash)."""
    if not data.startswith(PNG_MAGIC):
        raise ValueError("not a PNG")
    pos = len(PNG_MAGIC)
    width = height = None
    color = bitdepth = interlace = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, bitdepth, color, _, _, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bitdepth != 8 or color not in (0, 2) or interlace != 0:
        raise ValueError(
            f"unsupported PNG (bitdepth={bitdepth}, color={color}, interlace={interlace})"
        )
    bpp = 1 if color == 0 else 3
    stride = width * bpp
    raw = zlib.decompress(bytes(idat))
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG scanline payload size mismatch")
    # one reshape splits filter bytes from scanline payloads; reconstruction
    # runs IN PLACE on uint8 (numpy uint8 arithmetic wraps mod 256 exactly
    # as the spec asks) — no per-row frombuffer/int16 round-trips
    raw_arr = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    ftypes = raw_arr[:, 0]
    bad = ftypes[ftypes > 4]
    if bad.size:
        raise ValueError(f"bad PNG filter type {int(bad[0])}")
    out = raw_arr[:, 1:].copy()
    if not np.all(ftypes == 0):  # all-None: payload IS the image
        prev = np.zeros(stride, dtype=np.uint8)
        for y in range(height):
            ftype = ftypes[y]
            line = out[y]
            if ftype == 1:
                # Sub — rec[x] = line[x] + rec[x-bpp]: per-channel
                # cumulative sum, in place
                for ch in range(bpp):
                    np.add.accumulate(line[ch::bpp], dtype=np.uint8, out=line[ch::bpp])
            elif ftype == 2:  # Up — vectorized, wrapping add
                line += prev
            elif ftype in (3, 4):  # up+left dependency: per-pixel loop (rare
                # in practice; the fixture encoder avoids these for large pages)
                filt = line.astype(np.int16)
                rec16 = np.zeros(stride, dtype=np.int16)
                for x in range(stride):
                    a = int(rec16[x - bpp]) if x >= bpp else 0
                    b = int(prev[x])
                    if ftype == 3:
                        pred = (a + b) // 2
                    else:
                        c = int(prev[x - bpp]) if x >= bpp else 0
                        pred = _paeth(a, b, c)
                    rec16[x] = (int(filt[x]) + pred) & 0xFF
                line[:] = rec16.astype(np.uint8)
            prev = line
    if color == 0:
        return out
    rgb = out.reshape(height, width, 3).astype(np.int32)
    return ((299 * rgb[:, :, 0] + 587 * rgb[:, :, 1] + 114 * rgb[:, :, 2]) // 1000).astype(
        np.uint8
    )


def bitmap_to_png(bits: np.ndarray) -> bytes:
    """1-bit ink bitmap (1 = ink) → greyscale PNG (ink black on white)."""
    return encode_png(np.where(bits.astype(bool), 0, 255).astype(np.uint8))
