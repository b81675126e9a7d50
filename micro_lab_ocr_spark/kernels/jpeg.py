"""Pure-stdlib baseline JPEG codec (numpy DCT + canonical Huffman).

The container ships no imaging libraries, but baseline JPEG needs none
either: ITU-T T.81 baseline sequential is markers + canonical Huffman +
8×8 DCT, all expressible with the stdlib and numpy. This closes the last
raster gap in the media branch (the reference feeds real page scans to its
OCR APIs, `backend.py:177-205`): real ``\\xff\\xd8`` bytes now decode
through the same binarize→segment→recognize path as PNG/MLIMG instead of
passing through undecoded.

Scope — the envelope real scanned-page exports use:

* decode: baseline sequential (SOF0), 8-bit, grayscale or 3-component
  YCbCr with 1×1 sampling (4:4:4), restart markers, stuffed bytes.
  Progressive (SOF2), arithmetic coding, 12-bit, and subsampled chroma
  raise ``ValueError`` — the caller routes those bytes to the pass-through
  arm, never a crash (same contract as kernels/png.py).
* encode: grayscale SOF0 with the T.81 Annex-K quantization + Huffman
  tables (the interoperable defaults every baseline decoder ships), used
  by the fixture/tests side. Quality scaling follows the usual
  5000/Q / 200−2Q convention.

The DCT runs as one batched ``A @ X @ A.T`` einsum over all blocks; the
entropy coder is per-symbol Python, fine for page-sized fixtures (the 100 TB
path decodes media inside Arrow-batched kernels where a cluster deployment
swaps in libjpeg-turbo behind the same function signature).

Color images reduce to the Y (luma) component — downstream OCR binarizes
anyway, mirroring decode_png's BT.601 reduction.
"""

from __future__ import annotations

import struct

import numpy as np

JPEG_MAGIC = b"\xff\xd8\xff"

# ---------------------------------------------------------------------------
# shared tables (ITU-T T.81 Annex K — public interoperability defaults)
# ---------------------------------------------------------------------------

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

QTABLE_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64).reshape(8, 8)

# canonical Huffman specs: (BITS[1..16], HUFFVAL)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
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

# orthonormal 8×8 DCT-II basis: forward F = A @ X @ A.T, inverse X = A.T @ F @ A
_N = np.arange(8)
_DCT_A = np.sqrt(np.where(_N == 0, 1.0, 2.0) / 8.0)[:, None] * np.cos(
    (2 * _N[None, :] + 1) * _N[:, None] * np.pi / 16.0
)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """BITS/HUFFVAL → {symbol: (length, code)} (encoder side)."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """BITS/HUFFVAL → {(length, code): symbol} (decoder side)."""
    return {(ln, code): sym for sym, (ln, code) in _canonical_codes(bits, vals).items()}


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * scale + 50) // 100, 1, 255).astype(np.int64)


# ---------------------------------------------------------------------------
# bit I/O
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # stuffing
                self.out.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            self.put(0x7F, 8 - self.n)  # pad with 1-bits per spec
        return bytes(self.out)


class _BitReader:
    """Reads MSB-first bits from de-stuffed entropy bytes."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def bit(self) -> int:
        byte_i, off = divmod(self.pos, 8)
        if byte_i >= len(self.data):
            raise ValueError("JPEG entropy stream truncated")
        self.pos += 1
        return (self.data[byte_i] >> (7 - off)) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _extend(raw: int, size: int) -> int:
    if size == 0:
        return 0
    return raw if raw >= (1 << (size - 1)) else raw - (1 << size) + 1


def _read_symbol(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


# ---------------------------------------------------------------------------
# encoder (grayscale baseline — the fixture/test side)
# ---------------------------------------------------------------------------


def encode_jpeg(gray: np.ndarray, quality: int = 92, restart_interval: int = 0) -> bytes:
    """8-bit grayscale ndarray (H, W) → baseline JFIF bytes (Annex-K
    quantization scaled by ``quality``, standard luminance Huffman tables).
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many MCUs
    (what scanners emit for error resilience; exercises the decoder's
    restart path)."""
    img = np.asarray(gray, dtype=np.uint8)
    h, w = img.shape
    qt = _quality_scale(QTABLE_LUMA, quality)
    ph, pw = -h % 8, -w % 8
    img = np.pad(img, ((0, ph), (0, pw)), mode="edge")
    bh, bw = img.shape[0] // 8, img.shape[1] // 8
    blocks = (
        img.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8).astype(np.float64)
        - 128.0
    )
    coef = np.einsum("ij,njk,lk->nil", _DCT_A, blocks, _DCT_A)
    quant = np.round(coef / qt[None, :, :]).astype(np.int64)
    zz = quant.reshape(-1, 64)[:, ZIGZAG]

    dc_codes = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_codes = _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    entropy = bytearray()
    bw_out = _BitWriter()
    pred = 0
    for mcu_i, row in enumerate(zz):
        if restart_interval and mcu_i and mcu_i % restart_interval == 0:
            entropy += bw_out.flush()
            entropy += struct.pack(">H", 0xFFD0 + ((mcu_i // restart_interval - 1) % 8))
            bw_out = _BitWriter()
            pred = 0
        diff = int(row[0]) - pred
        pred = int(row[0])
        size = int(abs(diff)).bit_length()
        ln, code = dc_codes[size]
        bw_out.put(code, ln)
        if size:
            bw_out.put(diff if diff >= 0 else diff + (1 << size) - 1, size)
        run = 0
        nz = np.flatnonzero(row[1:])
        last = nz[-1] + 1 if len(nz) else 0
        for k in range(1, last + 1):
            v = int(row[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                ln, code = ac_codes[0xF0]  # ZRL
                bw_out.put(code, ln)
                run -= 16
            size = abs(v).bit_length()
            ln, code = ac_codes[(run << 4) | size]
            bw_out.put(code, ln)
            bw_out.put(v if v >= 0 else v + (1 << size) - 1, size)
            run = 0
        if last < 63:
            ln, code = ac_codes[0x00]  # EOB
            bw_out.put(code, ln)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    dqt = seg(0xFFDB, b"\x00" + bytes(int(x) for x in qt.reshape(64)[ZIGZAG]))
    sof = seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    dht = seg(
        0xFFC4,
        b"\x00" + bytes(DC_LUMA_BITS) + bytes(DC_LUMA_VALS)
        + b"\x10" + bytes(AC_LUMA_BITS) + bytes(AC_LUMA_VALS),
    )
    app0 = seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    dri = seg(0xFFDD, struct.pack(">H", restart_interval)) if restart_interval else b""
    sos = seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
    entropy += bw_out.flush()
    return (
        b"\xff\xd8" + app0 + dqt + sof + dht + dri + sos + bytes(entropy) + b"\xff\xd9"
    )


# ---------------------------------------------------------------------------
# decoder (baseline sequential, grayscale / 4:4:4 YCbCr → luma)
# ---------------------------------------------------------------------------


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG bytes → 8-bit grayscale ndarray (H, W).

    3-component 4:4:4 images reduce to the Y channel (luma — the OCR path
    binarizes downstream, mirroring decode_png's RGB→luma). Raises
    ``ValueError`` on progressive/arithmetic/12-bit/subsampled streams."""
    if not data.startswith(JPEG_MAGIC):
        raise ValueError("not a JPEG")
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    restart_interval = 0
    frame = None  # (h, w, components)
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI before SOS
            break
        (ln,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        payload = data[pos + 4 : pos + 2 + ln]
        pos += 2 + ln
        if marker == 0xDB:  # DQT — one or more tables
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0x0F
                if pq != 0:
                    raise ValueError("unsupported JPEG (16-bit quant table)")
                if p + 65 > len(payload):
                    raise ValueError("truncated JPEG DQT segment")
                tbl = np.zeros(64, dtype=np.int64)
                tbl[ZIGZAG] = np.frombuffer(payload[p + 1 : p + 65], dtype=np.uint8)
                qtables[tq] = tbl.reshape(8, 8)
                p += 65
        elif marker == 0xC4:  # DHT — one or more tables
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0x0F
                bits = list(payload[p + 1 : p + 17])
                n = sum(bits)
                if len(bits) < 16 or p + 17 + n > len(payload):
                    raise ValueError("truncated JPEG DHT segment")
                vals = list(payload[p + 17 : p + 17 + n])
                htables[(tc, th)] = _decode_table(bits, vals)
                p += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1: baseline/ext sequential
            if len(payload) < 6:
                raise ValueError("truncated JPEG SOF segment")
            prec, h, w, nc = struct.unpack(">BHHB", payload[:6])
            if len(payload) < 6 + 3 * nc:
                raise ValueError("truncated JPEG SOF segment")
            if prec != 8:
                raise ValueError("unsupported JPEG (precision != 8)")
            comps = []
            for i in range(nc):
                cid, samp, tq = payload[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, samp >> 4, samp & 0x0F, tq))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("unsupported JPEG (progressive/arithmetic/lossless)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", payload[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            if not payload:
                raise ValueError("truncated JPEG SOS segment")
            ns = payload[0]
            if len(payload) < 1 + 2 * ns:
                raise ValueError("truncated JPEG SOS segment")
            scan_tables = {}
            for i in range(ns):
                cs, tt = payload[1 + 2 * i], payload[2 + 2 * i]
                scan_tables[cs] = (tt >> 4, tt & 0x0F)
            return _decode_scan(
                data, pos, frame, scan_tables, qtables, htables, restart_interval
            )
        # APPn/COM/others: skipped
    raise ValueError("JPEG has no scan")


def _decode_scan(data, pos, frame, scan_tables, qtables, htables, restart_interval):
    h, w, comps = frame
    if len(comps) not in (1, 3):
        raise ValueError(f"unsupported JPEG ({len(comps)} components)")
    if any(sh != 1 or sv != 1 for _, sh, sv, _ in comps):
        raise ValueError("unsupported JPEG (subsampled chroma)")
    # de-stuff + split on restart markers
    segments: list[bytes] = []
    cur = bytearray()
    i = pos
    while i < len(data):
        b = data[i]
        if b == 0xFF:
            nxt = data[i + 1] if i + 1 < len(data) else 0xD9
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:  # RSTn
                segments.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break  # EOI or next marker
        cur.append(b)
        i += 1
    segments.append(bytes(cur))

    bh, bw = (h + 7) // 8, (w + 7) // 8
    n_mcu = bh * bw
    coef = [np.zeros((n_mcu, 64), dtype=np.int64) for _ in comps]
    mcu = 0
    for seg_bytes in segments:
        r = _BitReader(seg_bytes)
        preds = [0] * len(comps)
        limit = min(n_mcu, mcu + restart_interval) if restart_interval else n_mcu
        while mcu < limit:
            for ci, (cid, _, _, _tq) in enumerate(comps):
                if cid not in scan_tables:
                    raise ValueError("JPEG scan component missing from frame")
                dc_t, ac_t = scan_tables[cid]
                dc = htables.get((0, dc_t))
                ac = htables.get((1, ac_t))
                if dc is None or ac is None:
                    raise ValueError("JPEG scan references missing Huffman table")
                size = _read_symbol(r, dc)
                if size > 15:
                    raise ValueError("invalid JPEG DC magnitude category")
                preds[ci] += _extend(r.bits(size), size)
                block = coef[ci][mcu]
                block[0] = preds[ci]
                k = 1
                while k < 64:
                    sym = _read_symbol(r, ac)
                    if sym == 0x00:  # EOB
                        break
                    if sym == 0xF0:  # ZRL
                        k += 16
                        continue
                    k += sym >> 4
                    size = sym & 0x0F
                    if k > 63:
                        raise ValueError("JPEG AC run past block end")
                    block[k] = _extend(r.bits(size), size)
                    k += 1
            mcu += 1
        if mcu >= n_mcu:
            break
    if mcu < n_mcu:
        raise ValueError("JPEG scan ended early")

    # luma only: component 0 is Y for YCbCr, the sole plane for grayscale
    _, _, _, tq = comps[0]
    if tq not in qtables:
        raise ValueError("JPEG frame references missing quant table")
    dq = np.zeros((n_mcu, 64), dtype=np.float64)
    dq[:, ZIGZAG] = coef[0] * qtables[tq].reshape(64)[ZIGZAG]
    blocks = dq.reshape(-1, 8, 8)
    pix = np.einsum("ji,njk,kl->nil", _DCT_A, blocks, _DCT_A) + 128.0
    pix = np.clip(np.round(pix), 0, 255).astype(np.uint8)
    img = pix.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
    return img[:h, :w].copy()
