"""PDF layout kernel: XY-cut reading-order recovery over text blocks.

The fixture "pdf" format is a deterministic block container (``MLPDF`` magic +
JSON block list ``[{x0,y0,x1,y1,text}, …]``) standing in for a real PDF's
positioned text runs — real PDF parsing (PyMuPDF et al.) is stubbed behind an
import-try since the container ships no PDF library; the XY-cut algorithm and
the Spark plumbing are identical either way.

Recursive XY-cut (the classical top-down page segmentation): find the widest
blank gap, cut, recurse — vertical cuts (columns) take precedence so
multi-column pages read column-major, then top-to-bottom.
"""

from __future__ import annotations

import json

MAGIC = b"MLPDF"
MIN_GAP = 5.0  # minimum blank gap (pts) that separates regions


def encode_pdf(blocks: list[dict]) -> bytes:
    """Fixture-side: pack blocks [{x0,y0,x1,y1,text}] into MLPDF bytes."""
    return MAGIC + json.dumps(blocks, ensure_ascii=False, sort_keys=True).encode("utf-8")


def decode_pdf(data: bytes) -> list[dict]:
    if not data.startswith(MAGIC):
        raise ValueError("not a MLPDF container")
    return json.loads(data[len(MAGIC):].decode("utf-8"))


def _gaps(intervals: list[tuple[float, float]], lo: float, hi: float) -> list[tuple[float, float]]:
    """Maximal blank gaps within [lo,hi] not covered by any interval."""
    events = sorted(intervals)
    gaps: list[tuple[float, float]] = []
    cursor = lo
    for a, b in events:
        if a > cursor:
            gaps.append((cursor, a))
        cursor = max(cursor, b)
    if cursor < hi:
        gaps.append((cursor, hi))
    return [(a, b) for a, b in gaps if (b - a) >= MIN_GAP]


def xy_cut(blocks: list[dict]) -> list[dict]:
    """Order blocks in reading order via recursive XY-cut."""
    if len(blocks) <= 1:
        return list(blocks)
    x_lo = min(b["x0"] for b in blocks)
    x_hi = max(b["x1"] for b in blocks)
    y_lo = min(b["y0"] for b in blocks)
    y_hi = max(b["y1"] for b in blocks)

    # vertical cut first (column detection)
    vgaps = _gaps([(b["x0"], b["x1"]) for b in blocks], x_lo, x_hi)
    if vgaps:
        cut = max(vgaps, key=lambda g: g[1] - g[0])
        mid = (cut[0] + cut[1]) / 2
        left = [b for b in blocks if b["x1"] <= mid]
        right = [b for b in blocks if b["x1"] > mid]
        if left and right:
            return xy_cut(left) + xy_cut(right)

    hgaps = _gaps([(b["y0"], b["y1"]) for b in blocks], y_lo, y_hi)
    if hgaps:
        cut = max(hgaps, key=lambda g: g[1] - g[0])
        mid = (cut[0] + cut[1]) / 2
        top = [b for b in blocks if b["y1"] <= mid]
        bottom = [b for b in blocks if b["y1"] > mid]
        if top and bottom:
            return xy_cut(top) + xy_cut(bottom)

    # no clean cut: stable sort by (y0, x0)
    return sorted(blocks, key=lambda b: (b["y0"], b["x0"]))


def layout_text(data: bytes) -> str:
    """PDF bytes → reading-order text (blocks joined by newline). Accepts
    both the MLPDF fixture container and REAL ``%PDF`` files (pure-stdlib
    parser below); both paths order blocks through the same XY-cut."""
    blocks = decode_real_pdf(data) if data.startswith(b"%PDF") else decode_pdf(data)
    return "\n".join(b["text"] for b in xy_cut(blocks))


# ---------------------------------------------------------------------------
# Real-PDF text extraction — pure stdlib, like kernels/png.py for rasters.
#
# Reference behavior: `backend.py:101-112` renders real PDFs and feeds the
# pages to OCR. This engine goes straight to the text layer: a lenient
# object scanner (no xref needed — works on appended/linearized files),
# FlateDecode via stdlib zlib, and a content-stream interpreter for the
# text operators (BT/ET, Tf, Tm/Td/TD/T*, Tj/TJ/'/") that yields positioned
# text lines as the same {x0,y0,x1,y1,text} block dicts the MLPDF fixture
# path uses, so XY-cut reading-order recovery is shared.
#
# Honest limitations (documented, not hidden): glyph widths are estimated
# (0.5 em) rather than read from font metrics, and strings decode latin-1 —
# correct for Standard/WinAnsi-encoded simple fonts, wrong for embedded
# subset fonts with custom cmaps (those need a real font stack). Encrypted
# PDFs are routed to pass-through upstream by the S2 DRM detector.
# ---------------------------------------------------------------------------

_OBJ_RE = None  # compiled lazily (module import stays cheap on executors)


def _pdf_objects(data: bytes) -> list[tuple[bytes, bytes | None]]:
    """Scan ``N G obj … endobj`` bodies → [(dict_part, stream_bytes|None)].
    Lenient: ignores xref entirely and takes objects in file order."""
    import re

    global _OBJ_RE
    if _OBJ_RE is None:
        _OBJ_RE = re.compile(rb"\d+\s+\d+\s+obj(.*?)endobj", re.S)
    out = []
    for m in _OBJ_RE.finditer(data):
        body = m.group(1)
        sm = re.search(rb"stream\r?\n", body)
        if sm:
            head = body[: sm.start()]
            tail = body[sm.end():]
            se = tail.rfind(b"endstream")
            stream = tail[:se] if se >= 0 else tail
            out.append((head, stream))
        else:
            out.append((body, None))
    return out


def _inflate(head: bytes, stream: bytes) -> bytes | None:
    """Decode a stream body: FlateDecode via zlib, raw when unfiltered;
    None for filters a stdlib parser can't handle (DCT, LZW, …)."""
    import zlib

    if b"/FlateDecode" in head:
        try:
            return zlib.decompress(stream.rstrip(b"\r\n"))
        except zlib.error:
            try:
                return zlib.decompressobj().decompress(stream)
            except zlib.error:
                return None
    if b"/Filter" in head:
        return None
    return stream


def _pdf_string(tok: bytes) -> str:
    """Literal ``(…)`` (with \\-escapes and octal) or hex ``<…>`` → str.
    latin-1: exact for Standard/WinAnsi simple fonts (see module note)."""
    if tok.startswith(b"<"):
        hx = b"".join(tok[1:-1].split())
        if len(hx) % 2:
            hx += b"0"
        return bytes.fromhex(hx.decode("ascii", "ignore")).decode("latin-1")
    body = tok[1:-1]
    out = bytearray()
    i = 0
    esc = {b"n"[0]: 10, b"r"[0]: 13, b"t"[0]: 9, b"b"[0]: 8, b"f"[0]: 12,
           b"("[0]: 40, b")"[0]: 41, b"\\"[0]: 92}
    while i < len(body):
        c = body[i]
        if c == 0x5C and i + 1 < len(body):  # backslash
            nxt = body[i + 1]
            if nxt in esc:
                out.append(esc[nxt])
                i += 2
                continue
            if 0x30 <= nxt <= 0x37:  # octal, up to 3 digits
                j = i + 1
                oct_digits = b""
                while j < len(body) and len(oct_digits) < 3 and 0x30 <= body[j] <= 0x37:
                    oct_digits += bytes([body[j]])
                    j += 1
                out.append(int(oct_digits, 8) & 0xFF)
                i = j
                continue
            if nxt in (10, 13):  # line continuation
                i += 2
                if nxt == 13 and i < len(body) and body[i] == 10:
                    i += 1
                continue
            out.append(nxt)
            i += 2
            continue
        out.append(c)
        i += 1
    return out.decode("latin-1")


def _tokenize_content(cs: bytes):
    """Content-stream tokens: numbers, names, strings, array markers,
    operators. Strings handle nested parens and escapes."""
    import re

    i, n = 0, len(cs)
    num = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")
    name = re.compile(rb"/[^\s/\[\]()<>{}%]*")
    op = re.compile(rb"[A-Za-z'\"*]{1,3}")
    while i < n:
        c = cs[i:i + 1]
        if c in b" \t\r\n\x00":
            i += 1
        elif c == b"%":
            j = cs.find(b"\n", i)
            i = n if j < 0 else j + 1
        elif c == b"(":
            depth, j = 1, i + 1
            while j < n and depth:
                ch = cs[j]
                if ch == 0x5C:
                    j += 2
                    continue
                if ch == 0x28:
                    depth += 1
                elif ch == 0x29:
                    depth -= 1
                j += 1
            yield ("str", cs[i:j])
            i = j
        elif c == b"<" and cs[i:i + 2] != b"<<":
            j = cs.find(b">", i)
            j = n if j < 0 else j + 1
            yield ("str", cs[i:j])
            i = j
        elif cs[i:i + 2] in (b"<<", b">>"):
            yield ("delim", cs[i:i + 2])
            i += 2
        elif c in b"[]":
            yield ("delim", c)
            i += 1
        else:
            m = num.match(cs, i)
            if m:
                yield ("num", m.group())
                i = m.end()
                continue
            m = name.match(cs, i)
            if m:
                yield ("name", m.group())
                i = m.end()
                continue
            m = op.match(cs, i)
            if m:
                yield ("op", m.group())
                i = m.end()
                continue
            i += 1  # unknown byte — lenient skip


def _interpret_text(cs: bytes, page_h: float) -> list[dict]:
    """Run the text operators of one content stream; return block dicts.
    One block per text LINE (shows at one baseline merge in x-order);
    y flipped top-down so XY-cut's fixture convention applies."""
    blocks: list[dict] = []
    size = 12.0
    leading = 14.4
    tx = ty = 0.0
    line: list[tuple[float, str]] = []

    def flush():
        nonlocal line
        if line:
            line.sort(key=lambda p: p[0])
            text = "".join(t for _, t in line)
            if text.strip():
                x0 = line[0][0]
                width = 0.5 * size * sum(len(t) for _, t in line)
                y_top = page_h - ty - size
                blocks.append({"x0": x0, "y0": y_top, "x1": x0 + width,
                               "y1": y_top + size, "text": text})
            line = []

    stack: list = []
    cursor_x = 0.0
    for kind, tok in _tokenize_content(cs):
        if kind in ("num", "name", "str"):
            stack.append((kind, tok))
        elif kind == "delim":
            stack.append((kind, tok))
        else:  # operator
            try:
                if tok == b"Tf" and len(stack) >= 1 and stack[-1][0] == "num":
                    size = float(stack[-1][1])
                    leading = 1.2 * size
                elif tok == b"TL" and stack and stack[-1][0] == "num":
                    leading = float(stack[-1][1])
                elif tok in (b"Td", b"TD") and len(stack) >= 2:
                    dx, dy = float(stack[-2][1]), float(stack[-1][1])
                    flush()
                    tx += dx
                    ty += dy
                    cursor_x = tx
                    if tok == b"TD":
                        leading = -dy if dy else leading
                elif tok == b"Tm" and len(stack) >= 6:
                    # text matrix [a b c d e f]: take the translation (e, f);
                    # glyph-space scaling beyond Tf size is out of scope
                    flush()
                    tx, ty = float(stack[-2][1]), float(stack[-1][1])
                    cursor_x = tx
                elif tok == b"T*":
                    flush()
                    ty -= leading
                    cursor_x = tx
                elif tok in (b"Tj", b"'", b'"'):
                    if tok != b"Tj":
                        flush()
                        ty -= leading
                        cursor_x = tx
                    s = next((t for k, t in reversed(stack) if k == "str"), None)
                    if s is not None:
                        text = _pdf_string(s)
                        line.append((cursor_x, text))
                        cursor_x += 0.5 * size * len(text)
                elif tok == b"TJ":
                    # array of strings and kerning numbers (ignored)
                    for k, t in stack:
                        if k == "str":
                            text = _pdf_string(t)
                            line.append((cursor_x, text))
                            cursor_x += 0.5 * size * len(text)
                elif tok == b"BT":
                    tx = ty = 0.0
                    cursor_x = 0.0
                elif tok == b"ET":
                    flush()
            finally:
                stack = []
    flush()
    return blocks


def encode_real_pdf(blocks: list[dict], page_h: float = 792.0, compress: bool = True) -> bytes:
    """Fixture-side: render block dicts as a REAL one-page ``%PDF`` file
    (Flate-compressed content stream) — the real-format counterpart of
    :func:`encode_pdf`, so tests can drive :func:`decode_real_pdf` without
    any PDF library. Text is escaped for literal strings; y converts from
    the top-down block convention to PDF's bottom-up baseline."""
    import zlib

    parts = []
    for b in blocks:
        size = max(b["y1"] - b["y0"], 1.0)
        ty = page_h - b["y0"] - size
        esc = (
            b["text"].encode("latin-1", "replace")
            .replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")
        )
        parts.append(
            b"BT /F1 %.1f Tf %.1f %.1f Td (%s) Tj ET"
            % (size, b["x0"], ty, esc)
        )
    content = b" ".join(parts)
    if compress:
        body, filt = zlib.compress(content), b"/Filter /FlateDecode "
    else:
        body, filt = content, b""
    objs = [
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj",
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj",
        b"3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 %d] "
        b"/Contents 4 0 R >> endobj" % int(page_h),
        b"4 0 obj << " + filt + b"/Length " + str(len(body)).encode()
        + b" >> stream\n" + body + b"\nendstream endobj",
    ]
    return b"%PDF-1.4\n" + b"\n".join(objs) + b"\n%%EOF"


def decode_real_pdf(data: bytes) -> list[dict]:
    """Real ``%PDF`` bytes → positioned text blocks (pure stdlib — scanner +
    FlateDecode + text-operator interpreter; see module note for scope).
    Raises ValueError when no text layer is recoverable, so callers can
    route scanned-image PDFs to the raster/OCR path instead."""
    import re

    mb = re.search(rb"/MediaBox\s*\[\s*[\d.+-]+\s+[\d.+-]+\s+[\d.+-]+\s+([\d.+-]+)", data)
    page_h = float(mb.group(1)) if mb else 792.0
    blocks: list[dict] = []
    for head, stream in _pdf_objects(data):
        if stream is None:
            continue
        cs = _inflate(head, stream)
        if cs is None or b"BT" not in cs:
            continue
        blocks.extend(_interpret_text(cs, page_h))
    if not blocks:
        raise ValueError("no text layer found (image-only or unsupported PDF)")
    return blocks
