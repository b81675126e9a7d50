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
    """MLPDF bytes → reading-order text (blocks joined by newline)."""
    return "\n".join(b["text"] for b in xy_cut(decode_pdf(data)))


def decode_real_pdf(data: bytes) -> list[dict]:  # pragma: no cover
    """Real-PDF text+bbox extraction. STUB: no PDF library in this container;
    on a production cluster install pymupdf and emit the same block dicts."""
    try:
        import fitz  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "real-PDF decode requires a PDF library not present in this environment"
        ) from exc
    raise NotImplementedError("wire PyMuPDF block extraction here")
