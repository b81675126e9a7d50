"""Oracle page/document extraction: pure-Python restatement of the two
reference engines' record-extraction flows (SURVEY §3.1, §3.2) and the full
per-document span-normalization pipeline. This is the executable spec pytest
compares the Spark engine against.
"""

from __future__ import annotations

import re

from micro_lab_ocr_spark import banks, spanspec
from micro_lab_ocr_spark.kernels import html as html_kernel
from micro_lab_ocr_spark.kernels import ocr as ocr_kernel
from micro_lab_ocr_spark.kernels import jpeg as jpeg_kernel
from micro_lab_ocr_spark.kernels import pdf as pdf_kernel
from micro_lab_ocr_spark.kernels import png as png_kernel
from micro_lab_ocr_spark.oracle import cleaners as oc

# ===========================================================================
# Upstage/HTML engine (`backend.py:312-426`, FIFO `backend.py:115-171`)
# ===========================================================================


class FallbackState:
    """Restates FallbackManager: page-scoped FIFO of surplus (test#, presc#)
    pairs + E.coli counter + current fill-down keys."""

    def __init__(self) -> None:
        self.pairs: list[tuple[str | None, str | None]] = []
        self.ecoli_count = 0
        self.current_test: str | None = None
        self.current_prescription: str | None = None

    def pop_front(self) -> tuple[str | None, str | None]:
        if self.pairs:
            return self.pairs.pop(0)
        return None, None

    def get_fallback_data(
        self, current_test: str | None = None, current_presc: str | None = None
    ) -> tuple[str | None, str | None]:
        """All three pop regimes of `backend.py:137-163` (W3): both-empty
        front pop (the only regime the reference's single call site
        `backend.py:386` reaches), test-only scan-pop, presc-only scan-pop.
        The partial pops REMOVE the donor pair entirely — its other half is
        discarded, exactly as the reference does."""
        if not current_test and not current_presc and self.pairs:
            current_test, current_presc = self.pairs.pop(0)
        elif not current_test and self.pairs:
            for i, (ft, _fp) in enumerate(self.pairs):
                if ft:
                    current_test = ft
                    self.pairs.pop(i)
                    break
        elif not current_presc and self.pairs:
            for i, (_ft, fp) in enumerate(self.pairs):
                if fp:
                    current_presc = fp
                    self.pairs.pop(i)
                    break
        return current_test, current_presc


# hard-coded column layouts (`backend.py:371,377`): with bulk name vs without
_IDX_WITH_BULK = {"0": 3, "7": 4, "14": 5, "28": 6, "judg": 7, "final": 8}
_IDX_NO_BULK = {"0": 2, "7": 3, "14": 4, "28": 5, "judg": 6, "final": 7}


def _cell(cells: list[html_kernel.Cell], idx: int) -> str:
    return cells[idx].text.strip() if len(cells) > idx else ""


def extract_date_info_html(rows: list[list[html_kernel.Cell]],
                           last_date_info: dict | None) -> dict:
    """`backend.py:259-310` incl. W2 carry (class-var analogue passed in)."""
    if len(rows) >= 2 and len(rows[1]) >= 1:
        first = rows[1][0].text.strip()
        consecutive = oc.parse_consecutive_dates(first)
        if len(consecutive) >= 4:
            return {
                "date_0": consecutive[0],
                "date_7": consecutive[1],
                "date_14": consecutive[2],
                "date_28": consecutive[3],
            }
        # F16: `parse_date` tries 9 strptime formats (`backend.py:774-798`)
        # in order — month-day forms first, then day-month for '/', '-', ' '.
        # strptime leaves the year at its default 1900, so the Upstage ladder
        # does its +7/+14/+28 arithmetic in year 1900 (NOT 2024 like the
        # Azure engine) — a reference quirk preserved by date_ladder_1900.
        parsed = oc.parse_date_multi(first)
        if parsed:
            return oc.date_ladder_1900(int(parsed[5:7]), int(parsed[8:10]))
    if last_date_info:
        return dict(last_date_info)
    return {}


def parse_table_rows_html(rows: list[list[html_kernel.Cell]],
                          state: FallbackState) -> list[dict]:
    """`backend.py:312-426` — W5 start detect, W1 fill-down, J2/J3 FIFO,
    Upstage clean chain, P4/P5 gates."""
    records: list[dict] = []

    data_start = 2
    for i, row in enumerate(rows):
        if row and row[0].rowspan and len(row[0].text.strip()) > 10:
            data_start = i
            break

    for row in rows[data_start:]:
        cells = row
        if len(cells) < 1:
            continue
        has_bulk = bool(cells[0].rowspan and cells[0].text.strip())
        if has_bulk:
            bulk = cells[0].text.strip()
            tests, prescs = oc.extract_multiple_numbers(bulk)
            if len(tests) > 1 or len(prescs) > 1:
                pairs = oc.create_matched_pairs(tests, prescs)
                if pairs:
                    state.current_test, state.current_prescription = pairs[0]
                    if len(pairs) > 1:
                        state.pairs.extend(pairs[1:])
                else:
                    state.current_test = tests[0] if tests else None
                    state.current_prescription = prescs[0] if prescs else None
            else:
                state.current_test = tests[0] if tests else None
                state.current_prescription = prescs[0] if prescs else None
            if len(cells) > 1:
                strain = cells[1].text.strip()
                idx = _IDX_WITH_BULK
            else:
                continue
        else:
            strain = cells[0].text.strip()
            idx = _IDX_NO_BULK
            if "E.coli" in strain or "Escherichia" in strain:
                state.ecoli_count += 1
                if state.ecoli_count > 1 and state.pairs:
                    state.current_test, state.current_prescription = (
                        state.get_fallback_data(None, None)
                    )

        if not strain or not any(k in strain for k in banks.VALID_STRAIN_KEYWORDS):
            continue
        strain_norm = oc.normalize_strain_upstage(strain)

        rec = {
            "test_number": state.current_test or "",
            "prescription_number": state.current_prescription or "",
            "strain": strain_norm,
            "cfu_0day": oc.clean_cfu_value_upstage(_cell(cells, idx["0"]), strain_norm, "0"),
            "cfu_7day": oc.clean_cfu_value_upstage(_cell(cells, idx["7"]), strain_norm, "7"),
            "cfu_14day": oc.clean_cfu_value_upstage(_cell(cells, idx["14"]), strain_norm, "14"),
            "cfu_28day": oc.clean_cfu_value_upstage(_cell(cells, idx["28"]), strain_norm, "28"),
            "judgment": oc.extract_judgment_upstage(_cell(cells, idx["judg"])),
            "final_judgment": oc.extract_judgment_upstage(_cell(cells, idx["final"])),
        }
        if any(v.strip() for k, v in rec.items() if k.startswith("cfu_")):
            records.append(rec)
    return records


def parse_html_page(html: str, state: FallbackState,
                    last_date_info: dict | None) -> tuple[list[dict], dict]:
    """`backend.py:207-250`: first table, ≥3-row gate, dates, rows."""
    rows = html_kernel.parse_first_table(html)
    if not rows or len(rows) < 3:
        return [], {}
    date_info = extract_date_info_html(rows, last_date_info)
    records = parse_table_rows_html(rows, state)
    return records, date_info


# ===========================================================================
# Azure/grid engine (`backend_preservation.py:255-580,737-923`)
# ===========================================================================

Grid = dict[int, dict[int, str]]


def grid_from_cells(cells: list[tuple[int, int, str]]) -> Grid:
    grid: Grid = {}
    for r, c, t in cells:
        grid.setdefault(r, {})[c] = t
    return grid


_HEADER_KEYWORDS = ["CHALLENGED ORGANISM", "BULK NAME", "SPECIFICATION"]
_STRAIN_KEYWORDS = [
    "E.COLI", "ESCHERICHIA", "P.AERUGINOSA", "PSEUDOMONAS",
    "S.AUREUS", "STAPHYLOCOCCUS", "C.ALBICANS", "CANDIDA",
    "A.BRASILIENSIS", "ASPERGILLUS", "균주", "STRAIN",
]
_CFU_VALUE_RE = re.compile(r"\d+\.?\d*\s*[×xX]\s*10[\^]?\d+")
_SPEC_VALUE_RE = re.compile(r"^(≤[0-9]+[°cC]?|[0-9]{1,2}[°cC]?|SI)$")


def find_header_row(grid: Grid) -> int | None:
    """W8 (`backend_preservation.py:737-806`): keyword header → row; strain-
    keyword candidate with CFU values → -1 (headerless); else None."""
    n = len(grid)
    for row_idx in range(min(5, n)):
        if row_idx not in grid:
            continue
        row_text = " ".join(str(v) for v in grid[row_idx].values()).upper()
        if any(k in row_text for k in _HEADER_KEYWORDS):
            return row_idx
    candidates = []
    for row_idx in range(min(15, n)):
        if row_idx not in grid:
            continue
        row_text = " ".join(str(v) for v in grid[row_idx].values()).upper()
        if any(k in row_text for k in _STRAIN_KEYWORDS):
            candidates.append(row_idx)
    for row_idx in candidates:
        has_cfu = False
        for v in grid[row_idx].values():
            vs = str(v).strip()
            if _CFU_VALUE_RE.search(vs) or re.match(r"^\d{4,}$", vs):
                has_cfu = True
                break
        return -1 if has_cfu else row_idx
    return None


def identify_columns(grid: Grid, header_row: int) -> dict:
    """`backend_preservation.py:808-923` — keyword map + sequential fallback
    with Specification skip (incl. A7 value-pattern vote)."""
    cmap: dict[str, int] = {}
    if header_row not in grid:
        return cmap
    for col_idx, value in grid[header_row].items():
        vu = str(value).upper().strip()
        v = str(value)
        if "균주" in v or "STRAIN" in vu or "E.COLI" in vu or "ORGANISM" in vu:
            cmap["strain_col"] = col_idx
        if "SPECIFICATION" in vu or "SPEC" in vu:
            cmap["specification_col"] = col_idx
        if "0" in v and ("일" in v or "DAY" in vu or "CFU" in vu or "접종" in v):
            cmap["cfu_0_col"] = col_idx
        elif "7" in v and ("일" in v or "DAY" in vu or "CFU" in vu):
            cmap["cfu_7_col"] = col_idx
        elif "14" in v and ("일" in v or "DAY" in vu or "CFU" in vu):
            cmap["cfu_14_col"] = col_idx
        elif "28" in v and ("일" in v or "DAY" in vu or "CFU" in vu):
            cmap["cfu_28_col"] = col_idx
        if "판정" in v or "JUDGMENT" in vu:
            if "최종" in v or "FINAL" in vu:
                cmap["final_judgment_col"] = col_idx
            elif "judgment_col" not in cmap:
                cmap["judgment_col"] = col_idx

    if "strain_col" in cmap:
        strain_col = cmap["strain_col"]
        spec_col = cmap.get("specification_col", -1)
        if spec_col == -1:
            next_col = strain_col + 1
            spec_count = 0
            checked = 0
            for row_idx in sorted(grid.keys()):
                if row_idx <= header_row:
                    continue
                if checked >= 5:
                    break
                if next_col in grid[row_idx]:
                    if _SPEC_VALUE_RE.match(str(grid[row_idx][next_col]).strip()):
                        spec_count += 1
                    checked += 1
            if spec_count >= 3:
                spec_col = next_col
                cmap["specification_col"] = spec_col
        cfu_start = spec_col + 1 if spec_col > strain_col else strain_col + 1
        cmap.setdefault("cfu_0_col", cfu_start)
        cmap.setdefault("cfu_7_col", cfu_start + 1)
        cmap.setdefault("cfu_14_col", cfu_start + 2)
        cmap.setdefault("cfu_28_col", cfu_start + 3)
        cmap.setdefault("judgment_col", cfu_start + 4)
        cmap.setdefault("final_judgment_col", cfu_start + 5)
    return cmap


def extract_grid_records(grid: Grid) -> list[dict]:
    """`backend_preservation.py:416-580`: W1 fill-down, per-cell clean chain,
    F13 judgment, A2 strain-order sort within consecutive test groups."""
    header_row = find_header_row(grid)
    if header_row is None:
        return []
    data_start = 0 if header_row == -1 else header_row + 1
    cmap = identify_columns(grid, 0 if header_row == -1 else header_row)

    records: list[dict] = []
    current_test = ""
    current_prescription = ""
    n = len(grid)
    for row_idx in range(data_start, n):
        if row_idx not in grid:
            continue
        row = grid[row_idx]
        bulk = str(row.get(0, "")).strip()
        if bulk:
            t, p = oc.extract_test_info_from_row(bulk)
            if t:
                current_test = t
            if p:
                current_prescription = p
        strain_col = cmap.get("strain_col")
        if strain_col is None or strain_col not in row:
            continue
        strain = str(row[strain_col]).strip()
        strain_norm = oc.normalize_strain(strain)
        if not strain_norm:
            continue
        cfu_0 = oc.clean_cfu_value(str(row.get(cmap.get("cfu_0_col", -1), "")), "0")
        cfu_7 = oc.clean_cfu_value(str(row.get(cmap.get("cfu_7_col", -1), "")), "7")
        cfu_14 = oc.clean_cfu_value(str(row.get(cmap.get("cfu_14_col", -1), "")), "14")
        cfu_28 = oc.clean_cfu_value(str(row.get(cmap.get("cfu_28_col", -1), "")), "28")
        judgment = oc.extract_judgment(str(row.get(cmap.get("judgment_col", -1), "")))
        final_col = cmap.get("final_judgment_col", -1)
        if final_col == -1:
            final = ""
        else:
            fv = str(row.get(final_col, ""))
            final = oc.extract_judgment(fv) if fv else ""
        records.append(
            {
                "test_number": current_test,
                "prescription_number": current_prescription,
                "strain": strain_norm,
                "cfu_0day": cfu_0,
                "cfu_7day": cfu_7,
                "cfu_14day": cfu_14,
                "cfu_28day": cfu_28,
                "judgment": judgment,
                "final_judgment": final,
            }
        )

    # A2 — sort consecutive same-test groups by canonical strain order
    sorted_records: list[dict] = []
    group: list[dict] = []
    current = object()
    for rec in records:
        if rec["test_number"] != current:
            group.sort(key=lambda r: banks.STRAIN_ORDER.get(r["strain"], 999))
            sorted_records.extend(group)
            current = rec["test_number"]
            group = [rec]
        else:
            group.append(rec)
    group.sort(key=lambda r: banks.STRAIN_ORDER.get(r["strain"], 999))
    sorted_records.extend(group)
    return sorted_records


# ===========================================================================
# full per-document span pipeline (the oracle for span-sequence equality)
# ===========================================================================


def normalize_document(doc_id: str, spans: list[dict], media: dict[str, bytes]) -> list[dict]:
    """Expected normalized spans for one document.

    spans: [{kind, text, media_ref, offset}] (raw); media: media_ref → bytes.
    Sequential state: Upstage date carry (W2) across table_html spans; the
    fallback FIFO resets per span (page analogue, `app.py:401`).
    """
    out: list[dict] = []
    last_date_info: dict = {}
    for span in sorted(spans, key=lambda s: s["offset"]):
        kind = span["kind"]
        text = span["text"]
        ref = span["media_ref"]
        if kind == "text":
            out.append({"kind": "text", "text": text, "media_ref": ""})
        elif kind == "html":
            out.append({"kind": "text", "text": html_kernel.extract_main_content(text), "media_ref": ""})
        elif kind == "table_html":
            state = FallbackState()
            records, date_info = parse_html_page(text, state, last_date_info)
            if date_info:
                last_date_info = date_info
            out.append(
                {"kind": "table", "text": spanspec.serialize_table(date_info, records), "media_ref": ""}
            )
        elif (
            kind == "image"
            and ref in media
            and media[ref] is not None
            and (
                media[ref].startswith(ocr_kernel.MAGIC)
                or media[ref].startswith(png_kernel.PNG_MAGIC)
                or media[ref].startswith(jpeg_kernel.JPEG_MAGIC)
            )
        ):
            # only rasters the OCR kernel decodes (MLIMG fixture container,
            # real PNG or real baseline JPEG); other bytes — and magic-valid
            # bytes whose payload fails to decode — fall to the pass-through
            # arm (same contract as the pdf branch's no-text-layer fallback)
            try:
                grid = grid_from_cells(ocr_kernel.decode_image(media[ref]))
            except ocr_kernel.DECODE_ERRORS:
                out.append({"kind": kind, "text": text, "media_ref": ref})
            else:
                date_info = oc.extract_date_info_from_grid(grid)
                records = extract_grid_records(grid)
                out.append(
                    {"kind": "table", "text": spanspec.serialize_table(date_info, records), "media_ref": ref}
                )
        elif (
            kind == "pdf"
            and ref in media
            and media[ref] is not None
            and (
                media[ref].startswith(pdf_kernel.MAGIC)
                or (media[ref].startswith(b"%PDF") and b"/Encrypt" not in media[ref])
            )
        ):
            # S2: only decodable containers are parsed — the MLPDF fixture
            # container or a real %PDF without /Encrypt (pure-stdlib text
            # layer, kernels/pdf.decode_real_pdf); DRM-flagged or headerless
            # bytes fall to the pass-through arm (`drm_utils.py:19-134`;
            # S3 decrypt is an external non-goal)
            try:
                out.append(
                    {"kind": "text", "text": pdf_kernel.layout_text(media[ref]), "media_ref": ref}
                )
            except ValueError:
                # no recoverable text layer (image-only real PDF)
                out.append({"kind": kind, "text": text, "media_ref": ref})
        else:
            # unknown kind, or media span whose ref is missing from the media
            # table: pass through unchanged — never silently dropped
            out.append({"kind": kind, "text": text, "media_ref": ref})
    for i, span in enumerate(out):
        span["offset"] = i
    return out
