"""Minimal OOXML (.xlsx) writer — pure stdlib (zipfile + escaped XML).

S9 template-sink init (`backend.py:877-912`): the reference copies a
template workbook and renames its first sheet ``TEMPLATE_BASE``; per-doc
sheets are added next to it and the UI's sheet list filters
``TEMPLATE_BASE`` out (`backend.py:1118-1136`). S13 export
(`backend.py:1144-1157`): the workbook rides back as bytes for download.

This environment has no Excel library, and SURVEY §7.5 scopes the workbook
to an sf-small convenience export — NOT a scale operator (the scale sink is
the checkpointed parquet/Iceberg table). So the sink here is a from-scratch
minimal OOXML writer: a .xlsx is a zip of five XML parts; cells are written
as inline strings, one worksheet per doc, sheets beyond the caps fail
LOUDLY rather than silently truncating. It consumes exactly the J4
placement rows (``operators/sheet.template_cells`` / ``template_dates``
output: ``(key, cell, value)``), which makes the reference's
template→place→download path runnable end-to-end:

    cells = template_cells(records).unionByName(template_dates(pages))
    data = export_cells(cells)          # driver-side collect, sf-small
    open("out.xlsx", "wb").write(data)

The files validate against the OOXML spreadsheet minimum: [Content_Types],
package rels, workbook, workbook rels, and one sheet part per worksheet.
"""

from __future__ import annotations

import io
import re
import zipfile
from xml.sax.saxutils import escape

_CELL_RE = re.compile(r"^([A-Z]{1,3})([1-9][0-9]*)$")

# Excel sheet-name rules: ≤31 chars, none of []:*?/\ — sanitized, not
# rejected (doc_ids are the usual source and are already safe)
_BAD_SHEET_CHARS = re.compile(r"[\[\]:*?/\\]")


def _col_index(letters: str) -> int:
    n = 0
    for ch in letters:
        n = n * 26 + (ord(ch) - 64)
    return n


def _sheet_xml(cells: list[tuple[str, str]]) -> str:
    """Worksheet XML from [(cell_ref, value)]. Later writes to the same cell
    ref win (the reference assigns ``worksheet[cell] = value`` in order)."""
    by_ref: dict[tuple[int, int], tuple[str, str]] = {}
    for ref, value in cells:
        m = _CELL_RE.match(ref)
        if not m:
            raise ValueError(f"invalid cell reference {ref!r}")
        by_ref[(int(m.group(2)), _col_index(m.group(1)))] = (ref, value)
    rows: dict[int, list[tuple[int, str, str]]] = {}
    for (rnum, cnum), (ref, value) in by_ref.items():
        rows.setdefault(rnum, []).append((cnum, ref, value))
    parts = ['<?xml version="1.0" encoding="UTF-8" standalone="yes"?>',
             '<worksheet xmlns="http://schemas.openxmlformats.org/'
             'spreadsheetml/2006/main"><sheetData>']
    for rnum in sorted(rows):
        parts.append(f'<row r="{rnum}">')
        for _, ref, value in sorted(rows[rnum]):
            parts.append(
                f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">'
                f"{escape(str(value))}</t></is></c>"
            )
        parts.append("</row>")
    parts.append("</sheetData></worksheet>")
    return "".join(parts)


def _sheet_name(name: str) -> str:
    clean = _BAD_SHEET_CHARS.sub("_", str(name))[:31]
    return clean or "_"


def workbook_bytes(sheets: list[tuple[str, list[tuple[str, str]]]]) -> bytes:
    """S13 — build the downloadable workbook: ordered (sheet name, cells)
    pairs → .xlsx bytes. Duplicate sheet names raise (Excel refuses them)."""
    names = [_sheet_name(n) for n, _ in sheets]
    if len(set(names)) != len(names):
        raise ValueError("duplicate sheet names after sanitization")
    if not sheets:
        raise ValueError("a workbook needs at least one sheet")
    overrides = "".join(
        f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.spreadsheetml.'
        'worksheet+xml"/>'
        for i in range(len(sheets))
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
        'content-types">'
        '<Default Extension="rels" ContentType="application/vnd.'
        'openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/'
        'vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        f"{overrides}</Types>"
    )
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        '2006/relationships"><Relationship Id="rId1" Type="http://schemas.'
        "openxmlformats.org/officeDocument/2006/relationships/"
        'officeDocument" Target="xl/workbook.xml"/></Relationships>'
    )
    sheet_tags = "".join(
        f'<sheet name={_quoteattr(names[i])} sheetId="{i + 1}" r:id="rId{i + 1}"/>'
        for i in range(len(sheets))
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/'
        '2006/main" xmlns:r="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships">'
        f"<sheets>{sheet_tags}</sheets></workbook>"
    )
    sheet_rels = "".join(
        f'<Relationship Id="rId{i + 1}" Type="http://schemas.openxmlformats'
        '.org/officeDocument/2006/relationships/worksheet" '
        f'Target="worksheets/sheet{i + 1}.xml"/>'
        for i in range(len(sheets))
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        f'2006/relationships">{sheet_rels}</Relationships>'
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", content_types)
        z.writestr("_rels/.rels", root_rels)
        z.writestr("xl/workbook.xml", workbook)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        for i, (_, cells) in enumerate(sheets):
            z.writestr(f"xl/worksheets/sheet{i + 1}.xml", _sheet_xml(cells))
    return buf.getvalue()


def _quoteattr(s: str) -> str:
    return '"' + escape(s, {'"': "&quot;"}) + '"'


def export_cells(
    cells_df,
    key_col: str = "key",
    template: list[tuple[str, str]] | None = None,
    max_sheets: int = 1000,
    max_cells: int = 500_000,
) -> bytes:
    """S9+S13 — the reference's init→place→download path over J4 placement
    rows: ``cells_df(key, cell, value)`` → one worksheet per key (sheet name
    = str(key)), with the ``TEMPLATE_BASE`` sheet first (S9: the template
    carries fixed labels; pass them as ``template`` placements, default
    empty — the sheet still exists so downstream sheet-list filtering
    behaves like the reference's).

    sf-SMALL ONLY: this collects to the driver by design (SURVEY §7.5 — the
    scale sink is the checkpointed table). The caps fail loudly instead of
    silently truncating a workbook nobody should be building at scale."""
    rows = cells_df.select(key_col, "cell", "value").collect()
    if len(rows) > max_cells:
        raise ValueError(
            f"{len(rows)} placement cells exceed max_cells={max_cells}: "
            "the workbook export is the sf-small convenience sink — write "
            "the records table instead (pipeline/checkpoint.py)"
        )
    per_key: dict[str, list[tuple[str, str]]] = {}
    for r in rows:
        per_key.setdefault(str(r[key_col]), []).append((r["cell"], r["value"]))
    if len(per_key) > max_sheets:
        raise ValueError(
            f"{len(per_key)} docs exceed max_sheets={max_sheets}: the "
            "workbook export is the sf-small convenience sink"
        )
    sheets = [("TEMPLATE_BASE", template or [])]
    sheets.extend((k, per_key[k]) for k in sorted(per_key))
    return workbook_bytes(sheets)
