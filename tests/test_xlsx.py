"""S9/S13 minimal workbook sink (sinks/xlsx.py): structural OOXML checks via
stdlib zip+ElementTree, and the J4 placement → workbook path end-to-end."""

from __future__ import annotations

import io
import xml.etree.ElementTree as ET
import zipfile

import pytest

from micro_lab_ocr_spark.sinks import xlsx

NS = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}


def _sheet_cells(data: bytes, part: str) -> dict[str, str]:
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        root = ET.fromstring(z.read(part))
    out = {}
    for c in root.iter("{%s}c" % NS["m"]):
        t = c.find("m:is/m:t", NS)
        out[c.attrib["r"]] = t.text or "" if t is not None else ""
    return out


def test_workbook_structure_and_values():
    data = xlsx.workbook_bytes([
        ("TEMPLATE_BASE", []),
        ("d0001", [("J20", "5.5×10^5"), ("A1", "x & <y>"), ("J20", "override")]),
    ])
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        names = set(z.namelist())
        assert {"[Content_Types].xml", "_rels/.rels", "xl/workbook.xml",
                "xl/_rels/workbook.xml.rels", "xl/worksheets/sheet1.xml",
                "xl/worksheets/sheet2.xml"} <= names
        # every part parses as XML
        for n in names:
            ET.fromstring(z.read(n))
        wb = ET.fromstring(z.read("xl/workbook.xml"))
    sheet_names = [s.attrib["name"] for s in wb.iter("{%s}sheet" % NS["m"])]
    assert sheet_names == ["TEMPLATE_BASE", "d0001"]
    cells = _sheet_cells(data, "xl/worksheets/sheet2.xml")
    # same-ref later write wins (reference assigns worksheet[cell] in order)
    assert cells == {"J20": "override", "A1": "x & <y>"}


def test_workbook_rejects_bad_input():
    with pytest.raises(ValueError):
        xlsx.workbook_bytes([])
    with pytest.raises(ValueError):
        xlsx.workbook_bytes([("a", []), ("a", [])])
    with pytest.raises(ValueError):
        xlsx.workbook_bytes([("s", [("NOT_A_REF", "v")])])


def test_sheet_name_sanitized():
    data = xlsx.workbook_bytes([("bad[name]:with*chars" + "x" * 40, [])])
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        wb = ET.fromstring(z.read("xl/workbook.xml"))
    (name,) = [s.attrib["name"] for s in wb.iter("{%s}sheet" % NS["m"])]
    assert len(name) <= 31 and not set("[]:*?/\\") & set(name)


def test_export_cells_end_to_end(spark):
    # the full reference path: records → J4 placements → workbook download
    from micro_lab_ocr_spark.operators import sheet

    recs = spark.createDataFrame(
        [("d1", "T", "P", "E.coli", "5.5×10^5", "<10", "", "", "적합", ""),
         ("d2", "T", "P", "C.albicans", "100", "", "", "", "", "")],
        ["key", "test_number", "prescription_number", "strain", "cfu_0day",
         "cfu_7day", "cfu_14day", "cfu_28day", "judgment", "final_judgment"],
    )
    data = xlsx.export_cells(sheet.template_cells(recs))
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        wb = ET.fromstring(z.read("xl/workbook.xml"))
    names = [s.attrib["name"] for s in wb.iter("{%s}sheet" % NS["m"])]
    assert names == ["TEMPLATE_BASE", "d1", "d2"]
    d1 = _sheet_cells(data, "xl/worksheets/sheet2.xml")
    assert d1["J20"] == "5.5×10^5" and d1["U20"] == "적합" and d1["J50"] == "5.7"
    d2 = _sheet_cells(data, "xl/worksheets/sheet3.xml")
    assert d2["J23"] == "100" and d2["J53"] == "2.0"


def test_export_cells_caps_fail_loudly(spark):
    cells = spark.createDataFrame(
        [(f"d{i}", "A1", "v") for i in range(4)], ["key", "cell", "value"]
    )
    with pytest.raises(ValueError, match="max_sheets"):
        xlsx.export_cells(cells, max_sheets=2)
    with pytest.raises(ValueError, match="max_cells"):
        xlsx.export_cells(cells, max_cells=2)
