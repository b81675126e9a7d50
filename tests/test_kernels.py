"""Pure-Python kernel tests (no Spark session): OCR raster round-trip,
HTML DOM/table/boilerplate, XY-cut reading order."""

from __future__ import annotations

import random

from micro_lab_ocr_spark.kernels import html as hk
from micro_lab_ocr_spark.kernels import ocr as ok
from micro_lab_ocr_spark.kernels import pdf as pk
from micro_lab_ocr_spark.sources import fixtures


def test_ocr_roundtrip_exact():
    rng = random.Random(123)
    for _ in range(40):
        grid = fixtures.make_grid(rng)
        img = ok.render_grid_image(grid)
        assert sorted(ok.decode_image(img)) == sorted(grid)


def test_ocr_full_alphabet_roundtrip():
    cells = []
    row = 0
    alpha = ok.ALPHABET
    for i in range(0, len(alpha), 8):
        cells.append((row, 0, "".join(alpha[i:i + 8])))
        row += 1
    img = ok.render_grid_image(cells)
    assert sorted(ok.decode_image(img)) == sorted(cells)


def test_ocr_spaces_roundtrip():
    cells = [(0, 0, "a b"), (0, 1, "a  b"), (1, 0, "< 10"), (1, 1, "5.5 × 10 5")]
    img = ok.render_grid_image(cells)
    assert sorted(ok.decode_image(img)) == sorted(cells)


def test_html_first_table_rowspan():
    html = (
        "<html><body><p>pre</p>"
        '<table><tr><td rowspan="2">bulk</td><td>a</td></tr>'
        "<tr><td>b</td></tr></table>"
        "<table><tr><td>second table ignored</td></tr></table></body></html>"
    )
    rows = hk.parse_first_table(html)
    assert len(rows) == 2
    assert rows[0][0].text == "bulk" and rows[0][0].rowspan
    assert rows[0][1].text == "a" and not rows[0][1].rowspan
    assert rows[1][0].text == "b"


def test_html_nested_markup_in_cell():
    rows = hk.parse_first_table("<table><tr><td><b>x</b> <i>y</i></td></tr></table>")
    assert rows[0][0].text == "x y"


def test_main_content_beats_boilerplate():
    main = "the quick brown fox jumps over the lazy dog " * 10
    html = (
        "<html><body>"
        "<nav><div><a href='/a'>aaa</a> <a href='/b'>bbb</a> <a href='/c'>ccc</a></div></nav>"
        f"<div id='c'><p>{main}</p></div>"
        "<footer><div>copyright footer text that is quite long as well</div></footer>"
        "</body></html>"
    )
    out = hk.extract_main_content(html)
    assert out == main.strip()


def test_link_density_penalizes_link_farms():
    farm = "".join(f"<a href='/{i}'>link text number {i}</a> " for i in range(30))
    main = "short but real sentence about an actual topic of interest"
    html = f"<html><body><div>{farm}</div><p>{main}</p></body></html>"
    assert hk.extract_main_content(html) == main


def test_xy_cut_two_columns():
    blocks = [
        {"x0": 0, "x1": 100, "y0": 0, "y1": 50, "text": "L1"},
        {"x0": 0, "x1": 100, "y0": 60, "y1": 110, "text": "L2"},
        {"x0": 200, "x1": 300, "y0": 0, "y1": 50, "text": "R1"},
        {"x0": 200, "x1": 300, "y0": 60, "y1": 110, "text": "R2"},
    ]
    random.Random(0).shuffle(blocks)
    data = pk.encode_pdf(blocks)
    assert pk.layout_text(data) == "L1\nL2\nR1\nR2"


def test_xy_cut_single_column_order():
    blocks = [
        {"x0": 0, "x1": 500, "y0": 120, "y1": 170, "text": "B"},
        {"x0": 0, "x1": 500, "y0": 0, "y1": 50, "text": "A"},
        {"x0": 0, "x1": 500, "y0": 240, "y1": 290, "text": "C"},
    ]
    assert pk.layout_text(pk.encode_pdf(blocks)) == "A\nB\nC"
