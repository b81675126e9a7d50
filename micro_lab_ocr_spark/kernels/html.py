"""Lightweight HTML kernels: regex/stack tokenizer → table parse + main-content
block scoring. Pure Python, no external parser — re-creates the behaviors the
reference gets from BeautifulSoup (first ``<table>``, tr/td walk, rowspan flag;
`backend.py:228-337`) plus the north-star Readability/Boilerpipe-style
main-content extraction (text-density / link-density block scoring).

Runs only inside batched Arrow UDFs (scalar ``pandas_udf`` over a string
series); per-call cost is linear in document length.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

_TAG_RE = re.compile(r"<(/?)([a-zA-Z][a-zA-Z0-9]*)((?:\s+[^<>]*?)?)(/?)>", re.DOTALL)
_ATTR_RE = re.compile(r"([a-zA-Z_:][-a-zA-Z0-9_:.]*)\s*=\s*(\"[^\"]*\"|'[^']*'|[^\s\"'>]+)")
_WS_RE = re.compile(r"\s+")
_VOID_TAGS = {"br", "hr", "img", "input", "meta", "link", "area", "base", "col", "embed", "source", "track", "wbr"}

BLOCK_TAGS = {"div", "p", "section", "article", "main", "td", "li", "blockquote", "pre", "body"}
BOILERPLATE_TAGS = {"nav", "footer", "header", "aside", "script", "style", "form", "noscript"}


def _unquote(v: str) -> str:
    if len(v) >= 2 and v[0] in "\"'" and v[-1] == v[0]:
        return v[1:-1]
    return v


def tokenize(html: str):
    """Yield ('text', s) and ('open'/'close'/'selfclose', tag, attrs) tokens."""
    pos = 0
    for m in _TAG_RE.finditer(html):
        if m.start() > pos:
            yield ("text", html[pos : m.start()])
        closing, tag, attr_s, selfclose = m.groups()
        tag = tag.lower()
        if closing:
            yield ("close", tag, {})
        else:
            attrs = {k.lower(): _unquote(v) for k, v in _ATTR_RE.findall(attr_s or "")}
            kind = "selfclose" if (selfclose or tag in _VOID_TAGS) else "open"
            yield (kind, tag, attrs)
        pos = m.end()
    if pos < len(html):
        yield ("text", html[pos:])


# ---------------------------------------------------------------------------
# table parse (R2): first <table>, tr/td walk, text + rowspan flag of cell 0
# ---------------------------------------------------------------------------


@dataclass
class Cell:
    text: str
    rowspan: bool


def parse_first_table(html: str) -> list[list[Cell]]:
    """First ``<table>`` → rows of cells (text stripped of nested markup),
    mirroring the reference's ``soup.find('table')`` + ``find_all('tr'/'td')``
    walk (`backend.py:229-337`). Nested tables are flattened into the first
    (the reference's find_all does the same)."""
    rows: list[list[Cell]] = []
    in_table = 0
    cur_row: list[Cell] | None = None
    cur_cell: list[str] | None = None
    cur_rowspan = False
    done = False
    for tok in tokenize(html):
        if done:
            break
        kind = tok[0]
        if kind == "text":
            if cur_cell is not None:
                cur_cell.append(tok[1])
            continue
        tag = tok[1]
        if kind == "open":
            if tag == "table":
                in_table += 1
            elif in_table:
                if tag == "tr":
                    cur_row = []
                elif tag in ("td", "th"):
                    cur_cell = []
                    cur_rowspan = "rowspan" in tok[2]
        elif kind == "close":
            if tag == "table" and in_table:
                in_table -= 1
                if in_table == 0:
                    done = True
            elif in_table:
                if tag in ("td", "th") and cur_cell is not None:
                    text = _WS_RE.sub(" ", "".join(cur_cell)).strip()
                    if cur_row is not None:
                        cur_row.append(Cell(text, cur_rowspan))
                    cur_cell = None
                elif tag == "tr" and cur_row is not None:
                    rows.append(cur_row)
                    cur_row = None
    return rows


# ---------------------------------------------------------------------------
# main-content extraction (north-star): block tree + text/link-density scoring
# ---------------------------------------------------------------------------


@dataclass
class _Block:
    tag: str
    boiler: bool
    text_parts: list[str] = field(default_factory=list)
    link_chars: int = 0
    own_chars: int = 0


def extract_main_content(html: str) -> str:
    """Readability/Boilerpipe-style main-content extraction.

    Build a flat list of block elements; score each as
    ``own_chars * (1 - link_density)``, zeroing blocks inside
    nav/footer/header/aside/script/style; return the best block's
    whitespace-normalized text (ties → earliest block).
    """
    blocks: list[_Block] = []
    stack: list[_Block] = []
    boiler_depth = 0
    link_depth = 0
    for tok in tokenize(html):
        kind = tok[0]
        if kind == "text":
            text = tok[1]
            stripped = _WS_RE.sub(" ", text)
            if not stripped.strip():
                continue
            n = len(stripped.strip())
            if stack:
                blk = stack[-1]
                blk.text_parts.append(stripped)
                blk.own_chars += n
                if link_depth:
                    blk.link_chars += n
            continue
        tag = tok[1]
        if kind == "open":
            if tag in BOILERPLATE_TAGS:
                boiler_depth += 1
            if tag == "a":
                link_depth += 1
            if tag in BLOCK_TAGS:
                blk = _Block(tag, boiler_depth > 0)
                blocks.append(blk)
                stack.append(blk)
        elif kind == "close":
            if tag in BOILERPLATE_TAGS and boiler_depth:
                boiler_depth -= 1
            elif tag == "a" and link_depth:
                link_depth -= 1
            elif tag in BLOCK_TAGS:
                for i in range(len(stack) - 1, -1, -1):
                    if stack[i].tag == tag:
                        del stack[i:]
                        break
    best_text = ""
    best_score = -1.0
    for blk in blocks:
        if blk.boiler or blk.own_chars == 0:
            continue
        link_density = blk.link_chars / blk.own_chars
        score = blk.own_chars * (1.0 - link_density)
        if score > best_score:
            best_score = score
            best_text = _WS_RE.sub(" ", "".join(blk.text_parts)).strip()
    return best_text
