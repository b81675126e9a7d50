"""Sheet-side operators: J4 template-cell placement, J5 edit merge.

The reference renders extracted records into a fixed Excel template
(`backend.py:1040-1115`): a literal strain→sheet-row map places each
record's CFU/judgment values at fixed cell addresses, a parallel "log"
block places the F20 log₁₀-converted CFU values, and the page's date_info
lands at fixed date cells. The Streamlit UI additionally lets the user edit
the records frame, and the edited frame overrides the OCR frame by position
(`app_preservation.py:693-704,846`).

Spark-first equivalents — the workbook itself is a sink concern (S9/S13,
documented non-goals: no Excel lib in this environment and not a scale
operator); what IS an engine operator is the join semantics:

* :func:`template_cells` — J4: records ⋈ literal position map → one row per
  (doc key, cell address, value). Pure Catalyst (`create_map` lookups +
  `explode` over a literal cell array): no shuffle, no UDF — a columnar
  sink or a sf-small workbook writer consumes it directly.
* :func:`template_dates` — the date-cell placement block
  (`backend.py:1040-1057`): non-empty dates land at the four original +
  four log date cells.
* :func:`merge_edits` — J5: the user-edited frame wins by position. Edits
  are human-scale (a session's worth of corrections), so the key set
  broadcasts onto the records scan: a broadcast anti-join drops the
  overridden rows and the edit rows append — records never shuffle.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from micro_lab_ocr_spark.functions import cleaners as C

# `backend.py:1060-1071` — exact-key dict (NOT the substring-matching F12
# synonym bank): long form → canonical short name, unknown strains pass
# through the map and are then dropped by the position lookup.
TEMPLATE_STRAIN_MAPPING: dict[str, str] = {
    "E.coli": "E.coli",
    "Escherichia coli": "E.coli",
    "P.aeruginosa": "P.aeruginosa",
    "Pseudomonas aeruginosa": "P.aeruginosa",
    "S.aureus": "S.aureus",
    "Staphylococcus aureus": "S.aureus",
    "C.albicans": "C.albicans",
    "Candida albicans": "C.albicans",
    "A.brasiliensis": "A.brasiliensis",
    "Aspergillus brasiliensis": "A.brasiliensis",
}

# `backend.py:1073-1087` — per-strain sheet rows: originals at rows 20-24
# (columns J/M/P/S/U = cfu_0/7/14/28 + judgment), log₁₀ block at rows 50-54
# (columns J/M/P/S = log of cfu_0/7/14/28).
TEMPLATE_STRAIN_ROW: dict[str, int] = {
    "E.coli": 0,
    "P.aeruginosa": 1,
    "S.aureus": 2,
    "C.albicans": 3,
    "A.brasiliensis": 4,
}
_ORIG_COLS = ["J", "M", "P", "S", "U"]
_LOG_COLS = ["J", "M", "P", "S"]
_CFU_FIELDS = ["cfu_0day", "cfu_7day", "cfu_14day", "cfu_28day"]

# `backend.py:1049-1051` — date header cells (original + log blocks).
_DATE_CELLS_ORIG = ["I19", "L19", "O19", "R19"]
_DATE_CELLS_LOG = ["I49", "L49", "O49", "R49"]
_DATE_FIELDS = ["date_0", "date_7", "date_14", "date_28"]


def _lit_map(d: dict) -> Column:
    return F.create_map(*chain.from_iterable((F.lit(k), F.lit(v)) for k, v in d.items()))


def template_cells(
    records: DataFrame, key_col: str = "key", order_col: str | None = None
) -> DataFrame:
    """J4 — template-cell join (`backend.py:1060-1115`): records →
    ``(key, cell, value)`` placement rows.

    Per record row whose normalized strain has template positions: five
    original cells (J/M/P/S/U at row 20+idx ← cfu_0/7/14/28 + judgment,
    empty values included — the reference writes ``row.get(..., '')``
    unconditionally) and four log cells (J/M/P/S at row 50+idx ←
    F20 ``convert_to_log`` of each CFU). Strains outside the map emit
    nothing (the reference's ``if mapped_strain in original_positions``).

    The reference iterates rows in frame order, so a later row of the same
    strain overwrites the earlier one's cells. Pass ``order_col`` to get
    that last-wins semantics declaratively (a max-by window per
    (key, strain)); with the default ``None`` the caller guarantees one row
    per (key, strain) — the engine's extraction output — and no window (and
    thus no extra sort) is planned.
    """
    canon = F.coalesce(
        F.element_at(_lit_map(TEMPLATE_STRAIN_MAPPING), F.col("strain")),
        F.col("strain"),
    )
    r = records.withColumn("_idx", F.element_at(_lit_map(TEMPLATE_STRAIN_ROW), canon))
    r = r.where(F.col("_idx").isNotNull())
    if order_col is not None:
        w = Window.partitionBy(key_col, "_idx").orderBy(F.col(order_col).desc())
        r = r.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1)
    row_orig = (F.col("_idx") + 20).cast("string")
    row_log = (F.col("_idx") + 50).cast("string")

    def cell(col_letter: str, row: Column, value: Column) -> Column:
        return F.struct(
            F.concat(F.lit(col_letter), row).alias("cell"),
            F.coalesce(value, F.lit("")).alias("value"),
        )

    entries = F.array(
        *[cell(c, row_orig, F.col(f)) for c, f in zip(_ORIG_COLS, _CFU_FIELDS + ["judgment"],)],
        *[cell(c, row_log, C.convert_to_log(F.col(f))) for c, f in zip(_LOG_COLS, _CFU_FIELDS)],
    )
    return r.select(key_col, F.explode(entries).alias("e")).select(
        key_col, F.col("e.cell").alias("cell"), F.col("e.value").alias("value")
    )


def template_dates(pages: DataFrame, key_col: str = "key") -> DataFrame:
    """Date-cell placement (`backend.py:1040-1057`): per page, each
    NON-empty ``date_0/7/14/28`` lands at its original AND log date cell
    (the reference writes only ``if date_val``; empty/null slots emit
    nothing). Input: ``(key, date_0, date_7, date_14, date_28)``."""
    entries = F.array(
        *[
            F.struct(F.lit(cellname).alias("cell"), F.col(f).alias("value"))
            for cells in (_DATE_CELLS_ORIG, _DATE_CELLS_LOG)
            for cellname, f in zip(cells, _DATE_FIELDS)
        ]
    )
    return (
        pages.select(key_col, F.explode(entries).alias("e"))
        .where(F.col("e.value").isNotNull() & (F.col("e.value") != ""))
        .select(key_col, F.col("e.cell").alias("cell"), F.col("e.value").alias("value"))
    )


def merge_edits(records: DataFrame, edits: DataFrame, on: list[str]) -> DataFrame:
    """J5 — user-edited rows override extracted rows by position
    (`app_preservation.py:693-704,846`: the edited frame, keyed by its grid
    position, replaces the OCR frame wherever it exists).

    Scale shape: ``edits`` is a human session's corrections — bounded and
    tiny next to a 10^12-doc records table — so its KEY SET broadcasts onto
    the records side (broadcast left-anti join: overridden rows drop without
    shuffling records), then the edit rows union in, projected to the
    records schema (extra UI columns dropped; a missing records column
    raises — field-level partial edits are upstream's concern, a row is
    replaced wholesale exactly like the reference's frame swap). The batch
    MERGE-INTO analogue for persisted output is
    ``pipeline.checkpoint.apply_corrections`` (S11); this operator is the
    in-plan form.
    """
    keys = F.broadcast(edits.select(*on).distinct())
    # the name-list join moves the key columns to the front — project back
    # to the records schema so callers see position-stable columns
    kept = records.join(keys, on, "left_anti").select(*records.columns)
    return kept.unionByName(edits.select(*records.columns))
