"""J4 template-cell placement + J5 edit merge (operators/sheet.py vs the
reference semantics in `backend.py:1040-1115` / `app_preservation.py:693-704`)."""

from __future__ import annotations

from pyspark.sql import functions as F

from micro_lab_ocr_spark.operators import sheet

REC_COLS = [
    "key", "test_number", "prescription_number", "strain",
    "cfu_0day", "cfu_7day", "cfu_14day", "cfu_28day",
    "judgment", "final_judgment",
]


def _rec(key, strain, c0="", c7="", c14="", c28="", judg="", final="", test="T", presc="P"):
    return (key, test, presc, strain, c0, c7, c14, c28, judg, final)


def test_template_cells_places_known_strains(spark):
    recs = spark.createDataFrame(
        [
            _rec(1, "E.coli", "5.5×10^5", "<10", "100", "", "적합"),
            _rec(1, "Candida albicans", "1.0×10^3"),  # long form → row 23/53
            _rec(1, "unknown bug", "9.9×10^9"),       # not in map → dropped
        ],
        REC_COLS,
    )
    out = {(r["cell"]): r["value"] for r in sheet.template_cells(recs).collect()}
    # E.coli row 20: originals J/M/P/S/U (empty values still written)
    assert out["J20"] == "5.5×10^5"
    assert out["M20"] == "<10"
    assert out["P20"] == "100"
    assert out["S20"] == ""
    assert out["U20"] == "적합"
    # E.coli log row 50 (F20 conversion)
    assert out["J50"] == "5.7"
    assert out["M50"] == "<1.0"
    assert out["P50"] == "2.0"
    assert out["S50"] == ""
    # Candida albicans mapped to C.albicans → rows 23/53
    assert out["J23"] == "1.0×10^3"
    assert out["J53"] == "3.0"
    # nothing from the unmapped strain, and no row-25+ cells at all
    assert len(out) == 18


def test_template_cells_order_col_dedup(spark):
    # reference iterates frame order: a later row of the same strain
    # overwrites the earlier one's cells — order_col gives that last-wins
    recs = spark.createDataFrame(
        [
            (1, 0) + _rec(1, "E.coli", "111")[1:],
            (1, 1) + _rec(1, "E.coli", "222")[1:],
        ],
        ["key", "ord"] + REC_COLS[1:],
    )
    out = {r["cell"]: r["value"] for r in
           sheet.template_cells(recs, order_col="ord").collect()}
    assert out["J20"] == "222"
    assert len(out) == 9  # one strain's worth


def test_template_dates_skips_empty(spark):
    pages = spark.createDataFrame(
        [(1, "01/05", "", "01/19", None)],
        "key long, date_0 string, date_7 string, date_14 string, date_28 string",
    )
    out = {r["cell"]: r["value"] for r in sheet.template_dates(pages).collect()}
    # non-empty dates land in both the original and the log block
    assert out == {"I19": "01/05", "O19": "01/19", "I49": "01/05", "O49": "01/19"}


def test_merge_edits_overrides_by_position(spark):
    recs = spark.createDataFrame(
        [_rec(1, "E.coli", "111"), _rec(1, "C.albicans", "333"), _rec(2, "E.coli", "444")],
        REC_COLS,
    )
    edits = spark.createDataFrame(
        [
            _rec(1, "E.coli", "EDITED"),      # overrides (1, E.coli)
            _rec(3, "S.aureus", "ADDED"),     # brand-new position → appended
        ],
        REC_COLS,
    )
    out = sheet.merge_edits(recs, edits, on=["key", "strain"])
    got = {(r["key"], r["strain"]): r["cfu_0day"] for r in out.collect()}
    assert got == {
        (1, "E.coli"): "EDITED",
        (1, "C.albicans"): "333",
        (2, "E.coli"): "444",
        (3, "S.aureus"): "ADDED",
    }
    assert out.columns == recs.columns


def test_merge_edits_drops_extra_ui_columns(spark):
    recs = spark.createDataFrame([_rec(1, "E.coli", "111")], REC_COLS)
    edits = spark.createDataFrame(
        [(1, "T", "P", "E.coli", "E2", "", "", "", "", "", "✅ ok")],
        REC_COLS + ["ui_badge"],
    )
    out = sheet.merge_edits(recs, edits, on=["key", "strain"])
    assert out.columns == recs.columns
    assert out.collect()[0]["cfu_0day"] == "E2"


def test_merge_edits_plan_broadcasts_edits(spark):
    recs = spark.createDataFrame([_rec(1, "E.coli", "111")], REC_COLS)
    edits = spark.createDataFrame([_rec(1, "E.coli", "E")], REC_COLS)
    plan = sheet.merge_edits(recs, edits, on=["key", "strain"])._jdf.queryExecution(
    ).executedPlan().toString()
    # the anti-join must be broadcast (records never shuffle for an edit set)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_template_cells_plans_no_shuffle(spark):
    # the placement is a literal map lookup + explode — zero exchanges on
    # top of whatever produced the records
    recs = spark.createDataFrame([_rec(1, "E.coli", "1")], REC_COLS)
    plan = sheet.template_cells(recs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "BatchEvalPython" not in plan
