"""Normalized-span format spec — shared by engine and oracle.

The pipeline's output contract (BASELINE.json): per doc_id, an array
``spans: array<struct<kind,text,media_ref,offset>>`` in reading order with
dense offsets. Kinds emitted:

* ``text``  — plain text, extracted HTML main content, or PDF reading-order
  text;
* ``table`` — a parsed preservation-test table (from a ``table_html`` span via
  the Upstage-semantics engine, or an ``image`` span via OCR + the
  Azure-semantics engine), serialized canonically below.

Table serialization: first line ``dates=<d0>,<d7>,<d14>,<d28>`` (empty string
when no date info), then one line per record with the 9 fields joined by
``|`` in SURVEY §1.3 order.
"""

from __future__ import annotations

RECORD_FIELDS = [
    "test_number",
    "prescription_number",
    "strain",
    "cfu_0day",
    "cfu_7day",
    "cfu_14day",
    "cfu_28day",
    "judgment",
    "final_judgment",
]

DATE_KEYS = ["date_0", "date_7", "date_14", "date_28"]


def serialize_table(date_info: dict[str, str] | None, records: list[dict]) -> str:
    dates = ",".join((date_info or {}).get(k, "") for k in DATE_KEYS)
    if not any((date_info or {}).get(k) for k in DATE_KEYS):
        dates = ",,,"
    lines = [f"dates={dates}"]
    for rec in records:
        lines.append("|".join(str(rec.get(f, "")) for f in RECORD_FIELDS))
    return "\n".join(lines)
