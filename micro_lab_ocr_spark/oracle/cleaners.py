"""Oracle restatement of the reference's scalar cleaning banks (SURVEY §2.7).

Each function re-states, branch for branch, the observable behavior of the
cited reference function (Azure engine `backend_preservation.py` unless noted)
— written fresh against the spec in SURVEY.md, sharing its vocabularies with
the Spark expression layer via :mod:`micro_lab_ocr_spark.banks`.
"""

from __future__ import annotations

import math
import re
from datetime import datetime, timedelta

from micro_lab_ocr_spark import banks

# --------------------------------------------------------------------------
# F4 — merged-cell split (`backend_preservation.py:1205-1243`)
# --------------------------------------------------------------------------


def split_merged_cells(value: str) -> str:
    if not value:
        return value
    sci = re.findall(banks.MERGED_SCIENTIFIC, value)
    if len(sci) >= 2:
        return sci[0]
    lt = re.findall(banks.MERGED_LESS_THAN, value)
    if len(lt) >= 2:
        return lt[0]
    return value


# --------------------------------------------------------------------------
# F5 — noise strip (`backend_preservation.py:1245-1276`)
# --------------------------------------------------------------------------


def remove_noise(value: str) -> str:
    if not value:
        return value
    for tok in (":selected:", ":unselected:"):
        value = value.replace(tok, "")
    for ch in ('"', "'", "°", "€"):
        value = value.replace(ch, "")
    value = value.replace("\n", " ")
    return value.strip()


# --------------------------------------------------------------------------
# F6 — `<10` misread bank (`backend_preservation.py:1278-1440`)
# Tier order is semantic: literals → regex tiers → pass-through.
# --------------------------------------------------------------------------


def fix_less_than_10(value: str) -> str:
    if not value:
        return value
    value = value.strip()

    if value in banks.MEANINGLESS_LITERALS:
        return ""
    if value in banks.LESS_THAN_10_LITERALS:
        return "<10"
    if re.match(r"^<\s*10[\?\-\)]+$", value):
        return "<10"
    if re.match(r"^<\s*[czsCZS]ion", value, re.IGNORECASE):
        return "<10"
    if re.match(r"^\d$", value):
        return "<10"
    if value == "00":
        return "<10"
    # --- `<10^2` tiers ---
    if re.match(r"^<\s*10[\^]?2$", value):
        return "<10^2"
    if re.match(r"^<\s*10[\^]?2,?$", value):
        return "<10^2"
    if re.match(r"^<\s*10\s+2$", value):
        return "<10^2"
    if value in banks.LT10E2_LITERALS:
        return "<10^2"
    if re.match(r"^[SC]I0?2,?$", value, re.IGNORECASE):
        return "<10^2"
    if re.match(r"^[5C6]/0?2$", value):
        return "<10^2"
    if re.match(r"^\(\s*10?2,?$", value):
        return "<10^2"
    if re.match(r"^[SC]I0?2\s+2$", value, re.IGNORECASE):
        return "<10^2"
    if re.match(r"^\d+[45]102$", value):
        return "<10^2"
    # --- special `<10` tiers ---
    if value in banks.LT10_TIER3_LITERALS:
        return "<10"
    if re.match(r"^\d+\s*<\s*10", value):
        return "<10"
    if value == "103":
        return "<10^3"
    if re.match(r'^<\s*10\s*["\'\s\?\-\)]*$', value):
        return "<10"
    if value in ("<10", "< 10"):
        return "<10"
    return value


# --------------------------------------------------------------------------
# F7 — scientific normalize (`backend_preservation.py:1442-1501`)
# --------------------------------------------------------------------------


def normalize_scientific(value: str) -> str:
    if not value:
        return value
    value = value.strip().replace("X", "×").replace("x", "×")
    prefix = "<" if value.startswith("<") else ("≤" if value.startswith("≤") else "")
    m = re.search(banks.SCIENTIFIC_SPACED, value)
    if m:
        base, exp = m.group(1), m.group(2) or "0"
        return f"{prefix}{base}×10^{exp}"
    m = re.search(banks.SCIENTIFIC_TIGHT, value)
    if m:
        return f"{prefix}{m.group(1)}×10^{m.group(2)}"
    return value


# --------------------------------------------------------------------------
# F11 — 7-day ambiguity (`backend_preservation.py:1545-1600`)
# --------------------------------------------------------------------------


def fix_7day_ambiguous(value: str, original: str) -> str:
    if "^" in value:
        return value
    if value != "<10":
        return value
    original_clean = original.strip()
    for pat in banks.CLEAR_LT10_ORIGINALS:
        if original_clean == pat or original_clean == pat.replace(" ", ""):
            return "<10"
    for pat in banks.AMBIGUOUS_LT10_ORIGINALS:
        if pat in original_clean:
            return "<10^2"
    return "<10"


# --------------------------------------------------------------------------
# the integrated per-cell pipeline (`backend_preservation.py:1503-1543`)
# day ∈ {'0','7','14','28'}
# --------------------------------------------------------------------------


def clean_cfu_value(value: str, day: str) -> str:
    if not value:
        return ""
    original = value
    value = split_merged_cells(value)
    value = remove_noise(value)
    if day == "0":
        value = normalize_scientific(value)
    else:
        value = fix_less_than_10(value)
        value = normalize_scientific(value)
        if day == "7":
            value = fix_7day_ambiguous(value, original)
    return value


# --------------------------------------------------------------------------
# F12 — strain normalize, Azure variant: '' on miss
# (`backend_preservation.py:1170-1203`); Upstage variant passes through
# (`backend.py:627-646`).
# --------------------------------------------------------------------------


def normalize_strain(strain: str, passthrough: bool = False) -> str:
    low = strain.lower()
    for synonym, canonical in banks.STRAIN_SYNONYMS:
        if synonym.lower() in low:
            return canonical
    return strain if passthrough else ""


def normalize_strain_upstage(strain: str) -> str:
    """Upstage variant (`backend.py:627-646`): equality pass then substring
    pass over the 15-entry map (no genus-only entries); passthrough on miss."""
    low = strain.lower()
    for synonym, canonical in banks.UPSTAGE_STRAIN_SYNONYMS:
        if synonym.lower() == low:
            return canonical
    for synonym, canonical in banks.UPSTAGE_STRAIN_SYNONYMS:
        if synonym.lower() in low:
            return canonical
    return strain


# --------------------------------------------------------------------------
# F13 — judgment decode (`backend_preservation.py:1602-1613`)
# --------------------------------------------------------------------------


def extract_judgment(value: str) -> str:
    if not value:
        return "적합"
    v = value.strip().upper()
    if any(c in v for c in banks.JUDGMENT_FAIL_CHARS) or "부적합" in v:
        return "부적합"
    return "적합"


def extract_judgment_upstage(value: str) -> str:
    """Upstage variant (`backend.py:715-739`): raw-case char scan incl. 'v'."""
    if any(c in value for c in banks.JUDGMENT_FAIL_CHARS_UPSTAGE):
        return "부적합"
    return "적합"


# --------------------------------------------------------------------------
# Upstage CFU clean chain — F8/F9/F10 (`backend.py:648-713`), distinct from
# the Azure chain above.
# --------------------------------------------------------------------------


def clean_cfu_value_upstage(value: str, strain: str, day: str) -> str:
    """day ∈ {'0','7','14','28'} (the reference passes '0일' etc.)."""
    if not value:
        return ""
    original = value
    # F8 — CJK scrub + char substitutions (order matters: C→< before Co/CIO
    # rules can never fire on 'C'; the reference applies them in this order,
    # so 'CIO' has already become '<I0' when the CIO rule is reached).
    value = re.sub(r"[ぁ-んァ-ン一-龯]+", "", value)
    value = value.replace("く", "<").replace("C", "<").replace("O", "0")
    value = value.replace("Co", "0").replace("CIO", "<10").replace("C10", "<10")
    value = value.strip()

    # scientific form
    if re.search(r"[×xX]", value):
        m = re.match(r"([0-9.]+)\s*[×xX]\s*10\s*\^?([0-9]+)", value)
        if m:
            return f"{m.group(1)}×10^{m.group(2)}"

    # F9 — '<' canonicalize
    if "<" in value:
        m = re.search(r"<\s*10\s*\^?\s*([0-9]+)", value)
        if m:
            return f"<10^{m.group(1)}"
        m = re.search(r"<\s*([0-9]+)", value)
        if m:
            return f"<{m.group(1)}"
        return "<10"

    if "≤" in value:
        m = re.search(r"≤\s*([0-9]+)", value)
        if m:
            return f"≤{m.group(1)}"

    # F10 — day/strain-conditional defaults
    target = ["E.coli", "P.aeruginosa", "S.aureus", "C.albicans"]
    is_target = bool(strain) and any(s in strain for s in target)
    if day in ("7", "14", "28") and is_target:
        if re.match(r"^≤\d+[°⁰]?$", value, re.IGNORECASE):
            return value
        if len(original) >= 6:
            return value
        corrected = "<10^2" if day == "7" else "<10"
        has_power_signal = "2" in original and any(
            ch in original for ch in ["^", "²", "⁰", "¹", "³"]
        )
        if has_power_signal and day != "28":
            corrected = "<10^2"
        return corrected
    return value


def convert_to_log_upstage(cfu_value: str):
    """F20 Upstage variant (`backend.py:800-835`): adds a `≤n` → '<n.0'
    branch — but NESTED inside the `'<' in value` block, so it only fires for
    values containing both '<' and '≤'; a bare '≤3' falls through to the
    float parse and passes through unchanged (reference quirk, preserved)."""
    if not cfu_value:
        return ""
    if "<" in cfu_value:
        if "10^" in cfu_value:
            m = re.search(r"<10\^(\d+)", cfu_value)
            if m:
                return f"<{m.group(1)}.0"
        elif "≤" in cfu_value:
            m = re.search(r"≤(\d+)", cfu_value)
            if m:
                return f"<{m.group(1)}.0"
        return "<1.0"
    m = re.match(r"([0-9.]+)×10\^(\d+)", cfu_value)
    if m:
        try:
            return round(int(m.group(2)) + math.log10(float(m.group(1))), 1)
        except ValueError:
            return cfu_value
    try:
        return round(math.log10(float(cfu_value)), 1)
    except ValueError:
        return cfu_value


# --------------------------------------------------------------------------
# F3/F2 — test/prescription extraction from a bulk-name cell, Azure
# single-row variant (`backend_preservation.py:925-1007`).
# --------------------------------------------------------------------------

_TEST_PATTERNS_ROW = [
    r"\b(2[0-9][A-Z]\d{2}[I!|1]\d{2})\b",
    r"\b(2[0-9][E]\d{2}1\d{2})\b",
]

_PRESC_PATTERNS_ROW = [
    r"\b([A-Z]{2,4}\d{4,5}[A-Z]?-[A-Z]{1,5}\d?)\b",
    r"\b([A-Z]{3}\d{5}-[A-Z]{2,4})\b",
    r"\b(M-[A-Z]{2,4}\d{4,5}-[A-Z]{1,4}\d?)\b",
    r"\b([A-Z]{2,4}\d{3,6}-[A-Z]{1,5})\b",
    r"\b([A-Z]{2,5}\d{4}-[A-Z]{1,3}\d{0,2})\b",
    r"\b([A-Z]{1,3}\d{4,5}-[A-Z]{2,4}[A-Z]?)\b",
    r"\b([A-Z]{2,4}\d{4}-[A-Z]\d[A-Z]{1,3})\b",
    r"\b([A-Z]{2,4}\d{3,4}[A-Z]?-[A-Z]{1,4}\d*)\b",
    r"\b([A-Z]{2,4}\d{4}-\d{1,2}[A-Z]{1,2})\b",
    r"\b([A-Z]{2,4}\d{4,5}[A-Z]?-\s*[A-Z]{1,5}\d?)\b",
    r"\b([A-Z]{2,4}\d{4,5}[A-Z]?-\s*[A-Z]+\d+[A-Z]+)\b",
    r"\b([A-Z]{2,4}\d{4,5}[A-Z]?-[A-Z]{1,5}\d[A-Z]+)\b",
    r"\b([A-Z]{2,4}\d{3,5}-[A-Z]{1,4}\d{1,2})\b",
    r"\b([A-Z]{2,5}\d{3,5}-[A-Z]{2,5}[A-Z\d]*)\b",
]


def preprocess_bulk_name(text: str) -> str:
    """F1 — bulk-name preprocess (`backend_preservation.py:944-950`)."""
    t = text.upper().replace("!", "I").replace("|", "I")
    t = re.sub(r"-\s+", "-", t)
    t = re.sub(r"\s+-", "-", t)
    t = re.sub(r"-+", "-", t)
    t = re.sub(r"\s+", " ", t)
    return t


def extract_test_info_from_row(row_text: str) -> tuple[str, str]:
    if not row_text:
        return "", ""
    t = preprocess_bulk_name(row_text)
    test_number = ""
    for pat in _TEST_PATTERNS_ROW:
        m = re.search(pat, t)
        if m:
            test_number = m.group(1)
            test_number = re.sub(r"([A-Z])(\d{2})1(\d{2})", r"\g<1>\g<2>I\g<3>", test_number)
            test_number = test_number.replace("|", "I").replace("!", "I")
            break
    prescription = ""
    for pat in _PRESC_PATTERNS_ROW:
        m = re.search(pat, t)
        if m:
            prescription = m.group(1).strip()
            break
    return test_number, prescription


def extract_multiple_numbers(bulk_name: str) -> tuple[list[str], list[str]]:
    """Upstage multi-extract (`backend.py:518-582`): all matches, deduped in
    first-seen order; I/1 repair on positions 5-6."""
    t = bulk_name.upper().replace("!", "I")
    t = re.sub(r"-\s+", "-", t)
    t = re.sub(r"\s+", " ", t)
    prescs: list[str] = []
    for pat in banks.PRESCRIPTION_PATTERNS:
        prescs.extend(re.findall(pat, t))
    tests: list[str] = []
    for pat in (banks.TEST_NUMBER_CORRECT, banks.TEST_NUMBER_I_AS_1):
        for m in re.findall(pat, t):
            if "1" in m[5:7]:
                tests.append(m[:5] + "I" + m[6:])
            else:
                tests.append(m)
    tests = list(dict.fromkeys(tests))
    prescs = list(dict.fromkeys(prescs))
    return tests, prescs


def create_matched_pairs(
    tests: list[str], prescs: list[str]
) -> list[tuple[str | None, str | None]]:
    """J2 — positional zip with one-sided surplus (`backend.py:584-625`)."""
    pairs: list[tuple[str | None, str | None]] = []
    for i, tnum in enumerate(tests):
        pairs.append((tnum, prescs[i] if i < len(prescs) else None))
    for i in range(len(tests), len(prescs)):
        pairs.append((None, prescs[i]))
    return pairs


# --------------------------------------------------------------------------
# F15–F19 — dates
# --------------------------------------------------------------------------


def parse_consecutive_dates(date_text: str) -> list[str]:
    """F15 (`backend.py:741-772`): 8+ two-digit tokens → 4 MM/DD strings."""
    parts = date_text.split()
    if len(parts) >= 8 and all(p.isdigit() and len(p) == 2 for p in parts):
        dates = [f"{parts[i]}/{parts[i+1]}" for i in range(0, 8, 2)]
        if len(dates) >= 4:
            return dates[:4]
    return []


def fix_date_cell(value: str) -> str:
    """F18 (`backend_preservation.py:323-327`): '0.5 15' → '05 15'."""
    return re.sub(r"^(\d)\.(\d)\s+(\d{1,2})$", r"\1\2 \3", value)


def date_ladder(month: int, day: int, year: int = 2024) -> dict[str, str]:
    """F17 (`backend_preservation.py:380-408`): year pinned to 2024."""
    d0 = datetime(year, month, day)
    return {
        "date_0": d0.strftime("%m/%d"),
        "date_7": (d0 + timedelta(days=7)).strftime("%m/%d"),
        "date_14": (d0 + timedelta(days=14)).strftime("%m/%d"),
        "date_28": (d0 + timedelta(days=28)).strftime("%m/%d"),
    }


_F16_FORMATS = [
    "%m %d", "%m-%d", "%m/%d", "%m.%d",
    "%m월%d일", "%m월 %d일",
    "%d/%m", "%d-%m", "%d %m",
]


def parse_date_multi(value: str) -> str:
    """F16 spec (`backend.py:774-798`): try the 9 strptime formats in order;
    '1900-MM-DD' on first success, '' when none parses. strptime's implicit
    year 1900 is the reference quirk that makes '02 29' unparseable (1900 is
    not a leap year). The reference's trailing `re.match(r'^\\d+\\s+\\d+$')`
    retry of '%m %d' adds nothing (that format was already tried) and is
    deliberately omitted."""
    if not value:
        return ""
    # strptime compiles \d WITHOUT re.ASCII, so non-ASCII Unicode digits
    # (e.g. Arabic-Indic '٣ ٤') would parse here while the Catalyst chain's
    # ASCII regexes return '' — reject non-ASCII DIGITS so oracle and Spark
    # agree (the Korean 월/일 literals themselves stay in scope; non-ASCII
    # digit dates are a documented restriction).
    if any(ch.isdigit() and not ch.isascii() for ch in value):
        return ""
    for fmt in _F16_FORMATS:
        try:
            return datetime.strptime(value, fmt).strftime("%Y-%m-%d")
        except ValueError:
            continue
    return ""


def date_ladder_1900(month: int, day: int) -> dict[str, str]:
    """Upstage F17 variant (`backend.py:290-298`): the year is strptime's
    implicit 1900 (non-leap), a reference quirk that shifts ladders crossing
    Feb 28 relative to the Azure engine's pinned 2024 (leap)."""
    return date_ladder(month, day, year=1900)


def extract_date_info_from_grid(grid: dict[int, dict[int, str]]) -> dict[str, str]:
    """F19 (`backend_preservation.py:294-414`): scan first 5 rows.

    Pass 1: a row with ≥4 MM/DD-or-MM DD cells → zero-padded ladder.
    Pass 2: first single date cell → computed ladder (year 2024).
    """
    n_rows = len(grid)
    for row_idx in range(min(5, n_rows)):
        if row_idx not in grid:
            continue
        dates: list[tuple[str, str]] = []
        for col_idx in sorted(grid[row_idx].keys()):
            value = fix_date_cell(str(grid[row_idx][col_idx]).strip())
            m = re.match(r"^(\d{1,2})[/\-.](\d{1,2})$", value)
            if m:
                dates.append((m.group(1), m.group(2)))
                continue
            m = re.match(r"^(\d{1,2})\s+(\d{1,2})$", value)
            if m:
                dates.append((m.group(1), m.group(2)))
        if len(dates) >= 4:
            return {
                "date_0": f"{dates[0][0].zfill(2)}/{dates[0][1].zfill(2)}",
                "date_7": f"{dates[1][0].zfill(2)}/{dates[1][1].zfill(2)}",
                "date_14": f"{dates[2][0].zfill(2)}/{dates[2][1].zfill(2)}",
                "date_28": f"{dates[3][0].zfill(2)}/{dates[3][1].zfill(2)}",
            }
    for row_idx in range(min(5, n_rows)):
        if row_idx not in grid:
            continue
        for col_idx in grid[row_idx]:
            value = fix_date_cell(str(grid[row_idx][col_idx]).strip())
            m = re.match(r"^(\d{1,2})[/\-.](\d{1,2})$", value) or re.match(
                r"^(\d{1,2})\s+(\d{1,2})$", value
            )
            if m:
                try:
                    return date_ladder(int(m.group(1)), int(m.group(2)))
                except ValueError:
                    continue
    return {}


# --------------------------------------------------------------------------
# F20 — CFU → log₁₀ (`backend_preservation.py:1615-1646`, Azure variant:
# no `≤` branch). Returns str for censored values, rounded float otherwise
# (reference type instability preserved: we stringify floats as repr-rounded).
# --------------------------------------------------------------------------


def convert_to_log(cfu_value: str):
    if not cfu_value:
        return ""
    if "<" in cfu_value:
        if "10^" in cfu_value:
            m = re.search(r"<10\^(\d+)", cfu_value)
            if m:
                return f"<{m.group(1)}.0"
        return "<1.0"
    m = re.match(r"([0-9.]+)×10\^(\d+)", cfu_value)
    if m:
        try:
            return round(int(m.group(2)) + math.log10(float(m.group(1))), 1)
        except ValueError:
            return cfu_value
    try:
        return round(math.log10(float(cfu_value)), 1)
    except ValueError:
        return cfu_value
