"""Metadata derivation + YAML front-matter (reference ``sec_parser/metadata.py``).

Determinism note: the reference stamps ``parsed_at`` with wall-clock
(``metadata.py:213``); our engine derives it from the row's ``warc_ts`` so
identical inputs always produce identical bytes (required for the per-url
byte-identity invariant).
"""

from __future__ import annotations

import re
from datetime import datetime

_MONTHS = {"january": 1, "february": 2, "march": 3, "april": 4, "may": 5,
           "june": 6, "july": 7, "august": 8, "september": 9, "october": 10,
           "november": 11, "december": 12}

_CAL_QUARTER = {3: "Q1", 6: "Q2", 9: "Q3"}


def detect_fiscal_year_end(cover_text: str) -> int | None:
    m = re.search(r"(?:fiscal\s+)?year\s+ended\s+(\w+)\s+\d{1,2}", cover_text,
                  re.IGNORECASE)
    return _MONTHS.get(m.group(1).lower()) if m else None


def fiscal_year_for(period_year: int | None, period_month: int | None,
                    fy_end_month: int | None) -> int | None:
    """Fiscal year named by the calendar year it ends in (metadata.py:50-63)."""
    if not period_year or not period_month:
        return period_year
    if not fy_end_month or fy_end_month == 12:
        return period_year
    return period_year + 1 if period_month > fy_end_month else period_year


def infer_period_type(filing_type: str, period_str: str,
                      fy_end_month: int | None = None) -> str:
    """Q1-Q4 / FY from filing type + period month (metadata.py:66-103)."""
    if filing_type.upper().startswith("10-K"):
        return "FY"
    m = re.search(r"([A-Za-z]+)", period_str)
    month = _MONTHS.get(m.group(1).lower()) if m else None
    if not month:
        return "Q?"
    if fy_end_month:
        fy_start = (fy_end_month % 12) + 1
        into = (month - fy_start) % 12 + 1
        return f"Q{(into - 1) // 3 + 1}"
    return _CAL_QUARTER.get(month, "Q?")


def infer_scale(scale_hint: str | None) -> str:
    if not scale_hint:
        return "units"
    h = scale_hint.lower()
    if "million" in h and "thousand" in h:
        return "millions"  # dollar-amount scale wins over per-share scale
    if "billion" in h:
        return "billions"
    if "million" in h:
        return "millions"
    if "thousand" in h:
        return "thousands"
    return "units"


def parse_period_date(period_str: str) -> tuple[str, int | None]:
    """'June 30, 2024' → ('2024-06-30', 2024); ('', year-or-None) on failure."""
    if not period_str:
        return "", None
    cleaned = period_str.strip().replace(",", ", ").replace("  ", " ")
    for fmt in ("%B %d, %Y", "%B %d %Y"):
        try:
            dt = datetime.strptime(cleaned, fmt)
            return dt.strftime("%Y-%m-%d"), dt.year
        except ValueError:
            continue
    m = re.search(r"(\d{4})", period_str)
    return "", int(m.group(1)) if m else None


SCALE_HINT_PATTERNS = [
    re.compile(r"\(in\s+(?:\w+\s+)?(?:thousands|millions|billions)[^)]*\)",
               re.IGNORECASE),
    re.compile(r"\bin\s+(?:(?:USD|U\.S\.\s*dollars?|CAD|EUR)\s*\$?\s*)?"
               r"(?:thousands|millions|billions)\b", re.IGNORECASE),
    re.compile(r"(?:amounts?|tabular\s+amounts?)\s+in\s+(?:thousands|millions|billions)",
               re.IGNORECASE),
    re.compile(r"\((?:thousands|millions|billions)\s+of\s+(?:dollars|euros|pounds)\)",
               re.IGNORECASE),
]


def find_scale_hint(texts: list[str]) -> str | None:
    """First scale-hint match across financial-statement texts (pipeline.py:391-422)."""
    for text in texts:
        for pat in SCALE_HINT_PATTERNS:
            m = pat.search(text)
            if m:
                return m.group(0)
    return None


def build_metadata(cover_fields: list[tuple[str, str]], scale_hint: str | None,
                   source_url: str, cover_text: str = "",
                   parsed_at: str = "") -> dict:
    """Assemble the metadata dict (metadata.py:153-226); ``parsed_at`` comes
    from the caller (warc_ts), never from the wall clock."""
    lookup = dict(cover_fields)
    filing_type = lookup.get("Filing Type", "")
    period_str = lookup.get("Period", "")
    period_end, fy = parse_period_date(period_str)
    fy_end = detect_fiscal_year_end(cover_text) if cover_text else None
    period_type = (infer_period_type(filing_type, period_str, fy_end)
                   if filing_type else "")
    m = re.search(r"([A-Za-z]+)", period_str)
    pmonth = _MONTHS.get(m.group(1).lower()) if m else None
    fy = fiscal_year_for(fy, pmonth, fy_end)

    meta = {
        "company": lookup.get("Company", ""),
        "ticker": lookup.get("Ticker", ""),
        "cik": lookup.get("CIK", ""),
        "commission_file_number": lookup.get("Commission File Number", ""),
        "filing_type": filing_type,
        "period_end": period_end,
        "period_type": period_type,
        "fiscal_year": fy if fy else "",
        "scale": infer_scale(scale_hint),
        "currency": "USD",
        "audited": bool(filing_type) and filing_type.upper().startswith("10-K"),
        "source_url": source_url,
        "parsed_at": parsed_at,
    }
    for label, key in (("State of Incorporation", "state_of_incorporation"),
                       ("Address", "address"), ("Phone", "phone")):
        if lookup.get(label, ""):
            meta[key] = lookup[label]
    return meta


_YAML_SPECIAL = set(":#{}[],&*?|>'\"%@`")


def _yaml_scalar(value: object) -> str:
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, (int, float)):
        return str(value)
    s = str(value)
    if any(ch in _YAML_SPECIAL for ch in s):
        return '"' + s.replace("\\", "\\\\").replace('"', '\\"') + '"'
    return s


def front_matter(meta: dict) -> str:
    """Manual YAML front-matter (metadata.py:229-262); nested dicts render as
    one-level mappings (data_sources / confidence)."""
    lines = ["---"]
    for key, value in meta.items():
        if isinstance(value, dict):
            lines.append(f"{key}:")
            for sk, sv in value.items():
                lines.append(f"  {sk}: {_yaml_scalar(sv)}")
        else:
            lines.append(f"{key}: {_yaml_scalar(value)}")
    lines.append("---")
    return "\n".join(lines) + "\n"
