"""Cover-page field extraction (reference ``programmatic.py:13-232``).

~15 regex extractors over the cover-page text: filing type, registrant
company name, reporting period, commission file number, CIK, shares
outstanding, ticker (SEC 12(b) table walk + inline fallback), exchange,
state of incorporation, 3-line address back-scan, phone, and press-release
fallbacks for company/ticker/period. Pure per-document kernel.
"""

from __future__ import annotations

import re

_BAD_TICKERS = {"THE", "LLC", "INC", "NYSE", "EACH", "NAME"}


def extract_cover_fields(text: str) -> list[tuple[str, str]]:
    fields: list[tuple[str, str]] = []

    m = re.search(r"FORM\s+(10-[QK](?:/A)?)", text, re.IGNORECASE)
    if m:
        fields.append(("Filing Type", m.group(1).upper()))

    m = re.search(r"^[ \t]*(.+)\n\s*\((?:Exact|exact)\s+name\s+of\s+(?:R|r)egistrant",
                  text, re.MULTILINE)
    if m:
        name = m.group(1).strip()
        if not re.match(r"Commission|File\s+Number|\d+-\d+", name, re.IGNORECASE):
            fields.append(("Company", name))

    m = re.search(
        r"(?:(?:quarterly|annual)\s+period\s+ended|(?:fiscal\s+)?year\s+ended|"
        r"period\s+of\s+report)[:\s]+(\w+\s+\d{1,2},?\s+\d{4})",
        text, re.IGNORECASE)
    if m:
        fields.append(("Period", m.group(1).strip()))

    m = re.search(r"Commission\s+File\s+Number[:\s]+([\d-]+)", text, re.IGNORECASE)
    if m:
        fields.append(("Commission File Number", m.group(1).strip()))

    m = re.search(r"(?:Central\s+Index\s+Key|CIK)[:\s]+(\d+)", text, re.IGNORECASE)
    if m:
        fields.append(("CIK", m.group(1).strip()))

    m = re.search(r"(\d[\d,]+)\s+shares\s+of\s+common\s+stock", text, re.IGNORECASE)
    if m:
        fields.append(("Shares Outstanding", m.group(1).strip()))

    # Ticker: SEC 12(b) registration table walk, then inline fallback.
    ticker_found = False
    header = re.search(
        r"Title\s+of\s+(?:Each|each)\s+(?:Class|class)\s+(?:Trading\s+)?[Ss]ymbol",
        text, re.IGNORECASE)
    if header:
        for line in text[header.end():].splitlines()[:10]:
            s = line.strip()
            if not s or "registered" in s.lower():
                continue
            if re.match(r"^\s*(?:Name\s+of\s+)?(?:Each\s+)?Exchange", s, re.IGNORECASE):
                continue
            if s.lower().startswith("indicate"):
                break
            tm = re.search(
                r"(?:par\s+value(?:\s+per\s+share)?|per\s+share|stock|warrant[s]?|"
                r"unit[s]?|right[s]?|debenture[s]?|shares)\s+([A-Z]{1,5})\s", s)
            if tm and tm.group(1) not in _BAD_TICKERS:
                fields.append(("Ticker", tm.group(1)))
                ticker_found = True
                break
    if not ticker_found:
        m = re.search(r"Trading\s+Symbol\(?s?\)?[:\s]+([A-Za-z]{1,5})\b",
                      text, re.IGNORECASE)
        if m and m.group(1).upper() not in ("NAME", "THE", "OF", "EACH", "N", "A"):
            fields.append(("Ticker", m.group(1).strip().upper()))
            ticker_found = True

    m = re.search(
        r"(?:Name\s+of\s+.*exchange|registered)[:\s]*"
        r"((?:NYSE|NASDAQ|New\s+York\s+Stock\s+Exchange)[^\n]*)",
        text, re.IGNORECASE)
    if m:
        fields.append(("Exchange", m.group(1).strip().rstrip(".")))

    m = re.search(r"^(.+)\n\s*\((?:State|state)\s+or\s+other\s+jurisdiction\s+of\s+incorporat",
                  text, re.MULTILINE)
    if m and len(m.group(1).strip()) < 60:
        fields.append(("State of Incorporation", m.group(1).strip()))

    m = re.search(r"\((?:Address|address)\s+of\s+principal\s+executive\s+offic", text)
    if m:
        before = [l.strip() for l in text[:m.start()].splitlines() if l.strip()]
        addr: list[str] = []
        for line in reversed(before[-3:]):
            if re.match(r"(?:Commission|File\s+Number|Form\s+10|UNITED\s+STATES|SECURITIES)",
                        line, re.IGNORECASE):
                break
            if len(line) > 120 or line.startswith("("):
                break
            if re.search(r"incorporation\b|Identification\s+N[ou]", line, re.IGNORECASE):
                continue
            addr.insert(0, line)
        if addr and len(", ".join(addr)) < 200:
            fields.append(("Address", ", ".join(addr)))

    m = re.search(r"(?:telephone\s+number|phone)[^)]*?(\(?\d{3}\)?[\s.-]\d{3}[\s.-]\d{4})",
                  text, re.IGNORECASE)
    if m:
        fields.append(("Phone", m.group(1).strip()))

    # --- press-release fallbacks ---
    labels = {l for l, _ in fields}
    if "Company" not in labels:
        m = re.search(r"([A-Z][\w &.,'-]+?)\s*\((?:NYSE|NASDAQ|Nasdaq|TSX|LSE)[:\s]+([A-Z]{1,5})\)",
                      text)
        if m:
            fields.append(("Company", m.group(1).strip().rstrip(",")))
            if "Ticker" not in labels:
                fields.append(("Ticker", m.group(2).strip()))
                ticker_found = True
        else:
            m = re.search(
                r"((?:The\s+)?[A-Z][\w\s&.,'-]+?(?:Company|Inc\.|Corp(?:oration)?\.?|"
                r"Ltd\.?|N\.V\.|plc|Group|LP))\s+today\s+(?:reported|announced)", text)
            if m:
                fields.append(("Company", m.group(1).strip().rstrip(",")))
    if "Ticker" not in labels and not ticker_found:
        m = re.search(r"(?:NYSE|NASDAQ|Nasdaq|TSX|LSE)[:\s]+([A-Z]{1,5})\b", text)
        if m and m.group(1) not in _BAD_TICKERS:
            fields.append(("Ticker", m.group(1).strip()))
    if "Period" not in labels:
        m = re.search(r"ended\s+(\w+\s+\d{1,2},?\s+\d{4})", text, re.IGNORECASE)
        if m:
            fields.append(("Period", m.group(1).strip()))
    return fields


def render_cover(text: str) -> str:
    """Cover fields as a | Field | Value | table; raw text when none match."""
    fields = extract_cover_fields(text)
    if not fields:
        return text
    lines = ["| Field | Value |", "|-------|-------|"]
    lines += [f"| {k} | {v} |" for k, v in fields]
    return "\n".join(lines)
