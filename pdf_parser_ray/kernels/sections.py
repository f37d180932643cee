"""Section segmentation: map pages to SEC / IFRS filing sections.

Reference semantics: ``sec_parser/section_split.py`` (13 ordered SEC heading
patterns, heading-line validation, TOC-page skipping, cover-page synthesis,
per-section page caps, same-page boundary text splitting, MDA stub
re-detection) and ``sec_parser/ifrs_section_split.py`` (5 IFRS patterns,
divider/parent-company page skipping). Re-hosted as one generic segmentation
engine parameterized by a pattern pack; all logic is per-document (no
shuffle) and runs inside the extraction ``map_batches`` stage.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from .html_tokenizer import Page

# --- SEC section keys -------------------------------------------------------
COVER = "cover_page"
INCOME = "income_statement"
BALANCE = "balance_sheet"
CASHFLOW = "cash_flow"
EQUITY = "stockholders_equity"
COMPREHENSIVE = "comprehensive_income"
NOTES = "notes"
MDA = "mda"
MARKET_RISK = "market_risk"
CONTROLS = "controls"
LEGAL = "legal_proceedings"
RISK_FACTORS = "risk_factors"
EXHIBITS = "exhibits"
SIGNATURES = "signatures"

SEC_TITLES = {
    COVER: "Cover Page",
    INCOME: "Consolidated Statements of Income",
    BALANCE: "Consolidated Balance Sheets",
    CASHFLOW: "Consolidated Statements of Cash Flows",
    EQUITY: "Consolidated Statements of Stockholders' Equity",
    COMPREHENSIVE: "Consolidated Statements of Comprehensive Income",
    NOTES: "Notes to Financial Statements",
    MDA: "Management's Discussion and Analysis",
    MARKET_RISK: "Quantitative and Qualitative Disclosures About Market Risk",
    CONTROLS: "Controls and Procedures",
    LEGAL: "Legal Proceedings",
    RISK_FACTORS: "Risk Factors",
    EXHIBITS: "Exhibits",
    SIGNATURES: "Signatures",
}

_C = r"(?:CONDENSED\s+)?CONSOLIDATED\s+"

SEC_PATTERNS: list[tuple[str, re.Pattern[str]]] = [
    (INCOME, re.compile(
        _C + r"STATEMENTS?\s+OF\s+(?:INCOME|OPERATIONS|EARNINGS)"
        r"(?:\s+AND\s+COMPREHENSIVE\s+(?:INCOME|LOSS)(?:\s*\(LOSS\))?)?",
        re.IGNORECASE)),
    (COMPREHENSIVE, re.compile(
        _C + r"STATEMENTS?\s+OF\s+COMPREHENSIVE\s+(?:INCOME|LOSS)(?:\s*\(LOSS\))?",
        re.IGNORECASE)),
    (BALANCE, re.compile(
        _C + r"(?:BALANCE\s+SHEETS?|STATEMENTS?\s+OF\s+FINANCIAL\s+CONDITION)",
        re.IGNORECASE)),
    (CASHFLOW, re.compile(
        _C + r"STATEMENTS?\s+OF\s+CASH\s+FLOWS?", re.IGNORECASE)),
    (EQUITY, re.compile(
        _C + r"STATEMENTS?\s+OF\s+(?:(?:STOCKHOLDERS|SHAREHOLDERS|CHANGES\s+IN\s+"
        r"(?:STOCKHOLDERS|SHAREHOLDERS))['’]?\s*(?:EQUITY|DEFICIT)|CHANGES\s+IN\s+EQUITY)",
        re.IGNORECASE)),
    (NOTES, re.compile(
        r"NOTES\s+TO\s+(?:THE\s+)?(?:CONDENSED\s+)?(?:CONSOLIDATED\s+)?"
        r"(?:CONDENSED\s+)?(?:INTERIM\s+)?FINANCIAL\s+STATEMENTS", re.IGNORECASE)),
    (MDA, re.compile(
        r"(?:Item\s+(?:2|7)[.\s]*)?MANAGEMENT['’]?S\s+DISCUSSION\s+AND\s+ANALYSIS"
        r"(?:\s+OF\s+FINANCIAL\s+CONDITION\s+AND\s+RESULTS\s+OF\s+OPERATIONS)?",
        re.IGNORECASE)),
    (MARKET_RISK, re.compile(
        r"QUANTITATIVE\s+AND\s+QUALITATIVE\s+DISCLOSURES?\s+ABOUT\s+MARKET\s+RISK",
        re.IGNORECASE)),
    (CONTROLS, re.compile(
        r"(?:Item\s+4[.\s]*)?CONTROLS\s+AND\s+PROCEDURES", re.IGNORECASE)),
    (LEGAL, re.compile(r"Item\s+(?:1|3)[.\s]+LEGAL\s+PROCEEDINGS", re.IGNORECASE)),
    (RISK_FACTORS, re.compile(r"Item\s+1A[.\s]+RISK\s+FACTORS", re.IGNORECASE)),
    (EXHIBITS, re.compile(r"Item\s+(?:6|15|16)[.\s]+EXHIBITS", re.IGNORECASE)),
    (SIGNATURES, re.compile(r"^SIGNATURES?\s*$", re.IGNORECASE | re.MULTILINE)),
]

# Financial statement sections rarely run long; cap to stop them absorbing
# unrelated trailing pages (reference section_split.py:428-435).
SEC_PAGE_CAPS = {INCOME: 5, COMPREHENSIVE: 5, BALANCE: 5, CASHFLOW: 5,
                 EQUITY: 5, RISK_FACTORS: 25}

# --- IFRS section keys ------------------------------------------------------
IFRS_INCOME = "ifrs_income_statement"
IFRS_BALANCE = "ifrs_balance_sheet"
IFRS_CASHFLOW = "ifrs_cash_flow"
IFRS_EQUITY = "ifrs_equity_changes"
IFRS_NOTES = "ifrs_notes"

IFRS_TITLES = {
    IFRS_INCOME: "Consolidated Statement of Profit or Loss and Other Comprehensive Income",
    IFRS_BALANCE: "Consolidated Balance Sheet",
    IFRS_CASHFLOW: "Consolidated Statement of Cash Flows",
    IFRS_EQUITY: "Consolidated Statement of Changes in Equity",
    IFRS_NOTES: "Notes to the Consolidated Financial Statements",
}

_P = r"(?:(?:Interim\s+)?(?:Condensed\s+)?(?:Consolidated\s+)?)"
IFRS_PATTERNS: list[tuple[str, re.Pattern[str]]] = [
    (IFRS_INCOME, re.compile(_P + r"Statement\s+of\s+Profit\s+or\s+Loss", re.IGNORECASE)),
    (IFRS_BALANCE, re.compile(
        _P + r"(?:Balance\s+Sheet|Statement\s+of\s+Financial\s+Position)", re.IGNORECASE)),
    (IFRS_EQUITY, re.compile(_P + r"Statement\s+of\s+Changes\s+in\s+Equity", re.IGNORECASE)),
    (IFRS_CASHFLOW, re.compile(_P + r"Statement\s+of\s+Cash\s+Flows?", re.IGNORECASE)),
    (IFRS_NOTES, re.compile(
        r"Notes\s+to\s+(?:the\s+)?(?:Condensed\s+)?(?:Consolidated\s+)?Financial\s+Statements",
        re.IGNORECASE)),
]

_PARENT_CO = re.compile(r"Parent\s+Company", re.IGNORECASE)


@dataclass
class Section:
    key: str
    start_page: int
    end_page: int
    text: str = ""
    tables: list[list[list[str]]] = field(default_factory=list)


# ---------------------------------------------------------------------------
# Heading validation + TOC detection
# ---------------------------------------------------------------------------

_TRAILING_PAGENUM = re.compile(r"\s+\d{1,3}\s*$")
_REF_PREFIX = {"and", "or", "the", "refer", "see", "selected"}
_ANALYSIS_SUFFIX = re.compile(
    r"\b(?:ANALYSIS|DISCUSSION|SUMMARY|HIGHLIGHTS?|OVERVIEW|SELECTED|DATA)\b",
    re.IGNORECASE)


def _heading_ok(page_text: str, m: re.Match[str]) -> bool:
    """Is this pattern match a standalone heading line?

    Eight rejection rules (reference _is_heading_match,
    section_split.py:163-223): long line, late match position, trailing TOC
    page number, lowercase/reference-word prefix, long trailing prose,
    analysis-of-statements suffix, punctuation continuation, lowercase or
    at/as trailing word.
    """
    ls = page_text.rfind("\n", 0, m.start())
    ls = 0 if ls == -1 else ls + 1
    le = page_text.find("\n", m.end())
    le = len(page_text) if le == -1 else le
    line = page_text[ls:le]
    if len(line) > 120 or m.start() - ls > 10:
        return False
    if _TRAILING_PAGENUM.search(line):
        return False
    stripped = line.lstrip()
    if stripped and stripped[0].islower():
        return False
    first = stripped.split()[0].lower() if stripped.split() else ""
    if first in _REF_PREFIX:
        return False
    trailing = page_text[m.end():le].strip()
    if len(trailing) > 50:
        return False
    if trailing:
        if _ANALYSIS_SUFFIX.search(trailing):
            return False
        if trailing[0] in ".;,":
            return False
        tw = trailing.split()[0] if trailing.split() else ""
        if tw and (tw[0].islower() or tw.lower() in ("at", "as")):
            return False
    return True


_TOC_HEAD = re.compile(r"TABLE\s+OF\s+CONTENTS", re.IGNORECASE)
_LEADING_NUM = re.compile(r"^\s*\d{1,3}\s+[A-Z]")
_DOTTED = re.compile(r"\.{3,}\s*\d{1,3}\s*$")
_FIN_DATA = re.compile(
    r"(?:total\s+(?:assets|liabilities|revenue|equity|current)\s.*[\d,]+|"
    r"net\s+(?:income|loss|cash)\s.*[\d,]+|"
    r"operating\s+(?:income|loss|expenses)\s.*[\d,]+|\$\s*[\d,]+)",
    re.IGNORECASE)


def _has_toc_listing(text: str) -> bool:
    lines = text.split("\n")
    if sum(1 for l in lines if _TRAILING_PAGENUM.search(l)) >= 3:
        return True
    return sum(1 for l in lines if _LEADING_NUM.search(l)) >= 5


def is_toc_page(page: Page) -> bool:
    """TOC-page classifier with running-header disambiguation.

    Mirrors section_split.py:245-299: a "TABLE OF CONTENTS" heading plus
    page-number listings marks a TOC, unless the TOC text is a running header
    on a page that also carries real financial data; ≥4 section patterns on
    one page is also a TOC (a listing of headings).
    """
    text = page.text
    if _TOC_HEAD.search(text) and _has_toc_listing(text):
        lines = text.strip().splitlines()
        header_area = any(_TOC_HEAD.search(l) and len(l.strip()) < 60
                          for l in lines[:3])
        financial = bool(_FIN_DATA.search(text))
        if header_area and financial:
            return False
        if not header_area and financial:
            return False
        if sum(1 for l in lines if _DOTTED.search(l)) >= 2:
            return True
        return True
    return sum(1 for _, pat in SEC_PATTERNS if pat.search(text)) >= 4


# ---------------------------------------------------------------------------
# Segmentation engine
# ---------------------------------------------------------------------------

def _locate_starts(pages: list[Page],
                   patterns: list[tuple[str, re.Pattern[str]]],
                   validate: bool) -> list[tuple[str, int]]:
    found: list[tuple[str, int]] = []
    seen: set[str] = set()
    for page in pages:
        if validate and is_toc_page(page):
            continue
        for key, pat in patterns:
            if key in seen:
                continue
            for m in pat.finditer(page.text):
                if not validate or _heading_ok(page.text, m):
                    found.append((key, page.number))
                    seen.add(key)
                    break
    found.sort(key=lambda kv: kv[1])
    return found


def _cut_at_heading(text: str, pat: re.Pattern[str]) -> tuple[str, str]:
    """(before, from-heading-line) split of a page's text at a pattern."""
    m = pat.search(text)
    if not m:
        return text, ""
    ls = text.rfind("\n", 0, m.start())
    ls = 0 if ls == -1 else ls + 1
    return text[:ls], text[ls:]


def split_sec_sections(pages: list[Page]) -> dict[str, Section]:
    """SEC segmentation (reference split_sections, section_split.py:374-496)."""
    if not pages:
        return {}
    last = pages[-1].number
    starts = _locate_starts(pages, SEC_PATTERNS, validate=True)

    # MDA forward-reference stub: a detected MDA spanning ≤1 page may be
    # "Item 7 ... see Financial Section"; prefer a later real heading.
    mda_i = next((i for i, (k, _) in enumerate(starts) if k == MDA), None)
    if mda_i is not None:
        mda_pg = starts[mda_i][1]
        nxt = starts[mda_i + 1][1] if mda_i + 1 < len(starts) else last + 1
        if nxt - mda_pg <= 1:
            pat = dict(SEC_PATTERNS)[MDA]
            for page in pages:
                if page.number <= mda_pg or is_toc_page(page):
                    continue
                hit = next((m for m in pat.finditer(page.text)
                            if _heading_ok(page.text, m)), None)
                if hit:
                    starts[mda_i] = (MDA, page.number)
                    starts.sort(key=lambda kv: kv[1])
                    break

    pat_by_key = dict(SEC_PATTERNS)
    sections: dict[str, Section] = {}

    # Cover page: everything strictly before the first detected section.
    if starts and pages and starts[0][1] > pages[0].number:
        first_pg = starts[0][1]
        parts = [p.text for p in pages if p.number < first_pg]
        tabs = [t for p in pages if p.number < first_pg for t in p.tables]
        if parts:
            sections[COVER] = Section(COVER, pages[0].number, first_pg - 1,
                                      "\n\n".join(parts), tabs)

    for i, (key, start_pg) in enumerate(starts):
        end_pg = max(start_pg, starts[i + 1][1] - 1) if i + 1 < len(starts) else last
        cap = SEC_PAGE_CAPS.get(key)
        if cap and end_pg - start_pg >= cap:
            end_pg = start_pg + cap - 1
        nxt_key = starts[i + 1][0] if i + 1 < len(starts) else None
        nxt_pg = starts[i + 1][1] if i + 1 < len(starts) else None

        parts: list[str] = []
        tabs: list[list[list[str]]] = []
        for page in pages:
            if not (start_pg <= page.number <= end_pg):
                continue
            text = page.text
            if page.number == start_pg and i > 0:
                # a previous section also touches this page — start at our heading
                _, frm = _cut_at_heading(text, pat_by_key[key])
                if frm:
                    text = frm
            if nxt_key and nxt_pg == page.number and nxt_pg == end_pg:
                before, _ = _cut_at_heading(text, pat_by_key[nxt_key])
                if before.strip():
                    text = before
            parts.append(text)
            tabs.extend(page.tables)
        sections[key] = Section(key, start_pg, end_pg, "\n\n".join(parts), tabs)
    return sections


def split_ifrs_sections(pages: list[Page]) -> dict[str, Section]:
    """IFRS segmentation (reference split_ifrs_sections,
    ifrs_section_split.py:133-211): skips divider pages (<100 chars) and
    Parent-Company pages; Notes truncate at the first parent-company page."""
    if not pages:
        return {}
    last = pages[-1].number

    def divider(p: Page) -> bool:
        return len(p.text.strip()) < 100

    def parent(p: Page) -> bool:
        return bool(_PARENT_CO.search(p.text[:200]))

    starts: list[tuple[str, int]] = []
    seen: set[str] = set()
    for page in pages:
        if divider(page) or parent(page):
            continue
        for key, pat in IFRS_PATTERNS:
            if key not in seen and pat.search(page.text):
                starts.append((key, page.number))
                seen.add(key)
    starts.sort(key=lambda kv: kv[1])

    pat_by_key = dict(IFRS_PATTERNS)
    sections: dict[str, Section] = {}
    for i, (key, start_pg) in enumerate(starts):
        if i + 1 < len(starts):
            end_pg = max(start_pg, starts[i + 1][1] - 1)
        else:
            end_pg = last
            for page in pages:
                if page.number > start_pg and parent(page):
                    end_pg = page.number - 1
                    break
        nxt_key = starts[i + 1][0] if i + 1 < len(starts) else None
        nxt_pg = starts[i + 1][1] if i + 1 < len(starts) else None

        parts: list[str] = []
        tabs: list[list[list[str]]] = []
        for page in pages:
            if not (start_pg <= page.number <= end_pg):
                continue
            if divider(page) and page.number != start_pg:
                continue
            text = page.text
            if page.number == start_pg and i > 0 and starts[i - 1][1] == start_pg:
                _, frm = _cut_at_heading(text, pat_by_key[key])
                if frm:
                    text = frm
            if nxt_key and nxt_pg == page.number and nxt_pg == end_pg:
                before, _ = _cut_at_heading(text, pat_by_key[nxt_key])
                if before.strip():
                    text = before
            parts.append(text)
            tabs.extend(page.tables)
        sections[key] = Section(key, start_pg, end_pg, "\n\n".join(parts), tabs)
    return sections
