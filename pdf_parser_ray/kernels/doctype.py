"""Document-kind classification and filing-start detection.

Reference semantics: ``sec_parser/detect.py`` — report-type scoring over the
first 10 pages (unique-pattern counts, SEC vs IFRS, ``detect.py:111-129``)
and combined-annual-report start-page detection (``detect.py:62-108``). Our
corpus also contains generic web pages; documents matching neither marker set
are classified ``web`` and routed to the boilerplate-strip path instead of
the filing pipeline (the reference had no such route — everything was a
filing).
"""

from __future__ import annotations

import re

from .html_tokenizer import Page

SEC_MARKERS = [
    re.compile(r"FORM\s+10-[KQ]", re.IGNORECASE),
    re.compile(r"SECURITIES\s+AND\s+EXCHANGE\s+COMMISSION", re.IGNORECASE),
    re.compile(r"Central\s+Index\s+Key", re.IGNORECASE),
]

IFRS_MARKERS = [
    re.compile(r"(?:EUR|NOK|DKK|SEK|GBP)['’]?000", re.IGNORECASE),
    re.compile(r"\bIFRS\b"),
    re.compile(r"(?:CVR|Org\.?\s*(?:nr|no|number))[.\s:]+[\d\s]+", re.IGNORECASE),
    re.compile(r"Statement\s+of\s+Profit\s+or\s+Loss", re.IGNORECASE),
    re.compile(r"Statement\s+of\s+Financial\s+Position", re.IGNORECASE),
    re.compile(r"Oslo\s+B.rs|Oslo\s+Stock\s+Exchange|Euronext", re.IGNORECASE),
]

_FORM_RE = re.compile(r"FORM\s+10-[KQ]", re.IGNORECASE)
_COMMISSION_RE = re.compile(
    r"UNITED\s+STATES\s+SECURITIES\s+AND\s+EXCHANGE\s+COMMISSION", re.IGNORECASE)
_REGISTRANT_RE = re.compile(r"\(Exact\s+name\s+of\s+registrant", re.IGNORECASE)
_EMBED_FOOTER_RE = re.compile(
    r"(?:^|\n)\s*(?:\d+\s+)?.{3,60}/\d{4}\s+Form\s+10-[KQ](?:\s+\d+)?\s*(?:$|\n)",
    re.IGNORECASE)


def _is_simple_toc(text: str) -> bool:
    """TOC check used during start-page scan (reference detect.py:27-41)."""
    if "TABLE OF CONTENTS" not in text.upper():
        return False
    hits = sum(1 for line in text.split("\n")
               if re.search(r"\.{2,}\s*\d+\s*$", line)
               or re.search(r"\s{3,}\d+\s*$", line))
    return hits >= 3


def classify_document(pages: list[Page], scan_pages: int = 10) -> str:
    """Return 'sec', 'ifrs', or 'web' from the first *scan_pages* pages.

    Scoring counts UNIQUE matched marker patterns (not occurrences); higher
    set wins, tie breaks to 'sec' (reference behavior). Zero matches on both
    sides means the document is a generic web page.
    """
    sec_hit: set[int] = set()
    ifrs_hit: set[int] = set()
    for page in pages[:scan_pages]:
        for i, pat in enumerate(SEC_MARKERS):
            if pat.search(page.text):
                sec_hit.add(i)
        for i, pat in enumerate(IFRS_MARKERS):
            if pat.search(page.text):
                ifrs_hit.add(i)
    if not sec_hit and not ifrs_hit:
        return "web"
    return "ifrs" if len(ifrs_hit) > len(sec_hit) else "sec"


def find_filing_start(pages: list[Page]) -> int:
    """1-indexed page where the embedded 10-K/10-Q begins; 1 when not combined.

    Priority (reference detect.py:62-108):
    1. SEC commission header AND a FORM 10-K/Q mention on the same non-TOC
       page; 2. a registrant parenthetical line; 3. the embedded-10-K footer
       pattern on a page > 1.
    """
    for page in pages:
        text = page.text
        if _is_simple_toc(text):
            continue
        if _COMMISSION_RE.search(text) and _FORM_RE.search(text):
            return page.number
        if _REGISTRANT_RE.search(text):
            return page.number
    for page in pages:
        if _EMBED_FOOTER_RE.search(page.text):
            if page.number > 1:
                return page.number
            break
    return 1
