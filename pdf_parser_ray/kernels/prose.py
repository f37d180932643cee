"""Prose cleanup + exhibits formatting (reference ``programmatic.py:244-273,
1485-1601``).

``clean_prose`` is the reference's main boilerplate stripper for prose
sections: page numbers, ``Co | 2024 Form 10-K | NN`` footers, Table-of-
Contents running headers, F-N refs, repeated-line removal (any line seen ≥3
times), ``### Item N.`` headings, title-case sub-heading promotion, and
mid-sentence line rejoin. In the web engine the same kernel doubles as the
prose-side cleanup after boilerplate classification.
"""

from __future__ import annotations

import re
from collections import Counter

_PAGE_NUM = re.compile(r"^\s*\d{1,3}\s*$")
_FOOTER = re.compile(
    r"^\s*.{3,50}\s*\|\s*\d{4}\s+Form\s+10-[KQ](?:/A)?\s*\|\s*\d{1,3}\s*$",
    re.IGNORECASE)
_TOC_HDR = re.compile(r"^\s*(?:Financial\s+)?Table\s+of\s+Contents\b.*$", re.IGNORECASE)
_FPAGE = re.compile(r"^\s*F-\d{1,3}\s*$")
_ITEM_HDR = re.compile(r"^(Item\s+\d+[A-Za-z]?\.\s+.+)$", re.IGNORECASE)
_EXHIBIT_NUM = re.compile(r"^(\d{1,3}(?:\.\d{1,3})?(?:\.\w+)?)\s")


def clean_prose(section_text: str, tables: list | None = None) -> str:
    from .tablekit import normalize_tables

    table_md = ""
    if tables:
        rendered = normalize_tables(section_text, tables)
        if "|" in rendered:
            table_md = rendered

    lines = section_text.splitlines()
    lines = [l for l in lines if not _PAGE_NUM.match(l)]
    lines = [l for l in lines if not _FOOTER.match(l)]
    lines = [l for l in lines if not _TOC_HDR.match(l)]
    lines = [l for l in lines if not _FPAGE.match(l)]
    lines = [re.sub(r"\s+F-\d{1,3}\.?\s*$", "", l)
             if not l.lstrip().startswith("|") else l for l in lines]

    counts: Counter[str] = Counter(l.strip() for l in lines if l.strip())
    repeated = {t for t, c in counts.items() if c >= 3 and len(t) < 120}
    lines = [l for l in lines if l.strip() not in repeated]

    out: list[str] = []
    for line in lines:
        s = line.strip()
        if not s:
            out.append("")
            continue
        m = _ITEM_HDR.match(s)
        if m:
            out.append(f"### {m.group(1)}")
            continue
        words = s.split()
        if (2 <= len(words) <= 10 and len(s) < 80
                and not s.endswith((",", ";", ":", "and", "or"))
                and s[0].isupper()
                and not s.startswith(("(", "$", "•", "-", "*"))
                and sum(1 for w in words if w[0].isupper()) / len(words) >= 0.6
                and not re.match(r"^[A-Z]\w+\s+[a-z].*[a-z]\s+[a-z]", s)):
            out.append(f"### {s}")
            continue
        out.append(s)

    joined: list[str] = []
    for line in out:
        if (joined and joined[-1] and not joined[-1].startswith("#")
                and not line.startswith(("#", "|", "-", "*", "•"))
                and line and line[0].islower()):
            joined[-1] = joined[-1] + " " + line
        else:
            joined.append(line)

    text = re.sub(r"\n{3,}", "\n\n", "\n".join(joined)).strip()
    if table_md:
        text = text + "\n\n" + table_md
    return text


def format_exhibits(section_text: str) -> str:
    """Exhibit index lines (31.1, 101.INS, …) → markdown list items; falls
    back to clean_prose when <2 exhibit lines are found."""
    out: list[str] = []
    count = 0
    for line in section_text.splitlines():
        s = line.strip()
        if not s:
            out.append("")
            continue
        if re.match(r"^\s*\d{1,3}\s*$", s):
            continue
        if _EXHIBIT_NUM.match(s):
            out.append(f"- {s}")
            count += 1
        else:
            out.append(s)
    if count < 2:
        return clean_prose(section_text)
    return re.sub(r"\n{3,}", "\n\n", "\n".join(out)).strip()
