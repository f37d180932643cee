"""Output-quality harness: deterministic checks over extracted markdown.

Rebuilds the reference's quality harness (``sec_parser/test_runner.py:
112-368`` — 9 checks over written ``.md`` files, run as a separate CLI)
as pure kernels applied to the ``extracted_text`` column by a
``map_batches`` stage (:mod:`..stages.qa`). The check registry is
user-extensible the same way the reference's is ("append new checks
here", test_runner.py:357): append a ``fn(text, doc_kind) -> QAResult``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

REQUIRED_SECTIONS_10K = ["Cover Page", "Balance Sheets", "Statements of Income",
                         "Statements of Cash Flows", "Notes"]
REQUIRED_SECTIONS_10Q = REQUIRED_SECTIONS_10K


@dataclass
class QAResult:
    check: str
    passed: bool
    message: str = ""


def check_section_completeness(text: str, doc_kind: str) -> QAResult:
    """Required sections present (test_runner.py:112-129)."""
    if doc_kind != "sec":
        return QAResult("section_completeness", True, "n/a")
    missing = [s for s in REQUIRED_SECTIONS_10K if f"## " not in text or
               not re.search(rf"^## .*{re.escape(s)}", text, re.MULTILINE)]
    return QAResult("section_completeness", not missing,
                    f"missing: {missing}" if missing else "")


def check_tables_formatted(text: str, doc_kind: str) -> QAResult:
    """Financial sections contain pipe tables (test_runner.py:132-154)."""
    if doc_kind != "sec":
        return QAResult("tables_formatted", True, "n/a")
    m = re.search(r"^## .*Balance Sheets?\n(.*?)(?=^## |\Z)", text,
                  re.MULTILINE | re.DOTALL)
    if not m:
        return QAResult("tables_formatted", False, "no balance sheet section")
    ok = "|" in m.group(1)
    return QAResult("tables_formatted", ok,
                    "" if ok else "balance sheet has no table")


def check_no_stray_page_numbers(text: str, doc_kind: str) -> QAResult:
    """No standalone page-number lines survive (test_runner.py:157-177)."""
    stray = [l for l in text.splitlines() if re.fullmatch(r"\s*\d{1,3}\s*", l)]
    return QAResult("no_stray_page_numbers", len(stray) == 0,
                    f"{len(stray)} stray page-number lines" if stray else "")


def check_table_structure(text: str, doc_kind: str) -> QAResult:
    """Consistent column counts within each table (test_runner.py:180-215)."""
    bad = 0
    cur_cols = None
    for line in text.splitlines():
        if line.startswith("|") and line.endswith("|"):
            ncols = line.count("|") - 1
            if set(line.replace("|", "").strip()) <= set(":- "):
                cur_cols = ncols
            elif cur_cols is not None and ncols != cur_cols:
                bad += 1
        else:
            cur_cols = None
    return QAResult("table_structure", bad == 0,
                    f"{bad} rows with inconsistent column count" if bad else "")


def check_no_empty_sections(text: str, doc_kind: str) -> QAResult:
    """Sections have content (allowlist mirrors test_runner.py:218-236)."""
    allow = {"Reserved", "Mine Safety", "Signatures"}
    empties = []
    parts = re.split(r"^## ", text, flags=re.MULTILINE)[1:]
    for part in parts:
        title, _, body = part.partition("\n")
        if title.strip() in allow:
            continue
        if not body.strip():
            empties.append(title.strip())
    return QAResult("no_empty_sections", not empties,
                    f"empty: {empties}" if empties else "")


def check_prose_quality(text: str, doc_kind: str) -> QAResult:
    """MDA prose has subheadings (test_runner.py:239-266)."""
    if doc_kind != "sec":
        return QAResult("prose_quality", True, "n/a")
    m = re.search(r"^## .*Discussion and Analysis.*\n(.*?)(?=^## |\Z)", text,
                  re.MULTILINE | re.DOTALL)
    if not m:
        return QAResult("prose_quality", True, "no MDA section")
    ok = "###" in m.group(1) or len(m.group(1)) < 200
    return QAResult("prose_quality", ok, "" if ok else "MDA has no subheadings")


def check_cover_fields(text: str, doc_kind: str) -> QAResult:
    """Cover table carries the core fields (test_runner.py:269-296)."""
    if doc_kind != "sec":
        return QAResult("cover_fields", True, "n/a")
    need = ["Filing Type", "Company"]
    missing = [f for f in need if f"| {f} |" not in text]
    return QAResult("cover_fields", not missing,
                    f"missing: {missing}" if missing else "")


def check_table_density(text: str, doc_kind: str) -> QAResult:
    """Financial tables have ≥5 data rows (test_runner.py:299-330)."""
    if doc_kind != "sec":
        return QAResult("table_density", True, "n/a")
    m = re.search(r"^## .*Balance Sheets?\n(.*?)(?=^## |\Z)", text,
                  re.MULTILINE | re.DOTALL)
    if not m:
        return QAResult("table_density", False, "no balance sheet")
    rows = [l for l in m.group(1).splitlines()
            if l.startswith("|") and not set(l.replace("|", "").strip()) <= set(":- ")]
    ok = len(rows) >= 6  # header + ≥5 data rows
    return QAResult("table_density", ok,
                    "" if ok else f"only {len(rows)} table rows")


def check_no_artifacts(text: str, doc_kind: str) -> QAResult:
    """No extraction artifacts: U+FFFD, F-NN refs, TOC repeats
    (test_runner.py:333-354)."""
    issues = []
    if "�" in text:
        issues.append("replacement chars")
    if re.search(r"^\s*F-\d+\s*$", text, re.MULTILINE):
        issues.append("F-N page refs")
    if text.count("TABLE OF CONTENTS") > 1:
        issues.append("repeated TOC")
    return QAResult("no_artifacts", not issues, ", ".join(issues))


# Ordered registry — append new checks here (user-extension surface,
# mirrors test_runner.py:357-368).
ALL_CHECKS = [
    check_section_completeness,
    check_tables_formatted,
    check_no_stray_page_numbers,
    check_table_structure,
    check_no_empty_sections,
    check_prose_quality,
    check_cover_fields,
    check_table_density,
    check_no_artifacts,
]


def run_qa(text: str, doc_kind: str) -> list[QAResult]:
    return [fn(text, doc_kind) for fn in ALL_CHECKS]
