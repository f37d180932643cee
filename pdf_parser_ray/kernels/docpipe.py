"""Per-document extraction: one (url, html, warc_ts) row in, one record out.

This is the engine's unit of correctness — the rebuilt equivalent of the
reference's ``process_pdf`` (``sec_parser/pipeline.py:177-533``) plus its
IFRS branch (``:114-174``), with three differences mandated by the target
architecture:

* the reader is the HTML page tokenizer, not pdfplumber;
* the EDGAR/XBRL network joins become a broadcast lookup into a local
  structured-facts side table (:mod:`.facts`);
* documents with no SEC/IFRS markers take a third route — trafilatura-style
  main-content extraction for generic web pages;
* ``parsed_at`` derives from ``warc_ts`` (determinism), and the
  ``filing_sequence`` front-matter key is emitted up front (value 0) so the
  cross-document sequence stage patches it *before* the write instead of the
  reference's read-modify-write second pass (``cli.py:19-41``).

No cross-document effects happen here; dedup / consistency / sequencing are
separate grouped stages.
"""

from __future__ import annotations

import json as _json
import re
from urllib.parse import urlparse

from . import checks as C
from . import cover as COV
from . import finmeta as FM
from . import sections as S
from .doctype import classify_document, find_filing_start
from .facts import FactsStore, render_facts_statement
from .html_tokenizer import detect_scanned, extract_main_text, tokenize_pages
from .prose import clean_prose, format_exhibits
from .tablekit import detect_headers, normalize_tables, parse_text_table
from .taxonomy import LabelNormalizer

SEC_ORDER = [S.COVER, S.BALANCE, S.INCOME, S.CASHFLOW, S.EQUITY,
             S.COMPREHENSIVE, S.NOTES, S.MDA, S.MARKET_RISK, S.CONTROLS,
             S.LEGAL, S.RISK_FACTORS, S.EXHIBITS, S.SIGNATURES]
IFRS_ORDER = [S.IFRS_INCOME, S.IFRS_BALANCE, S.IFRS_EQUITY, S.IFRS_CASHFLOW,
              S.IFRS_NOTES]

SEC_REQUIRED = {S.INCOME, S.BALANCE, S.CASHFLOW, S.EQUITY, S.NOTES}
IFRS_REQUIRED = set(IFRS_ORDER)

FINANCIAL_SECTIONS = [S.INCOME, S.BALANCE, S.CASHFLOW, S.EQUITY, S.COMPREHENSIVE]
IFRS_FINANCIAL = [S.IFRS_INCOME, S.IFRS_BALANCE, S.IFRS_CASHFLOW, S.IFRS_EQUITY]
PROSE_SECTIONS = [S.MDA, S.MARKET_RISK, S.CONTROLS, S.LEGAL, S.RISK_FACTORS]
PASSTHROUGH = [S.EXHIBITS, S.SIGNATURES]

STATEMENT_TYPES = {S.INCOME: "income_statement", S.BALANCE: "balance_sheet",
                   S.CASHFLOW: "cash_flow"}
FACTS_STATEMENTS = {S.INCOME: "income_statement", S.BALANCE: "balance_sheet",
                    S.CASHFLOW: "cash_flow", S.EQUITY: "stockholders_equity",
                    S.COMPREHENSIVE: "comprehensive_income"}

MISSING_PLACEHOLDER = "*Section not found in filing.*"


def _url_stem(url: str) -> str:
    path = urlparse(url).path.rstrip("/")
    stem = path.rsplit("/", 1)[-1] or urlparse(url).netloc
    return re.sub(r"\.[A-Za-z0-9]{1,5}$", "", stem)


def family_key_for(url: str, cik: str = "") -> str:
    """Cross-document grouping key: CIK when known, else url host + first
    path segment (the "document family" of the north rule)."""
    if cik:
        return f"cik:{cik}"
    p = urlparse(url)
    seg = p.path.strip("/").split("/", 1)[0] if p.path.strip("/") else ""
    return f"host:{p.netloc}/{seg}"


def _assemble(title: str, processed: dict[str, str], order: list[str],
              titles: dict[str, str], required: set[str],
              meta: dict | None = None, validation_md: str = "",
              confidence_md: str = "") -> tuple[str, list[dict]]:
    """Assemble final markdown; returns (text, spans) where spans carry
    character offsets of each section's content within the text
    (the "span offsets per url" output of the north rule)."""
    parts: list[str] = []
    spans: list[dict] = []
    if meta:
        parts.append(FM.front_matter(meta))
    parts.append(f"# {title}\n")

    def _offset() -> int:
        return sum(len(p) + 1 for p in parts)  # +1 per joining newline

    for key in order:
        content = processed.get(key)
        if content is None:
            if key in required:
                parts.append(f"## {titles[key]}\n")
                start = _offset()
                parts.append(MISSING_PLACEHOLDER)
                spans.append({"section": key, "start": start,
                              "end": start + len(MISSING_PLACEHOLDER)})
                parts.append("")
            continue
        title_line = titles[key]
        parts.append(f"## {title_line}\n")
        dedup = re.compile(r"^\s*#{0,4}\s*" + re.escape(title_line) + r"\s*\n*",
                           re.IGNORECASE)
        content = dedup.sub("", content, count=1).lstrip("\n")
        start = _offset()
        parts.append(content)
        spans.append({"section": key, "start": start, "end": start + len(content)})
        parts.append("")
    if validation_md:
        parts.append("## Validation\n")
        start = _offset()
        parts.append(validation_md)
        spans.append({"section": "validation", "start": start,
                      "end": start + len(validation_md)})
        parts.append("")
    if confidence_md:
        parts.append("## Data Confidence\n")
        start = _offset()
        parts.append(confidence_md)
        spans.append({"section": "confidence", "start": start,
                      "end": start + len(confidence_md)})
        parts.append("")
    return "\n".join(parts) + "\n", spans


def _record(url: str, warc_ts: str, status: str, kind: str, text: str = "",
            spans: list[dict] | None = None, meta: dict | None = None,
            mappings: list[dict] | None = None, family: str = "",
            period_end: str = "", n_pages: int = 0,
            confidence_avg: float = 0.0) -> dict:
    return {
        "url": url, "warc_ts": warc_ts, "status": status, "doc_kind": kind,
        "family_key": family or family_key_for(url),
        "period_end": period_end, "extracted_text": text,
        "spans": spans or [], "mappings": mappings or [],
        "n_pages": n_pages, "n_spans": len(spans or []),
        "confidence_avg": confidence_avg,
        "meta_json": _json.dumps(meta or {}, sort_keys=True),
    }


def process_document(url: str, payload: bytes | str, warc_ts: str,
                     normalizer: LabelNormalizer,
                     facts: FactsStore | None = None,
                     classifier=None) -> dict:
    """Full per-document pipeline. Never raises on malformed payloads —
    failures land in the ``status`` column (poison-pill isolation; the
    reference instead crashed per document, ANALYSIS_REPORT.md:148-154).

    ``classifier`` is the per-worker model-backed section classifier
    (:class:`..stages.classify.SectionClassifier`); when present, the SEC
    Notes path runs through it (the reference's LLM analogue,
    ``pipeline.py:361-372``). ``None`` falls back to the reference's
    model-free fallback (``programmatic.py:1467-1478``)."""
    try:
        return _process(url, payload, warc_ts, normalizer, facts, classifier)
    except Exception as exc:  # noqa: BLE001 — app-level error column
        return _record(url, warc_ts, f"error:{type(exc).__name__}", "unknown")


def _process(url: str, payload: bytes | str, warc_ts: str,
             normalizer: LabelNormalizer, facts: FactsStore | None,
             classifier=None) -> dict:
    pages = tokenize_pages(payload)
    n_pages = len(pages)
    if detect_scanned(pages):
        return _record(url, warc_ts, "skipped_scanned", "unknown",
                       n_pages=n_pages)

    kind = classify_document(pages)

    if kind == "web":
        text = extract_main_text(pages)
        spans = [{"section": "main", "start": 0, "end": len(text)}]
        return _record(url, warc_ts, "ok", "web", text, spans,
                       n_pages=n_pages)

    if kind == "ifrs":
        return _process_ifrs(url, warc_ts, pages, n_pages)

    return _process_sec(url, warc_ts, pages, n_pages, normalizer, facts,
                        classifier)


def _process_ifrs(url: str, warc_ts: str, pages, n_pages: int) -> dict:
    sections = S.split_ifrs_sections(pages)
    processed: dict[str, str] = {}
    for key in IFRS_FINANCIAL:
        if key in sections:
            sec = sections[key]
            processed[key] = normalize_tables(sec.text, sec.tables)
    if S.IFRS_NOTES in sections:
        # Notes: model-free prose path (the reference's LLM fallback,
        # pipeline.py:149-158 — our engine has no remote model).
        processed[S.IFRS_NOTES] = clean_prose(sections[S.IFRS_NOTES].text)
    text, spans = _assemble(_url_stem(url), processed, IFRS_ORDER,
                            S.IFRS_TITLES, IFRS_REQUIRED)
    return _record(url, warc_ts, "ok", "ifrs", text, spans, n_pages=n_pages)


def _process_sec(url: str, warc_ts: str, pages, n_pages: int,
                 normalizer: LabelNormalizer, facts: FactsStore | None,
                 classifier=None) -> dict:
    # Combined annual report: trim pages before the embedded filing, keeping
    # a ≤5000-char prefix for metadata fallback (pipeline.py:211-225).
    start_pg = find_filing_start(pages)
    pre_text = ""
    if start_pg > 1:
        pre_parts: list[str] = []
        for p in pages:
            if p.number >= start_pg:
                break
            pre_parts.append(p.text)
            if sum(len(t) for t in pre_parts) > 5000:
                break
        pre_text = "\n".join(pre_parts)[:5000]
        pages = [p for p in pages if p.number >= start_pg]

    sections = S.split_sec_sections(pages)
    processed: dict[str, str] = {}

    cover_fields: list[tuple[str, str]] = []
    if S.COVER in sections:
        cover_fields = COV.extract_cover_fields(sections[S.COVER].text)
        processed[S.COVER] = COV.render_cover(sections[S.COVER].text)
    if pre_text:
        have = {l for l, _ in cover_fields}
        if "Company" not in have or "Ticker" not in have:
            for label, value in COV.extract_cover_fields(pre_text):
                if label not in have:
                    cover_fields.append((label, value))
                    have.add(label)

    lookup = dict(cover_fields)
    cik = lookup.get("CIK", "")
    filing_type = lookup.get("Filing Type", "")
    period_end, _ = FM.parse_period_date(lookup.get("Period", ""))

    # Structured-facts lookup (broadcast side table; EDGAR analogue).
    facts_by_section: dict[str, object] = {}
    data_sources: dict[str, str] = {}
    if facts is not None and cik:
        found = facts.lookup(cik, filing_type, period_end)
        for sec_key, st in FACTS_STATEMENTS.items():
            if st in found:
                facts_by_section[sec_key] = found[st]

    normalized_rows: dict[str, list[list[str]]] = {}
    for key in FINANCIAL_SECTIONS:
        if key in facts_by_section:
            stmt = facts_by_section[key]
            processed[key] = render_facts_statement(stmt)
            data_sources[FACTS_STATEMENTS[key]] = "facts"
            if key in sections and key in STATEMENT_TYPES:
                rows: list[list[str]] = []
                normalize_tables(sections[key].text, sections[key].tables,
                                 normalizer=normalizer, normalized_rows_out=rows)
                normalized_rows[key] = rows
        elif key in sections:
            sec = sections[key]
            rows = []
            result = normalize_tables(sec.text, sec.tables,
                                      normalizer=normalizer,
                                      normalized_rows_out=rows)
            if "|" not in result:
                periods, years = detect_headers(sec.text)
                alt = parse_text_table(sec.text, periods, years)
                if alt:
                    result = alt
            processed[key] = result
            if key in STATEMENT_TYPES:
                normalized_rows[key] = rows
            data_sources[FACTS_STATEMENTS.get(key, key)] = "extracted"

    notes_info: dict = {}
    if S.NOTES in sections:
        if classifier is not None:
            # model-backed notes path: chunk at note boundaries, score
            # every chunk through the per-worker classifier, trim
            # confidently-foreign trailing chunks (LLM-call replacement;
            # reference pipeline.py:361-372 + gemini_client.py:70-133)
            from .notes import process_notes_model
            processed[S.NOTES], notes_info = process_notes_model(
                sections[S.NOTES].text, classifier)
        else:
            processed[S.NOTES] = clean_prose(sections[S.NOTES].text)
    for key in PROSE_SECTIONS:
        if key in sections:
            processed[key] = clean_prose(sections[key].text, sections[key].tables)
    for key in PASSTHROUGH:
        if key in sections:
            processed[key] = (format_exhibits(sections[key].text)
                              if key == S.EXHIBITS
                              else clean_prose(sections[key].text))

    scale_hint = FM.find_scale_hint(
        [sections[k].text for k in FINANCIAL_SECTIONS if k in sections])
    cover_text = sections[S.COVER].text if S.COVER in sections else ""
    meta = FM.build_metadata(cover_fields, scale_hint, url, cover_text,
                             parsed_at=warc_ts)
    meta["filing_sequence"] = 0  # patched by the grouped sequence stage
    if notes_info:
        meta.update(notes_info)  # model-stage provenance in front matter
    if data_sources:
        meta["data_sources"] = data_sources

    statements: dict[str, dict[str, list[float]]] = {}
    for key, st in STATEMENT_TYPES.items():
        if key in normalized_rows:
            data = C.statement_data(normalized_rows[key])
            if data:
                statements[st] = data
    results = C.run_checks(statements) if statements else []
    validation_md = C.render_checks(results)

    confidences: list[C.Confidence] = []
    for sec_key, st in FACTS_STATEMENTS.items():
        f = facts_by_section.get(sec_key)
        e = statements.get(st)
        discs = None
        if f is not None and e:
            discs = C.cross_validate(f.line_items, e)
        val_status = None
        if results:
            mine = [r for r in results if st.upper()[:2] in r.check.upper()[:5]]
            if mine:
                if any(r.status == "FAIL" for r in mine):
                    val_status = "FAIL"
                elif any(r.status == "WARN" for r in mine):
                    val_status = "WARN"
                else:
                    val_status = "PASS"
        conf = C.score_confidence(f, e, st, discs, val_status)
        if conf.facts_available or conf.extracted_available:
            confidences.append(conf)
    confidence_md = C.render_confidence(confidences)
    if confidences:
        meta["confidence"] = {c.statement_type: c.confidence for c in confidences}

    mappings: dict[str, str] = {}
    for rows in normalized_rows.values():
        for row in rows:
            if len(row) >= 2 and row[0].strip():
                mappings[row[0].strip()] = (row[1] or "").strip()

    text, spans = _assemble(_url_stem(url), processed, SEC_ORDER, S.SEC_TITLES,
                            SEC_REQUIRED, meta=meta, validation_md=validation_md,
                            confidence_md=confidence_md)
    conf_avg = (sum(c.confidence for c in confidences) / len(confidences)
                if confidences else 0.0)
    return _record(url, warc_ts, "ok", "sec", text, spans,
                   meta={k: v for k, v in meta.items()
                         if not isinstance(v, dict)},
                   mappings=[{"label": k, "canonical": v}
                             for k, v in mappings.items()],
                   family=family_key_for(url, cik), period_end=period_end,
                   n_pages=n_pages, confidence_avg=conf_avg)
