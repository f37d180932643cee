"""Structured-facts side table: the local, deterministic stand-in for the
reference's SEC EDGAR XBRL client (``sec_parser/edgar_client.py``).

The reference fetched ``companyfacts``/``submissions`` JSON over HTTP per
CIK (module-global cache + 100 ms throttle, edgar_client.py:29-54), matched
the filing accession by (form, reportDate) (``:116-148``), extracted
per-statement facts (``:178-295``) and rendered them as the primary table
source. Our engine has no network: the same structured facts live in a
Parquet side table generated alongside the corpus, keyed by
``(cik, filing_type, period_end, statement_type)``. The table is small —
loaded once per extraction actor in ``__init__`` (the broadcast-small-side
join pattern), never re-read per batch.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class FactsStatement:
    statement_type: str
    line_items: dict[str, list[float | None]]  # canonical -> per-period values
    periods: list[str]
    unit: str = "USD"


class FactsStore:
    """In-memory index over the structured-facts side table.

    ``records`` rows: dicts with keys cik, filing_type, period_end,
    statement_type, canonical, values (list[float|None]), periods
    (list[str]). Grouped here into per-(filing, statement) FactsStatement.
    """

    def __init__(self, records: list[dict] | None = None):
        self._index: dict[tuple[str, str, str], dict[str, FactsStatement]] = {}
        for rec in records or []:
            key = (str(rec["cik"]), str(rec["filing_type"]).upper(),
                   str(rec["period_end"]))
            stmts = self._index.setdefault(key, {})
            st = rec["statement_type"]
            stmt = stmts.get(st)
            if stmt is None:
                stmt = FactsStatement(st, {}, list(rec.get("periods") or []))
                stmts[st] = stmt
            stmt.line_items[rec["canonical"]] = list(rec.get("values") or [])

    @classmethod
    def from_parquet(cls, path: str) -> "FactsStore":
        import pyarrow.parquet as pq
        try:
            table = pq.read_table(path)
        except (FileNotFoundError, OSError):
            return cls([])
        return cls(table.to_pylist())

    def lookup(self, cik: str, filing_type: str,
               period_end: str) -> dict[str, FactsStatement]:
        """Accession-match analogue: form type normalized by stripping /A,
        exact period_end equality (edgar_client.py:116-148)."""
        if not cik or not filing_type or not period_end:
            return {}
        ft = filing_type.upper()
        if ft.endswith("/A"):
            ft = ft[:-2]
        return self._index.get((str(cik), ft, period_end), {})


# ---------------------------------------------------------------------------
# Raw companyfacts-JSON extraction (reference J4 semantics,
# edgar_client.py:178-295): for environments where the side table is not
# pre-shaped but raw XBRL-style fact dumps are available.
# ---------------------------------------------------------------------------

UNIT_PREFERENCE = ("USD", "USD/shares", "shares", "pure")
MAX_PERIODS = 4
MIN_LINE_ITEMS = 3


def pad_cik(cik) -> str:
    """EDGAR CIKs are 10-digit zero-padded (edgar_client.py pad_cik)."""
    return str(cik).zfill(10)


def accession_prefix(accession: str) -> str:
    """XBRL facts reference accessions without dashes
    (edgar_client.py:150-156)."""
    return accession.replace("-", "")


def find_filing_accession(submissions: dict, form: str,
                          report_date: str) -> str | None:
    """Locate the accession of the filing matching (form, reportDate) in a
    submissions-JSON dump (edgar_client.py:116-148 behavior: recent
    filings arrays, reportDate exact match, form matched after the
    reference's normalization — ``upper().rstrip("/A")`` — so a "10-K"
    request also finds the amended "10-K/A" filing; the char-set rstrip
    quirk is mirrored deliberately for parity)."""
    recent = (submissions.get("filings", {}) or {}).get("recent", {}) or {}
    forms = recent.get("form", []) or []
    dates = recent.get("reportDate", []) or []
    accs = recent.get("accessionNumber", []) or []
    target = (form or "").upper().rstrip("/A")
    for f, d, a in zip(forms, dates, accs):
        if (f or "").upper().rstrip("/A") == target and d == report_date:
            return a
    return None


def extract_statement_facts(company_facts: dict, accession: str,
                            statement_type: str,
                            xbrl_map: dict[str, str]) -> FactsStatement | None:
    """Shape raw companyfacts JSON into one statement's aligned line items.

    Reference semantics rebuilt (edgar_client.py:178-295):

    * unit preference ``USD > USD/shares > shares > pure``; once a concept
      yields data in one unit, later units are not consulted;
    * facts are filtered to the filing's accession (dash-stripped match);
    * dimensional (``segment``-tagged) facts are excluded;
    * period key is ``end`` for instant facts, ``start_end`` for durations;
    * at most the 4 most-recent end dates are kept, and per end date the
      LONGEST duration wins over shorter ones / instants;
    * fewer than 3 mapped line items ⇒ not enough data ⇒ ``None``.
    """
    acc = accession_prefix(accession)
    us_gaap = (company_facts.get("facts", {}) or {}).get("us-gaap", {}) or {}
    if not us_gaap:
        return None

    found: dict[str, dict[str, float]] = {}
    periods_seen: set[str] = set()
    for concept, canonical in xbrl_map.items():
        units = (us_gaap.get(concept) or {}).get("units", {}) or {}
        for unit_key in UNIT_PREFERENCE:
            for fact in units.get(unit_key, []) or []:
                if accession_prefix(fact.get("accn", "")) != acc:
                    continue
                end = fact.get("end", "")
                val = fact.get("val")
                if not end or val is None or fact.get("segment"):
                    continue
                start = fact.get("start", "")
                key = f"{start}_{end}" if start else end
                found.setdefault(canonical, {})[key] = float(val)
                periods_seen.add(key)
            if canonical in found:
                break  # unit preference: first unit with data wins

    if len(found) < MIN_LINE_ITEMS:
        return None

    by_end: dict[str, list[str]] = {}
    for p in sorted(periods_seen):
        by_end.setdefault(p.split("_")[-1], []).append(p)
    recent_ends = sorted(by_end, reverse=True)[:MAX_PERIODS]

    final_periods: list[str] = []
    for end in sorted(recent_ends):
        candidates = by_end[end]
        durations = sorted((c for c in candidates if "_" in c),
                           key=lambda c: c.split("_")[0])
        final_periods.append(durations[0] if durations else candidates[0])
    if not final_periods:
        return None

    line_items = {canonical: [vals.get(p) for p in final_periods]
                  for canonical, vals in found.items()}
    display = [p.split("_")[-1] for p in final_periods]
    return FactsStatement(statement_type, line_items, display)


def render_facts_statement(stmt: FactsStatement) -> str:
    """Markdown render of a facts-backed statement (edgar_client.py:300-340):
    label column left-aligned, one right-aligned column per period, em-dash
    for missing values, thousands separators, ints without decimals."""
    if not stmt.line_items or not stmt.periods:
        return ""
    header = [""] + stmt.periods
    sep = [":---"] + ["---:"] * len(stmt.periods)
    lines = ["| " + " | ".join(header) + " |",
             "| " + " | ".join(sep) + " |"]
    for canonical, values in stmt.line_items.items():
        cells = [canonical]
        for v in values:
            if v is None:
                cells.append("—")
            elif v == int(v):
                cells.append(f"{int(v):,}")
            else:
                cells.append(f"{v:,.2f}")
        lines.append("| " + " | ".join(cells) + " |")
    return "\n".join(lines)
