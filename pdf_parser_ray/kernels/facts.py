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
