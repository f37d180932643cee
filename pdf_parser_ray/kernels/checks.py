"""Numeric parsing, statement validation, cross-validation, confidence.

Reference semantics: ``sec_parser/validate.py`` (parse_numeric, balance-sheet
equation, gross-profit / net-income, cash reconciliation, cross-statement
checks) and ``sec_parser/confidence.py`` (facts-vs-extracted discrepancies,
0-1 confidence ladder). All per-document kernels over the ``stmt`` data.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


def parse_numeric(value: str | None) -> float | None:
    """'$ (13,756)' → -13756.0; dashes/empty → None (validate.py:20-54)."""
    if value is None:
        return None
    s = value.strip()
    if not s:
        return None
    s = re.sub(r"[$€£]", "", s).strip()
    if s in ("—", "-", "–", ""):
        return None
    negative = False
    m = re.match(r"^\((.+)\)$", s)
    if m:
        negative = True
        s = m.group(1).strip()
    s = s.replace(",", "").replace(" ", "")
    try:
        v = float(s)
    except ValueError:
        return None
    return -v if negative else v


def statement_data(rows: list[list[str]]) -> dict[str, list[float]]:
    """Normalized rows [label, canonical, v1, v2…] → {canonical: [floats]}."""
    data: dict[str, list[float]] = {}
    for row in rows:
        if len(row) < 3:
            continue
        canonical = (row[1] or "").strip()
        if not canonical:
            continue
        vals = [v for v in (parse_numeric(c) for c in row[2:]) if v is not None]
        if vals:
            data[canonical] = vals
    return data


@dataclass
class CheckResult:
    check: str
    status: str  # PASS | WARN | FAIL | SKIP
    detail: str


def _first(data: dict[str, list[float]], key: str) -> float | None:
    v = data.get(key)
    return v[0] if v else None


def _compare(name: str, expected: float, actual: float,
             tolerance: float = 0.01) -> CheckResult:
    if expected == actual:
        return CheckResult(name, "PASS", f"Expected {expected:,.2f}, got {actual:,.2f}")
    denom = abs(expected) if expected != 0 else abs(actual)
    if denom == 0:
        return CheckResult(name, "PASS", "Both values are zero")
    rel = abs(expected - actual) / denom
    status = "WARN" if rel <= tolerance else "FAIL"
    return CheckResult(name, status,
                       f"Expected {expected:,.2f}, got {actual:,.2f} (off by {rel:.2%})")


def check_balance_sheet(data: dict[str, list[float]]) -> list[CheckResult]:
    assets = _first(data, "Total Assets")
    combined = _first(data, "Total Liabilities & Stockholders' Equity")
    if assets is not None and combined is not None:
        return [_compare("BS Balance (Assets vs L+E)", assets, combined)]
    liab = _first(data, "Total Liabilities")
    eq = _first(data, "Total Stockholders' Equity")
    if assets is None or (liab is None and eq is None):
        return [CheckResult("BS Balance (Assets vs L+E)", "SKIP",
                            "Missing key items for balance sheet check")]
    return [_compare("BS Balance (Assets vs L+E)", assets,
                     (liab or 0.0) + (eq or 0.0))]


def check_income_statement(data: dict[str, list[float]]) -> list[CheckResult]:
    out: list[CheckResult] = []
    rev, cor, gp = (_first(data, "Revenue"), _first(data, "Cost of Revenue"),
                    _first(data, "Gross Profit"))
    if rev is not None and cor is not None and gp is not None:
        out.append(_compare("IS Gross Profit Check", rev - abs(cor), gp))
    else:
        out.append(CheckResult("IS Gross Profit Check", "SKIP",
                               "Missing Revenue, Cost of Revenue, or Gross Profit"))
    ni = _first(data, "Net Income")
    if ni is not None:
        out.append(CheckResult("IS Net Income Present", "PASS",
                               f"Net Income = {ni:,.2f}"))
    else:
        out.append(CheckResult("IS Net Income Present", "SKIP",
                               "Net Income not found"))
    return out


def check_cash_flow(data: dict[str, list[float]]) -> list[CheckResult]:
    out: list[CheckResult] = []
    begin, change, end = (_first(data, "Beginning Cash"),
                          _first(data, "Net Change in Cash"),
                          _first(data, "Ending Cash"))
    if begin is not None and change is not None and end is not None:
        out.append(_compare("CF Cash Reconciliation", begin + change, end))
    else:
        out.append(CheckResult("CF Cash Reconciliation", "SKIP",
                               "Missing Beginning Cash, Net Change, or Ending Cash"))
    acts = ["Net Cash from Operations", "Net Cash from Investing",
            "Net Cash from Financing"]
    missing = [a for a in acts if _first(data, a) is None]
    if not missing:
        out.append(CheckResult("CF Activity Sections", "PASS",
                               "All 3 activity sections present"))
    else:
        out.append(CheckResult(
            "CF Activity Sections",
            "WARN" if len(acts) - len(missing) >= 2 else "FAIL",
            f"Missing: {', '.join(missing)}"))
    return out


def check_cross_statement(
        statements: dict[str, dict[str, list[float]]]) -> list[CheckResult]:
    out: list[CheckResult] = []
    is_d = statements.get("income_statement", {})
    cf_d = statements.get("cash_flow", {})
    bs_d = statements.get("balance_sheet", {})

    is_ni, cf_ni = is_d.get("Net Income", []), cf_d.get("Net Income", [])
    if is_ni and cf_ni:
        if any(abs(a - b) <= max(1, abs(a) * 0.01) for a in is_ni for b in cf_ni):
            out.append(CheckResult("Cross: Net Income (IS vs CF)", "PASS",
                                   f"IS values {is_ni} match CF values {cf_ni}"))
        else:
            out.append(_compare("Cross: Net Income (IS vs CF)", is_ni[0], cf_ni[0]))
    else:
        out.append(CheckResult("Cross: Net Income (IS vs CF)", "SKIP",
                               "Net Income not available in both IS and CF"))

    cf_end = _first(cf_d, "Ending Cash")
    bs_cash = _first(bs_d, "Cash & Cash Equivalents")
    if cf_end is not None and bs_cash is not None:
        result = _compare("Cross: Cash (CF Ending vs BS)", cf_end, bs_cash)
        if result.status == "FAIL":
            restricted = _first(bs_d, "Restricted Cash")
            if restricted is not None:
                retry = _compare("Cross: Cash (CF Ending vs BS)", cf_end,
                                 bs_cash + restricted)
                if retry.status in ("PASS", "WARN"):
                    retry.detail += " (includes restricted cash)"
                    result = retry
        out.append(result)
    else:
        out.append(CheckResult("Cross: Cash (CF Ending vs BS)", "SKIP",
                               "Ending Cash or BS Cash not available"))
    return out


def run_checks(statements: dict[str, dict[str, list[float]]]) -> list[CheckResult]:
    out: list[CheckResult] = []
    if "balance_sheet" in statements:
        out += check_balance_sheet(statements["balance_sheet"])
    if "income_statement" in statements:
        out += check_income_statement(statements["income_statement"])
    if "cash_flow" in statements:
        out += check_cash_flow(statements["cash_flow"])
    if len(statements) >= 2:
        out += check_cross_statement(statements)
    return out


def render_checks(results: list[CheckResult]) -> str:
    if not results:
        return ""
    lines = ["| Check | Status | Detail |", "|:------|:-------|:-------|"]
    lines += [f"| {r.check} | {r.status} | {r.detail} |" for r in results]
    return "\n".join(lines)


# ---------------------------------------------------------------------------
# Facts-vs-extracted cross-validation + confidence (confidence.py:30-173)
# ---------------------------------------------------------------------------

@dataclass
class Discrepancy:
    line_item: str
    facts_value: float
    extracted_value: float
    difference: float
    pct_difference: float
    severity: str  # info | warn | error


@dataclass
class Confidence:
    statement_type: str
    source: str  # facts | extracted | facts+extracted | none
    confidence: float
    facts_available: bool
    extracted_available: bool
    discrepancies: list[Discrepancy] = field(default_factory=list)


def cross_validate(facts: dict[str, list[float | None]],
                   extracted: dict[str, list[float]],
                   tolerance: float = 0.01) -> list[Discrepancy]:
    out: list[Discrepancy] = []
    for key in sorted(set(facts) & set(extracted)):
        fv = next((v for v in facts[key] if v is not None), None)
        ev = extracted[key][0] if extracted[key] else None
        if fv is None or ev is None:
            continue
        diff = abs(fv - ev)
        denom = abs(fv) if fv != 0 else abs(ev)
        pct = 0.0 if denom == 0 else diff / denom
        severity = "info" if pct <= tolerance else ("warn" if pct <= 0.05 else "error")
        out.append(Discrepancy(key, fv, ev, diff, pct, severity))
    return out


def score_confidence(facts_data, extracted_data, statement_type: str,
                     discrepancies: list[Discrepancy] | None = None,
                     validation_status: str | None = None) -> Confidence:
    facts_ok = facts_data is not None
    ext_ok = bool(extracted_data)
    if facts_ok and ext_ok:
        if discrepancies is not None:
            errors = any(d.severity == "error" for d in discrepancies)
            warns = any(d.severity == "warn" for d in discrepancies)
            if not errors and not warns:
                conf, src = 1.0, "facts+extracted"
            elif not errors:
                conf, src = 0.95, "facts+extracted"
            else:
                conf, src = 0.8, "facts"
        else:
            conf, src = 0.9, "facts+extracted"
        return Confidence(statement_type, src, conf, True, True,
                          discrepancies or [])
    if facts_ok:
        return Confidence(statement_type, "facts", 0.9, True, False)
    if ext_ok:
        conf = {"PASS": 0.7, "WARN": 0.5, "FAIL": 0.3}.get(validation_status or "", 0.6)
        return Confidence(statement_type, "extracted", conf, False, True)
    return Confidence(statement_type, "none", 0.0, False, False)


def render_confidence(confidences: list[Confidence]) -> str:
    if not confidences:
        return ""
    lines = ["| Statement | Source | Confidence | Discrepancies |",
             "|:----------|:-------|:-----------|:--------------|"]
    for c in confidences:
        n = len(c.discrepancies)
        errors = sum(1 for d in c.discrepancies if d.severity == "error")
        warns = sum(1 for d in c.discrepancies if d.severity == "warn")
        if errors:
            summary = f"{n} ({errors} ERROR, {warns} WARN)"
        elif warns:
            summary = f"{n} ({warns} WARN)"
        else:
            summary = "None" if n == 0 else f"{n} found"
        lines.append(f"| {c.statement_type} | {c.source} | {c.confidence:.1f} | {summary} |")
    discs = [d for c in confidences for d in c.discrepancies]
    if discs:
        lines += ["", "### Discrepancy Details", "",
                  "| Line Item | Facts Value | Extracted Value | Difference | Severity |",
                  "|:----------|:-----------|:----------|:-----------|:---------|"]
        for d in discs:
            lines.append(f"| {d.line_item} | {d.facts_value:,.2f} | "
                         f"{d.extracted_value:,.2f} | {d.pct_difference:.2%} | "
                         f"{d.severity.upper()} |")
    return "\n".join(lines)
