"""Financial line-item taxonomy + tiered label normalization.

Reference semantics: ``sec_parser/taxonomy.yaml`` (statement → item →
{canonical, aliases}) loaded by ``normalize.py:21-26``; matching is
exact-lowercase → fuzzy(SequenceMatcher ≥ 0.85) → LLM batch
(``normalize.py:49-76,164-223``). Our tier 3 replaces the remote LLM with a
deterministic local model: a character-n-gram feature-hash centroid
classifier trained (at build time) on the alias lists — the "model-backed
classifier" of the rebuilt engine. Context disambiguation (current vs
non-current, ``normalize.py:79-146``) is a stateful fold within one table.

The taxonomy itself is plain Python data (our engine's broadcast side-input;
loaded once per actor, never per document).
"""

from __future__ import annotations

import difflib
import math
import re
from dataclasses import dataclass

# statement -> list of (canonical, [aliases...]).  Canonical names follow
# standard US-GAAP presentation labels (the same vocabulary the reference's
# validation checks key on, e.g. "Total Assets", "Net Cash from Operations").
TAXONOMY: dict[str, list[tuple[str, list[str]]]] = {
    "income_statement": [
        ("Revenue", ["Net revenues", "Total revenues", "Revenues", "Net sales",
                     "Total net sales", "Total net revenues", "Revenue, net",
                     "Net revenue", "Sales", "Total sales"]),
        ("Cost of Revenue", ["Cost of sales", "Cost of goods sold", "Cost of revenue",
                             "Cost of revenues", "Cost of products sold",
                             "Cost of net revenues"]),
        ("Gross Profit", ["Gross profit", "Gross margin"]),
        ("Research & Development", ["Research and development",
                                    "Research and development expense",
                                    "Research and development expenses", "R&D expenses"]),
        ("Selling, General & Administrative",
         ["Selling, general and administrative",
          "Selling, general and administrative expenses",
          "General and administrative", "General and administrative expenses",
          "Sales and marketing", "Selling and marketing expenses"]),
        ("Depreciation & Amortization", ["Depreciation and amortization",
                                         "Depreciation, depletion and amortization",
                                         "Depreciation expense"]),
        ("Total Operating Expenses", ["Total operating expenses",
                                      "Total costs and expenses",
                                      "Total expenses", "Operating expenses"]),
        ("Operating Income", ["Operating income", "Income from operations",
                              "Operating income (loss)", "Loss from operations",
                              "Operating loss", "Operating profit"]),
        ("Interest Expense", ["Interest expense", "Interest expense, net"]),
        ("Interest Income", ["Interest income", "Interest and dividend income"]),
        ("Other Income (Expense)", ["Other income (expense), net", "Other income, net",
                                    "Other expense, net", "Other income (expense)",
                                    "Other non-operating income"]),
        ("Income Before Tax", ["Income before income taxes", "Income before taxes",
                               "Income (loss) before income taxes",
                               "Loss before income taxes",
                               "Income before provision for income taxes"]),
        ("Income Tax Expense", ["Provision for income taxes", "Income tax expense",
                                "Income tax provision", "Income tax benefit",
                                "Income taxes"]),
        ("Net Income", ["Net income", "Net loss", "Net income (loss)",
                        "Net earnings", "Net income attributable to the Company",
                        "Profit for the year", "Profit for the period"]),
        ("EPS - Basic", ["Basic earnings per share", "Basic net income per share",
                         "Earnings per share - basic", "Basic", "Basic (in dollars per share)"]),
        ("EPS - Diluted", ["Diluted earnings per share", "Diluted net income per share",
                           "Earnings per share - diluted", "Diluted",
                           "Diluted (in dollars per share)"]),
        ("Shares Outstanding - Basic", ["Weighted average shares outstanding - basic",
                                        "Weighted-average basic shares outstanding",
                                        "Basic weighted average shares"]),
        ("Shares Outstanding - Diluted", ["Weighted average shares outstanding - diluted",
                                          "Weighted-average diluted shares outstanding",
                                          "Diluted weighted average shares"]),
    ],
    "balance_sheet": [
        ("Cash & Cash Equivalents", ["Cash and cash equivalents",
                                     "Cash and equivalents", "Cash",
                                     "Cash, cash equivalents"]),
        ("Restricted Cash", ["Restricted cash", "Restricted cash and equivalents"]),
        ("Short-Term Investments", ["Short-term investments",
                                    "Short-term marketable securities"]),
        ("Long-Term Investments", ["Long-term investments",
                                   "Long-term marketable securities"]),
        ("Accounts Receivable", ["Accounts receivable, net", "Accounts receivable",
                                 "Trade receivables", "Receivables, net"]),
        ("Inventory", ["Inventories", "Inventory, net", "Inventories, net", "Inventory"]),
        ("Prepaid Expenses", ["Prepaid expenses", "Prepaid expenses and other current assets",
                              "Other current assets"]),
        ("Total Current Assets", ["Total current assets"]),
        ("Property, Plant & Equipment", ["Property, plant and equipment, net",
                                         "Property and equipment, net",
                                         "Property, plant and equipment"]),
        ("Goodwill", ["Goodwill"]),
        ("Intangible Assets", ["Intangible assets, net", "Acquired intangible assets, net",
                               "Other intangible assets"]),
        ("Other Non-Current Assets", ["Other non-current assets", "Other long-term assets",
                                      "Other assets"]),
        ("Total Non-Current Assets", ["Total non-current assets", "Total long-term assets"]),
        ("Total Assets", ["Total assets"]),
        ("Accounts Payable", ["Accounts payable", "Trade payables"]),
        ("Accrued Liabilities", ["Accrued liabilities", "Accrued expenses",
                                 "Accrued expenses and other current liabilities"]),
        ("Deferred Revenue", ["Deferred revenue", "Unearned revenue",
                              "Contract liabilities"]),
        ("Short-Term Debt", ["Short-term debt", "Current portion of long-term debt",
                             "Commercial paper", "Term debt, current"]),
        ("Other Current Liabilities", ["Other current liabilities"]),
        ("Total Current Liabilities", ["Total current liabilities"]),
        ("Long-Term Debt", ["Long-term debt", "Term debt, non-current",
                            "Long-term borrowings"]),
        ("Other Non-Current Liabilities", ["Other non-current liabilities",
                                           "Other long-term liabilities"]),
        ("Total Non-Current Liabilities", ["Total non-current liabilities",
                                           "Total long-term liabilities"]),
        ("Total Liabilities", ["Total liabilities"]),
        ("Common Stock", ["Common stock", "Common stock and additional paid-in capital",
                          "Common stock, par value"]),
        ("Additional Paid-In Capital", ["Additional paid-in capital", "Paid-in capital",
                                        "Capital surplus"]),
        ("Retained Earnings", ["Retained earnings", "Accumulated deficit",
                               "Retained earnings (accumulated deficit)",
                               "Retained earnings (deficit)"]),
        ("Accumulated Other Comprehensive Income",
         ["Accumulated other comprehensive income",
          "Accumulated other comprehensive income (loss)",
          "Accumulated other comprehensive loss"]),
        ("Total Stockholders' Equity", ["Total stockholders' equity",
                                        "Total shareholders' equity",
                                        "Total stockholders’ equity",
                                        "Total shareholders’ equity",
                                        "Total equity",
                                        "Total stockholders' equity (deficit)"]),
        ("Total Liabilities & Stockholders' Equity",
         ["Total liabilities and stockholders' equity",
          "Total liabilities and shareholders' equity",
          "Total liabilities and stockholders’ equity",
          "Total liabilities and equity"]),
    ],
    "cash_flow": [
        ("Net Income", ["Net income", "Net loss", "Net income (loss)"]),
        ("Depreciation & Amortization", ["Depreciation and amortization"]),
        ("Stock-Based Compensation", ["Stock-based compensation",
                                      "Share-based compensation expense",
                                      "Stock-based compensation expense"]),
        ("Changes in Working Capital", ["Changes in operating assets and liabilities",
                                        "Changes in working capital"]),
        ("Net Cash from Operations", ["Net cash provided by operating activities",
                                      "Net cash used in operating activities",
                                      "Cash generated by operating activities",
                                      "Net cash provided by (used in) operating activities"]),
        ("Capital Expenditures", ["Purchases of property and equipment",
                                  "Capital expenditures", "Additions to property, plant and equipment",
                                  "Payments for acquisition of property, plant and equipment"]),
        ("Acquisitions", ["Acquisitions, net of cash acquired",
                          "Payments made in connection with business acquisitions"]),
        ("Net Cash from Investing", ["Net cash used in investing activities",
                                     "Net cash provided by investing activities",
                                     "Cash used in investing activities",
                                     "Net cash provided by (used in) investing activities"]),
        ("Debt Issued", ["Proceeds from issuance of debt",
                         "Proceeds from issuance of term debt, net"]),
        ("Debt Repaid", ["Repayments of debt", "Repayments of term debt"]),
        ("Dividends Paid", ["Payments for dividends and dividend equivalents",
                            "Dividends paid", "Cash dividends paid"]),
        ("Share Repurchases", ["Repurchases of common stock",
                               "Payments for repurchase of common stock"]),
        ("Net Cash from Financing", ["Net cash used in financing activities",
                                     "Net cash provided by financing activities",
                                     "Cash used in financing activities",
                                     "Net cash provided by (used in) financing activities"]),
        ("Net Change in Cash", ["Net increase in cash", "Net decrease in cash",
                                "Net increase (decrease) in cash",
                                "Increase (decrease) in cash and cash equivalents",
                                "Net change in cash and cash equivalents"]),
        ("Beginning Cash", ["Cash and cash equivalents, beginning of period",
                            "Cash, cash equivalents, beginning balances",
                            "Cash and cash equivalents, beginning of year",
                            "Beginning cash and cash equivalents"]),
        ("Ending Cash", ["Cash and cash equivalents, end of period",
                         "Cash, cash equivalents, ending balances",
                         "Cash and cash equivalents, end of year",
                         "Ending cash and cash equivalents"]),
    ],
}

# Labels whose canonical depends on the running current/non-current context
# of the enclosing balance-sheet block (reference: normalize.py:85-96).
CONTEXT_OVERRIDES: dict[str, dict[str, str]] = {
    "marketable securities": {
        "current": "Short-Term Investments",
        "non-current": "Long-Term Investments",
    },
    "other current liabilities": {"current": "Other Current Liabilities"},
    "other non-current liabilities": {"non-current": "Other Non-Current Liabilities"},
}

_CUR_HDR = re.compile(r"(?:^|\b)current\s+(?:assets|liabilities)", re.IGNORECASE)
_NONCUR_HDR = re.compile(r"(?:non[- ]?current|long[- ]?term)\s+(?:assets|liabilities)",
                         re.IGNORECASE)


def canonical_names() -> list[str]:
    out: list[str] = []
    seen: set[str] = set()
    for items in TAXONOMY.values():
        for canonical, _ in items:
            if canonical not in seen:
                seen.add(canonical)
                out.append(canonical)
    return out


def build_alias_index(taxonomy: dict | None = None) -> dict[str, str]:
    """lowercase alias (and canonical) → canonical name."""
    taxonomy = taxonomy or TAXONOMY
    index: dict[str, str] = {}
    for items in taxonomy.values():
        for canonical, aliases in items:
            index[canonical.lower()] = canonical
            for a in aliases:
                index[a.lower()] = canonical
    return index


# ---------------------------------------------------------------------------
# Tier-3: deterministic feature-hash centroid classifier (LLM replacement)
# ---------------------------------------------------------------------------

_N_FEATURES = 512


def _stable_hash(s: str) -> int:
    # FNV-1a; Python's builtin hash() is salted per process and would make
    # the classifier nondeterministic across workers.
    h = 2166136261
    for ch in s:
        h = ((h ^ ord(ch)) * 16777619) & 0xFFFFFFFF
    return h


def _featurize_stable(label: str) -> dict[int, float]:
    s = " " + re.sub(r"[^a-z0-9& ]+", " ", label.lower()).strip() + " "
    feats: dict[int, float] = {}
    for i in range(len(s) - 2):
        h = _stable_hash(s[i:i + 3]) % _N_FEATURES
        feats[h] = feats.get(h, 0.0) + 1.0
    return feats


def _norm(v: dict[int, float]) -> float:
    return math.sqrt(sum(x * x for x in v.values()))


class LabelClassifier:
    """Deterministic centroid classifier over taxonomy aliases.

    Replaces the reference's LLM tier (``normalize.py:164-223``) with a local
    model: per-canonical centroids of hashed character-trigram vectors, cosine
    scored. Built once (in the actor's ``__init__`` at runtime), never per row.
    """

    def __init__(self, taxonomy: dict | None = None, threshold: float = 0.82):
        import numpy as np

        self.threshold = threshold
        self.centroids: list[tuple[str, dict[int, float], float]] = []
        for items in (taxonomy or TAXONOMY).values():
            for canonical, aliases in items:
                acc: dict[int, float] = {}
                for text in [canonical] + aliases:
                    for k, v in _featurize_stable(text).items():
                        acc[k] = acc.get(k, 0.0) + v
                n = _norm(acc)
                if n > 0:
                    self.centroids.append((canonical, acc, n))
        # dense row-normalized centroid matrix for the batched tier: one
        # (labels × features) @ (features × canonicals) matmul classifies a
        # whole unmapped-label batch (the reference batched unmapped labels
        # into ONE LLM call, normalize.py:164-223 — same shape here)
        self._names = [c[0] for c in self.centroids]
        self._cmat = np.zeros((len(self.centroids), _N_FEATURES))
        for i, (_, cen, cn) in enumerate(self.centroids):
            for k, v in cen.items():
                self._cmat[i, k] = v / cn

    def classify_batch(self, labels: list[str]) -> list[tuple[str | None, float]]:
        """Vectorized classification of a label batch: hash-featurize each
        label (cheap), then a single matmul against the centroid matrix."""
        import numpy as np

        if not labels:
            return []
        fmat = np.zeros((len(labels), _N_FEATURES))
        for i, label in enumerate(labels):
            for k, v in _featurize_stable(label).items():
                fmat[i, k] = v
        norms = np.linalg.norm(fmat, axis=1)
        norms[norms == 0] = 1.0
        scores = (fmat / norms[:, None]) @ self._cmat.T
        best = scores.argmax(axis=1)
        out: list[tuple[str | None, float]] = []
        for i, bi in enumerate(best):
            s = float(scores[i, bi])
            if not fmat[i].any():
                out.append((None, 0.0))
            elif s >= self.threshold:
                out.append((self._names[bi], s))
            else:
                out.append((None, s))
        return out

    def classify(self, label: str) -> tuple[str | None, float]:
        return self.classify_batch([label])[0]


@dataclass
class MatchResult:
    canonical: str | None
    confidence: float
    method: str  # "exact" | "fuzzy" | "model" | "none"


class LabelNormalizer:
    """Tiered label→canonical matcher: exact → fuzzy → model.

    Reference: ``normalize.py:49-76`` (exact + SequenceMatcher fuzzy ≥0.85)
    with the LLM tier swapped for :class:`LabelClassifier`. Alias index and
    model are built ONCE here (the reference rebuilt the index per table,
    ``normalize.py:110`` — the actor-pool model fixes that for free).
    """

    def __init__(self, taxonomy: dict | None = None, use_model: bool = True):
        self.alias_index = build_alias_index(taxonomy)
        self.model = LabelClassifier(taxonomy) if use_model else None
        # per-instance memo: the same labels recur across every document of
        # a corpus, and the fuzzy tier's O(aliases) SequenceMatcher scan
        # dominated per-document profile time without it
        self._memo: dict[str, MatchResult] = {}

    def match(self, label: str) -> MatchResult:
        if not label or not label.strip():
            return MatchResult(None, 0.0, "none")
        key = label.strip().lower()
        cached = self._memo.get(key)
        if cached is not None:
            return cached
        result = self._match_uncached(key, label)
        if len(self._memo) < 100_000:  # bound actor memory
            self._memo[key] = result
        return result

    def _tier12(self, key: str) -> tuple[MatchResult | None, float]:
        """Exact + fuzzy tiers; ``(None, best_fuzzy_score)`` means the
        model tier must decide."""
        hit = self.alias_index.get(key)
        if hit:
            return MatchResult(hit, 1.0, "exact"), 1.0
        best_score, best = 0.0, None
        lk = len(key)
        for alias, canonical in self.alias_index.items():
            # sound prune: SequenceMatcher ratio ≤ 2·min(la,lb)/(la+lb),
            # so aliases too different in length can never reach the 0.85
            # fuzzy threshold — skip the quadratic matcher entirely
            la = len(alias)
            if 2.0 * min(lk, la) / max(1, lk + la) < 0.85:
                continue
            score = difflib.SequenceMatcher(None, key, alias).ratio()
            if score > best_score:
                best_score, best = score, canonical
        if best_score >= 0.85:
            return MatchResult(best, best_score, "fuzzy"), best_score
        return None, best_score

    def _match_uncached(self, key: str, label: str) -> MatchResult:
        res, best_score = self._tier12(key)
        if res is not None:
            return res
        if self.model is not None:
            name, score = self.model.classify(label)
            if name:
                return MatchResult(name, score, "model")
        return MatchResult(None, best_score, "none")

    def _memo_put(self, key: str, result: MatchResult) -> None:
        if len(self._memo) < 100_000:  # bound actor memory
            self._memo[key] = result

    # -- table-level annotation (reference: normalize_table_rows, :99-146) --

    def annotate_rows(self, rows: list[list[str]],
                      is_numeric) -> list[list[str]]:
        """Insert a canonical-name cell at index 1 of every row.

        Tracks the running current/non-current context from section-header
        rows to disambiguate labels that appear in both blocks; header rows
        (label ends with ':' or all value cells empty) get no canonical.

        Tier-3 is BATCHED: labels the exact/fuzzy tiers can't decide are
        collected across the whole table and classified in one vectorized
        ``classify_batch`` matmul — the reference batched its unmapped
        labels into one LLM call the same way (``normalize.py:164-223``).
        """
        out: list[list[str]] = []
        context = ""
        pending: dict[str, list[int]] = {}  # memo key -> out-row indexes
        pending_label: dict[str, str] = {}
        pending_fuzzy: dict[str, float] = {}
        for row in rows:
            first = (row[0] if row else "").strip()
            canonical = ""
            if first and not is_numeric(first):
                if _NONCUR_HDR.search(first):
                    context = "non-current"
                elif _CUR_HDR.search(first):
                    context = "current"
                values = row[1:]
                header_row = first.endswith(":") or (
                    bool(values) and all(not (c or "").strip() for c in values))
                if not header_row:
                    override = CONTEXT_OVERRIDES.get(first.lower(), {})
                    if context and context in override:
                        canonical = override[context]
                    else:
                        key = first.lower()
                        cached = self._memo.get(key)
                        if cached is not None:
                            canonical = cached.canonical or ""
                        else:
                            res, fuzzy = self._tier12(key)
                            if res is not None or self.model is None:
                                res = res or MatchResult(None, fuzzy, "none")
                                self._memo_put(key, res)
                                canonical = res.canonical or ""
                            else:
                                pending.setdefault(key, []).append(len(out))
                                pending_label[key] = first
                                pending_fuzzy[key] = fuzzy
            out.append([row[0] if row else "", canonical] + list(row[1:]))
        if pending:
            keys = list(pending)
            results = self.model.classify_batch(
                [pending_label[k] for k in keys])
            for key, (name, score) in zip(keys, results):
                res = (MatchResult(name, score, "model") if name
                       else MatchResult(None, pending_fuzzy[key], "none"))
                self._memo_put(key, res)
                for oi in pending[key]:
                    out[oi][1] = res.canonical or ""
        return out


def collect_unmapped(rows: list[list[str]]) -> list[str]:
    """Labels with no canonical after annotation (canonical at index 1)."""
    return [r[0] for r in rows
            if len(r) >= 2 and r[0].strip() and not (r[1] or "").strip()]
