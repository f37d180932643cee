"""Glyph-artifact repair kernels.

Rebuilds, from behavior, the reference's bold-overlay and rotated-header
repairs (``sec_parser/pdf_extract.py:36-206``): renderers that overlay a
glyph N times for bold produce text like ``YYYeeeaaarrr``; rotated column
headers extract as interleaved character streams like
``CPoremfemrreond SSttcoockk``. Both appear verbatim in our synthetic web
corpus payloads so the repair path is exercised end-to-end.

Pure scalar string functions — applied per line / per table cell inside the
batched page parser.
"""

from __future__ import annotations

FINANCIAL_TERMS = [
    "common", "stock", "preferred", "treasury", "retained", "earnings",
    "capital", "additional", "paid", "accumulated", "comprehensive",
    "total", "shares", "par", "value", "surplus",
]

COMMON_WORDS = set(FINANCIAL_TERMS) | {
    "in", "of", "the", "and", "for", "net", "loss", "income", "other",
    "equity", "debt", "assets", "cash", "from", "non", "per", "share",
    "changes", "statement", "balance", "sheet", "flow", "operating",
}


def _runs(line: str):
    """Yield (char, run_length) for consecutive identical characters."""
    i, n = 0, len(line)
    while i < n:
        j = i
        ch = line[i]
        while j < n and line[j] == ch:
            j += 1
        yield ch, j - i
        i = j


def _collapse_at(line: str, factor: int) -> str | None:
    """Collapse assuming every glyph repeats ``factor`` times.

    Accepts only when ≥70% of non-space character runs are an exact multiple
    of the factor and there are ≥3 such runs (same acceptance rule as the
    reference, pdf_extract.py:82-130).
    """
    out: list[str] = []
    groups = hits = 0
    for ch, rl in _runs(line):
        if ch == " ":
            out.append(" ")  # space runs are not reliable — keep one
            continue
        groups += 1
        if rl % factor == 0:
            hits += 1
            out.append(ch * (rl // factor))
        else:
            out.append(ch * rl)
    if groups >= 3 and hits / groups >= 0.7:
        return "".join(out)
    return None


def collapse_glyph_runs(line: str) -> str:
    """Undo bold-overlay glyph repetition on one line, e.g. YYYeeeaaarrr→Year.

    Tries repeat factors 2..15 and keeps the candidate with the best
    compression (reference: _try_collapse_line, pdf_extract.py:54-79).
    """
    if len(line) < 6:
        return line
    # cheap gate: factor-f collapse needs ≥70% of runs to be length-f
    # multiples, so ≥~half the characters sit in doubled positions. One
    # O(n) scan rejects normal text before the 14-factor attempt loop
    # (which dominated per-document profile time otherwise).
    doubled = sum(1 for i in range(len(line) - 1)
                  if line[i] == line[i + 1] and line[i] != " ")
    if doubled * 3 < len(line):
        return line
    best: tuple[float, str] | None = None
    for factor in range(2, 16):
        if len(line) < factor * 3:
            continue
        cand = _collapse_at(line, factor)
        if cand is not None:
            ratio = len(cand) / len(line)
            if best is None or ratio < best[0]:
                best = (ratio, cand)
    return best[1] if best else line


def collapse_glyph_runs_text(text: str) -> str:
    return "\n".join(collapse_glyph_runs(l) for l in text.split("\n"))


def deinterleave(text: str) -> str:
    """Un-interleave rotated-header character streams in a short cell.

    Splits the string into 2 or 3 round-robin streams (with and without
    spaces), scores candidates by total matched financial-term length, and
    accepts at score ≥ 10 (reference: _try_deinterleave,
    pdf_extract.py:148-206). Returns the original text when it already reads
    as words or nothing scores high enough.
    """
    s = text.strip()
    if len(s) < 10 or len(s) >= 60 or any(c.isdigit() for c in s):
        return text
    words = s.lower().split()
    if words:
        known = sum(1 for w in words if w in COMMON_WORDS)
        if known / len(words) >= 0.4:
            return text

    best_score, best = 0, None
    candidates = [s]
    squeezed = s.replace(" ", "")
    if squeezed != s:
        candidates.append(squeezed)
    for cand in candidates:
        for k in (2, 3):
            if len(cand) < 4 * k:
                continue
            streams = ["".join(cand[i::k]).strip() for i in range(k)]
            score = 0
            for part in streams:
                pl = part.lower()
                for term in FINANCIAL_TERMS:
                    if term in pl:
                        score += len(term)
            if score > best_score:
                best_score = score
                best = " / ".join(p for p in streams if p)
    if best_score >= 10 and best:
        return best
    return text


def repair_cell(cell: str) -> str:
    """Full cell repair chain: glyph-run collapse then de-interleave."""
    return deinterleave(collapse_glyph_runs(cell))
