"""Table-normalization kernels: sparse cell grids → clean markdown tables.

Rebuilds, from behavior, the reference's flagship table path
(``sec_parser/programmatic.py:280-1460``): row densification (currency-symbol
and split-negative merging), position-aware alignment for wide sparse tables,
single-column row splitting, header inference from surrounding text,
prose-table rejection, note-reference-column stripping, grand-total
truncation, orphaned-row recovery, multi-page fragment merging, taxonomy
annotation, and markdown rendering. Everything here is per-document and runs
inside the batched extraction stage; the only cross-document state is the
:class:`~pdf_parser_ray.kernels.taxonomy.LabelNormalizer` handed in by the
actor.
"""

from __future__ import annotations

import re
from collections import Counter

_CURRENCY = ("$", "€", "£")

_OPEN_NEG = re.compile(r"^\([\d,]+\.?\d*$")

_VALUE_TOKEN = re.compile(
    r"(?:\$\s*)?(?:\([\d,]+\.?\d*\)|[\d,]+\.?\d*|[—–])%?")

_DATE_FRAG = re.compile(
    r"(?:January|February|March|April|May|June|July|August|September|October|"
    r"November|December|Jan|Feb|Mar|Apr|Jun|Jul|Aug|Sep|Oct|Nov|Dec)"
    r"\s+\d{1,2},?\s+\d{4}", re.IGNORECASE)

_MONTH = (r"(?:January|February|March|April|May|June|July|August|"
          r"September|October|November|December)")

_NUM_TOKEN = re.compile(r"\([\d,]+(?:\.\d+)?\)|[\d,]+(?:\.\d+)?|—|–")

_PAGE_NUM = re.compile(r"^\s*\d{1,3}\s*$")
_FPAGE = re.compile(r"^\s*F-\d{1,3}\s*$")
_FOOTER = re.compile(
    r"^\s*.{3,50}\s*\|\s*\d{4}\s+Form\s+10-[KQ](?:/A)?\s*\|\s*\d{1,3}\s*$",
    re.IGNORECASE)
_SEE_NOTES = re.compile(
    r"^\s*(?:See|The)\s+(?:accompanying\s+)?(?:Notes?\s+to|The\s+Notes)",
    re.IGNORECASE)
_FORM_FOOTER = re.compile(
    r"^\s*\d{1,3}\s+.{3,40}\s+(?:Form\s+10-[KQ]|Annual\s+Report)", re.IGNORECASE)
_SCALE_LINE = re.compile(r"^\(?\s*in\s+(?:thousands|millions|billions)",
                         re.IGNORECASE)
_NOTE_REF = re.compile(r"^\d{1,2}(?:\s*,\s*\d{1,2})*$")
_GRAND_TOTAL = re.compile(r"^Total\s+liabilities\s+and\s+stockholders",
                          re.IGNORECASE)


def is_numeric_cell(cell: str) -> bool:
    """Numeric test including $, commas, parens, dashes (programmatic.py:778-788)."""
    s = cell.replace("$", "").replace(",", "").replace(" ", "").strip()
    if s in ("—", "-", "–", ""):
        return True
    s = s.strip("()")
    try:
        float(s)
        return True
    except ValueError:
        return False


def _join_label(parts: list[str]) -> str:
    """Join label fragments, detecting mid-word splits ("deposit-rela"+"ted")."""
    if not parts:
        return ""
    label = parts[0]
    for p in parts[1:]:
        if label and p and label[-1].isalpha() and p[0].islower():
            label += p
        else:
            label += " " + p
    return label


def densify_row(row: list[str]) -> list[str]:
    """Collapse a sparse cell row into dense cells (programmatic.py:280-375).

    ['Cash','','$','854','','','$','1,212',''] → ['Cash','$ 854','$ 1,212'];
    split parenthetical negatives ['(13,756',')'] re-attach; '%' glues to the
    previous value; leading text fragments merge into one label cell.
    """
    dense: list[str] = []
    i, n = 0, len(row)
    while i < n:
        cell = (row[i] or "").strip()
        if cell in _CURRENCY:
            j = i + 1
            while j < n and not (row[j] or "").strip():
                j += 1
            if j < n:
                nxt = (row[j] or "").strip()
                if nxt.startswith("(") and not nxt.endswith(")"):
                    k = j + 1
                    while k < n and not (row[k] or "").strip():
                        k += 1
                    if k < n and (row[k] or "").strip() == ")":
                        dense.append(f"{cell} {nxt})")
                        i = k + 1
                        continue
                dense.append(f"{cell} {nxt}")
                i = j + 1
            else:
                dense.append(cell)
                i += 1
        elif cell.startswith("(") and not cell.endswith(")") and _OPEN_NEG.match(cell):
            j = i + 1
            while j < n and not (row[j] or "").strip():
                j += 1
            if j < n and (row[j] or "").strip() == ")":
                dense.append(f"{cell})")
                i = j + 1
            else:
                dense.append(cell)
                i += 1
        elif cell == "%":
            if dense:
                dense[-1] += "%"
            i += 1
        elif cell == ")":
            i += 1
        elif cell:
            dense.append(cell)
            i += 1
        else:
            i += 1

    # merge consecutive leading text cells into a single label cell
    if len(dense) >= 3:
        first_num = next(
            (k for k, c in enumerate(dense)
             if is_numeric_cell(c) or c.startswith(_CURRENCY)), None)
        if first_num is not None and first_num >= 2:
            dense = [_join_label(dense[:first_num])] + dense[first_num:]
    return dense


def _densify_with_anchor(row: list[str]) -> list[tuple[int, str]]:
    """densify_row variant that keeps each merged value's raw cell position."""
    out: list[tuple[int, str]] = []
    i, n = 0, len(row)
    while i < n:
        cell = (row[i] or "").strip()
        if cell in _CURRENCY:
            anchor = i
            j = i + 1
            while j < n and not (row[j] or "").strip():
                j += 1
            if j < n:
                nxt = (row[j] or "").strip()
                if nxt.startswith("(") and not nxt.endswith(")"):
                    k = j + 1
                    while k < n and not (row[k] or "").strip():
                        k += 1
                    if k < n and (row[k] or "").strip() == ")":
                        out.append((anchor, f"{cell} {nxt})"))
                        i = k + 1
                        continue
                out.append((anchor, f"{cell} {nxt}"))
                i = j + 1
            else:
                out.append((anchor, cell))
                i += 1
        elif cell.startswith("(") and not cell.endswith(")") and _OPEN_NEG.match(cell):
            anchor = i
            j = i + 1
            while j < n and not (row[j] or "").strip():
                j += 1
            if j < n and (row[j] or "").strip() == ")":
                out.append((anchor, f"{cell})"))
                i = j + 1
            else:
                out.append((anchor, cell))
                i += 1
        elif cell == "%" and out:
            pos, val = out[-1]
            out[-1] = (pos, val + "%")
            i += 1
        elif cell == ")":
            i += 1
        elif cell:
            out.append((i, cell))
            i += 1
        else:
            i += 1
    return out


def densify_table(table: list[list[str]]) -> list[list[str]]:
    """Whole-table densify with positional alignment for wide sparse grids.

    Grids with <10 raw columns use plain :func:`densify_row`. Wider grids
    (stockholders'-equity style) build a column map from the 3 fullest rows'
    anchor positions, then place each row's merged values into the nearest
    logical column (adjacent-slot fallback on collisions) so sparse rows are
    not left-shifted (programmatic.py:378-518).
    """
    if not table:
        return []
    if max(len(r) for r in table) < 10:
        return [densify_row(r) for r in table]

    fills = sorted(((sum(1 for c in r if (c or "").strip()), ri)
                    for ri, r in enumerate(table)), reverse=True)
    anchors: set[int] = set()
    for _, ri in fills[:3]:
        for pos, _val in _densify_with_anchor(table[ri]):
            anchors.add(pos)
    col_map = sorted(anchors)
    if len(col_map) < 3:
        return [densify_row(r) for r in table]

    ncols = len(col_map)
    out: list[list[str]] = []
    for row in table:
        vals = _densify_with_anchor(row)
        if not vals:
            continue
        placed = [""] * ncols
        used: set[int] = set()
        for pos, val in vals:
            best = min(range(ncols), key=lambda c: abs(col_map[c] - pos))
            if best in used:
                for off in range(1, ncols):
                    if best + off < ncols and best + off not in used:
                        best += off
                        break
                    if best - off >= 0 and best - off not in used:
                        best -= off
                        break
            placed[best] = val
            used.add(best)
        out.append(placed)
    return out


def split_inline_row(text: str) -> list[str]:
    """'Revenue $ 130,497 $ 60,922' → ['Revenue','$ 130,497','$ 60,922'].

    Masks date fragments so "June 30, 2024" never parses as values, then
    walks contiguous trailing value tokens backwards (programmatic.py:540-591).
    """
    text = text.strip()
    if not text:
        return [text]
    date_spans = [(m.start(), m.end()) for m in _DATE_FRAG.finditer(text)]
    matches = [m for m in _VALUE_TOKEN.finditer(text)
               if not any(a <= m.start() < b for a, b in date_spans)]
    if not matches:
        return [text]
    spans: list[tuple[int, int, str]] = []
    for m in reversed(matches):
        bound = len(text) if not spans else spans[-1][0]
        if text[m.end():bound].strip():
            break
        spans.append((m.start(), m.end(), m.group().strip()))
    if not spans:
        return [text]
    spans.reverse()
    label = text[:spans[0][0]].strip()
    vals = [s[2] for s in spans]
    if not label:
        return vals if vals else [text]
    return [label] + vals


# ---------------------------------------------------------------------------
# Header inference
# ---------------------------------------------------------------------------

def detect_headers(text: str) -> tuple[list[str], list[str]]:
    """(period_headers, year_columns) from section text (programmatic.py:594-661)."""
    periods: list[str] = []
    years: list[str] = []
    for raw in text.splitlines():
        line = raw.strip()
        found = re.findall(
            r"((?:Three|Six|Nine|Twelve)\s+Months?\s+Ended\s+\w+\s+\d{1,2},?)",
            line, re.IGNORECASE)
        if found:
            periods.extend(found)
            continue
        if len(line) < 60:
            m = re.match(r"^((?:Year|Period)\s+Ended\s+\w+\s+\d{1,2},?)\s*$",
                         line, re.IGNORECASE)
            if m:
                periods.append(m.group(1))
                continue
        dates = re.findall(_MONTH + r"\s+\d{1,2},?", line)
        if dates and not periods and len(line) < 60:
            periods.extend(dates)
            continue
        if re.match(r"^(\d{4}(?:\s+\d{4})+)\s*$", line) and not years:
            years = line.split()
        elif not years:
            trail = re.search(r"(\d{4}(?:\s+\d{4})+)\s*$", line)
            if trail:
                cand = trail.group(1).split()
                if len(cand) >= 2 and all(1990 <= int(y) <= 2050 for y in cand):
                    years = cand
    return periods, years


def compose_header_rows(periods: list[str], years: list[str],
                        col_count: int) -> list[list[str]]:
    """Merge periods × years into 1-2 header rows (programmatic.py:664-710)."""
    rows: list[list[str]] = []
    data_cols = col_count - 1
    if periods and years and len(years) >= data_cols:
        ys = years[:data_cols]
        if len(periods) == 1:
            rows.append([""] + [f"{periods[0]} {y}" for y in ys])
        elif len(periods) == data_cols:
            rows.append([""] + [f"{p} {y}" for p, y in zip(periods, ys)])
        elif len(periods) * 2 == data_cols:
            rows.append([""] + [f"{periods[i // 2]} {y}" for i, y in enumerate(ys)])
        else:
            r1 = [""] + periods[:data_cols]
            r1 += [""] * (col_count - len(r1))
            rows.append(r1)
            rows.append([""] + ys)
    elif years and len(years) >= data_cols:
        rows.append([""] + years[:data_cols])
    elif periods:
        r = [""] + periods[:data_cols]
        r += [""] * (col_count - len(r))
        rows.append(r)
    return rows


# ---------------------------------------------------------------------------
# Table classification / repair
# ---------------------------------------------------------------------------

def is_prose_table(table: list[list[str]]) -> bool:
    """Reject grids that are really paragraph text (programmatic.py:713-775).

    Numeric-density heuristics: hard cutoff for >50-row <30%-numeric grids;
    soft path needs ≥6 columns, numeric ratio ≤0.15, short cells, and ≥40% of
    the first 10 rows joining into long word-rich lines.
    """
    if not table or len(table) < 2:
        return False
    cells = [(c or "").strip() for r in table for c in r if (c or "").strip()]
    if len(table) > 50 and cells:
        numeric = sum(1 for c in cells if is_numeric_cell(c) and len(c) < 30)
        if numeric / len(cells) < 0.30:
            return True
    if max(len(r) for r in table) < 6 or len(cells) < 5:
        return False
    numeric = sum(1 for c in cells if is_numeric_cell(c) and len(c) < 30)
    if numeric / len(cells) > 0.15:
        return False
    if sum(len(c) for c in cells) / len(cells) > 40:
        return False
    prose_rows = 0
    for r in table[:10]:
        joined = " ".join((c or "").strip() for c in r).strip()
        if len(joined) > 60 and len(joined.split()) > 8:
            prose_rows += 1
    sample = min(len(table), 10)
    return sample > 0 and prose_rows / sample >= 0.4


def strip_note_columns(tables: list[list[list[str]]]) -> list[list[list[str]]]:
    """Drop note-reference columns at index 1 (programmatic.py:832-923)."""
    out: list[list[list[str]]] = []
    for table in tables:
        if not table:
            out.append(table)
            continue
        data_rows = [r for r in table if len(r) >= 2]
        if not data_rows:
            out.append(table)
            continue
        lengths = Counter(len(r) for r in data_rows).most_common(2)
        if len(lengths) < 2:
            col_count = lengths[0][0]
            if col_count < 3:
                out.append(table)
                continue
            notes = [r[1].strip() for r in data_rows if len(r) > 1 and r[1].strip()]
            if notes:
                n_ref = sum(1 for c in notes if _NOTE_REF.match(c))
                financial = any(("$" in c or ("," in c and len(c) > 3))
                                and not _NOTE_REF.match(c) for c in notes)
                small = all(all(int(x.strip()) <= 30 for x in c.split(","))
                            for c in notes if _NOTE_REF.match(c))
                if n_ref >= 3 and not financial and small:
                    out.append([[c for i, c in enumerate(r) if i != 1]
                                for r in table])
                    continue
            out.append(table)
            continue
        short_len, long_len = sorted([lengths[0][0], lengths[1][0]])
        if long_len - short_len != 1:
            out.append(table)
            continue
        n_ref = with_data = 0
        for r in data_rows:
            if len(r) == long_len and len(r) >= 2 and r[1].strip():
                with_data += 1
                c = r[1].strip()
                if _NOTE_REF.match(c):
                    try:
                        if all(int(x.strip()) <= 30 for x in c.split(",")):
                            n_ref += 1
                    except ValueError:
                        pass
        if with_data >= 2 and n_ref / with_data >= 0.5:
            out.append([[r[0]] + r[2:] if len(r) == long_len else r for r in table])
        else:
            out.append(table)
    return out


def truncate_after_grand_total(tables: list[list[list[str]]]) -> list[list[list[str]]]:
    """Cut each table after the first valued grand-total row
    (programmatic.py:1160-1195) to drop VIE/footnote sub-tables."""
    out = []
    for table in tables:
        cut = None
        for ri, row in enumerate(table):
            parts: list[str] = []
            for c in row[:5]:
                cs = (c or "").strip()
                if cs and not re.match(r"^[\$€£]?\s*[\d,()\.\-—–%]+\$?$", cs):
                    parts.append(cs)
                elif cs:
                    break
            label = _join_label(parts)
            if _GRAND_TOTAL.match(label) and any(is_numeric_cell(c) for c in row[1:]):
                cut = ri
                break
        if cut is not None and cut < len(table) - 1:
            table = table[:cut + 1]
        out.append(table)
    return out


def recover_leading_rows(section_text: str,
                         first_table: list[list[str]]) -> list[list[str]]:
    """Find $-valued text lines that precede the first captured table row and
    return them as parsed rows to prepend (programmatic.py:926-1013)."""
    if not first_table or not section_text:
        return []
    first_label = next(((r[0] or "").strip() for r in first_table
                        if r and (r[0] or "").strip()), "")
    if not first_label:
        return []
    label_words = re.split(r"\s+\d", first_label)[0].strip().rstrip(":")
    lines = section_text.splitlines()
    start_idx = next((i for i, l in enumerate(lines)
                      if label_words and label_words.lower() in l.lower()), -1)
    if start_idx <= 0:
        return []
    dollar = re.compile(r"\$\s*[\d,]+")
    found: list[list[str]] = []
    i = 0
    while i < start_idx:
        line = lines[i].strip()
        if (not line or _SCALE_LINE.match(line)
                or (line.isupper() and len(line) < 80)
                or re.match(r"^(?:Years?\s+ended|" + _MONTH + r")\s", line,
                            re.IGNORECASE)
                or re.match(r"^\d{4}(?:\s+\d{4})*\s*$", line)):
            i += 1
            continue
        if dollar.search(line):
            parsed = split_inline_row(line)
            if len(parsed) >= 2:
                found.append(parsed)
            i += 1
            continue
        if i + 1 < start_idx and dollar.search(lines[i + 1].strip()):
            parsed = split_inline_row(line + " " + lines[i + 1].strip())
            if len(parsed) >= 2:
                found.append(parsed)
            i += 2
            continue
        i += 1
    return found


def clean_fallback_text(text: str) -> str:
    """Strip page numbers / footers / F-N refs / See-Notes boilerplate when a
    section falls back to raw text (programmatic.py:1139-1151)."""
    lines = [l for l in text.splitlines()
             if not (_PAGE_NUM.match(l) or _FOOTER.match(l) or _FPAGE.match(l)
                     or _SEE_NOTES.match(l) or _FORM_FOOTER.match(l))]
    return "\n".join(lines)


def render_table(header_rows: list[list[str]], data_rows: list[list[str]],
                 col_count: int, left_cols: int = 1) -> str:
    """Markdown render with :--- / ---: alignment (programmatic.py:791-829)."""
    col_count = max(col_count, 2)
    sep = [":---"] * left_cols + ["---:"] * (col_count - left_cols)
    lines: list[str] = []

    def fmt(row: list[str]) -> str:
        padded = (list(row) + [""] * col_count)[:col_count]
        padded = [re.sub(r"\s+", " ", c.replace("\n", " ")).strip() for c in padded]
        return "| " + " | ".join(padded) + " |"

    for h in header_rows:
        lines.append(fmt(h))
    if not header_rows:
        lines.append("| " + " | ".join([""] * col_count) + " |")
    lines.append("| " + " | ".join(sep) + " |")
    for r in data_rows:
        lines.append(fmt(r))
    return "\n".join(lines)


def parse_text_table(section_text: str, periods: list[str] | None = None,
                     years: list[str] | None = None) -> str | None:
    """Second-chance text→table parser for label-less grids
    (programmatic.py:1024-1120): dominant value-token count per line sets the
    column count; rightmost N tokens are values, prefix is the label."""
    lines = [l for l in section_text.splitlines() if not _PAGE_NUM.match(l)]
    counts: list[int] = []
    for line in lines:
        toks = _NUM_TOKEN.findall(line)
        counts.append(len([t for t in toks if len(t) > 2 or not t.isdigit()]))
    freq = Counter(c for c in counts if c > 0)
    if not freq:
        return None
    expected = freq.most_common(1)[0][0]
    if expected < 1 or sum(1 for c in counts if c >= expected) < 3:
        return None

    data_rows: list[list[str]] = []
    seen_data = False
    for line in lines:
        s = line.strip()
        if not s:
            continue
        ms = [m for m in _NUM_TOKEN.finditer(s)
              if len(m.group()) > 2 or not m.group().isdigit()]
        if len(ms) >= expected:
            seen_data = True
            vals = ms[-expected:]
            label = re.sub(r"\s+\d{1,2}\s*$", "", s[:vals[0].start()].rstrip())
            data_rows.append([label or "Total"] + [m.group() for m in vals])
        elif seen_data and s and len(s) < 80:
            data_rows.append([s] + [""] * expected)
    if len(data_rows) < 3:
        return None

    header_rows: list[list[str]] = []
    if years and len(years) == expected:
        header_rows = [[""] + years]
    elif periods:
        header_rows = [[""] + periods[:expected]]
    else:
        for line in section_text.splitlines()[:5]:
            ys = re.findall(r"\b(20\d{2})\b", line)
            if len(ys) == expected:
                header_rows = [[""] + ys]
                break
        if not header_rows:
            header_rows = [[""] + [f"Col {i + 1}" for i in range(expected)]]
    return render_table(header_rows, data_rows, expected + 1)


# ---------------------------------------------------------------------------
# Flagship composite
# ---------------------------------------------------------------------------

_DATE_ONLY = re.compile(
    r"^(?:" + _MONTH + r"\s+\d{1,2},?\s*(?:\d{4})?"
    r"|\d{4}(?:\s+\d{4})*"
    r"|(?:Three|Six|Nine|Twelve)\s+Months?\s+Ended\b.*"
    r"|(?:Year|Period)\s+Ended\b.*"
    r"|Fiscal\s+Year\s+\d{4})\s*$", re.IGNORECASE)


def normalize_tables(section_text: str, tables: list[list[list[str]]],
                     normalizer=None,
                     normalized_rows_out: list | None = None) -> str:
    """The flagship composite (reference tables_to_markdown,
    programmatic.py:1198-1460): filter prose grids → densify → split inline
    rows → recover leading rows → strip note columns → grand-total cut →
    mid-table header removal → label-coverage fallback → fragment merge →
    header inference → optional taxonomy annotation → markdown render.
    """
    if not tables:
        return clean_fallback_text(section_text)

    kept: list[list[list[str]]] = []
    for table in tables:
        if not table or is_prose_table(table):
            continue
        cells = [(c or "").strip() for r in table for c in r if (c or "").strip()]
        if cells:
            avg = sum(len(c) for c in cells) / len(cells)
            has_num = any(is_numeric_cell(c) for c in cells if len(c) < 30)
            if avg > 60 and not has_num and max(len(r) for r in table) <= 3:
                continue  # a paragraph, not a data grid
        kept.append(table)
    if not kept:
        return clean_fallback_text(section_text)

    dense: list[list[list[str]]] = []
    for table in kept:
        d = [r for r in densify_table(table) if any(c.strip() for c in r)]
        if d:
            dense.append(d)
    if not dense:
        return section_text

    for ti, table in enumerate(dense):
        if Counter(len(r) for r in table).most_common(1)[0][0] <= 1:
            dense[ti] = [split_inline_row(r[0] if r else "") for r in table]

    lead = recover_leading_rows(section_text, dense[0])
    if lead:
        dense[0] = lead + dense[0]

    dense = strip_note_columns(dense)
    dense = truncate_after_grand_total(dense)

    # drop mid-table scale indicators and repeated date-only header rows
    for ti, table in enumerate(dense):
        cleaned: list[list[str]] = []
        for ri, row in enumerate(table):
            filled = [c for c in row if c.strip()]
            if filled and all(not is_numeric_cell(c) for c in filled):
                if _SCALE_LINE.match(" ".join(filled)):
                    continue
                if ri > 0 and all(_DATE_ONLY.match(c.strip()) for c in filled):
                    continue
            cleaned.append(row)
        dense[ti] = cleaned

    # label coverage: mostly label-less grids fall back to cleaned text
    total = labeled = 0
    for table in dense:
        for row in table:
            if not row:
                continue
            total += 1
            for ci in range(min(2, len(row))):
                c = row[ci].strip()
                if (c and not is_numeric_cell(c) and len(c) > 3
                        and not re.match(r"^(?:Q\d|FY)?\s*\d{4}$", c)):
                    labeled += 1
                    break
    if total > 0 and labeled / total < 0.2:
        return clean_fallback_text(section_text)

    for table in dense:
        table[:] = [r for r in table
                    if not (len(r) == 1 and _PAGE_NUM.match(r[0]))]

    # merge multi-page fragments with equal dominant column counts
    merged: list[list[list[str]]] = []
    for table in dense:
        if not table:
            continue
        dom = Counter(len(r) for r in table).most_common(1)[0][0]
        if merged:
            prev_dom = Counter(len(r) for r in merged[-1]).most_common(1)[0][0]
            if dom == prev_dom:
                filled = [c for c in table[0] if c.strip()]
                is_title = len(filled) == 1 and not is_numeric_cell(filled[0])
                both_small = len(merged[-1]) < 15 and len(table) < 15
                if is_title or both_small:
                    merged.append(table)
                else:
                    start = 1 if table[0] == merged[-1][0] else 0
                    merged[-1].extend(table[start:])
                continue
        merged.append(table)

    periods, years = detect_headers(section_text)
    parts: list[str] = []
    for table in merged:
        if not table:
            continue
        col_count = Counter(len(r) for r in table).most_common(1)[0][0]
        for ri, row in enumerate(table):
            if len(row) < col_count and len(row) >= 2:
                if (not is_numeric_cell(row[0])
                        and any(is_numeric_cell(c) for c in row[1:])):
                    table[ri] = row + ["—"] * (col_count - len(row))

        first = table[0]
        filled = [c for c in first if c.strip()]
        own_header = len(filled) > 1 and all(
            not is_numeric_cell(c) for c in filled if c.strip())
        if own_header:
            header_rows = [first]
            data_rows = table[1:]
            if len(first) > col_count:
                col_count = len(first)
            if data_rows:
                second = data_rows[0]
                s_filled = [c for c in second if c.strip()]
                year_re = re.compile(r"^\d{4}$")
                if (s_filled
                        and all(not is_numeric_cell(c) or year_re.match(c.strip())
                                for c in s_filled)
                        and any(year_re.match(c.strip()) for c in s_filled)):
                    mh = []
                    for ci in range(max(len(first), len(second))):
                        c1 = first[ci].strip() if ci < len(first) else ""
                        c2 = second[ci].strip() if ci < len(second) else ""
                        mh.append(f"{c1} {c2}" if c1 and c2 else (c2 or c1))
                    header_rows = [mh]
                    data_rows = data_rows[1:]
        else:
            header_rows = compose_header_rows(periods, years, col_count)
            data_rows = table

        left_cols = 1
        if normalizer is not None:
            data_rows = normalizer.annotate_rows(data_rows, is_numeric_cell)
            if normalized_rows_out is not None:
                normalized_rows_out.extend(data_rows)
            col_count += 1
            left_cols = 2
            header_rows = [[h[0] if h else "", "Canonical"] + list(h[1:])
                           for h in header_rows]
        parts.append(render_table(header_rows, data_rows, col_count,
                                  left_cols=left_cols))
    return "\n\n".join(parts)
