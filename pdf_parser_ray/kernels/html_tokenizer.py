"""Batched DOM tokenizer: HTML payload → pages (text overlay + tables + blocks).

This is our engine's analogue of the reference's PDF reader
(``sec_parser/pdf_extract.py:217-250``): where the reference walks pdfplumber
pages calling ``extract_text()`` + ``extract_tables()``, we walk an HTML
payload with a single-pass regex tag scanner and produce, per page:

* ``text``  — a plain-text overlay in reading order (block-level elements on
  their own lines; table rows rendered as space-joined lines, mirroring how a
  PDF text layer duplicates table content — downstream kernels rely on that
  duplication exactly as the reference does);
* ``tables`` — list of ragged ``list[list[str]]`` cell grids (``<tr>``/``<td>``);
* ``blocks`` — per text block: (tag, text, link_char_count, boiler_depth)
  feeding the trafilatura-style boilerplate classifier (text density +
  link density + tag-path features) used for generic web pages.

Pages are delimited by elements carrying ``class="page"`` (or an
``<hr class="pagebreak">``); a document without page markers is one page.
No external HTML library — the scanner is ~100 lines and vectorizes by
being called per row inside ``map_batches``.
"""

from __future__ import annotations

import html as _html
import re
from dataclasses import dataclass, field

from .textfix import collapse_glyph_runs, repair_cell

_TAG_RE = re.compile(
    r"<(/?)([a-zA-Z][a-zA-Z0-9]*)((?:[^>\"']|\"[^\"]*\"|'[^']*')*?)(/?)>|<!--.*?-->",
    re.DOTALL,
)
_CLASS_RE = re.compile(r"""class\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]+))""")

# Elements whose text content is never page content.
_SKIP_CONTENT = {"script", "style", "noscript", "template", "svg"}
# Block-level elements: entering/leaving one breaks the current text line.
_BLOCK = {"p", "div", "section", "article", "main", "header", "footer", "nav",
          "aside", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
          "blockquote", "pre", "figure", "figcaption", "br", "hr", "tr",
          "table", "title"}
# Structural boilerplate containers (tag-path feature).
_BOILER_TAGS = {"nav", "footer", "header", "aside"}


@dataclass
class Block:
    tag: str
    text: str
    link_chars: int = 0
    boiler_depth: int = 0  # >0 when inside nav/footer/header/aside


@dataclass
class Page:
    number: int
    text: str = ""
    tables: list[list[list[str]]] = field(default_factory=list)
    blocks: list[Block] = field(default_factory=list)


def _attr_class(attrs: str) -> str:
    m = _CLASS_RE.search(attrs or "")
    if not m:
        return ""
    return (m.group(2) or m.group(3) or m.group(4) or "")


def tokenize_pages(payload: bytes | str, repair: bool = True) -> list[Page]:
    """Scan an HTML payload into pages of (text overlay, tables, blocks).

    When ``repair`` is set, the glyph-run collapse runs on every text line and
    the full repair chain (collapse + de-interleave) on every table cell —
    the same placement as the reference reader (pdf_extract.py:228-247).
    """
    if isinstance(payload, bytes):
        doc = payload.decode("utf-8", errors="replace")
    else:
        doc = payload

    pages: list[Page] = [Page(number=1)]
    cur = pages[0]

    # scanner state
    skip_depth = 0
    boiler_depth = 0
    in_table = 0
    table_rows: list[list[str]] = []
    row_cells: list[str] | None = None
    cell_parts: list[str] = []
    line_parts: list[str] = []      # current text line (outside tables)
    link_depth = 0
    line_link_chars = 0
    cur_tag = "p"

    def flush_line() -> None:
        nonlocal line_parts, line_link_chars
        text = re.sub(r"[ \t]+", " ", "".join(line_parts)).strip()
        if text:
            if repair:
                text = collapse_glyph_runs(text)
            cur.blocks.append(Block(tag=cur_tag, text=text,
                                    link_chars=line_link_chars,
                                    boiler_depth=boiler_depth))
        line_parts = []
        line_link_chars = 0

    def flush_cell() -> None:
        nonlocal cell_parts, row_cells
        if row_cells is not None:
            cell = re.sub(r"\s+", " ", "".join(cell_parts)).strip()
            row_cells.append(repair_cell(cell) if repair else cell)
        cell_parts = []

    def flush_row() -> None:
        nonlocal row_cells
        if row_cells is not None:
            flush_cell()
            table_rows.append(row_cells)
            # mirror a PDF text layer: the row also appears as a text line
            joined = " ".join(c for c in row_cells if c).strip()
            if joined:
                cur.blocks.append(Block(tag="tr", text=joined,
                                        boiler_depth=boiler_depth))
        row_cells = None

    def new_page() -> None:
        nonlocal cur
        flush_line()
        cur = Page(number=len(pages) + 1)
        pages.append(cur)

    pos = 0
    for m in _TAG_RE.finditer(doc):
        # text run before this tag
        if m.start() > pos and skip_depth == 0:
            chunk = _html.unescape(doc[pos:m.start()])
            if in_table and row_cells is not None:
                cell_parts.append(chunk)
            else:
                # normalize intra-block newlines to spaces
                chunk = chunk.replace("\n", " ")
                if chunk:
                    line_parts.append(chunk)
                    if link_depth:
                        line_link_chars += len(chunk.strip())
        pos = m.end()
        if m.group(2) is None:
            continue  # comment
        closing, tag = m.group(1) == "/", m.group(2).lower()
        attrs, selfclose = m.group(3) or "", m.group(4) == "/"

        if tag in _SKIP_CONTENT:
            if not selfclose:
                skip_depth += 1 if not closing else -1
                skip_depth = max(skip_depth, 0)
            continue
        if skip_depth:
            continue

        if not closing:
            cls = _attr_class(attrs)
            if (tag == "hr" and "pagebreak" in cls) or (
                    tag in ("div", "section") and "page" in cls.split()):
                new_page()
                if tag == "hr":
                    continue
            if tag == "a":
                link_depth += 1
            if tag in _BOILER_TAGS:
                boiler_depth += 1
            if tag == "table":
                flush_line()
                in_table += 1
                table_rows = []
            elif in_table and tag == "tr":
                flush_row()
                row_cells = []
            elif in_table and tag in ("td", "th"):
                flush_cell()
            elif tag in _BLOCK:
                flush_line()
                cur_tag = tag
        else:
            if tag == "a":
                link_depth = max(0, link_depth - 1)
            # flush pending text BEFORE leaving a boilerplate container —
            # otherwise the block is recorded at the outer depth and the
            # classifier sees footer/nav text as content
            if tag in _BOILER_TAGS:
                flush_line()
                boiler_depth = max(0, boiler_depth - 1)
            if tag == "table":
                flush_row()
                if in_table:
                    in_table -= 1
                    if table_rows:
                        cur.tables.append(table_rows)
                    table_rows = []
            elif in_table and tag == "tr":
                flush_row()
            elif tag in _BLOCK:
                flush_line()
                cur_tag = "p"

    if pos < len(doc) and skip_depth == 0:
        line_parts.append(_html.unescape(doc[pos:]).replace("\n", " "))
    flush_line()

    # drop a leading empty page created by an immediate page marker
    pages = [p for p in pages if p.blocks or p.tables] or [Page(number=1)]
    for i, p in enumerate(pages):
        p.number = i + 1
        p.text = "\n".join(b.text for b in p.blocks)
    return pages


# ---------------------------------------------------------------------------
# Boilerplate classifier for generic web pages (trafilatura-style heuristics)
# ---------------------------------------------------------------------------

def extract_main_text(pages: list[Page]) -> str:
    """Main-content extraction for non-filing web pages.

    Block-level filtering on three features (cheap, deterministic):
    * tag path — blocks inside ``nav/footer/header/aside`` are boilerplate;
    * link density — blocks whose text is mostly anchor text (>0.5) are
      navigation / related-links chrome;
    * text density — very short all-link or punctuation-only fragments drop.

    This generalizes the reference's numeric-density prose-table filter
    (``programmatic.py:713-775``) to the web-page domain, per the north-star
    architecture (DOM tokenizer + text/link-density boilerplate classifier).
    """
    kept: list[str] = []
    for page in pages:
        for b in page.blocks:
            if b.boiler_depth > 0:
                continue
            n = len(b.text)
            if n == 0:
                continue
            link_density = b.link_chars / n
            if link_density > 0.5:
                continue
            if n < 25 and link_density > 0.2:
                continue
            words = b.text.split()
            if b.tag not in ("h1", "h2", "h3", "tr") and len(words) < 3:
                continue
            kept.append(b.text)
    # collapse repeated running lines (same ≥3-occurrence rule the reference
    # uses for page headers, programmatic.py:1529-1537)
    from collections import Counter
    counts = Counter(kept)
    out = [l for l in kept if not (counts[l] >= 3 and len(l) < 120)]
    return "\n".join(out)


def detect_scanned(pages: list[Page], threshold: float = 0.8,
                   min_chars: int = 50) -> bool:
    """True when >threshold of pages carry <min_chars of text.

    The analogue of the image-only-PDF guard (pdf_extract.py:253-266); rather
    than raising, callers route the row to a ``skipped`` status (poison-pill
    isolation — one bad document must not kill a partition).
    """
    if not pages:
        return False
    sparse = sum(1 for p in pages if len(p.text.strip()) < min_chars)
    return sparse / len(pages) > threshold
