"""Deterministic synthetic corpus in the input_hint schema.

Generates Common-Crawl-style rows ``(url, warc_ts, html, text, lang)`` whose
HTML payloads embed every artifact the reference extractor handles (see
FIXTURES.md F1/F2/F4): SEC cover pages, TOC pages with dotted leaders,
sparse financial tables with isolated ``$`` cells and split parenthetical
negatives, note-reference columns, wide sparse equity grids, glyph-tripled
bold headings, interleaved rotated headers, running footers / page numbers,
single-column concatenated rows, IFRS statements, generic boilerplate-heavy
web pages, near-empty "scanned" documents, and exact-duplicate pages.

Everything is seeded — same (seed, n_docs) → byte-identical corpus — and a
structured-facts side table (the local EDGAR stand-in) is derived from the
same values embedded in the tables, with deliberate discrepancies on a
fixed fraction of filings to exercise cross-validation severities.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

_COMPANY_WORDS = ["Acme", "Borealis", "Cascade", "Deltaic", "Ember", "Fathom",
                  "Granite", "Harbor", "Ionic", "Juniper", "Krypton", "Lumen",
                  "Meridian", "Nimbus", "Orchard", "Pinnacle", "Quartz",
                  "Redwood", "Summit", "Tundra"]
_COMPANY_SUFFIX = ["Corp", "Inc.", "Holdings", "Industries", "Systems",
                   "Technologies", "Group"]
_EXCHANGES = ["New York Stock Exchange", "NASDAQ Stock Market"]
_STATES = ["Delaware", "Nevada", "California", "New York", "Washington"]

_REV_ALIASES = ["Net revenues", "Total revenues", "Net sales", "Revenues"]
_NI_POS = ["Net income"]
_NI_NEG = ["Net loss"]

_BASE_TS = datetime(2025, 3, 1, 12, 0, 0)

_LOREM = ("the company continues to invest in research and development across "
          "its principal markets while managing supply chain exposure and "
          "foreign currency risk through a combination of hedging programs "
          "and long term supplier agreements").split()


def _sentences(rng: random.Random, n: int, lead_upper: bool = True) -> list[str]:
    out = []
    for _ in range(n):
        k = rng.randint(8, 16)
        words = [rng.choice(_LOREM) for _ in range(k)]
        s = " ".join(words)
        if lead_upper:
            s = s[0].upper() + s[1:]
        out.append(s + ".")
    return out


def _fmt(v: int) -> str:
    return f"{abs(v):,}"


def _money_cells(v: int, with_dollar: bool) -> list[str]:
    """Sparse-grid cells for one value: isolated $ cell, split negatives."""
    cells: list[str] = []
    if with_dollar:
        cells.append("$")
        cells.append("")
    if v < 0:
        cells.append(f"({_fmt(v)}")
        cells.append(")")
    else:
        cells.append(_fmt(v))
        cells.append("")
    return cells


def _table_html(rows: list[list[str]], cls: str = "") -> str:
    out = [f'<table class="{cls}">' if cls else "<table>"]
    for r in rows:
        out.append("<tr>" + "".join(f"<td>{c}</td>" for c in r) + "</tr>")
    out.append("</table>")
    return "\n".join(out)


def _page(body: str) -> str:
    return f'<section class="page">\n{body}\n</section>'


def _p(*lines: str) -> str:
    return "\n".join(f"<p>{l}</p>" for l in lines)


def _triple(s: str) -> str:
    """Bold-overlay artifact: every character tripled (YYYeeeaaarrr)."""
    return "".join(ch * 3 for ch in s)


def _interleave(a: str, b: str) -> str:
    """Rotated-header artifact: round-robin interleave of two words."""
    a2, b2 = a.replace(" ", ""), b.replace(" ", "")
    n = max(len(a2), len(b2))
    a2, b2 = a2.ljust(n), b2.ljust(n)
    return "".join(a2[i] + b2[i] for i in range(n)).strip()


# ---------------------------------------------------------------------------
# Filing value model (kept consistent so validation checks PASS by design)
# ---------------------------------------------------------------------------

def _filing_values(rng: random.Random) -> dict[str, tuple[int, int]]:
    vals: dict[str, tuple[int, int]] = {}

    def two(lo: int, hi: int) -> tuple[int, int]:
        cur = rng.randint(lo, hi)
        prior = int(cur * rng.uniform(0.7, 1.1))
        return cur, prior

    rev = two(50_000, 900_000)
    cor = tuple(int(r * rng.uniform(0.4, 0.7)) for r in rev)
    gp = tuple(r - c for r, c in zip(rev, cor))
    rd = tuple(int(r * rng.uniform(0.05, 0.15)) for r in rev)
    sga = tuple(int(r * rng.uniform(0.1, 0.2)) for r in rev)
    opex = tuple(a + b for a, b in zip(rd, sga))
    opinc = tuple(g - o for g, o in zip(gp, opex))
    other = two(-5_000, 5_000)
    pretax = tuple(o + x for o, x in zip(opinc, other))
    tax = tuple(int(p * 0.21) if p > 0 else 0 for p in pretax)
    ni = tuple(p - t for p, t in zip(pretax, tax))

    vals.update(revenue=rev, cost=cor, gross=gp, rnd=rd, sga=sga, opex=opex,
                opinc=opinc, other=other, pretax=pretax, tax=tax, ni=ni)

    cash = two(20_000, 200_000)
    mks_cur = two(5_000, 60_000)
    ar = two(10_000, 90_000)
    inv = two(5_000, 50_000)
    tca = tuple(sum(x) for x in zip(cash, mks_cur, ar, inv))
    mks_lt = two(5_000, 40_000)
    ppe = two(30_000, 250_000)
    gw = two(10_000, 80_000)
    ta = tuple(sum(x) for x in zip(tca, mks_lt, ppe, gw))
    ap = two(8_000, 60_000)
    accrued = two(5_000, 40_000)
    tcl = tuple(a + b for a, b in zip(ap, accrued))
    ltd = two(20_000, 150_000)
    tl = tuple(a + b for a, b in zip(tcl, ltd))
    cs = two(1_000, 5_000)
    te = tuple(a - l for a, l in zip(ta, tl))
    re_ = tuple(e - c for e, c in zip(te, cs))
    tle = ta
    vals.update(cash=cash, mks_cur=mks_cur, ar=ar, inv=inv, tca=tca,
                mks_lt=mks_lt, ppe=ppe, gw=gw, ta=ta, ap=ap, accrued=accrued,
                tcl=tcl, ltd=ltd, tl=tl, cs=cs, re_=re_, te=te, tle=tle)

    dna = tuple(int(p * 0.1) for p in vals["ppe"])
    sbc = two(2_000, 20_000)
    wc = two(-15_000, 15_000)
    cfo = tuple(sum(x) for x in zip(ni, dna, sbc, wc))
    capex = tuple(-int(p * 0.12) for p in vals["ppe"])
    cfi = capex
    bb = two(-30_000, -5_000)
    div = two(-20_000, -4_000)
    cff = tuple(a + b for a, b in zip(bb, div))
    delta = tuple(sum(x) for x in zip(cfo, cfi, cff))
    begin = tuple(c - d for c, d in zip(cash, delta))
    vals.update(dna=dna, sbc=sbc, wc=wc, cfo=cfo, capex=capex, cfi=cfi,
                bb=bb, div=div, cff=cff, delta=delta, begin=begin, end=cash)
    return vals


def _sparse_rows(items: list[tuple[str, tuple[int, int] | None]],
                 note_col: bool, rng: random.Random) -> list[list[str]]:
    """Render (label, values) pairs as a sparse cell grid; None values make a
    header row. The first data row carries $ cells; a fraction of rows get a
    note-reference cell at index 1."""
    rows: list[list[str]] = []
    first_data = True
    for label, vv in items:
        if vv is None:
            rows.append([label, "", "", "", "", "", "", ""])
            continue
        row = [label]
        if note_col:
            row.append(str(rng.randint(1, 20)) if rng.random() < 0.7 else "")
        for v in vv:
            row.extend(_money_cells(v, with_dollar=first_data))
        first_data = False
        rows.append(row)
    return rows


def _statement_page(heading: str, period_line: str, year_line: str,
                    rows: list[list[str]], footer: str,
                    scale_line: str = "(in thousands, except per share data)",
                    extra_before_table: str = "") -> str:
    body = [
        _p(heading),
        _p(scale_line),
        _p(period_line),
        _p(year_line),
    ]
    if extra_before_table:
        body.append(extra_before_table)
    body.append(_table_html(rows))
    body.append(_p("See accompanying Notes to Financial Statements"))
    body.append(_p(footer))
    return _page("\n".join(body))


def build_sec_filing(rng: random.Random, company: dict, form: str,
                     period: str, period_iso: str, year: int,
                     quirks: dict) -> tuple[str, dict]:
    """One SEC filing document. Returns (html, facts_values)."""
    v = _filing_values(rng)
    yr_line = f"{year} {year - 1}"
    footer = f"{company['name']} | {year} Form {form} | "
    qtr = "quarterly" if form == "10-Q" else "annual"

    pages: list[str] = []

    # -- cover page --
    name_line = company["name"]
    if quirks.get("bold_cover"):
        name_line = _triple(name_line)
    cover = [
        _p("UNITED STATES SECURITIES AND EXCHANGE COMMISSION",
           "Washington, D.C. 20549",
           f"FORM {form}",
           f"For the {qtr} period ended {period}",
           f"Commission File Number: {company['file_no']}",
           name_line,
           "(Exact name of registrant as specified in its charter)",
           company["state"],
           "(State or other jurisdiction of incorporation or organization)",
           company["address"],
           "(Address of principal executive offices)",
           f"Registrant's telephone number: {company['phone']}",
           f"Central Index Key: {company['cik']}",
           "Title of Each Class Trading Symbol Name of Each Exchange",
           f"Common Stock, $0.001 par value {company['ticker']} {company['exchange']}",
           f"{company['shares']} shares of common stock outstanding as of {period}"),
    ]
    pages.append(_page("\n".join(cover)))

    # -- TOC page --
    toc = _p("TABLE OF CONTENTS",
             "Item 1. Financial Statements ............ 3",
             "Consolidated Balance Sheets ............ 4",
             "Consolidated Statements of Cash Flows ............ 5",
             "Item 2. Management's Discussion and Analysis ............ 7",
             "Item 1A. Risk Factors ............ 9",
             "Item 6. Exhibits ............ 10")
    pages.append(_page(toc))

    rev_alias = quirks["rev_alias"]
    ni_label = _NI_NEG[0] if v["ni"][0] < 0 else _NI_POS[0]
    period_line = (f"Three Months Ended {period.rsplit(',', 1)[0]},"
                   if form == "10-Q" else f"Year Ended {period.rsplit(',', 1)[0]},")

    # -- income statement --
    is_items = [
        (rev_alias, v["revenue"]),
        ("Cost of sales", v["cost"]),
        ("Gross profit", v["gross"]),
        ("Operating expenses:", None),
        ("Research and development", v["rnd"]),
        ("Selling, general and administrative", v["sga"]),
        ("Total operating expenses", v["opex"]),
        ("Operating income", v["opinc"]),
        ("Other income (expense), net", v["other"]),
        ("Income before income taxes", v["pretax"]),
        ("Provision for income taxes", v["tax"]),
        (ni_label, v["ni"]),
    ]
    pages.append(_statement_page(
        "CONDENSED CONSOLIDATED STATEMENTS OF OPERATIONS",
        period_line, yr_line,
        _sparse_rows(is_items, note_col=False, rng=rng), footer + "3"))

    # -- balance sheet (note-ref column on some filings) --
    bs_items = [
        ("Current assets:", None),
        ("Cash and cash equivalents", v["cash"]),
        ("Marketable securities", v["mks_cur"]),
        ("Accounts receivable, net", v["ar"]),
        ("Inventories", v["inv"]),
        ("Total current assets", v["tca"]),
        ("Non-current assets:", None),
        ("Marketable securities", v["mks_lt"]),
        ("Property, plant and equipment, net", v["ppe"]),
        ("Goodwill", v["gw"]),
        ("Total assets", v["ta"]),
        ("Current liabilities:", None),
        ("Accounts payable", v["ap"]),
        ("Accrued liabilities", v["accrued"]),
        ("Total current liabilities", v["tcl"]),
        ("Long-term debt", v["ltd"]),
        ("Total liabilities", v["tl"]),
        ("Common stock", v["cs"]),
        ("Retained earnings", v["re_"]),
        ("Total stockholders' equity", v["te"]),
        ("Total liabilities and stockholders' equity", v["tle"]),
    ]
    pages.append(_statement_page(
        "CONDENSED CONSOLIDATED BALANCE SHEETS",
        f"{period.rsplit(',', 1)[0]},", yr_line,
        _sparse_rows(bs_items, note_col=quirks.get("note_col", False), rng=rng),
        footer + "4",
        scale_line="(in thousands)"))

    # -- cash flow; beginning-cash row lives only in the text overlay on some
    #    filings (orphaned-row recovery path) --
    cf_items = [
        ("Operating activities:", None),
        ("Net income (loss)", v["ni"]),
        ("Depreciation and amortization", v["dna"]),
        ("Stock-based compensation", v["sbc"]),
        ("Changes in operating assets and liabilities", v["wc"]),
        ("Net cash provided by operating activities", v["cfo"]),
        ("Investing activities:", None),
        ("Purchases of property and equipment", v["capex"]),
        ("Net cash used in investing activities", v["cfi"]),
        ("Financing activities:", None),
        ("Repurchases of common stock", v["bb"]),
        ("Dividends paid", v["div"]),
        ("Net cash used in financing activities", v["cff"]),
        ("Net increase (decrease) in cash", v["delta"]),
        ("Cash and cash equivalents, end of period", v["end"]),
    ]
    orphan = ""
    if quirks.get("orphan_row"):
        orphan = _p("Cash, cash equivalents, beginning balances "
                    f"$ {_fmt(v['begin'][0])} $ {_fmt(v['begin'][1])}")
    else:
        cf_items.insert(-1, ("Cash and cash equivalents, beginning of period",
                             v["begin"]))
    pages.append(_statement_page(
        "CONDENSED CONSOLIDATED STATEMENTS OF CASH FLOWS",
        period_line, yr_line,
        _sparse_rows(cf_items, note_col=False, rng=rng), footer + "5",
        scale_line="(in thousands)", extra_before_table=orphan))

    # -- stockholders' equity: wide sparse grid with interleave artifact --
    cs_h = "Common Stock" if not quirks.get("interleaved") else \
        _interleave("Common", "Stock")
    eq_rows: list[list[str]] = [
        ["", cs_h, "", "Additional Paid-In Capital", "", "Retained Earnings",
         "", "", "Total", ""],
    ]
    bal = [v["cs"][1], 0, v["re_"][1], 0, v["te"][1]]
    eq_rows.append(["Balance, beginning of period",
                    _fmt(bal[0]), "", "—", "", _fmt(bal[2]), "", "",
                    _fmt(bal[4]), ""])
    eq_rows.append(["Stock-based compensation", "", "", _fmt(v["sbc"][0]),
                    "", "", "", "", _fmt(v["sbc"][0]), ""])
    eq_rows.append(["Net income", "", "", "", "", _fmt(v["ni"][0]), "", "",
                    _fmt(v["ni"][0]), ""])
    eq_rows.append(["Balance, end of period", _fmt(v["cs"][0]), "", "—", "",
                    _fmt(v["re_"][0]), "", "", _fmt(v["te"][0]), ""])
    pages.append(_page("\n".join([
        _p("CONDENSED CONSOLIDATED STATEMENTS OF STOCKHOLDERS' EQUITY"),
        _p("(in thousands)"),
        _table_html(eq_rows),
        _p(footer + "6"),
    ])))

    # -- notes --
    notes_body = [_p("NOTES TO FINANCIAL STATEMENTS"),
                  _p("Note 1 — Summary of Significant Accounting Policies")]
    notes_body += [_p(s) for s in _sentences(rng, 6)]
    notes_body.append(_p("Note 2 — Revenue Recognition"))
    notes_body += [_p(s) for s in _sentences(rng, 5)]
    notes_body.append(_p("14"))
    notes_body.append(_p(footer + "7"))
    pages.append(_page("\n".join(notes_body)))

    # -- MDA with mid-sentence break + repeated header --
    mda = [_p("Item 2. MANAGEMENT'S DISCUSSION AND ANALYSIS OF FINANCIAL "
              "CONDITION AND RESULTS OF OPERATIONS"),
           _p("Overview")]
    mda += [_p(s) for s in _sentences(rng, 4)]
    mda.append(_p("Results of Operations"))
    mda.append(_p("Revenue increased primarily due to higher volumes"))
    mda.append(_p("and improved pricing across all segments."))
    mda.append(_p("8"))
    mda.append(_p(footer + "8"))
    pages.append(_page("\n".join(mda)))

    # -- risk factors + legal + controls --
    rf = [_p("Item 1A. RISK FACTORS")]
    rf += [_p(s) for s in _sentences(rng, 5)]
    pages.append(_page("\n".join(rf)))
    misc = [_p("Item 3. LEGAL PROCEEDINGS")]
    misc += [_p(s) for s in _sentences(rng, 2)]
    misc.append(_p("Item 4. CONTROLS AND PROCEDURES"))
    misc += [_p(s) for s in _sentences(rng, 2)]
    pages.append(_page("\n".join(misc)))

    # -- exhibits + signatures --
    ex = _p("Item 6. EXHIBITS",
            "31.1 Certification of Principal Executive Officer",
            "31.2 Certification of Principal Financial Officer",
            "32.1 Section 1350 Certification",
            "101.INS Inline XBRL Instance Document")
    pages.append(_page(ex))
    pages.append(_page(_p("SIGNATURES",
                          "Pursuant to the requirements of the Securities "
                          "Exchange Act of 1934, the registrant has duly "
                          "caused this report to be signed on its behalf.")))

    html = "<html><body>\n" + "\n".join(pages) + "\n</body></html>"
    return html, v


def build_ifrs_report(rng: random.Random, company: dict, year: int) -> str:
    v = _filing_values(rng)
    yr_line = f"{year} {year - 1}"
    pages = [
        _page(_p(f"{company['name']} Annual Report {year}",
                 "Prepared in accordance with IFRS as adopted by the EU",
                 f"CVR no: {rng.randint(10_000_000, 99_999_999)}",
                 "All amounts in EUR'000 unless otherwise stated")),
        _page("\n".join([
            _p("Consolidated Statement of Profit or Loss"),
            _p("EUR'000"),
            _p(yr_line),
            _table_html(_sparse_rows([
                ("Revenue", v["revenue"]),
                ("Cost of sales", v["cost"]),
                ("Gross profit", v["gross"]),
                ("Operating profit", v["opinc"]),
                ("Profit for the year", v["ni"]),
            ], note_col=True, rng=rng)),
        ])),
        _page("\n".join([
            _p("Consolidated Statement of Financial Position"),
            _p("EUR'000"),
            _p(yr_line),
            _table_html(_sparse_rows([
                ("Total assets", v["ta"]),
                ("Total liabilities", v["tl"]),
                ("Total equity", v["te"]),
            ], note_col=False, rng=rng)),
        ])),
        _page("\n".join([
            _p("Consolidated Statement of Changes in Equity"),
            _table_html(_sparse_rows([
                ("Balance at 1 January", v["te"]),
                ("Profit for the year", v["ni"]),
            ], note_col=False, rng=rng)),
        ])),
        _page("\n".join([
            _p("Consolidated Statement of Cash Flows"),
            _p(yr_line),
            _table_html(_sparse_rows([
                ("Cash flows from operating activities", v["cfo"]),
                ("Cash flows from investing activities", v["cfi"]),
                ("Cash flows from financing activities", v["cff"]),
            ], note_col=False, rng=rng)),
        ])),
        _page("\n".join(
            [_p("Notes to the Consolidated Financial Statements")] +
            [_p(s) for s in _sentences(rng, 8)])),
    ]
    return "<html><body>\n" + "\n".join(pages) + "\n</body></html>"


def build_web_page(rng: random.Random, topic: str, idx: int,
                   body_text: str | None = None) -> str:
    nav = ("<nav><ul>" + "".join(
        f'<li><a href="/{topic}/{i}">{topic} story {i}</a></li>'
        for i in range(8)) + "</ul></nav>")
    header = f'<header><a href="/">Example {topic.title()} Daily</a></header>'
    if body_text is None:
        paras = [" ".join(s for s in _sentences(rng, 3))
                 for _ in range(rng.randint(3, 7))]
    else:
        paras = [body_text[i:i + 400] for i in range(0, len(body_text), 400)][:8]
    article = ("<article><h1>" + f"{topic.title()} report {idx}" + "</h1>" +
               "".join(f"<p>{p}</p>" for p in paras) + "</article>")
    related = ('<aside><a href="/a">related</a> <a href="/b">more</a> '
               '<a href="/c">links</a></aside>')
    footer = ('<footer><a href="/about">About</a> <a href="/tos">Terms</a> '
              "© Example Media</footer>")
    return ("<html><body>" + header + nav + article + related + footer +
            "</body></html>")


def build_scanned(rng: random.Random) -> str:
    pages = [_page(_p("")) for _ in range(4)]
    pages.append(_page(_p("12")))
    return "<html><body>" + "\n".join(pages) + "</body></html>"


# ---------------------------------------------------------------------------
# Corpus assembly
# ---------------------------------------------------------------------------

_PERIODS_10Q = [("March 31", "Q1"), ("June 30", "Q2"), ("September 30", "Q3")]


def _make_families(n_docs: int, seed: int) -> list[dict]:
    rng = random.Random(seed)
    n_families = max(1, n_docs // 8)
    families = []
    for fi in range(n_families):
        w = _COMPANY_WORDS[fi % len(_COMPANY_WORDS)]
        sfx = _COMPANY_SUFFIX[fi % len(_COMPANY_SUFFIX)]
        name = f"{w} {sfx}" if fi < len(_COMPANY_WORDS) else f"{w} {fi} {sfx}"
        families.append({
            "name": name,
            "slug": f"{w.lower()}-{fi}",
            "ticker": (w[:4].upper() + "ABCDEFGH"[fi % 8])[:5],
            "cik": f"{1000000 + fi * 37}",
            "file_no": f"001-{10000 + fi}",
            "exchange": _EXCHANGES[fi % 2],
            "state": _STATES[fi % len(_STATES)],
            "address": f"{100 + fi} Market Street, Metropolis, NY 1000{fi % 10}",
            "phone": f"(212) 555-{1000 + fi:04d}",
            "shares": f"{rng.randint(1, 900)},{rng.randint(100, 999)},000",
        })
    return families


def _filing_index(doc_i: int) -> int:
    """Filings occupy slots 0..15 of each 20-doc block (closed form so any
    document derives independently of the others — shard-parallel synth)."""
    return (doc_i // 20) * 16 + min(doc_i % 20, 16)


def _web_page_at(doc_i: int, seed: int) -> tuple[str, str]:
    drng = random.Random(seed * 1_000_003 + doc_i)
    topic = ["markets", "energy", "climate", "tech"][doc_i % 4]
    html = build_web_page(drng, topic, doc_i)
    return f"https://blog.example.org/{topic}/post-{doc_i}", html


def gen_doc(doc_i: int, seed: int, families: list[dict],
            facts_fraction: float = 0.5) -> tuple[dict, list[dict]]:
    """Generate document ``doc_i`` (and its facts rows) independently of
    every other document — the property that lets corpus synthesis run as
    parallel Ray tasks over doc ranges."""
    n_families = len(families)
    slot = doc_i % 20
    drng = random.Random(seed * 1_000_003 + doc_i)
    ts = _BASE_TS + timedelta(minutes=doc_i * 17)
    facts_rows: list[dict] = []

    if slot in (16, 17):  # generic web page
        url, html = _web_page_at(doc_i, seed)
        row = {"url": url, "warc_ts": ts, "html": html.encode(),
               "text": "", "lang": "en"}
    elif slot == 18:  # ifrs / scanned / exact duplicate
        sub = doc_i % 3
        if sub == 0:
            fam = families[doc_i % n_families]
            year = 2023 + (doc_i % 3)
            html = build_ifrs_report(drng, fam, year)
            url = f"https://reports.example.eu/{fam['slug']}/annual-{year}.html"
            row = {"url": url, "warc_ts": ts, "html": html.encode(),
                   "text": "", "lang": "en"}
        elif sub == 1:
            html = build_scanned(drng)
            url = f"https://scans.example.net/doc-{doc_i}"
            row = {"url": url, "warc_ts": ts, "html": html.encode(),
                   "text": "", "lang": "en"}
        else:  # exact duplicate of this block's slot-16 web page
            src_url, html = _web_page_at((doc_i // 20) * 20 + 16, seed)
            url = src_url + f"?ref=mirror-{doc_i}"
            row = {"url": url, "warc_ts": ts, "html": html.encode(),
                   "text": "", "lang": "en"}
    elif slot == 19:  # non-English page (language-filter fodder)
        topic = "mercado"
        html = build_web_page(drng, topic, doc_i)
        url = f"https://blog.example.mx/{topic}/nota-{doc_i}"
        row = {"url": url, "warc_ts": ts, "html": html.encode(),
               "text": "", "lang": "es"}
    else:  # SEC filing
        filing_i = _filing_index(doc_i)
        fam = families[filing_i % n_families]
        seq_in_family = filing_i // n_families
        year = 2023 + seq_in_family // 4
        qi = seq_in_family % 4
        if qi == 3:
            form, month = "10-K", "December 31"
        else:
            form = "10-Q"
            month, _ptype = _PERIODS_10Q[qi]
        period = f"{month}, {year}"
        iso_month = {"March 31": "03-31", "June 30": "06-30",
                     "September 30": "09-30", "December 31": "12-31"}[month]
        period_iso = f"{year}-{iso_month}"
        quirks = {
            "rev_alias": _REV_ALIASES[filing_i % len(_REV_ALIASES)],
            "note_col": filing_i % 3 == 0,
            "orphan_row": filing_i % 4 == 1,
            "bold_cover": filing_i % 5 == 2,
            "interleaved": filing_i % 6 == 3,
        }
        html, v = build_sec_filing(drng, fam, form, period, period_iso,
                                   year, quirks)
        url = (f"https://filings.example.com/{fam['slug']}/"
               f"{form.lower()}-{period_iso}.html")
        row = {"url": url, "warc_ts": ts, "html": html.encode(),
               "text": "", "lang": "en"}

        if drng.random() < facts_fraction * 2 and filing_i % 2 == 0:
            skew = 1.03 if filing_i % 7 == 0 else 1.0  # 3% off → "warn"
            periods = [f"{year - 1}-{iso_month}", period_iso]
            mapping = {
                "income_statement": [("Revenue", v["revenue"]),
                                     ("Cost of Revenue", v["cost"]),
                                     ("Gross Profit", v["gross"]),
                                     ("Operating Income", v["opinc"]),
                                     ("Income Tax Expense", v["tax"]),
                                     ("Net Income", v["ni"])],
                "balance_sheet": [("Cash & Cash Equivalents", v["cash"]),
                                  ("Total Current Assets", v["tca"]),
                                  ("Total Assets", v["ta"]),
                                  ("Total Current Liabilities", v["tcl"]),
                                  ("Total Liabilities", v["tl"]),
                                  ("Total Stockholders' Equity", v["te"])],
                "cash_flow": [("Net Cash from Operations", v["cfo"]),
                              ("Net Cash from Investing", v["cfi"]),
                              ("Net Cash from Financing", v["cff"]),
                              ("Depreciation & Amortization", v["dna"]),
                              ("Ending Cash", v["end"])],
            }
            for st, pairs in mapping.items():
                for canonical, vv in pairs:
                    facts_rows.append({
                        "cik": fam["cik"], "filing_type": form,
                        "period_end": period_iso, "statement_type": st,
                        "canonical": canonical,
                        "values": [float(int(vv[0] * skew)), float(vv[1])],
                        "periods": periods,
                    })

    from ..kernels.html_tokenizer import tokenize_pages
    pages = tokenize_pages(row["html"], repair=False)
    row["text"] = "\n\n".join(p.text for p in pages)
    return row, facts_rows


def synth_corpus(n_docs: int = 200, seed: int = 7,
                 facts_fraction: float = 0.5) -> tuple[list[dict], list[dict]]:
    """Build (corpus_rows, facts_rows) — same (seed, n_docs) → byte-identical.

    corpus rows: url, warc_ts (datetime), html (bytes), text (str), lang.
    facts rows: cik, filing_type, period_end, statement_type, canonical,
    values, periods — value-consistent with the embedded tables except for a
    deliberate 3% discrepancy on every 7th filing (warn-severity fodder).
    """
    families = _make_families(n_docs, seed)
    rows: list[dict] = []
    facts_rows: list[dict] = []
    for doc_i in range(n_docs):
        row, frows = gen_doc(doc_i, seed, families, facts_fraction)
        rows.append(row)
        facts_rows.extend(frows)
    return rows, facts_rows


def write_corpus(out_dir: str, n_docs: int = 200, seed: int = 7,
                 shards: int = 8) -> tuple[str, str]:
    """Write the corpus as ≥`shards` parquet files plus the facts side table.

    Returns (corpus_dir, facts_path). Sharded so Ray Data gets enough input
    blocks to parallelize (BASELINE.md: ≥128 shards at bench scale).
    """
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    corpus_dir = os.path.join(out_dir, "corpus")
    os.makedirs(corpus_dir, exist_ok=True)
    rows, facts_rows = synth_corpus(n_docs, seed)

    schema = pa.schema([
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.large_string()),
        ("lang", pa.string()),
    ])
    per = max(1, (len(rows) + shards - 1) // shards)
    for si in range(0, len(rows), per):
        chunk = rows[si:si + per]
        table = pa.Table.from_pylist(chunk, schema=schema)
        pq.write_table(table,
                       os.path.join(corpus_dir, f"part-{si // per:05d}.parquet"))

    facts_path = os.path.join(out_dir, "facts.parquet")
    fschema = pa.schema([
        ("cik", pa.string()), ("filing_type", pa.string()),
        ("period_end", pa.string()), ("statement_type", pa.string()),
        ("canonical", pa.string()), ("values", pa.list_(pa.float64())),
        ("periods", pa.list_(pa.string())),
    ])
    pq.write_table(pa.Table.from_pylist(facts_rows, schema=fschema), facts_path)
    return corpus_dir, facts_path


def write_corpus_parallel(out_dir: str, n_docs: int, seed: int = 7,
                          shards: int = 128) -> tuple[str, str]:
    """Shard-parallel corpus staging: each Ray task generates one doc range
    (documents derive independently via :func:`gen_doc`) and writes its own
    parquet shard. Same (seed, n_docs, shards) → byte-identical corpus to
    the serial :func:`write_corpus` layout. Requires an initialized Ray
    session; falls back to the serial writer otherwise."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    try:
        import ray
        if not ray.is_initialized():
            raise RuntimeError
    except Exception:
        return write_corpus(out_dir, n_docs=n_docs, seed=seed, shards=shards)

    os.makedirs(out_dir, exist_ok=True)
    corpus_dir = os.path.join(out_dir, "corpus")
    os.makedirs(corpus_dir, exist_ok=True)
    families = _make_families(n_docs, seed)
    fam_ref = ray.put(families)

    schema = pa.schema([
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.large_string()),
        ("lang", pa.string()),
    ])
    per = max(1, (n_docs + shards - 1) // shards)

    @ray.remote
    def gen_shard(si: int, lo: int, hi: int) -> list[dict]:
        fams = ray.get(fam_ref)
        rows, facts = [], []
        for doc_i in range(lo, hi):
            row, frows = gen_doc(doc_i, seed, fams)
            rows.append(row)
            facts.extend(frows)
        pq.write_table(pa.Table.from_pylist(rows, schema=schema),
                       os.path.join(corpus_dir, f"part-{si:05d}.parquet"))
        return facts

    futures = [gen_shard.remote(si, lo, min(lo + per, n_docs))
               for si, lo in enumerate(range(0, n_docs, per))]
    facts_rows = [f for chunk in ray.get(futures) for f in chunk]

    facts_path = os.path.join(out_dir, "facts.parquet")
    fschema = pa.schema([
        ("cik", pa.string()), ("filing_type", pa.string()),
        ("period_end", pa.string()), ("statement_type", pa.string()),
        ("canonical", pa.string()), ("values", pa.list_(pa.float64())),
        ("periods", pa.list_(pa.string())),
    ])
    pq.write_table(pa.Table.from_pylist(facts_rows, schema=fschema), facts_path)
    return corpus_dir, facts_path


def corpus_from_documents(sf_dir: str, limit: int | None = None) -> list[dict]:
    """Wrap the driver's documents.parquet rows as web-page corpus rows.

    Used by ``__ray_entry__.entry()`` so the flagship pipeline runs over the
    driver-provided tables: each document's text becomes the article body of
    a deterministic web page (same page chrome → the boilerplate classifier
    must strip it and recover the text).
    """
    import pyarrow.parquet as pq

    table = pq.read_table(f"{sf_dir}/documents.parquet")
    rows = []
    for i, rec in enumerate(table.to_pylist()):
        if limit is not None and i >= limit:
            break
        rng = random.Random(1000 + rec["doc_id"])
        html = build_web_page(rng, str(rec.get("source", "web")),
                              rec["doc_id"], body_text=rec["text"])
        rows.append({
            "url": f"https://docs.example.org/{rec.get('source', 'web')}/{rec['doc_id']}",
            "warc_ts": _BASE_TS + timedelta(minutes=int(rec["doc_id"])),
            "html": html.encode(),
            "text": rec["text"],
            "lang": rec.get("lang", "en"),
        })
    return rows
