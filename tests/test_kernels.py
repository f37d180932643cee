"""Kernel unit tests — mirror the reference's unit layer (SURVEY.md §5):
numeric parsing, cover-field extraction, taxonomy matching, metadata
inference, validation checks, text repair, table collapse."""

import random

from pdf_parser_ray.kernels import checks as C
from pdf_parser_ray.kernels import cover as COV
from pdf_parser_ray.kernels import finmeta as FM
from pdf_parser_ray.kernels import tablekit as TK
from pdf_parser_ray.kernels import textfix as TF
from pdf_parser_ray.kernels.html_tokenizer import detect_scanned, tokenize_pages
from pdf_parser_ray.kernels.taxonomy import LabelNormalizer

SAMPLE_COVER = """UNITED STATES SECURITIES AND EXCHANGE COMMISSION
FORM 10-Q
For the quarterly period ended June 30, 2024
Commission File Number: 001-12345
Acme Corp
(Exact name of registrant as specified in its charter)
Central Index Key: 0001234567
1,000,000 shares of common stock outstanding as of June 30, 2024
Title of Each Class Trading Symbol Name of Each Exchange
Common Stock, $0.001 par value ACME New York Stock Exchange
"""


def test_parse_numeric():
    assert C.parse_numeric("$ 1,234") == 1234.0
    assert C.parse_numeric("(13,756)") == -13756.0
    assert C.parse_numeric("—") is None
    assert C.parse_numeric("") is None
    assert C.parse_numeric("1,234.56") == 1234.56


def test_cover_fields():
    fields = dict(COV.extract_cover_fields(SAMPLE_COVER))
    assert fields["Filing Type"] == "10-Q"
    assert fields["Company"] == "Acme Corp"
    assert fields["Period"] == "June 30, 2024"
    assert fields["Commission File Number"] == "001-12345"
    assert fields["CIK"] == "0001234567"
    assert fields["Ticker"] == "ACME"
    assert "1,000,000" in fields["Shares Outstanding"]


def test_taxonomy_normalizer():
    n = LabelNormalizer()
    cases = {"Net revenues": "Revenue", "Cost of sales": "Cost of Revenue",
             "Net income": "Net Income", "Total assets": "Total Assets",
             "Total liabilities": "Total Liabilities",
             "Total stockholders' equity": "Total Stockholders' Equity"}
    for label, canon in cases.items():
        assert n.match(label).canonical == canon, label


def test_taxonomy_fuzzy():
    n = LabelNormalizer()
    m = n.match("Net revenuess")  # typo → fuzzy tier
    assert m.canonical == "Revenue"
    assert m.confidence < 1.0


def test_metadata_inference():
    assert FM.infer_period_type("10-K", "December 31, 2024") == "FY"
    assert FM.infer_period_type("10-Q", "June 30, 2024") == "Q2"
    assert FM.infer_scale("(in thousands, except per share data)") == "thousands"
    assert FM.infer_scale("in USD $ millions") == "millions"
    iso, year = FM.parse_period_date("June 30, 2024")
    assert iso == "2024-06-30" and year == 2024


def test_balance_sheet_check():
    ok = {"Total Assets": [5000.0], "Total Liabilities": [3000.0],
          "Total Stockholders' Equity": [2000.0]}
    res = C.check_balance_sheet(ok)
    assert any(r.status == "PASS" for r in res)
    bad = {"Total Assets": [5000.0], "Total Liabilities": [3000.0],
           "Total Stockholders' Equity": [1000.0]}
    res = C.check_balance_sheet(bad)
    assert any(r.status in ("WARN", "FAIL") for r in res)


def test_textfix_collapse():
    assert TF.collapse_glyph_runs("YYYeeeaaarrr") == "Year"
    assert TF.collapse_glyph_runs("Normal text stays") == "Normal text stays"


def test_densify_row():
    row = ["Cash", "$", "", "1,234", "", "$", "", "(13,756", ")"]
    dense = TK.densify_row(row)
    assert dense[0] == "Cash"
    assert "$ 1,234" in dense
    assert any("(13,756)" in c for c in dense)


def test_prose_table_filter():
    # soft path needs ≥6 columns (reference: programmatic.py:713-775)
    sentence = ("the company operates across many different regions and "
                "provides professional services to customers worldwide "
                "through dedicated local account teams").split()
    # 10 words per row, padded to 10 columns → joins to >60 chars, >8 words
    prose = [sentence[:10], sentence[5:15], sentence[8:18] + [""] * 2] * 3
    assert TK.is_prose_table(prose)
    numeric = [["Revenue", "1,234", "2,345"], ["Cost", "600", "700"],
               ["Net", "634", "1,645"]]
    assert not TK.is_prose_table(numeric)


def test_tokenizer_and_scanned():
    html = b"<html><body><section class='page'><p>Hello world</p></section>" \
           b"<section class='page'><p>Second page text here</p></section></body></html>"
    pages = tokenize_pages(html)
    assert len(pages) == 2
    assert "Hello world" in pages[0].text
    empty = tokenize_pages(b"<html><body><section class='page'><p></p>"
                           b"</section></body></html>")
    assert detect_scanned(empty)


def test_corpus_deterministic():
    from pdf_parser_ray.sources.corpus import synth_corpus
    r1, f1 = synth_corpus(30, seed=9)
    r2, f2 = synth_corpus(30, seed=9)
    assert [r["html"] for r in r1] == [r["html"] for r in r2]
    assert f1 == f2
    r3, _ = synth_corpus(30, seed=10)
    assert [r["html"] for r in r1] != [r["html"] for r in r3]


def test_dedup_hashing():
    from pdf_parser_ray.stages import dedup as D
    rng = random.Random(3)
    words = [f"w{i}" for i in range(50)]
    text = " ".join(rng.choice(words) for _ in range(120))
    near = text + " tail"
    far = " ".join(rng.choice(words) for _ in range(120))
    a, b = D._perm_params(64)
    s1 = D.minhash_signature(D.shingle_hashes(text), a, b)
    s2 = D.minhash_signature(D.shingle_hashes(near), a, b)
    s3 = D.minhash_signature(D.shingle_hashes(far), a, b)
    assert (s1 == s2).mean() > 0.8
    assert (s1 == s3).mean() < 0.5
    assert bin(D.simhash64(text) ^ D.simhash64(near)).count("1") <= 6
    assert D.ngram_jaccard(text, near) > 0.9
    assert D.ngram_jaccard(text, far) < 0.5


def test_union_find():
    from pdf_parser_ray.stages.dedup import cluster_pairs
    rep = cluster_pairs([(1, 2), (2, 3), (5, 6)], [1, 2, 3, 4, 5, 6])
    assert rep[1] == rep[2] == rep[3] == 1
    assert rep[4] == 4
    assert rep[5] == rep[6] == 5


def test_xbrl_fact_extraction_semantics():
    """Reference J4 semantics (edgar_client.py:178-295), rebuilt: unit
    preference, dimensional-fact exclusion, accession filter, <=4 recent
    periods with longest-duration preference, min-line-item gate."""
    from pdf_parser_ray.kernels.facts import (accession_prefix,
                                              extract_statement_facts,
                                              find_filing_accession, pad_cik)

    assert pad_cik("320193") == "0000320193"
    assert pad_cik(7) == "0000000007"
    assert accession_prefix("0000320193-24-000123") == "000032019324000123"

    acc = "0001111111-25-000001"

    def fact(end, val, start=None, accn=acc, segment=None):
        f = {"end": end, "val": val, "accn": accn}
        if start:
            f["start"] = start
        if segment:
            f["segment"] = segment
        return f

    facts = {"facts": {"us-gaap": {
        # duration concept, 6 end-dates: only the 4 most recent survive;
        # for 2024-12-31 both a short (Q4) and a long (FY) duration exist —
        # the longest (earliest start) must win
        "Revenues": {"units": {"USD": [
            fact("2019-12-31", 1.0, "2019-01-01"),
            fact("2020-12-31", 2.0, "2020-01-01"),
            fact("2021-12-31", 3.0, "2021-01-01"),
            fact("2022-12-31", 4.0, "2022-01-01"),
            fact("2023-12-31", 5.0, "2023-01-01"),
            fact("2024-12-31", 99.0, "2024-10-01"),
            fact("2024-12-31", 6.0, "2024-01-01"),
        ]}},
        # unit preference: USD present -> USD/shares ignored
        "NetIncomeLoss": {"units": {
            "USD": [fact("2024-12-31", 10.0, "2024-01-01")],
            "USD/shares": [fact("2024-12-31", 0.77, "2024-01-01")],
        }},
        # only USD/shares -> falls through preference order
        "EarningsPerShareBasic": {"units": {
            "USD/shares": [fact("2024-12-31", 1.25, "2024-01-01")],
        }},
        # segment-tagged (dimensional) facts are excluded entirely
        "GrossProfit": {"units": {"USD": [
            fact("2024-12-31", 50.0, "2024-01-01", segment="ProductsMember"),
        ]}},
        # wrong accession excluded
        "OperatingIncomeLoss": {"units": {"USD": [
            fact("2024-12-31", 33.0, "2024-01-01",
                 accn="0009999999-99-000001"),
        ]}},
    }}}
    xbrl_map = {"Revenues": "Revenue", "NetIncomeLoss": "Net Income",
                "EarningsPerShareBasic": "EPS",
                "GrossProfit": "Gross Profit",
                "OperatingIncomeLoss": "Operating Income"}
    st = extract_statement_facts(facts, acc, "income_statement", xbrl_map)
    assert st is not None
    assert st.periods == ["2021-12-31", "2022-12-31", "2023-12-31",
                          "2024-12-31"]  # <=4 most recent ends
    assert st.line_items["Revenue"] == [3.0, 4.0, 5.0, 6.0]  # FY beat Q4
    assert st.line_items["Net Income"][-1] == 10.0  # USD preferred
    assert st.line_items["EPS"][-1] == 1.25  # USD/shares fallback
    assert "Gross Profit" not in st.line_items  # segment excluded
    assert "Operating Income" not in st.line_items  # accession filter

    # fewer than 3 mapped items -> None
    thin = {"facts": {"us-gaap": {
        "Revenues": facts["facts"]["us-gaap"]["Revenues"]}}}
    assert extract_statement_facts(thin, acc, "income_statement",
                                   {"Revenues": "Revenue"}) is None
    # missing accession -> None
    assert extract_statement_facts(facts, "0000000000-00-000000",
                                   "income_statement", xbrl_map) is None
    # empty facts -> None
    assert extract_statement_facts({"facts": {}}, acc, "income_statement",
                                   xbrl_map) is None

    subs = {"filings": {"recent": {
        "form": ["10-K", "10-Q", "10-K"],
        "reportDate": ["2024-09-28", "2024-06-29", "2023-09-30"],
        "accessionNumber": ["a1", "a2", "a3"]}}}
    assert find_filing_accession(subs, "10-K", "2024-09-28") == "a1"
    assert find_filing_accession(subs, "10-Q", "2024-06-29") == "a2"
    assert find_filing_accession(subs, "10-K", "2099-01-01") is None
    assert find_filing_accession({}, "10-K", "2024-09-28") is None
    # amended-form + case normalization (edgar_client.py:139-143:
    # upper().rstrip("/A") on both sides)
    subs_a = {"filings": {"recent": {
        "form": ["10-K/A", "10-q"],
        "reportDate": ["2024-09-28", "2024-06-29"],
        "accessionNumber": ["amend1", "q2"]}}}
    assert find_filing_accession(subs_a, "10-K", "2024-09-28") == "amend1"
    assert find_filing_accession(subs_a, "10-Q/A", "2024-06-29") == "q2"


def test_batched_tier3_parity():
    """classify_batch must agree with per-label classify, and annotate_rows'
    batched tier-3 must produce the same canonicals as label-at-a-time
    match() (r1 VERDICT item 8)."""
    from pdf_parser_ray.kernels.taxonomy import LabelClassifier, LabelNormalizer

    cls = LabelClassifier()
    labels = ["Net saless", "Totall revenues", "Cost of products sold x",
              "Research & development expence", "zzz qqq xx", ""]
    batch = cls.classify_batch(labels)
    for lab, (name, score) in zip(labels, batch):
        one_name, one_score = cls.classify(lab)
        assert one_name == name
        assert abs(one_score - score) < 1e-9  # BLAS batch-size ulp jitter
    # table-level parity: batched annotate vs sequential match
    rows = [[lab, "1", "2"] for lab in labels if lab]
    a = LabelNormalizer().annotate_rows(rows, is_numeric=lambda s: False)
    b = LabelNormalizer()
    expect = [b.match(lab).canonical or "" for lab, *_ in rows]
    assert [r[1] for r in a] == expect


def test_period_type_edge_matrix():
    """Reference tests/test_metadata.py TestInferPeriodType matrix,
    rebuilt: amended forms, quarter months, unknowns, case folding."""
    assert FM.infer_period_type("10-K", "December 31, 2024") == "FY"
    assert FM.infer_period_type("10-K/A", "December 31, 2024") == "FY"
    assert FM.infer_period_type("10-Q", "March 31, 2024") == "Q1"
    assert FM.infer_period_type("10-Q", "June 30, 2024") == "Q2"
    assert FM.infer_period_type("10-Q", "September 30, 2024") == "Q3"
    assert FM.infer_period_type("10-Q", "December 31, 2024") == "Q?"
    assert FM.infer_period_type("10-Q", "") == "Q?"
    assert FM.infer_period_type("10-Q", "JUNE 30, 2024") == "Q2"


def test_infer_scale_edge_matrix():
    """Reference TestInferScale matrix: all magnitudes + fallbacks."""
    assert FM.infer_scale("(in thousands, except per share data)") == "thousands"
    assert FM.infer_scale("(In millions)") == "millions"
    assert FM.infer_scale("(in billions)") == "billions"
    assert FM.infer_scale("something else entirely") == "units"
    assert FM.infer_scale("") == "units"
    assert FM.infer_scale(None) == "units"


def test_front_matter_yaml_shape():
    """Reference YAML front-matter contract: delimiters, key:value lines,
    special-char quoting, booleans, integers."""
    md = FM.front_matter({"company": "Ember: Labs, Inc.", "audited": True,
                          "filing_sequence": 3,
                          "confidence": {"income_statement": 0.9}})
    lines = md.strip().splitlines()
    assert lines[0] == "---" and lines[-1] == "---"
    assert any(l.startswith("company:") and '"' in l for l in lines), \
        "special chars must be quoted"
    assert "audited: true" in md
    assert "filing_sequence: 3" in md
    assert "  income_statement: 0.9" in md


def test_filing_start_page_matrix():
    """Reference tests/test_detect.py start-page matrix, rebuilt against
    our Page type: cover on p1 / later cover / registrant line / embedded
    footer / no markers / TOC skipped / footer on p1."""
    from pdf_parser_ray.kernels.doctype import find_filing_start
    from pdf_parser_ray.kernels.html_tokenizer import Page

    def P(n, text):
        return Page(number=n, text=text)

    cover = ("UNITED STATES SECURITIES AND EXCHANGE COMMISSION\n"
             "Washington, D.C. 20549\nFORM 10-K\n")
    assert find_filing_start([P(1, cover), P(2, "Other content")]) == 1
    assert find_filing_start(
        [P(1, "Dear Fellow Shareholders,\nAnnual letter..."),
         P(2, "More letter content"), P(50, cover)]) == 50
    assert find_filing_start(
        [P(1, "Annual Report 2024"),
         P(30, "Acme Inc.\n(Exact name of registrant as specified in "
               "its charter)\n")]) == 30
    assert find_filing_start(
        [P(1, "Annual Report 2024\nDear shareholders..."),
         P(2, "Performance highlights and charts..."),
         P(83, "Table of contents\n50 Three-Year Summary\n52 Introduction\n"
               "Sample Bank & Co./2024 Form 10-K 49\n")]) == 83
    assert find_filing_start(
        [P(1, "Some random PDF content"), P(2, "More content")]) == 1
    toc = ("TABLE OF CONTENTS\nFORM 10-K.............. 5\n"
           "Risk Factors........... 10\nBalance Sheet.......... 20\n")
    assert find_filing_start([P(1, toc), P(5, cover)]) == 5
    assert find_filing_start(
        [P(1, "Company Inc./2024 Form 10-K 1\nSome content"),
         P(2, "More content")]) == 1


def test_validation_matrix():
    """Reference tests/test_validate.py matrix, rebuilt: numeric parsing
    variants, tolerance boundaries (exact PASS / <=1% WARN / >1% FAIL),
    per-statement checks incl. SKIP paths and combined-line balance."""
    assert C.parse_numeric("(500)") == -500.0
    assert C.parse_numeric("$ (1,234)") == -1234.0
    assert C.parse_numeric("€500") == 500.0
    for dash in ("—", "-", "–"):
        assert C.parse_numeric(dash) is None
    assert C.parse_numeric("  ") is None

    assert C._compare("t", 100.0, 100.0).status == "PASS"
    assert C._compare("t", 1000.0, 1005.0).status == "WARN"   # 0.5% off
    assert C._compare("t", 1000.0, 1050.0).status == "FAIL"   # 5% off

    warn = C.check_balance_sheet({"Total Assets": [1000.0],
                                  "Total Liabilities": [600.0],
                                  "Total Stockholders' Equity": [405.0]})
    assert any(r.status == "WARN" for r in warn)
    fail = C.check_balance_sheet({"Total Assets": [1000.0],
                                  "Total Liabilities": [600.0],
                                  "Total Stockholders' Equity": [500.0]})
    assert any(r.status == "FAIL" for r in fail)
    skip = C.check_balance_sheet({"Total Assets": [1000.0]})
    assert any(r.status == "SKIP" for r in skip)
    combined = C.check_balance_sheet(
        {"Total Assets": [1000.0],
         "Total Liabilities & Stockholders' Equity": [1000.0]})
    assert any(r.status == "PASS" for r in combined)

    gp = C.check_income_statement({"Revenue": [1000.0],
                                   "Cost of Revenue": [600.0],
                                   "Gross Profit": [400.0]})
    assert any(r.status == "PASS" and "Gross Profit" in r.check for r in gp)
    gp_skip = C.check_income_statement({"Revenue": [1000.0]})
    assert any(r.status == "SKIP" and "Gross Profit" in r.check
               for r in gp_skip)
    ni = C.check_income_statement({"Net Income": [100.0]})
    assert any(r.status == "PASS" and "Net Income" in r.check for r in ni)

    cf = C.check_cash_flow({"Beginning Cash": [100.0],
                            "Net Change in Cash": [50.0],
                            "Ending Cash": [150.0]})
    assert any(r.status == "PASS" and "Reconcil" in r.check for r in cf)
    acts = C.check_cash_flow({"Net Cash from Operations": [100.0],
                              "Net Cash from Investing": [-50.0],
                              "Net Cash from Financing": [-30.0]})
    assert any(r.status == "PASS" and "Activity" in r.check for r in acts)
    missing = C.check_cash_flow({"Net Cash from Operations": [100.0]})
    assert any(r.status in ("WARN", "FAIL") and "Activity" in r.check
               for r in missing)

    # cross-statement: restricted-cash retry turns a FAIL into PASS/WARN
    cross = C.check_cross_statement({
        "income_statement": {"Net Income": [100.0]},
        "cash_flow": {"Net Income": [100.0], "Ending Cash": [150.0]},
        "balance_sheet": {"Cash & Cash Equivalents": [120.0],
                          "Restricted Cash": [30.0]},
    })
    cash = [r for r in cross if "Cash (CF Ending vs BS)" in r.check][0]
    assert cash.status in ("PASS", "WARN") and "restricted" in cash.detail


def test_prose_table_hard_filter_boundaries():
    """Reference TestIsProseTableHardFilter, rebuilt: >50-row <30%-numeric
    hard cutoff with exact boundary semantics."""
    assert TK.is_prose_table([["word"] * 8 for _ in range(60)]) is True
    assert TK.is_prose_table(
        [["Line item", "1,234", "5,678", "9,012"] for _ in range(60)]) is False
    # 30 rows, 4 cols: neither hard (<=50 rows) nor soft (<=6 cols) filter
    assert TK.is_prose_table([["word"] * 4 for _ in range(30)]) is False
    assert TK.is_prose_table(
        [["some", "prose", "text", "here", "in", "cols", "many", "words"]
         for _ in range(51)]) is True


def test_cover_render_table_shape():
    """Reference parse_cover_page output contract: markdown field/value
    table with header + separator + data rows."""
    lines = COV.render_cover(SAMPLE_COVER).strip().split("\n")
    assert lines[0] == "| Field | Value |"
    assert lines[1].startswith("|") and set(lines[1]) <= set("|- ")
    assert len(lines) >= 3
    assert COV.extract_cover_fields("") == []
