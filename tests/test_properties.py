"""Property-based tests (hypothesis) — the reference has none (SURVEY §5);
these pin the never-crash and invariant guarantees fuzzing can reach."""

from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_parser_ray.kernels.checks import parse_numeric
from pdf_parser_ray.kernels.docpipe import process_document
from pdf_parser_ray.kernels.html_tokenizer import tokenize_pages
from pdf_parser_ray.kernels.taxonomy import LabelNormalizer
from pdf_parser_ray.kernels.textfix import collapse_glyph_runs
from pdf_parser_ray.stages.dedup import ngram_jaccard, shingle_hashes, simhash64

_NORM = LabelNormalizer()


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=4096))
def test_tokenizer_never_crashes(payload):
    pages = tokenize_pages(payload)
    assert isinstance(pages, list) and pages


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=2048))
def test_process_document_always_returns_record(payload):
    rec = process_document("https://fuzz/x", payload, "2025-01-01", _NORM)
    assert rec["status"]
    assert isinstance(rec["extracted_text"], str)
    for s in rec["spans"]:
        assert 0 <= s["start"] <= s["end"] <= len(rec["extracted_text"])


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=200))
def test_parse_numeric_total(s):
    v = parse_numeric(s)
    assert v is None or isinstance(v, float)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=120))
def test_glyph_collapse_never_grows(line):
    out = collapse_glyph_runs(line)
    assert len(out) <= len(line)


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet=st.characters(whitelist_categories=("Ll", "Zs")),
               max_size=300),
       st.text(alphabet=st.characters(whitelist_categories=("Ll", "Zs")),
               max_size=300))
def test_jaccard_properties(a, b):
    j_ab = ngram_jaccard(a, b)
    j_ba = ngram_jaccard(b, a)
    assert 0.0 <= j_ab <= 1.0
    assert j_ab == j_ba                       # symmetric
    assert ngram_jaccard(a, a) == 1.0         # reflexive


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=300))
def test_simhash_stable_and_bounded(t):
    h1, h2 = simhash64(t), simhash64(t)
    assert h1 == h2
    assert 0 <= h1 < (1 << 64)
    assert len(shingle_hashes(t)) >= 1


@settings(max_examples=100, deadline=None)
@given(st.lists(st.lists(st.one_of(st.text(max_size=12),
                                   st.sampled_from(["$", "", "(1,234", ")",
                                                    "1,234", "—", "%"])),
                         max_size=10),
                max_size=12),
       st.text(max_size=400))
def test_normalize_tables_total(table, section_text):
    from pdf_parser_ray.kernels.tablekit import normalize_tables
    out = normalize_tables(section_text, [table] if table else [])
    assert isinstance(out, str)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 30), st.integers(0, 10**7)),
                max_size=60))
def test_bucket_pairs_invariants(rows):
    """bucket_pairs: every emitted pair shares a key; every key bucket with
    >=2 distinct ids yields all its pairs; output is unique, (lo, hi)."""
    import numpy as np
    from pdf_parser_ray.stages.dedup import bucket_pairs

    keys = np.array([k for k, _ in rows], dtype=np.uint64)
    ids = np.array([i for _, i in rows], dtype=np.int64)
    got = bucket_pairs(keys, ids)
    got_set = {tuple(p) for p in got}
    assert len(got_set) == len(got)  # unique
    # brute-force expectation
    expect = set()
    by_key = {}
    for k, i in rows:
        by_key.setdefault(k, set()).add(i)
    for members in by_key.values():
        ms = sorted(members)
        for x in range(len(ms)):
            for y in range(x + 1, len(ms)):
                expect.add((ms[x], ms[y]))
    assert got_set == expect
    for lo, hi in got_set:
        assert lo < hi


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=2000), st.integers(50, 400))
def test_chunk_notes_partition(text, limit):
    """chunk_notes is a PARTITION of the input: concatenation round-trips
    byte-identically and no chunk exceeds the limit unless unsplittable."""
    from pdf_parser_ray.kernels.notes import chunk_notes

    chunks = chunk_notes(text, limit=limit)
    assert "".join(chunks) == text
    assert all(chunks) or text == ""


@settings(max_examples=50, deadline=None)
@given(st.lists(st.one_of(st.just(0.0),
                          st.floats(1e-6, 100),
                          st.floats(-100, -1e-6)),
                min_size=8, max_size=8))
def test_srp_sign_invariance(vec):
    """SRP band keys are invariant under exact (power-of-two) positive
    scaling — the property that makes recall deterministic for
    cosine-identical duplicates. Stated for NORMAL-range components:
    hypothesis found that a subnormal component (5e-324) breaks it,
    because round(x*p) can flush to +-0 while round(4x*p) stays nonzero
    — power-of-two scaling only commutes with rounding when no
    intermediate underflows. Real embeddings are normal-range, so the
    production recall guarantee is unaffected.
    (Inexact scales can flip the sign of a
    projection that lands within float epsilon of zero, so the guarantee
    is stated for exactly-representable scalings, which covers the
    doubled-corpus duplicate construction.)"""
    import pandas as pd
    from pdf_parser_ray.stages.dedup import SRPBandRows

    udf = SRPBandRows("v", "id", n_planes=16, bands=4)
    df1 = udf(pd.DataFrame({"id": [1], "v": [vec]}))
    df2 = udf(pd.DataFrame({"id": [1], "v": [[x * 4.0 for x in vec]]}))
    assert df1["band_key"].tolist() == df2["band_key"].tolist()


@settings(max_examples=150, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 5), st.integers(0, 100)),
                max_size=80),
       st.integers(2, 8))
def test_bucket_pairs_cap_invariants(rows, m):
    """Capped bucket_pairs: output is a SUBSET of the uncapped clique
    pairs; per-bucket connectivity is preserved (every member reaches
    the bucket minimum directly or via a clique member); small buckets
    are untouched."""
    import numpy as np
    from pdf_parser_ray.stages.dedup import bucket_pairs

    keys = np.array([k for k, _ in rows], dtype=np.uint64)
    ids = np.array([i for _, i in rows], dtype=np.int64)
    capped = {tuple(p) for p in bucket_pairs(keys, ids, max_bucket=m)}
    full = {tuple(p) for p in bucket_pairs(keys, ids, max_bucket=None)}
    assert capped <= full
    by_key = {}
    for k, i in rows:
        by_key.setdefault(k, set()).add(i)
    for members in by_key.values():
        ms = sorted(members)
        if len(ms) < 2:
            continue
        if len(ms) <= m:
            # untouched: full clique present
            for x in range(len(ms)):
                for y in range(x + 1, len(ms)):
                    assert (ms[x], ms[y]) in capped
            continue
        # connectivity: every member pairs with the bucket min, either
        # directly (star/tail) or as a clique member
        for v in ms[1:]:
            assert (ms[0], v) in capped


@settings(max_examples=100, deadline=None)
@given(st.integers(1, 8), st.integers(1, 8), st.integers(0, 4),
       st.sampled_from(["420", "422", "444", "mono"]),
       st.integers(0, 2**32 - 1))
def test_y4m_roundtrip(w2, h2, n_frames, cs, seed):
    """decode_y4m is the exact inverse of Y4M encoding for every
    colorspace geometry: random luma planes come back bit-identical and
    chroma is skipped at the right stride."""
    import numpy as np
    from pdf_parser_ray.stages.multimodal import decode_y4m

    w, h = w2 * 2, h2 * 2  # subsampled colorspaces need even dims
    rng = np.random.RandomState(seed)
    frames = [rng.randint(0, 256, (h, w), dtype=np.uint8)
              for _ in range(n_frames)]
    chroma_n = {"420": (w // 2) * (h // 2) * 2, "422": (w // 2) * h * 2,
                "444": w * h * 2, "mono": 0}[cs]
    payload = f"YUV4MPEG2 W{w} H{h} F30:1 Ip A1:1 C{cs}\n".encode()
    for f in frames:
        payload += b"FRAME\n" + f.tobytes() + bytes([128]) * chroma_n
    v = decode_y4m(payload)
    assert (v["width"], v["height"], v["colorspace"]) == (w, h, cs)
    assert len(v["y_frames"]) == n_frames
    for got, want in zip(v["y_frames"], frames):
        assert np.array_equal(got, want)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(-10**9, 10**9), min_size=1, max_size=100),
       st.integers(4, 14))
def test_hll_idx_rank_invariants(vals, p):
    """The shared HLL bit law: register index < 2^p, 1 <= rank <=
    64-p+1, and equal inputs always map identically (determinism the
    grouped and global sketches both rest on)."""
    import pandas as pd
    from pdf_parser_ray.stages.sketch import _hll_idx_rank

    s = pd.Series(vals)
    idx, rank = _hll_idx_rank(s, p)
    assert (idx >= 0).all() and (idx < (1 << p)).all()
    assert (rank >= 1).all() and (rank <= 64 - p + 1).all()
    idx2, rank2 = _hll_idx_rank(s, p)
    assert (idx == idx2).all() and (rank == rank2).all()
