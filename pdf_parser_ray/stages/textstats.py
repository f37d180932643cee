"""Text-analysis stage for training-data pipelines: language ID, quality
signals, token counts, document fingerprints.

All transforms are vectorized pandas/numpy inside ``map_batches`` — no
per-row Python in the hot path. Every rule is deliberately expressible in
ANSI SQL so the DuckDB oracle can verify it bit-for-bit (see
``__ray_entry__.oracle_sql``): whitespace tokens via ``\\S+`` counts, the
n-gram language heuristic via per-language marker-word counts with a fixed
priority order, fingerprints via md5 over whitespace-normalized text.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd

# Marker-word regexes per language (word-bounded, case-insensitive via
# pre-lowering). Must stay in sync with the SQL in __ray_entry__.
LANG_MARKERS: dict[str, str] = {
    "en": r"\b(the|and|of|with|for)\b",
    "es": r"\b(el|la|los|las|una?|para)\b",
    "de": r"\b(der|die|das|und|mit|für)\b",
    "fr": r"\b(le|la|les|des|une?|avec)\b",
}
LANG_PRIORITY = ["en", "es", "de", "fr"]
CJK_RE = r"[一-鿿]"

TOKEN_RE = r"\S+"
# BPE-ish word/number/punct split (GPT-2-style shape, simplified to stay
# RE2-compatible for the DuckDB oracle).
BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

_WS = re.compile(r"\s+")


def add_text_stats(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Append token/char/punct/quality columns. Vectorized."""
    text = df[text_col].fillna("")
    df = df.copy()
    df["token_cnt"] = text.str.count(TOKEN_RE).astype("int64")
    df["bpe_cnt"] = text.str.count(BPE_RE).astype("int64")
    df["char_cnt"] = text.str.len().astype("int64")
    df["alpha_cnt"] = text.str.count(r"[A-Za-z]").astype("int64")
    df["digit_cnt"] = text.str.count(r"[0-9]").astype("int64")
    df["punct_cnt"] = text.str.count(r"[^A-Za-z0-9_\s]").astype("int64")
    df["stop_cnt"] = text.str.lower().str.count(LANG_MARKERS["en"]).astype("int64")
    # quality gate: integer-friendly so the oracle hash matches exactly
    df["is_quality"] = (
        (df["token_cnt"] >= 20)
        & (df["char_cnt"] >= 100)
        & (df["char_cnt"] <= 20000)
        & (df["punct_cnt"] * 4 <= df["token_cnt"] * 3)
    ).astype("int64")
    return df


def add_lang_pred(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Heuristic language ID: CJK chars → zh, else argmax of marker-word
    counts with fixed priority (ties go to the earlier language; all-zero →
    'und')."""
    text = df[text_col].fillna("").str.lower()
    df = df.copy()
    scores = {lang: text.str.count(pat) for lang, pat in LANG_MARKERS.items()}
    best = pd.Series("und", index=df.index)
    best_score = pd.Series(0, index=df.index)
    for lang in reversed(LANG_PRIORITY):  # earlier langs overwrite on ties
        s = scores[lang]
        take = s >= best_score
        # strict compare for later langs is implied by iterating reversed
        best = best.where(~take | (s == 0), lang)
        best_score = best_score.where(~take, s)
    best = best.where(best_score > 0, "und")
    has_cjk = text.str.contains(CJK_RE, regex=True)
    df["lang_pred"] = best.where(~has_cjk, "zh")
    return df


def normalize_for_fp(s: str) -> str:
    return _WS.sub(" ", s).strip().lower()


def add_fingerprint(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """md5 over whitespace-normalized lowercased text (exact-dedup key).

    Matches DuckDB ``md5(lower(trim(regexp_replace(text,'\\s+',' ','g'))))``.
    """
    df = df.copy()
    norm = (df[text_col].fillna("")
            .str.replace(r"\s+", " ", regex=True).str.strip().str.lower())
    df["fingerprint"] = [hashlib.md5(t.encode()).hexdigest() for t in norm]
    return df


def rolling_fingerprint(text: str, window: int = 16) -> int:
    """Deterministic 63-bit rolling (Rabin-Karp-style) document fingerprint;
    cheap per-doc scan used for container-level identity at ingest."""
    h = 0
    mod = (1 << 61) - 1
    out = 0
    for i, ch in enumerate(text):
        h = (h * 1099511628211 + ord(ch)) % mod
        if i >= window:
            out ^= h
    return (out or h) & ((1 << 63) - 1)


class TextStats:
    """map_batches UDF adding all text-analysis columns in one pass."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        df = add_text_stats(df, self.text_col)
        df = add_lang_pred(df, self.text_col)
        df = add_fingerprint(df, self.text_col)
        return df


def text_stats_dataset(ds, text_col: str = "text", batch_size: int = 1024):
    return ds.map_batches(TextStats(text_col), batch_format="pandas",
                          batch_size=batch_size)


def winnow_fingerprints(text: str, k: int = 3, w: int = 4) -> list[str]:
    """Winnowed k-gram fingerprints (Schleimer/Wilkerson/Aiken winnowing):
    md5 each word k-gram, slide a w-window keeping each window's minimum,
    return the sorted distinct minima. md5-hex minima make the selection
    SQL-expressible (lexicographic MIN over VARCHAR) so the oracle can
    replicate it exactly. Docs with < k tokens have no fingerprint.

    The per-k-gram md5 loop is a deliberate trade: swapping to the
    vectorized Arrow-buffer hash (``dedup._hash_strings_vec``) would
    require porting the same splitmix64 arithmetic into the q14 oracle
    SQL (HUGEINT mod-2^64 emulation — DuckDB overflows on 64x64-bit
    multiply), and q14 measures under 1 s at sf0.1, so the oracle
    stability is worth more than the speedup."""
    import hashlib

    toks = text.split()
    if len(toks) < k:
        return []
    hs = [hashlib.md5(" ".join(toks[i:i + k]).encode()).hexdigest()
          for i in range(len(toks) - k + 1)]
    n = max(1, len(hs) - w + 1)
    return sorted({min(hs[j:j + w]) for j in range(n)})


def winnow_dataset(ds, id_col: str, text_col: str = "text", *,
                   k: int = 3, w: int = 4, batch_size: int = 1024):
    """Exploded (id, fingerprint) rows — the shape a fingerprint index
    shuffles/joins on (one hash-partition by fingerprint finds every doc
    pair sharing a winnowed region)."""
    def explode(df: pd.DataFrame) -> pd.DataFrame:
        ids: list = []
        fps: list[str] = []
        for did, text in zip(df[id_col], df[text_col].fillna("")):
            for fp in winnow_fingerprints(text, k, w):
                ids.append(did)
                fps.append(fp)
        return pd.DataFrame({id_col: pd.Series(ids, dtype="int64"),
                             "fingerprint": pd.Series(fps, dtype="object")})

    return ds.select_columns([id_col, text_col]).map_batches(
        explode, batch_format="pandas", batch_size=batch_size)


def unigram_logprob(ds, id_col: str, text_col: str = "text",
                    *, batch_size: int = 1024, top_k: int | None = None,
                    n_parts: int = 64) -> pd.DataFrame:
    """Fit-then-score unigram language-model quality scoring.

    Phase 1 (fit): per-batch token-count partials → coarsened
    ``groupby(tok-hash)`` distributed combine (all occurrences of a token
    co-locate, so per-partition sums are global sums and per-partition
    top-K candidates contain the global top-K). Phase 2 (score): the
    log-frequency table broadcasts once (``ray.put``) and each batch
    scores via vectorized explode → map → groupby-mean.

    ``top_k`` is the web-scale knob: with it set, each combine partition
    emits only its K most frequent tokens (ties broken by token,
    deterministic) so the driver sees O(n_parts × K) rows — never the
    ~10^8-token web vocabulary — and out-of-vocabulary tokens score at
    the OOV floor, ``log(min retained count / total)`` (as rare as the
    rarest retained token; an upper bound on their true logprob, so only
    docs containing pruned tokens shift, and only upward). The total
    token count keeps every token (partition subtotals), pruned or not,
    so retained probabilities are unchanged by pruning. ``top_k=None``
    ships the whole vocabulary — the exactly-SQL-replicable mode the q19
    oracle pins, fine whenever the corpus vocab fits driver memory.

    Returns pandas ``(id, logprob_mean)`` per doc with ≥1 token — the
    classic corpus-likelihood quality signal (low = gibberish/outlier).
    """
    import ray

    from .relational import add_coarse_part

    def tok_counts(df: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter
        c: Counter = Counter()
        for t in df[text_col].fillna(""):
            c.update(t.lower().split())
        return pd.DataFrame({"tok": pd.Series(list(c), dtype="object"),
                             "c": pd.Series(list(c.values()),
                                            dtype="int64")})

    parts = (ds.select_columns([text_col])
             .map_batches(tok_counts, batch_format="pandas",
                          batch_size=batch_size))

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        agg = group.groupby("tok", sort=False)["c"].sum().reset_index()
        subtotal = int(agg["c"].sum())
        if top_k is not None and len(agg) > top_k:
            agg = (agg.sort_values(["c", "tok"], ascending=[False, True],
                                   kind="mergesort").head(top_k))
        agg = agg.assign(kind=np.int64(0))
        tot = pd.DataFrame({"tok": [""], "c": [subtotal],
                            "kind": [np.int64(1)]})
        return pd.concat([agg, tot], ignore_index=True)

    vocab = (add_coarse_part(parts, "tok", n_parts)
             .groupby("_kpart")
             .map_groups(combine, batch_format="pandas").to_pandas())
    total = float(vocab.loc[vocab["kind"] == 1, "c"].sum())
    toks_tab = vocab[vocab["kind"] == 0]
    if top_k is not None and len(toks_tab) > top_k:
        toks_tab = (toks_tab.sort_values(["c", "tok"],
                                         ascending=[False, True],
                                         kind="mergesort").head(top_k))
    freq = toks_tab.set_index("tok")["c"]
    logp = np.log(freq / total)
    oov_lp = float(np.log(freq.min() / total)) if top_k is not None else None
    logp_ref = ray.put(logp.to_dict())

    def score(df: pd.DataFrame) -> pd.DataFrame:
        table = ray.get(logp_ref)
        toks = (df[[id_col, text_col]]
                .assign(tok=df[text_col].fillna("").str.lower().str.split())
                .explode("tok"))
        toks = toks[toks["tok"].notna()]
        if toks.empty:
            return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                                 "logprob_mean": pd.Series(dtype="float64")})
        toks["lp"] = toks["tok"].map(table)
        if oov_lp is not None:
            toks["lp"] = toks["lp"].fillna(oov_lp)
        out = (toks.groupby(id_col, sort=False)["lp"].mean()
               .reset_index().rename(columns={"lp": "logprob_mean"}))
        return out

    scored = (ds.select_columns([id_col, text_col])
              .map_batches(score, batch_format="pandas",
                           batch_size=batch_size).to_pandas())
    scored["logprob_mean"] = scored["logprob_mean"].round(6)
    return scored.sort_values(id_col).reset_index(drop=True)


def _ngram_series(text: pd.Series, n: int) -> pd.Series:
    """Vectorized n-gram explode: lowercase whitespace tokens, joined in
    sliding windows of ``n`` with single spaces. n=1 is plain tokens; n=2
    pairs consecutive tokens WITHIN a document (the shift-and-compare
    trick — no Python loop over rows or tokens)."""
    toks = text.fillna("").str.lower().str.split().explode().dropna()
    if n == 1:
        return toks
    doc = pd.Series(toks.index.to_numpy())
    vals = pd.Series(toks.to_numpy(), dtype="object")
    grams = vals.copy()
    ok = pd.Series(True, index=vals.index)
    for i in range(1, n):
        ok &= doc.shift(-i).eq(doc)
        grams = grams + " " + vals.shift(-i)
    return grams[ok]


def top_tokens(ds, text_col: str = "text", *, k: int = 50, ngram: int = 1,
               n_parts: int = 64, batch_size: int = 1024) -> pd.DataFrame:
    """Exact distributed heavy hitters: the k most frequent whitespace
    tokens (lowercased; ``ngram``-grams of them for ngram>1), ties broken
    lexicographically.

    Classic combiner shape: per-batch token-count partials (vectorized
    explode + value_counts — the shuffle ships one row per *distinct*
    token per batch, never one per occurrence), coarsened
    ``groupby(tok-hash)`` combine so every occurrence of a token lands in
    exactly one partition (per-partition sums are global sums, so each
    partition's local top-k provably contains every global top-k member
    it owns), then a driver-side merge of n_parts × k candidate rows —
    O(k) driver memory at any corpus size."""
    from .relational import add_coarse_part

    def tok_counts(df: pd.DataFrame) -> pd.DataFrame:
        vc = _ngram_series(df[text_col], ngram).value_counts()
        return pd.DataFrame({"tok": vc.index.astype("object"),
                             "c": vc.to_numpy(dtype="int64")})

    parts = (ds.select_columns([text_col])
             .map_batches(tok_counts, batch_format="pandas",
                          batch_size=batch_size))

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        agg = group.groupby("tok", sort=False)["c"].sum().reset_index()
        return (agg.sort_values(["c", "tok"], ascending=[False, True],
                                kind="mergesort").head(k))

    cand = (add_coarse_part(parts, "tok", n_parts)
            .groupby("_kpart")
            .map_groups(combine, batch_format="pandas").to_pandas())
    out = (cand.sort_values(["c", "tok"], ascending=[False, True],
                            kind="mergesort").head(k)
           .reset_index(drop=True))
    out["c"] = out["c"].astype("int64")
    return out[["tok", "c"]]


def tfidf_topk(ds, id_col: str, text_col: str = "text", *, k: int = 3,
               n_parts: int = 64, batch_size: int = 1024):
    """Per-document top-k terms by tf-idf (score = tf × ln(N/df), rounded
    to 6 dp before ranking so the DuckDB oracle ranks identically).

    Two shuffles, no join, no double pass: per-batch (id, token, tf)
    partials are exact per-doc counts (a document is one row, so one
    batch holds all of it); ONE coarsened ``groupby(token-hash)`` shuffle
    co-locates each token's postings, where df is a vectorized
    ``transform('size')`` attached in place (cheaper than materializing a
    (token, df) side and joining it back); then :func:`grouped_topk`
    bounds the per-document output. Driver never sees the posting rows.
    """
    from .relational import add_coarse_part, grouped_topk

    n_docs = float(ds.count())

    def tf_counts(df: pd.DataFrame) -> pd.DataFrame:
        s = (df.set_index(id_col)[text_col].fillna("").str.lower()
             .str.split().explode().dropna())
        g = (pd.DataFrame({id_col: s.index.to_numpy(),
                           "token": s.to_numpy()})
             .groupby([id_col, "token"], sort=False).size()
             .reset_index(name="tf"))
        g["tf"] = g["tf"].astype("int64")
        return g

    tf = (ds.select_columns([id_col, text_col])
          .map_batches(tf_counts, batch_format="pandas",
                       batch_size=batch_size))

    def attach_score(group: pd.DataFrame) -> pd.DataFrame:
        dfreq = (group.groupby("token", sort=False)["token"]
                 .transform("size").to_numpy(dtype="float64"))
        out = group[[id_col, "token", "tf"]].copy()
        out["score"] = np.round(
            group["tf"].to_numpy() * np.log(n_docs / dfreq), 6)
        return out

    scored = (add_coarse_part(tf, "token", n_parts)
              .groupby("_kpart")
              .map_groups(attach_score, batch_format="pandas"))
    return grouped_topk(scored, id_col, "score", k, tie_break="token",
                        keep=["token", "score"], n_parts=n_parts)


def inverted_index(ds, id_col: str, text_col: str = "text", *,
                   min_token_len: int = 8, n_parts: int = 64,
                   batch_size: int = 1024):
    """Posting-list build: distinct (token, id) rows for tokens of at
    least ``min_token_len`` chars — the exploded shape an index shard
    shuffles on (hash-partition by token co-locates each posting list).

    Per-batch explode + local dedupe bounds what enters the shuffle;
    the coarsened ``groupby(tok-hash)`` dedupes globally in-partition.
    Returns a Dataset of (token, id) — write it partitioned by token
    hash for a resumable on-disk index."""
    from .relational import add_coarse_part

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        toks = (df[[id_col, text_col]]
                .assign(token=df[text_col].fillna("").str.lower()
                        .str.split())
                .explode("token"))
        toks = toks[toks["token"].notna()]
        toks = toks[toks["token"].str.len() >= min_token_len]
        out = toks[["token", id_col]].drop_duplicates()
        return pd.DataFrame({
            "token": out["token"].astype("object"),
            id_col: out[id_col].to_numpy(dtype="int64")})

    parts = (ds.select_columns([id_col, text_col])
             .map_batches(explode, batch_format="pandas",
                          batch_size=batch_size))

    def dedupe(group: pd.DataFrame) -> pd.DataFrame:
        return group[["token", id_col]].drop_duplicates()

    return (add_coarse_part(parts, "token", n_parts)
            .groupby("_kpart")
            .map_groups(dedupe, batch_format="pandas"))


SPLIT_BOUNDS = (("train", "e666"), ("val", "f333"))  # 90% / 5% / 5%


def assign_split(ds, id_col: str, *, batch_size: int = 4096):
    """Deterministic train/val/test split by stable content-free hash:
    the first 4 hex chars of md5(id) partition [0, 0xffff] at 90%/95%
    (lexicographic hex comparison == numeric comparison at fixed width).
    Pure per-batch map — no shuffle, no state, reproducible on any
    cluster size; the exact rule is SQL-replicable for the oracle."""
    def split(df: pd.DataFrame) -> pd.DataFrame:
        h = [hashlib.md5(str(v).encode()).hexdigest()[:4]
             for v in df[id_col]]
        out = df[[id_col]].copy()
        out["split"] = ["train" if x < SPLIT_BOUNDS[0][1]
                        else ("val" if x < SPLIT_BOUNDS[1][1] else "test")
                        for x in h]
        return out

    return ds.select_columns([id_col]).map_batches(
        split, batch_format="pandas", batch_size=batch_size)


def repetition_stats(ds, id_col: str, text_col: str = "text", *,
                     batch_size: int = 1024):
    """Per-document repetition / diversity signals in the style of the
    Gopher quality heuristics (Rae et al. 2021, "Scaling Language
    Models"): token count, distinct-token fraction, and the mass
    fraction of the most frequent unigram and bigram. Highly repetitive
    machine-generated pages score low distinct_frac / high top-*-frac
    and are filtered by a vectorized threshold downstream.

    Pure per-batch map — a document is one row, so every signal is
    exact with no shuffle. All group math is pandas groupby kernels
    over the exploded (doc, token) frame; no Python loop over rows or
    tokens. Empty docs get zero fractions; single-token docs get
    top_bigram_frac = 0.
    """
    def stats(df: pd.DataFrame) -> pd.DataFrame:
        s = (df.set_index(id_col)[text_col].fillna("").str.lower()
             .str.split().explode().dropna())
        d = pd.DataFrame({"d": s.index.to_numpy(),
                          "t": s.to_numpy(dtype=object)})
        g = d.groupby("d", sort=False)["t"]
        n_tok = g.size()
        n_distinct = g.nunique()
        uni_max = (d.groupby(["d", "t"], sort=False).size()
                   .groupby(level=0).max())
        doc = d["d"]
        ok = doc.shift(-1).eq(doc)
        bg = pd.DataFrame({"d": doc[ok],
                           "g": d["t"][ok] + " " + d["t"].shift(-1)[ok]})
        if len(bg):
            bgc = bg.groupby(["d", "g"], sort=False).size()
            b_frac = (bgc.groupby(level=0).max()
                      / bgc.groupby(level=0).sum())
        else:
            b_frac = pd.Series(dtype="float64")

        ids = pd.Index(df[id_col])
        out = pd.DataFrame({id_col: df[id_col].to_numpy()})
        n = n_tok.reindex(ids).fillna(0).to_numpy(dtype="float64")
        safe = np.where(n > 0, n, 1.0)
        out["n_tokens"] = n.astype("int64")
        out["distinct_frac"] = np.round(
            n_distinct.reindex(ids).fillna(0).to_numpy() / safe, 6)
        out["top_unigram_frac"] = np.round(
            uni_max.reindex(ids).fillna(0).to_numpy() / safe, 6)
        out["top_bigram_frac"] = np.round(
            b_frac.reindex(ids).fillna(0.0).to_numpy(dtype="float64"), 6)
        return out

    return ds.select_columns([id_col, text_col]).map_batches(
        stats, batch_format="pandas", batch_size=batch_size)


def chunk_documents(ds, id_col: str, text_col: str = "text", *,
                    window: int = 64, stride: int = 32,
                    batch_size: int = 512):
    """Split documents into fixed token-budget training chunks: windows
    of ``window`` whitespace tokens starting every ``stride`` tokens
    (stride < window = overlapping context, the usual LM packing shape).
    Chunk starts run while start < n_tokens, so trailing chunks may be
    short; empty docs yield no chunks.

    Pure per-batch map that only EXPANDS rows — no shuffle, no state, so
    it streams at any corpus size and composes with assign_split /
    dedup upstream. Output rows: (id, chunk_id, n_tokens, chunk_text).
    The per-doc slice loop is O(output chars) — the unavoidable cost of
    materializing chunk text — with all token splitting vectorized.
    """
    if stride < 1 or window < 1:
        raise ValueError("window and stride must be >= 1")

    def chunk(df: pd.DataFrame) -> pd.DataFrame:
        toks_col = df[text_col].fillna("").str.split()
        ids_out: list = []
        chunk_ids: list[int] = []
        n_out: list[int] = []
        texts: list[str] = []
        for doc_id, toks in zip(df[id_col], toks_col):
            n = len(toks)
            for ci, start in enumerate(range(0, n, stride)):
                piece = toks[start:start + window]
                ids_out.append(doc_id)
                chunk_ids.append(ci)
                n_out.append(len(piece))
                texts.append(" ".join(piece))
        return pd.DataFrame({
            id_col: pd.Series(ids_out),
            "chunk_id": pd.Series(chunk_ids, dtype="int64"),
            "n_tokens": pd.Series(n_out, dtype="int64"),
            "chunk_text": pd.Series(texts, dtype="object"),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        chunk, batch_format="pandas", batch_size=batch_size)


def filter_split(ds, id_col: str, splits, *, batch_size: int = 4096):
    """Keep only rows whose :func:`assign_split` bucket is in ``splits``
    ({'train','val','test'} subset). Same stable md5 rule, applied as a
    per-batch filter so the full table (text included) streams through
    without a join against the split assignment."""
    want = frozenset(splits)

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        h = [hashlib.md5(str(v).encode()).hexdigest()[:4]
             for v in df[id_col]]
        s = ["train" if x < SPLIT_BOUNDS[0][1]
             else ("val" if x < SPLIT_BOUNDS[1][1] else "test") for x in h]
        return df[pd.Series(s, index=df.index).isin(want)]

    return ds.map_batches(keep, batch_format="pandas",
                          batch_size=batch_size)


def ngram_contamination(train_ds, test_ds, id_col: str,
                        text_col: str = "text", *, n: int = 8,
                        n_parts: int = 64,
                        batch_size: int = 512) -> pd.DataFrame:
    """Train/test decontamination by exact token n-gram overlap — the
    GPT-3/PaLM-style contamination check: for every test document, count
    how many of its DISTINCT n-grams appear anywhere in the training
    split. Test docs with n_hits > 0 are contaminated and get dropped or
    flagged upstream of training.

    Distributed shape (no driver-side gram set, no broadcast of the
    training corpus):
      1. both sides explode per batch into (id, gram, side) rows —
         per-doc distinct grams, a doc is one row so distinctness is
         exact without a shuffle;
      2. union → coarsened co-partition on hash(gram) % n_parts
         (``add_coarse_part``), so every occurrence of a gram lands in
         exactly one partition;
      3. in-partition C-level hash join (test rows ⋈ distinct train
         grams) → per-partition partial (id, n_hits) counts — disjoint
         gram sets make the partials additive;
      4. tiny final sum by id (O(contaminated docs × n_parts) rows).

    Joining on the raw gram STRING keeps the op bit-exact against the
    SQL oracle; at 100 TB you would join on a 64-bit gram hash instead
    (``dedup._hash_strings_vec``) and accept the ~2^-64 collision rate —
    the shuffle shape is identical, only the key narrows.

    Returns a pandas frame (id, n_hits int64) of contaminated test docs,
    sorted by id; clean docs are absent.
    """
    from .relational import add_coarse_part

    def explode(side_val: int):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            ids: list = []
            grams: list[str] = []
            for i, toks in zip(df[id_col],
                               df[text_col].fillna("").str.split()):
                m = len(toks) - n + 1
                if m <= 0:
                    continue
                seen = set()
                for j in range(m):
                    g = " ".join(toks[j:j + n])
                    if g not in seen:
                        seen.add(g)
                        ids.append(i)
                        grams.append(g)
            return pd.DataFrame({
                id_col: pd.Series(ids, dtype=df[id_col].dtype),
                "gram": pd.Series(grams, dtype="object"),
                "side": pd.Series(
                    np.full(len(ids), side_val, dtype=np.int8)),
            })
        return f

    tr = (train_ds.select_columns([id_col, text_col])
          .map_batches(explode(0), batch_format="pandas",
                       batch_size=batch_size))
    te = (test_ds.select_columns([id_col, text_col])
          .map_batches(explode(1), batch_format="pandas",
                       batch_size=batch_size))
    both = add_coarse_part(tr.union(te), "gram", n_parts)

    def hits(group: pd.DataFrame) -> pd.DataFrame:
        t = group[group["side"] == 1]
        tr_grams = (group.loc[group["side"] == 0, ["gram"]]
                    .drop_duplicates())
        if not len(t) or not len(tr_grams):
            return pd.DataFrame({id_col: pd.Series([], dtype=group[id_col].dtype),
                                 "n_hits": pd.Series([], dtype="int64")})
        hit = t.merge(tr_grams, on="gram")
        out = (hit.groupby(id_col, sort=False).size()
               .rename("n_hits").reset_index())
        out["n_hits"] = out["n_hits"].astype("int64")
        return out

    parts = (both.groupby("_kpart")
             .map_groups(hits, batch_format="pandas").to_pandas())
    if not len(parts):
        return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                             "n_hits": pd.Series([], dtype="int64")})
    return (parts.groupby(id_col, sort=True)["n_hits"].sum()
            .astype("int64").reset_index())


def md5_u32(values) -> np.ndarray:
    """Stable 32-bit md5 prefix per value — the one hash-to-integer rule
    behind temperature sampling, packing shards and weighted sampling
    (``int(md5(str(v))[:8], 16)``; SQL twin: ``CAST('0x' ||
    substr(md5(CAST(v AS VARCHAR)), 1, 8) AS UBIGINT)``). One
    implementation so the rule cannot drift between stages (review
    finding: it was inlined three times)."""
    return np.array(
        [int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16)
         for v in values], dtype=np.uint64)


def temperature_sample(ds, id_col: str, group_col: str, *,
                       alpha: float = 0.5, batch_size: int = 4096):
    """Temperature-based group rebalancing (the XLM-R / mT5 multilingual
    recipe, downsample-only form): group g keeps each row with
    probability ``sqrt(n_min / n_g)`` at the default alpha=0.5, so the
    smallest group keeps everything and dominant groups shrink toward
    the flattened p^alpha distribution.

    Two streaming passes, zero shuffles: (1) per-batch group-count
    partials merge to a tiny rate table on the driver, (2) a stable
    md5-threshold filter (same hash family as :func:`assign_split`)
    keeps rows deterministically — reproducible on any cluster size and
    SQL-replicable. Rates use ``sqrt`` (correctly rounded IEEE on both
    engines) rather than a general pow to keep the keep/drop boundary
    bit-exact against the oracle.
    """
    if alpha != 0.5:
        raise NotImplementedError(
            "only alpha=0.5 (sqrt) keeps the oracle boundary bit-exact; "
            "generalize with pow() and accept 1-ulp boundary risk")
    import math

    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(group_col, sort=False).size().rename("n")
        return g.reset_index()

    parts = (ds.select_columns([group_col])
             .map_batches(count_partial, batch_format="pandas")
             .to_pandas())
    counts = parts.groupby(group_col, sort=False)["n"].sum()
    n_min = int(counts.min())
    rates = {g: math.sqrt(n_min / int(n)) for g, n in counts.items()}

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        frac = md5_u32(df[id_col]).astype(np.float64) / 4294967296.0
        rate = df[group_col].map(rates).to_numpy(dtype=np.float64)
        return df[frac < rate]

    return ds.map_batches(keep, batch_format="pandas",
                          batch_size=batch_size)


def pack_documents(ds, id_col: str, text_col: str = "text", *,
                   budget: int = 256, n_shards: int = 16,
                   batch_size: int = 1024):
    """Pack whole documents into ~``budget``-token training bins: docs
    are sharded by a stable md5 hash, and within each shard (ordered by
    id) a doc's bin is ``floor(preceding_token_sum / budget)`` — the
    deterministic whole-doc approximation of sequence packing. Unlike
    greedy bin packing, the rule is order-stable and cluster-size-free,
    so shard manifests are reproducible and the SQL oracle can replicate
    the exact (shard, pack_id) layout via a window sum.

    One shuffle on the bounded shard key (``n_shards`` groups, each a
    vectorized sort + shifted cumsum); the text column is dropped before
    the shuffle — only (id, shard, n_tokens) rows move. A shard is
    sorted as ONE in-memory frame, so size ``n_shards`` to the corpus:
    rows/n_shards × ~24 bytes must fit a worker's heap (10^5-10^6
    shards at web scale — the shard id doubles as the output-file key,
    so more shards also means better write parallelism).
    """
    def prep(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({id_col: df[id_col]})
        out["shard"] = pd.Series(
            (md5_u32(df[id_col]) % np.uint64(n_shards)).astype("int64"),
            dtype="int64", index=df.index)
        out["n_tokens"] = (df[text_col].fillna("").str.split()
                           .str.len().astype("int64"))
        return out

    proj = ds.select_columns([id_col, text_col]).map_batches(
        prep, batch_format="pandas", batch_size=batch_size)

    def pack(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(id_col, kind="mergesort").reset_index(
            drop=True)
        prev = g["n_tokens"].cumsum().shift(fill_value=0)
        g["pack_id"] = (prev // budget).astype("int64")
        return g

    return proj.groupby("shard").map_groups(pack, batch_format="pandas")


def bigram_pmi(ds, text_col: str = "text", *, min_count: int = 5,
               k: int = 40, n_parts: int = 64,
               batch_size: int = 1024) -> pd.DataFrame:
    """Collocation mining: pointwise mutual information of token bigrams,

        pmi(a b) = ln( (c_ab / N2) / ((c_a / N1) * (c_b / N1)) )

    over whitespace-lowercase tokens (the q25/q28 tokenizer). Shuffle
    discipline: bigram and unigram counts are both combiner-shaped
    (per-batch distinct-gram partials → coarsened ``groupby(gram-hash)``
    distributed combine — one row per distinct gram ever moves); only
    the bigrams surviving ``min_count`` (a tiny candidate set by Zipf)
    and the unigram counts of THEIR component tokens reach the driver.
    Totals N1/N2 are scalar partial sums. Returns the top ``k`` rows by
    (pmi rounded to 6dp desc, bigram asc) — rounding first so the
    ordering is bit-stable against SQL float op-order differences.
    """
    from .relational import add_coarse_part

    def gram_counts(n):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            vc = _ngram_series(df[text_col], n).value_counts()
            return pd.DataFrame({"tok": vc.index.astype("object"),
                                 "c": vc.to_numpy(dtype="int64")})
        return f

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        agg = group.groupby("tok", sort=False)["c"].sum().reset_index()
        agg["c"] = agg["c"].astype("int64")
        return agg[["tok", "c"]]

    def counts_ds(n):
        parts = (ds.select_columns([text_col])
                 .map_batches(gram_counts(n), batch_format="pandas",
                              batch_size=batch_size))
        return (add_coarse_part(parts, "tok", n_parts)
                .groupby("_kpart").map_groups(combine,
                                              batch_format="pandas"))

    uni = counts_ds(1).materialize()
    bi = counts_ds(2).materialize()

    def total(cds) -> int:
        def s(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"t": [int(df["c"].sum())]})
        return int(cds.map_batches(
            s, batch_format="pandas").to_pandas()["t"].sum())

    n1 = total(uni)
    n2 = total(bi)

    cand = bi.filter(
        expr=f"c >= {int(min_count)}").to_pandas()  # tiny by Zipf
    if cand.empty:
        return pd.DataFrame({"bigram": pd.Series(dtype="object"),
                             "c": pd.Series(dtype="int64"),
                             "pmi": pd.Series(dtype="float64")})
    comp = cand["tok"].str.split(" ", n=1, expand=True)
    need = set(comp[0]) | set(comp[1])

    def pick(df: pd.DataFrame, _need=need) -> pd.DataFrame:
        return df[df["tok"].isin(_need)]

    uc = uni.map_batches(pick, batch_format="pandas").to_pandas()
    cmap = dict(zip(uc["tok"], uc["c"].astype("int64")))
    ca = comp[0].map(cmap).to_numpy(np.float64)
    cb = comp[1].map(cmap).to_numpy(np.float64)
    c2 = cand["c"].to_numpy(np.float64)
    # mirror the oracle's parenthesization exactly
    pmi = np.log((c2 / n2) / ((ca / n1) * (cb / n1)))
    out = pd.DataFrame({"bigram": cand["tok"].to_numpy(),
                        "c": cand["c"].astype("int64").to_numpy(),
                        "pmi": np.round(pmi, 6)})
    out = out.sort_values(["pmi", "bigram"], ascending=[False, True],
                          kind="mergesort").head(k)
    return out.reset_index(drop=True)


# deterministic, SQL-replicable (RE2-safe) redaction patterns
PII_PATTERNS = (
    (r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\+\d{1,2}[ \-]\d{3}[ \-]\d{4}", "<PHONE>"),
)


def redact_pii(ds, id_col: str, text_col: str = "text", *,
               patterns=PII_PATTERNS, batch_size: int = 1024):
    """Training-data PII scrub: regex-redact emails/phone numbers per
    document — a pure per-batch vectorized map (compiled patterns,
    ``Series.str`` kernels, zero shuffles, embarrassingly parallel at
    any scale). Returns a Dataset of (id, clean_text, n_redacted).

    Patterns are RE2-compatible (no backrefs/lookaround) so the exact
    rule is SQL-replicable for the oracle; extend ``patterns`` for
    SSNs/IP addresses/credit cards as policy requires.
    """
    import re

    compiled = [(re.compile(p), rep) for p, rep in patterns]

    def scrub(df: pd.DataFrame) -> pd.DataFrame:
        text = df[text_col].fillna("")
        n = pd.Series(np.zeros(len(df), dtype=np.int64),
                      index=text.index)
        for rx, rep in compiled:
            n += text.str.count(rx).astype("int64")
            text = text.str.replace(rx, rep, regex=True)
        return pd.DataFrame({id_col: df[id_col],
                             "clean_text": text,
                             "n_redacted": n.astype("int64")})

    return ds.select_columns([id_col, text_col]).map_batches(
        scrub, batch_format="pandas", batch_size=batch_size)


def quality_top_p(ds, id_col: str, group_col: str, text_col: str = "text",
                  *, p: float = 0.25, n_parts: int = 64,
                  batch_size: int = 1024) -> pd.DataFrame:
    """Quality-weighted selection: keep each group's top ``p`` fraction
    of documents by unigram-LM corpus likelihood (:func:`unigram_logprob`)
    — the "train on the best quarter per language" curation step.

    Composition: the fit-then-score pass produces (id, score); group
    sizes come from the same frame; the cut is rank ≤ ceil(p·n_group)
    ordered by (score ROUNDED to 6dp desc, id asc) — ranking on the
    rounded score makes the kept set bit-stable against float op-order
    differences between numpy and the SQL oracle. Scores are
    driver-small (two int/float columns); the text never leaves the
    scoring pass."""
    import math

    scored = unigram_logprob(ds, id_col, text_col,
                             batch_size=batch_size, n_parts=n_parts)
    groups = (ds.select_columns([id_col, group_col])
              .to_pandas())
    merged = scored.merge(groups, on=id_col)
    merged = merged.sort_values(
        ["logprob_mean", id_col], ascending=[False, True],
        kind="mergesort")
    merged["rnk"] = merged.groupby(group_col, sort=False).cumcount() + 1
    sizes = merged.groupby(group_col, sort=False)[id_col].transform("size")
    cut = (sizes * p).apply(lambda x: math.ceil(x - 1e-9)).astype("int64")
    kept = merged[merged["rnk"] <= cut]
    out = kept[[id_col, group_col, "logprob_mean", "rnk"]].copy()
    out["rnk"] = out["rnk"].astype("int64")
    return (out.sort_values([group_col, "rnk"])
            .reset_index(drop=True))


def _gram_pos_explode(id_col: str, text_col: str, k: int):
    """Per-batch vectorized (gram, id, pos) explode shared by the
    ExactSubstr measure (:func:`duplicate_span_stats`) and the transform
    (:func:`remove_duplicate_spans`): whitespace tokens, 1-based k-gram
    start positions."""
    def explode(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)
        toks = df[text_col].fillna("").str.split()
        t = pd.DataFrame({"id": df[id_col].astype("int64"),
                          "v": toks}).explode("v").dropna(subset=["v"])
        if t.empty:
            return pd.DataFrame({"gram": pd.Series(dtype="object"),
                                 "id": pd.Series(dtype="int64"),
                                 "pos": pd.Series(dtype="int64")})
        # chain grams on ROW identity (the exploded frame's index),
        # never on the id VALUE: two rows sharing a doc_id in one batch
        # must not chain phantom k-grams across their boundary (review
        # finding; _ngram_series uses the same discipline)
        row = pd.Series(t.index.to_numpy())
        ids = pd.Series(t["id"].to_numpy())
        vals = pd.Series(t["v"].to_numpy(), dtype="object")
        pos = row.groupby(row, sort=False).cumcount() + 1
        grams = vals.copy()
        ok = pd.Series(True, index=vals.index)
        for i in range(1, k):
            ok &= row.shift(-i).eq(row)
            grams = grams + " " + vals.shift(-i)
        return pd.DataFrame({"gram": grams[ok],
                             "id": ids[ok].astype("int64"),
                             "pos": pos[ok].astype("int64")})
    return explode


def _dup_gram_positions(ds, id_col: str, text_col: str, *, k: int,
                        n_parts: int, batch_size: int):
    """(id, pos) Dataset of every k-gram start whose gram occurs ≥2
    times corpus-wide. Coarsened co-partition on hash(gram): every
    occurrence of a gram lands in one partition, so a partition-local
    count IS the global count; only the duplicated positions leave."""
    from .relational import add_coarse_part

    rows = ds.select_columns([id_col, text_col]).map_batches(
        _gram_pos_explode(id_col, text_col, k), batch_format="pandas",
        batch_size=batch_size)

    def dup_positions(group: pd.DataFrame) -> pd.DataFrame:
        n = group.groupby("gram", sort=False)["gram"].transform("size")
        dup = group[n >= 2]
        return dup[["id", "pos"]]

    return (add_coarse_part(rows, "gram", n_parts)
            .groupby("_kpart").map_groups(dup_positions,
                                          batch_format="pandas"))


def duplicate_span_stats(ds, id_col: str, text_col: str = "text", *,
                         k: int = 5, n_parts: int = 64,
                         batch_size: int = 512) -> pd.DataFrame:
    """Cross-document repeated-substring statistics — the measurement
    half of ExactSubstr dedup (Lee et al. 2022, "Deduplicating Training
    Data Makes Language Models Better"): for every document, how many
    of its token ``k``-gram positions start a gram that occurs MORE THAN
    ONCE anywhere in the corpus (including self-repetition), and how
    many of its tokens those duplicated spans cover (interval union).

    Distributed shape (two bounded exchanges, no driver gram set —
    the same co-partition discipline as :func:`ngram_contamination`):
      1. per-batch vectorized explode into (gram, id, pos) rows;
      2. coarsened co-partition on hash(gram) — every occurrence of a
         gram lands in one partition, so a partition-local count IS the
         global count; emit only the duplicated positions;
      3. coarsened ``groupby(id)``: per-doc position count + coverage.
         Same-length intervals sorted by start cannot nest, so the
         union is one vectorized ``min(k, next_start - start)`` — no
         interval-merge loop.

    Returns pandas (id, n_dup_grams, covered_tokens) for docs with ≥1
    duplicated gram (inner semantics), sorted by id. The removal half
    (cutting covered spans out of the text) is a per-doc map over these
    positions; the statistics are the cross-document part.
    """
    from .relational import add_coarse_part

    dup_rows = _dup_gram_positions(ds, id_col, text_col, k=k,
                                   n_parts=n_parts, batch_size=batch_size)

    def coverage(group: pd.DataFrame) -> pd.DataFrame:
        g = (group[["id", "pos"]].drop_duplicates()
             .sort_values(["id", "pos"], kind="mergesort"))
        nxt = g.groupby("id", sort=False)["pos"].shift(-1)
        contrib = np.minimum(float(k),
                             (nxt - g["pos"]).fillna(float(k)))
        out = pd.DataFrame({
            "id": g["id"],
            "n": 1,
            "cov": contrib.to_numpy(np.float64)})
        agg = out.groupby("id", sort=False).agg(
            n_dup_grams=("n", "sum"), covered_tokens=("cov", "sum"))
        agg = agg.reset_index()
        agg["n_dup_grams"] = agg["n_dup_grams"].astype("int64")
        agg["covered_tokens"] = agg["covered_tokens"].astype("int64")
        return agg

    res = (add_coarse_part(dup_rows, "id", n_parts)
           .groupby("_kpart").map_groups(coverage, batch_format="pandas")
           .to_pandas())
    if res.empty:
        return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                             "n_dup_grams": pd.Series(dtype="int64"),
                             "covered_tokens": pd.Series(dtype="int64")})
    res = res.rename(columns={"id": id_col})
    return res.sort_values(id_col).reset_index(drop=True)


def importance_weights(ds, id_col: str, text_col: str = "text", *,
                       target_col: str, batch_size: int = 1024,
                       n_parts: int = 64) -> pd.DataFrame:
    """Data-selection importance weights (DSIR-flavored, Xie et al.
    2023): per document, the mean unigram log-likelihood ratio between
    a TARGET-domain language model and the raw-corpus model,

        llr(doc) = mean_w [ ln p_t(w) - ln p_r(w) ]

    with add-one smoothing over the shared vocabulary (p(w) =
    (c + 1) / (N + V)) so unseen-in-target tokens stay finite and the
    whole rule is SQL-replicable. High-llr docs look like the target
    domain; sample proportionally (or top-p) to curate.

    Distributed shape (the q19 fit-then-score pattern, one pass each):
    per-batch (tok, c_all, c_target) count partials → coarsened
    ``groupby(tok-hash)`` combine → the ratio table broadcasts once
    (``ray.put``; prune with a top-K knob at web vocab scale exactly as
    :func:`unigram_logprob` does) → per-batch vectorized explode → map
    → groupby-mean. ``target_col`` is a boolean column marking
    target-domain rows. Returns pandas (id, llr) per doc with ≥1 token.
    """
    import ray

    from .relational import add_coarse_part

    proj = ds.select_columns([id_col, text_col, target_col])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        toks = df[text_col].fillna("").str.lower().str.split()
        # fillna BEFORE the bool cast: float NaN casts to True while
        # object-None casts to False (review finding) — a null flag
        # means "not target", consistently
        t = pd.DataFrame({"v": toks,
                          "is_t": df[target_col].fillna(False)
                          .astype(bool)}).explode("v").dropna(subset=["v"])
        if t.empty:
            return pd.DataFrame({"tok": pd.Series(dtype="object"),
                                 "c_all": pd.Series(dtype="int64"),
                                 "c_t": pd.Series(dtype="int64")})
        g = t.groupby("v", sort=False)["is_t"].agg(["size", "sum"])
        return pd.DataFrame({"tok": g.index.astype("object"),
                             "c_all": g["size"].to_numpy("int64"),
                             "c_t": g["sum"].to_numpy("int64")})

    parts = proj.map_batches(part, batch_format="pandas",
                             batch_size=batch_size)

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        agg = group.groupby("tok", sort=False)[["c_all", "c_t"]].sum()
        return agg.reset_index()

    vocab = (add_coarse_part(parts, "tok", n_parts)
             .groupby("_kpart").map_groups(combine,
                                           batch_format="pandas")
             .to_pandas())
    if vocab.empty:
        return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                             "llr": pd.Series(dtype="float64")})
    v = float(len(vocab))
    n_all = float(vocab["c_all"].sum())
    n_t = float(vocab["c_t"].sum())
    ratio = (np.log((vocab["c_t"].to_numpy(np.float64) + 1.0)
                    / (n_t + v))
             - np.log((vocab["c_all"].to_numpy(np.float64) + 1.0)
                      / (n_all + v)))
    table_ref = ray.put(dict(zip(vocab["tok"], ratio)))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        tab = ray.get(table_ref)
        toks = df[text_col].fillna("").str.lower().str.split()
        t = pd.DataFrame({"id": df[id_col].astype("int64"),
                          "v": toks}).explode("v").dropna(subset=["v"])
        if t.empty:
            return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                                 "llr": pd.Series(dtype="float64")})
        t["r"] = t["v"].map(tab)
        g = t.groupby("id", sort=False)["r"].mean().reset_index()
        return g.rename(columns={"id": id_col, "r": "llr"})

    out = (proj.map_batches(score, batch_format="pandas",
                            batch_size=batch_size).to_pandas())
    out["llr"] = out["llr"].round(6)
    out[id_col] = out[id_col].astype("int64")
    return out.sort_values(id_col).reset_index(drop=True)


def weighted_sample(ds, id_col: str, weight_col: str, k: int = 100, *,
                    batch_size: int = 4096) -> pd.DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ES,
    hash-derandomized): each row gets sample key ln(u)/w where u is the
    stable md5-uniform of its id (the :func:`temperature_sample` hash
    family, shifted off 0) — the k LARGEST keys are exactly a weighted
    sample without replacement. No RNG state: reproducible on any
    cluster size and partitioning, and the whole rule is
    SQL-replicable. One streaming pass; per-batch local top-k + tiny
    driver merge (the ``topk`` shape, never a global sort). Rows with
    weight ≤ 0 are excluded. 1-ulp caveat: two sample keys within one
    ulp of the k-boundary could order differently vs a SQL engine's
    ``ln`` — the same accepted boundary class temperature_sample
    documents for its sqrt threshold."""
    from .relational import topk

    def score(df: pd.DataFrame) -> pd.DataFrame:
        w = df[weight_col].to_numpy(np.float64)
        keep = w > 0
        d = df[[id_col, weight_col]][keep].copy()
        u = (md5_u32(d[id_col]).astype(np.float64)
             + 1.0) / 4294967297.0
        d["_skey"] = np.log(u) / w[keep]
        return d

    scored = ds.select_columns([id_col, weight_col]).map_batches(
        score, batch_format="pandas", batch_size=batch_size)
    res = topk(scored, "_skey", k, ascending=False, tie_break=id_col)
    return (res[[id_col, weight_col]]
            .sort_values(id_col).reset_index(drop=True))


def remove_duplicate_spans(ds, id_col: str, text_col: str = "text", *,
                           k: int = 5, min_run: int | None = None,
                           n_parts: int = 64, batch_size: int = 512):
    """ExactSubstr duplicate-span REMOVAL (Lee et al. 2022) — the
    transform half completing :func:`duplicate_span_stats` (the
    measure): every token covered by a corpus-duplicated k-gram
    (global count ≥ 2, self-repetition included) is a *covered*
    position; maximal covered runs of ``min_run``+ tokens (default
    ``k`` — every covered run is ≥ k long by construction, so the
    default removes them all; raise it to only cut long boilerplate
    runs) are dropped and the remaining tokens are re-joined with
    single spaces.

    Distributed shape (three bounded exchanges, nothing O(corpus) on
    the driver):
      1. the shared (gram, id, pos) explode + gram-hash co-partition
         emits duplicated positions only (:func:`_dup_gram_positions` —
         local count = global count by co-partition);
      2. docs (id, text) and dup positions (id, pos) union with a side
         tag and meet in ONE coarsened ``groupby(id-hash)`` — the
         asof_join_shuffle pattern, so the text column moves once and
         never multiplies per position;
      3. the in-partition rewrite is vectorized pandas: token explode
         with 1-based positions, covered = dup-start positions dilated
         by k (np.repeat + arange), runs via the gaps-and-islands
         cumcount trick, run-length filter, anti-merge, grouped join.

    Returns a Dataset of (id_col, clean_text, n_removed) — one row per
    input doc (clean_text = "" when everything was duplicated or the
    doc had no tokens). The rewritten corpus is as big as the input, so
    the result stays a Dataset; collect only at query scale."""
    import pyarrow as pa

    from .relational import add_coarse_part

    if min_run is None:
        min_run = k
    # the (id, text) projection feeds BOTH the gram explode and the
    # rewrite union — materialize it once or the upstream read/lineage
    # executes twice (review finding; the flagship materialize pattern)
    proj_in = ds.select_columns([id_col, text_col]).materialize()
    dup_rows = _dup_gram_positions(proj_in, id_col, text_col, k=k,
                                   n_parts=n_parts, batch_size=batch_size)

    def doc_side(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "id": df[id_col].astype("int64"),
            "text": df[text_col].fillna("").astype(str),
            "pos": pd.Series([pd.NA] * len(df), dtype="Int64"),
            "side": np.int8(0)})

    def pos_side(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "id": df["id"].astype("int64"),
            "text": pd.Series([None] * len(df), dtype="object"),
            "pos": df["pos"].astype("Int64"),
            "side": np.int8(1)})

    unioned = (proj_in
               .map_batches(doc_side, batch_format="pandas",
                            batch_size=batch_size)
               .union(dup_rows.map_batches(pos_side,
                                           batch_format="pandas")))

    def rewrite(group: pd.DataFrame) -> pa.Table:
        docs = group[group["side"] == 0]
        pos = group[group["side"] == 1]
        out = pd.DataFrame({id_col: docs["id"].to_numpy(np.int64)})
        if docs.empty:
            return pa.table({id_col: pa.array([], type=pa.int64()),
                             "clean_text": pa.array([], type=pa.string()),
                             "n_removed": pa.array([], type=pa.int64())})
        # exploded tokens with 1-based positions (row-identity chained)
        toks = docs["text"].fillna("").str.split()
        t = (pd.DataFrame({"id": docs["id"].to_numpy(np.int64),
                           "v": toks.to_numpy()})
             .explode("v").dropna(subset=["v"]).reset_index())
        t["tpos"] = t.groupby("index", sort=False).cumcount() + 1
        if pos.empty:
            clean = (t.groupby("id", sort=False)["v"]
                     .agg(" ".join))
            out["clean_text"] = (out[id_col].map(clean).fillna("")
                                 .astype(str))
            out["n_removed"] = np.int64(0)
            return pa.Table.from_pandas(out, preserve_index=False)
        # dilate each dup-gram start into its k covered positions
        p = pos["pos"].to_numpy(np.int64)
        pid = pos["id"].to_numpy(np.int64)
        cov = (pd.DataFrame({
            "id": np.repeat(pid, k),
            "cpos": (p[:, None] + np.arange(k, dtype=np.int64)).ravel()})
            .drop_duplicates().sort_values(["id", "cpos"],
                                           kind="mergesort"))
        # gaps-and-islands: consecutive covered positions share
        # cpos - cumcount; filter runs shorter than min_run
        rn = cov.groupby("id", sort=False).cumcount().to_numpy()
        cov["grp"] = cov["cpos"].to_numpy() - rn
        runlen = cov.groupby(["id", "grp"], sort=False)["cpos"] \
            .transform("size")
        rem = cov[runlen.to_numpy() >= min_run][["id", "cpos"]]
        rem = rem.assign(_hit=True)
        m = t.merge(rem, left_on=["id", "tpos"],
                    right_on=["id", "cpos"], how="left")
        m["_hit"] = m["_hit"].fillna(False).astype(bool)
        kept = m[~m["_hit"]]
        clean = kept.groupby("id", sort=False)["v"].agg(" ".join)
        nrem = m.groupby("id", sort=False)["_hit"].sum()
        out["clean_text"] = out[id_col].map(clean).fillna("").astype(str)
        out["n_removed"] = (out[id_col].map(nrem).fillna(0)
                            .astype("int64"))
        return pa.Table.from_pandas(out, preserve_index=False)

    return (add_coarse_part(unioned, "id", n_parts)
            .groupby("_kpart")
            .map_groups(lambda g: rewrite(g.drop(columns=["_kpart"])),
                        batch_format="pandas"))
