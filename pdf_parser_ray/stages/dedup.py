"""Deduplication stages: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

The reference has **no** dedup (each PDF is processed independently,
SURVEY.md §2.5 A9); at web scale it is mandatory, so these are first-class
stages over any Dataset with an id column and a text (or embedding) column.

Design for 100 TB:

* Exact dedup is a hash-shuffle ``groupby(fingerprint)`` keeping the min id
  per group — one all-to-all over a tiny ``(fingerprint, id)`` projection.
* MinHash/SimHash emit ``(band_key, id)`` rows — ``O(docs × bands)`` small
  rows — and shuffle *those*, never the text. Candidate pairs come from
  band buckets (``groupby(band_key)``); only candidates are verified.
* Verification joins signatures (not texts) for MinHash, texts only for the
  n-gram Jaccard variant, and runs on the candidate set, which banding
  keeps a tiny fraction of the corpus. The final union-find over verified
  pairs runs driver-side: the pair list is small by construction (near-dup
  clusters, not the corpus). If a pathological corpus makes it large, the
  scale path is iterative label propagation over a ``groupby(node)`` — the
  hook is `cluster_pairs`, swap it out.
* All hashing is seeded/stable (crc32 + fixed multipliers) — same corpus →
  same clusters on any cluster size, which resume and the oracle need.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(ds, key_col: str, id_col: str, *, keep_cols=None):
    """Keep one row (min id) per distinct key. Shuffles only once on key."""
    def first(group: pa.Table) -> pa.Table:
        if group.num_rows == 1:
            return group
        order = pc.sort_indices(group, sort_keys=[(id_col, "ascending")])
        return group.take(order[:1])

    if keep_cols:
        ds = ds.select_columns(list({key_col, id_col, *keep_cols}))
    return ds.groupby(key_col).map_groups(first, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Token / shingle machinery (shared)
# ---------------------------------------------------------------------------


def _tokens(text: str) -> list[str]:
    return text.lower().split()


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer: spread 32-bit crc values over the full 64-bit
    space. Without this, (a*x+b) mod p barely wraps for 32-bit x, the
    permutation family becomes order-preserving in x, and the smallest
    crc32 shingle wins every minhash slot (est ≈ 0 for true near-dups)."""
    x = (x + np.uint64(0x9E3779B97F4A7C15))
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Stable uint64 hashes of word k-shingles (crc32 → splitmix64)."""
    toks = _tokens(text)
    if len(toks) < k:
        joined = [" ".join(toks)] if toks else []
    else:
        joined = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
    if not joined:
        return np.zeros(1, dtype=np.uint64)
    raw = np.array([zlib.crc32(s.encode()) for s in joined], dtype=np.uint64)
    return np.unique(_mix64(raw))


_MERSENNE = np.uint64((1 << 61) - 1)


def _perm_params(num_perm: int, seed: int = 13) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, (1 << 31) - 1, size=num_perm).astype(np.uint64)
    b = rng.randint(0, (1 << 31) - 1, size=num_perm).astype(np.uint64)
    return a, b


def minhash_signature(sh: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(a*x + b) mod p minhash over the shingle-hash array; vectorized
    (num_perm × n_shingles) in one numpy broadcast."""
    vals = (sh[None, :] * a[:, None] + b[:, None]) % _MERSENNE
    return vals.min(axis=1).astype(np.uint64)


def simhash64(text: str) -> int:
    """64-bit SimHash over word tokens (stable crc32-based)."""
    toks = _tokens(text)
    if not toks:
        return 0
    hashes = np.array([zlib.crc32(t.encode()) * 2654435761 % (1 << 64)
                       for t in toks], dtype=np.uint64)
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
            & np.uint64(1)).astype(np.int64)
    votes = (2 * bits - 1).sum(axis=0)
    return int(((votes >= 0).astype(np.uint64)
                << np.arange(64, dtype=np.uint64)).sum())


def ngram_jaccard(a: str, b: str, k: int = 3) -> float:
    sa, sb = set(shingle_hashes(a, k).tolist()), set(shingle_hashes(b, k).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(1, len(sa | sb))


# ---------------------------------------------------------------------------
# Candidate generation + clustering
# ---------------------------------------------------------------------------


def cluster_pairs(pairs: list[tuple], ids: list) -> dict:
    """Union-find: {id -> cluster representative (min id)}."""
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for x in ids:
        parent.setdefault(x, x)
    for x, y in pairs:
        rx, ry = find(x), find(y)
        if rx != ry:
            lo, hi = (rx, ry) if rx <= ry else (ry, rx)
            parent[hi] = lo
    return {x: find(x) for x in parent}


def pairs_from_band_frame(df: "pd.DataFrame", id_col: str) -> list[tuple]:
    """All (a<b) candidate pairs among rows sharing a band_key.

    Vectorized duplicated-key filter first (no per-group Python for the
    non-colliding majority); the inner loop touches only colliding
    buckets, tiny by LSH design. At 10^12 docs the frame becomes a
    hash-partition by band_key with the same filter per partition.
    """
    if df.empty:
        return []
    dup = df[df.duplicated("band_key", keep=False)]
    pairs: set = set()
    for _, members in dup.groupby("band_key", sort=False)[id_col]:
        ids = sorted(members.tolist())
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pairs.add((ids[i], ids[j]))
    return sorted(pairs)


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------


class MinHashSignatures:
    """Actor UDF: adds a minhash signature column (list<uint64-as-int64>).

    Permutation params are built once per actor in ``__init__``."""

    def __init__(self, text_col: str, num_perm: int = 64, k: int = 3,
                 seed: int = 13):
        self.text_col = text_col
        self.k = k
        self.a, self.b = _perm_params(num_perm, seed)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        sigs = [minhash_signature(shingle_hashes(t, self.k), self.a, self.b)
                .astype(np.int64).tolist()
                for t in df[self.text_col].fillna("")]
        df = df.copy()
        df["minhash_sig"] = sigs
        return df


def _band_rows(df: pd.DataFrame, id_col: str, bands: int, rows: int) -> pd.DataFrame:
    """Vectorized banding: (docs × num_perm) signature matrix → one mixed
    uint64 band key per (doc, band) via numpy, no per-doc Python loop."""
    if df.empty:
        return pd.DataFrame({id_col: [], "band_key": []})
    sig = np.stack([np.asarray(s, dtype=np.int64) for s in df["minhash_sig"]])
    n = sig.shape[0]
    chunks = sig.reshape(n, bands, rows).astype(np.uint64)
    mixed = np.zeros((n, bands), dtype=np.uint64)
    for ri in range(rows):  # rows is 4 — a fixed tiny loop, vector ops inside
        mixed = _mix64(mixed ^ chunks[:, :, ri])
    band_idx = np.broadcast_to(np.arange(bands, dtype=np.uint64), (n, bands))
    keys = (mixed ^ _mix64(band_idx.copy())).ravel()
    ids = np.repeat(df[id_col].to_numpy(), bands)
    return pd.DataFrame({id_col: ids, "band_key": keys})


def minhash_lsh_dedup(ds, text_col: str, id_col: str, *, num_perm: int = 64,
                      bands: int = 16, k: int = 3, threshold: float = 0.8,
                      concurrency=(1, 4)):
    """Full MinHash→LSH→verify→cluster pipeline.

    Returns (clusters_df, sig_df): clusters_df is a pandas DataFrame
    ``(id, rep)`` for every input id (rep == id when unique); sig_df is the
    collected signatures frame (id_col, minhash_sig). Signature estimation
    verifies candidates (fraction of equal minhash components ≥ threshold).
    """
    rows = num_perm // bands
    # The signature computation is the distributed stage (shingling is the
    # compute); the signature frame itself is docs × num_perm ints — tiny
    # relative to the text — so it collects once and banding / candidate
    # verification run vectorized driver-side. At 10^12 docs the collect
    # becomes: shuffle the (band_key, id) rows by band_key, verify within
    # partitions, union-find the (small) verified pair list — same math.
    sig_df = ds.select_columns([id_col, text_col]).map_batches(
        MinHashSignatures, fn_constructor_kwargs={
            "text_col": text_col, "num_perm": num_perm, "k": k},
        batch_format="pandas", concurrency=concurrency).to_pandas()

    cand = pairs_from_band_frame(_band_rows(sig_df, id_col, bands, rows),
                                 id_col)

    verified: list[tuple] = []
    if cand:
        sig_map = {i: np.asarray(s) for i, s in
                   zip(sig_df[id_col], sig_df["minhash_sig"])}
        for x, y in cand:
            est = float((sig_map[x] == sig_map[y]).mean())
            if est >= threshold:
                verified.append((x, y))

    all_ids = sig_df[id_col].tolist()
    rep = cluster_pairs(verified, all_ids)
    clusters = pd.DataFrame({"id": list(rep), "rep": [rep[i] for i in rep]})
    return clusters.sort_values("id").reset_index(drop=True), sig_df


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------


def simhash_dedup(ds, text_col: str, id_col: str, *, max_hamming: int = 3,
                  n_bands: int = 4):
    """SimHash banding: 64-bit sig split into n_bands chunks; docs sharing a
    chunk are candidates; verify by full hamming distance ≤ max_hamming.
    Returns pandas (id, rep)."""
    def sigs(df: pd.DataFrame) -> pd.DataFrame:
        out = df[[id_col]].copy()
        out["simhash"] = [simhash64(t) for t in df[text_col].fillna("")]
        return out

    # distributed hashing stage; the (id, simhash) frame is tiny → banding
    # and verification run vectorized driver-side (scale path as in
    # minhash_lsh_dedup: shuffle band rows, verify per partition)
    sig_df = ds.select_columns([id_col, text_col]).map_batches(
        sigs, batch_format="pandas").to_pandas()

    width = 64 // n_bands
    mask = (1 << width) - 1
    sig_arr = sig_df["simhash"].to_numpy(dtype=np.uint64)
    ids_arr = sig_df[id_col].to_numpy()
    frames = []
    for bi in range(n_bands):
        frames.append(pd.DataFrame({
            id_col: ids_arr,
            "band_key": (np.uint64(bi) << np.uint64(60))
            | ((sig_arr >> np.uint64(bi * width)) & np.uint64(mask)),
        }))
    cand = pairs_from_band_frame(pd.concat(frames, ignore_index=True), id_col)

    sig_map = dict(zip(ids_arr.tolist(), sig_arr.tolist()))
    verified = [(x, y) for x, y in cand
                if bin(sig_map[x] ^ sig_map[y]).count("1") <= max_hamming]
    rep = cluster_pairs(verified, ids_arr.tolist())
    return (pd.DataFrame({"id": list(rep), "rep": [rep[i] for i in rep]})
            .sort_values("id").reset_index(drop=True))


# ---------------------------------------------------------------------------
# n-gram Jaccard near-dup (LSH candidates + exact verify on texts)
# ---------------------------------------------------------------------------


def ngram_jaccard_dedup(ds, text_col: str, id_col: str, *, k: int = 3,
                        threshold: float = 0.8, num_perm: int = 64,
                        bands: int = 16):
    """Exact n-gram-Jaccard verification over MinHash-LSH candidates.

    Texts are fetched only for candidate ids (a filtered projection), never
    broadcast wholesale."""
    clusters, _sig_df = minhash_lsh_dedup(
        ds, text_col, id_col, num_perm=num_perm, bands=bands, k=k,
        threshold=0.0)  # threshold 0 → candidates pass straight through
    # expand clusters back to the raw pair list via reps
    by_rep: dict = {}
    for r in clusters.itertuples():
        by_rep.setdefault(r.rep, []).append(r.id)
    pairs = []
    for members in by_rep.values():
        members = sorted(members)
        pairs += [(members[i], members[j]) for i in range(len(members))
                  for j in range(i + 1, len(members))]
    ids_needed = sorted({x for p in pairs for x in p})
    id_set = set(ids_needed)

    def collect(df: pd.DataFrame) -> pd.DataFrame:
        return df[df[id_col].isin(id_set)][[id_col, text_col]]

    texts = {r[id_col]: r[text_col] for r in
             ds.select_columns([id_col, text_col])
             .map_batches(collect, batch_format="pandas").take_all()} \
        if pairs else {}
    # shingle each candidate id once, not once per pair
    shingles = {i: set(shingle_hashes(t, k).tolist())
                for i, t in texts.items()}

    def jac(x, y) -> float:
        sx, sy = shingles[x], shingles[y]
        if not sx and not sy:
            return 1.0
        return len(sx & sy) / max(1, len(sx | sy))

    verified = [(x, y) for x, y in pairs if jac(x, y) >= threshold]
    all_ids = clusters["id"].tolist()
    rep = cluster_pairs(verified, all_ids)
    return (pd.DataFrame({"id": list(rep), "rep": [rep[i] for i in rep]})
            .sort_values("id").reset_index(drop=True))


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup
# ---------------------------------------------------------------------------


def embedding_dedup(ds, vec_col: str, id_col: str, *, threshold: float = 0.95,
                    block: int = 4096):
    """Near-dup by cosine ≥ threshold over an embedding column.

    Per-batch numpy matmul against the (normalized) full matrix broadcast
    once via ``ray.put`` — the blocked brute-force baseline. The scale path
    (documented, same interface) is LSH bucketing: random-hyperplane band
    keys + within-bucket verify, exactly the SimHash shape above.
    """
    import ray

    mats = []
    ids = []
    for b in ds.select_columns([id_col, vec_col]).iter_batches(
            batch_format="pandas", batch_size=block):
        mats.append(np.stack(b[vec_col].to_numpy()))
        ids.extend(b[id_col].tolist())
    mat = np.vstack(mats).astype(np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    mat_ref = ray.put(mat)
    ids_arr = np.asarray(ids)

    def find_pairs(df: pd.DataFrame) -> pd.DataFrame:
        full = ray.get(mat_ref)
        q = np.stack(df[vec_col].to_numpy()).astype(np.float64)
        q /= np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        sims = q @ full.T
        qa, qb = [], []
        for row_i, did in enumerate(df[id_col].tolist()):
            hits = ids_arr[sims[row_i] >= threshold]
            for h in hits:
                if h > did:
                    qa.append(did)
                    qb.append(h)
        return pd.DataFrame({"a": qa, "b": qb})

    pair_rows = ds.select_columns([id_col, vec_col]).map_batches(
        find_pairs, batch_format="pandas", batch_size=block).take_all()
    pairs = sorted({(r["a"], r["b"]) for r in pair_rows})
    rep = cluster_pairs(pairs, ids)
    return (pd.DataFrame({"id": list(rep), "rep": [rep[i] for i in rep]})
            .sort_values("id").reset_index(drop=True))
