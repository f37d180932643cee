"""Deduplication stages: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

The reference has **no** dedup (each PDF is processed independently,
SURVEY.md §2.5 A9); at web scale it is mandatory, so these are first-class
stages over any Dataset with an id column and a text (or embedding) column.

Architecture (the banded-shuffle path, r2 — no driver-side signature
collects):

* Exact dedup is a hash-shuffle ``groupby(fingerprint)`` keeping the min id
  per group — one all-to-all over a tiny ``(fingerprint, id)`` projection.
* MinHash/SimHash/SRP emit ``(band_key, id, sig)`` rows in the SAME
  map_batches that computes the signature (fused, one pass over text) and
  shuffle *those*, never the text. The shuffle is a
  ``groupby(band_part)`` where ``band_part = band_key % n_parts`` — a
  deliberately COARSENED key: every row of a given band_key trivially lands
  in one partition, but the executor sees ``n_parts`` groups instead of
  ``docs × bands`` groups (Ray's ``map_groups`` costs ~0.25 ms of Python
  per group; at 10^9 docs per-key groups would melt). Within a partition,
  bucket detection + pair emission + verification are vectorized
  numpy/pandas over the whole partition frame.
* Verification runs inside the partition: MinHash compares full signatures
  (carried as one 8·num_perm-byte payload per row), SimHash compares
  64-bit hamming distance. The verified pairs stay a Dataset; clustering
  is distributed iterative min-label propagation over a coarsened
  ``groupby(node)`` (:func:`cluster_pairs_dataset`) and the (id, rep)
  result is itself a Dataset — nothing O(corpus ids) or O(pairs) lands on
  the driver in ANY near-dup path (r4: the Jaccard/embedding candidate
  lists became Datasets too).
* n-gram Jaccard and embedding-cosine verify exact similarity for
  candidate pairs via :func:`verify_pairs_distributed`: candidate (a, b)
  rows hash to verify partitions, a (pid, vpart) routing projection
  joins the corpus on id (big-to-big ``shuffle_join``), each doc's
  payload (shingle set / normalized vector) is emitted once per
  partition that needs it, and the exact check runs inside
  ``groupby(vpart)`` — the corpus is never collected, no full matrix is
  broadcast, and the candidate list never materializes on the driver.
* All hashing is seeded/stable (crc32 + fixed multipliers) — same corpus →
  same clusters on any cluster size, which resume and the oracle need.
* Skew note: a hot band bucket (e.g. a boilerplate-only band over a
  template-heavy crawl) concentrates in one partition. The coarsened key
  keeps partition sizes ~uniform for *distinct* keys; a single giant
  bucket is guarded by :func:`bucket_pairs`'s ``max_bucket`` cap
  (clique over the smallest ids + min-id star — O(M²+b) pairs, logged,
  never O(b²)); exact-dedup first remains the cheaper upstream guard
  when templates are exact dups.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(ds, key_col: str, id_col: str, *, keep_cols=None,
                n_parts: int = 64):
    """Keep one row (min id) per distinct key. One shuffle, on a COARSENED
    key (hash(key) % n_parts) so partition count is decoupled from key
    cardinality; the within-partition winner pick is a vectorized pandas
    sort + drop_duplicates over every key the partition holds."""
    from .relational import add_coarse_part

    if keep_cols:
        ds = ds.select_columns(list({key_col, id_col, *keep_cols}))

    def first(group: pa.Table) -> pa.Table:
        df = (group.to_pandas()
              .sort_values([key_col, id_col], kind="mergesort")
              .drop_duplicates(key_col, keep="first"))
        return pa.Table.from_pandas(df.drop(columns=["_kpart"]),
                                    preserve_index=False)

    return (add_coarse_part(ds, key_col, n_parts)
            .groupby("_kpart").map_groups(first, batch_format="pyarrow"))


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
    """Stable uint64 hashes of word k-shingles, vectorized: tokens hash
    once via the Arrow-buffer pass (:func:`_hash_strings_vec`), then each
    k-window combines by sequential splitmix64 mixing of the k shifted
    hash arrays — order-sensitive, no per-shingle string joins or crc32
    calls (the r1 minhash hot spot). Fewer than k tokens collapse to one
    whole-text shingle, matching the r1 semantics."""
    toks = _tokens(text)
    if not toks:
        return np.zeros(1, dtype=np.uint64)
    th = _hash_strings_vec(toks)
    kk = min(k, len(th))
    m = len(th) - kk + 1
    acc = np.zeros(m, dtype=np.uint64)
    for j in range(kk):  # k is 3 — tiny fixed loop, vector ops inside
        acc = _mix64(acc ^ th[j:j + m])
    return np.unique(acc)


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


# FNV-64 prime powers (cycle 64) for the vectorized token hash below
_POW64 = np.array([pow(0x100000001B3, i, 1 << 64) for i in range(64)],
                  dtype=np.uint64)
_BIT_IDX = np.arange(64, dtype=np.uint64)
_BIT_W = (np.uint64(1) << _BIT_IDX)


def _hash_strings_vec(strings: list[str]) -> np.ndarray:
    """Stable uint64 hash per string, fully vectorized: Arrow does the
    UTF-8 encoding in C, then a position-weighted polynomial over the raw
    byte buffer (same construction as ``manifest.url_bucket``) plus a
    splitmix64 finalize. No per-string Python hashing."""
    if not strings:
        return np.empty(0, dtype=np.uint64)
    la = pa.array(strings, type=pa.string()).cast(pa.large_binary())
    offsets = np.frombuffer(la.buffers()[1], dtype=np.int64)[:len(strings) + 1]
    data = np.frombuffer(la.buffers()[2], dtype=np.uint8)
    seg = data[offsets[0]:offsets[-1]].astype(np.uint64)
    rel = (offsets - offsets[0]).astype(np.int64)
    lengths = np.diff(rel)
    sums = np.zeros(len(strings), dtype=np.uint64)
    if seg.size:
        pos = np.arange(seg.size, dtype=np.int64) - np.repeat(rel[:-1], lengths)
        weighted = (seg + np.uint64(1)) * _POW64[pos & 63]
        nz = lengths > 0
        sums[nz] = np.add.reduceat(weighted, rel[:-1][nz])
    return _mix64(sums ^ (lengths.astype(np.uint64) << np.uint64(32)))


def simhash64_batch(texts: list[str]) -> np.ndarray:
    """64-bit SimHash per text, batch-vectorized: all tokens of the batch
    hash in one Arrow-buffer pass, bit votes reduce per document via
    ``np.add.reduceat``. Replaces the r1 per-token crc32 Python loop
    (the q22 hot spot)."""
    toks_per_doc = [_tokens(t or "") for t in texts]
    counts = np.array([len(ts) for ts in toks_per_doc], dtype=np.int64)
    out = np.zeros(len(texts), dtype=np.uint64)
    all_toks = [tok for ts in toks_per_doc for tok in ts]
    if not all_toks:
        return out
    hashes = _hash_strings_vec(all_toks)
    bits = ((hashes[:, None] >> _BIT_IDX[None, :]) & np.uint64(1))
    signed = 2 * bits.astype(np.int32) - 1  # (n_tokens, 64)
    starts = np.zeros(len(texts), dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    nz = counts > 0
    votes = np.add.reduceat(signed, starts[nz], axis=0)
    packed = ((votes >= 0).astype(np.uint64) * _BIT_W[None, :]).sum(axis=1)
    out[nz] = packed
    return out


def simhash64(text: str) -> int:
    """64-bit SimHash over word tokens (stable; single-text view of
    :func:`simhash64_batch`)."""
    return int(simhash64_batch([text])[0])


def ngram_jaccard(a: str, b: str, k: int = 3) -> float:
    sa, sb = set(shingle_hashes(a, k).tolist()), set(shingle_hashes(b, k).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(1, len(sa | sb))


_POPCOUNT8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount for uint64 arrays (numpy 1.x has no
    bitwise_count): byte-table lookup over the raw view."""
    return _POPCOUNT8[x.view(np.uint8).reshape(len(x), 8)].sum(axis=1)


# ---------------------------------------------------------------------------
# Candidate generation + clustering
# ---------------------------------------------------------------------------


def cluster_pairs(pairs: list[tuple], ids: list) -> dict:
    """Union-find: {id -> cluster representative (min id)}. Driver-side
    small-scale twin of :func:`cluster_pairs_dataset` (kept for kernel
    tests and tiny ad-hoc uses; the dedup stages use the Dataset path)."""
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


def bucket_pairs(keys: np.ndarray, ids: np.ndarray, *,
                 max_bucket: int | None = 256) -> np.ndarray:
    """Unique candidate pairs (lo, hi) among rows sharing a key.

    Fully vectorized for the dominant size-2 buckets (sort → adjacent-equal
    mask); only buckets with >2 members hit a Python loop, and those are
    rare by LSH design. Returns an (n, 2) int64 array.

    ``max_bucket`` bounds pair emission for hot buckets (the
    template-heavy-crawl case: one boilerplate band key collecting 10^4+
    docs would emit O(b²) pairs). A bucket with b > max_bucket unique
    members emits the full clique over its ``max_bucket`` smallest ids
    PLUS a star from the bucket minimum to every remaining member —
    O(M² + b) pairs instead of O(b²), deterministic under any
    partitioning (members are sorted ids). Connectivity of a true
    template cluster survives (every member still reaches the hub; hub
    edges verify when members are near-identical, which is what made
    the bucket hot); the documented recall cost is spoke-spoke pairs
    whose hub edge fails downstream verification. Clipped volume is
    LOGGED, never silent. ``max_bucket=None`` disables the cap."""
    if len(keys) == 0:
        return np.empty((0, 2), dtype=np.int64)
    order = np.argsort(keys, kind="stable")
    k2, i2 = keys[order], ids[order].astype(np.int64)
    change = np.r_[True, k2[1:] != k2[:-1]]
    run = np.cumsum(change) - 1
    sizes = np.bincount(run)
    starts = np.flatnonzero(change)
    s2 = starts[sizes == 2]
    a = [i2[s2]]
    b = [i2[s2 + 1]]
    clipped_buckets = 0
    clipped_pairs = 0
    for bi in np.flatnonzero(sizes > 2):
        members = np.unique(i2[starts[bi]:starts[bi] + sizes[bi]])
        if len(members) < 2:
            continue
        if max_bucket is not None and len(members) > max_bucket:
            clipped_buckets += 1
            full = len(members) * (len(members) - 1) // 2
            head = members[:max_bucket]
            xi, yi = np.triu_indices(len(head), k=1)
            a.append(head[xi])
            b.append(head[yi])
            tail = members[max_bucket:]
            a.append(np.full(len(tail), members[0], dtype=np.int64))
            b.append(tail)
            clipped_pairs += full - (len(xi) + len(tail))
            continue
        xi, yi = np.triu_indices(len(members), k=1)
        a.append(members[xi])
        b.append(members[yi])
    if clipped_buckets:
        import logging
        logging.getLogger(__name__).warning(
            "bucket_pairs: capped %d hot bucket(s) at max_bucket=%d "
            "(clique over smallest ids + min-id star); %d clique pairs "
            "not emitted — spoke-spoke recall now rides on other bands "
            "or downstream hub verification",
            clipped_buckets, max_bucket, clipped_pairs)
    aa = np.concatenate(a)
    bb = np.concatenate(b)
    lo, hi = np.minimum(aa, bb), np.maximum(aa, bb)
    keep = lo != hi
    if not keep.all():
        lo, hi = lo[keep], hi[keep]
    if len(lo) == 0:
        return np.empty((0, 2), dtype=np.int64)
    return np.unique(np.stack([lo, hi], axis=1), axis=0)


_EMPTY_PAIRS = pd.DataFrame({"a": pd.Series(dtype="int64"),
                             "b": pd.Series(dtype="int64")})


def _collect_pairs(pair_ds) -> np.ndarray:
    """Collect the (a, b) verified/candidate pair dataset — small by LSH
    design — and dedupe across partitions (one pair can collide in several
    bands, each landing in a different partition)."""
    df = pair_ds.to_pandas()
    if df.empty:
        return np.empty((0, 2), dtype=np.int64)
    arr = df[["a", "b"]].to_numpy(dtype=np.int64)
    return np.unique(arr, axis=0)


def _ids_dataset(ds, id_col: str, ids=None):
    """Id-universe Dataset (the per-id cluster table is the OUTPUT, so an
    O(N) id *Dataset* is inherent to the result — what must never exist is
    an O(N) driver-side list). ``ids`` may be a Dataset (used as-is), a
    list (wrapped — query-surface convenience at test scale), or None (an
    id-only projection of the input, which recomputes transform-derived
    inputs — callers with a cheap id source should pass one)."""
    import ray.data

    if ids is None:
        return ds.select_columns([id_col])
    if hasattr(ids, "select_columns"):
        return ids.select_columns([id_col])
    return ray.data.from_arrow(
        pa.table({id_col: pa.array(list(ids), type=pa.int64())}))


def _pairs_dataset(pairs: np.ndarray):
    """Wrap an (n, 2) verified-pair array (already on the driver, bounded
    by candidate count) as an (a, b) Dataset for label propagation."""
    import ray.data

    return ray.data.from_arrow(pa.table({
        "a": pa.array(pairs[:, 0], type=pa.int64()),
        "b": pa.array(pairs[:, 1], type=pa.int64())}))


def _components_numpy(arr: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Connected components of an (n, 2) int64 edge array, fully
    vectorized: min-label propagation with pointer jumping over index
    space. Returns (nodes, rep) for the nodes that appear in any edge;
    rep = min node id of the component. O(edges · log diameter), a few
    ms per million edges — the in-memory twin of the distributed loop in
    :func:`cluster_pairs_dataset`."""
    nodes = np.unique(arr)
    ai = np.searchsorted(nodes, arr[:, 0])
    bi = np.searchsorted(nodes, arr[:, 1])
    lab = np.arange(len(nodes), dtype=np.int64)
    while True:
        old = lab.copy()
        np.minimum.at(lab, ai, lab[bi])
        np.minimum.at(lab, bi, lab[ai])
        # pointer jumping: labels are node indices, so chase one hop —
        # halves chain depth each round (log-diameter convergence)
        lab = np.minimum(lab, lab[lab])
        if np.array_equal(lab, old):
            break
    return nodes, nodes[lab]


def _cluster_small(pair_ds, base_ds):
    """Driver-side finish for a small verified-pair graph: solve the
    components in memory (the pair set is O(LSH candidates) by
    construction — bounded by the banding design, never O(corpus)),
    broadcast only the non-root (node, rep) arrays via ``ray.put``, and
    resolve every id with a shuffle-free ``map_batches`` lookup over the
    id universe. Driver memory is O(pair-touched nodes); the corpus id
    table itself stays a Dataset."""
    import ray

    df = pair_ds.to_pandas()
    arr = df[["a", "b"]].to_numpy(dtype=np.int64)
    nodes, reps = _components_numpy(arr)
    sub = reps != nodes
    ref = ray.put((nodes[sub], reps[sub]))

    def resolve(t: pa.Table) -> pa.Table:
        n, r = ray.get(ref)
        ids = t.column("id").to_numpy()
        rep = t.column("rep").to_numpy().copy()
        if len(n):
            pos = np.searchsorted(n, ids)
            pos[pos >= len(n)] = 0
            hit = n[pos] == ids
            rep[hit] = r[pos[hit]]
        return pa.table({"id": pa.array(ids, type=pa.int64()),
                         "rep": pa.array(rep, type=pa.int64())})

    return base_ds.map_batches(resolve, batch_format="pyarrow")


# Above this many verified pairs the clustering runs as distributed
# label propagation; below it the pair graph is solved on the driver
# (see _cluster_small — the pair list is already driver-bounded by LSH
# design, and ~20 shuffle jobs of fixed ~1-2 s submit latency dwarf an
# in-memory solve until the graph is tens of millions of edges).
DRIVER_CLUSTER_MAX_PAIRS = 5_000_000


def cluster_pairs_dataset(pair_ds, ids_ds, id_col: str, *,
                          n_parts: int = 64, max_iters: int = 64,
                          cluster_mode: str = "auto"):
    """Connected components over a verified-pair Dataset. Returns an
    ``(id, rep)`` Dataset (rep = min id of the component); no
    O(corpus-ids) frame is ever constructed on the driver in either
    path. ``cluster_mode``: "auto" (default) solves pair graphs up to
    ``DRIVER_CLUSTER_MAX_PAIRS`` edges in memory (:func:`_cluster_small`
    — O(pair-touched-nodes) driver memory, zero shuffles) and switches
    to the iterative distributed label propagation below past that;
    "driver"/"distributed" force a path.

    State rows ``(node, val, kind)``: kind 0 = edge (node→val, emitted
    symmetric so labels flow both ways), kind 1 = node's current label,
    kind 2 = a label message delivered to node, kind 3 = a pointer-jump
    request (node = u's current label, val = u). ONE coarsened
    ``groupby(node)`` shuffle per round both folds incoming messages
    (new label = min(node, labels, messages)) and emits the next round's
    messages along every edge — all vectorized pandas in-partition.
    The jump requests add path compression: each round u asks its label
    target for *its* label (reply arrives as a kind-2 message), so chain
    components converge in O(log diameter) rounds instead of diameter
    rounds (the synthetic sf0.1 simhash graph has hamming chains of
    diameter ~12: 14 plain rounds → 6 with jumping). Replies only carry
    labels of same-component nodes, and a no-change round regenerates the
    identical deterministic state, so the convergence certificate below
    is unaffected by the extra message type.
    Labels only decrease, so the global self-label sum is a convergence
    certificate: a round with an unchanged sum proves no message lowered
    any label. Rounds needed ~ log(component diameter) + 2 (near-dup
    clusters are stars/cliques of mutated copies — diameter 1-2 in
    practice).
    Duplicate pairs (one pair colliding in several bands) are harmless:
    min-folding is idempotent, so the band output feeds in un-deduped.
    """
    from .relational import add_coarse_part

    pair_ds = pair_ds.materialize()
    n_pairs = pair_ds.count()
    has_pairs = n_pairs > 0
    # Size the per-round shuffle to the edge set: state rows ≈ 4·pairs +
    # 2·touched-nodes, and a fixed 64-way groupby over a few-KB state is
    # pure task-dispatch overhead (measured ~1.5 s/round at 7.6k pairs,
    # ~2.5 s/round at 50k pairs with 38 parts — per-partition pandas work
    # is ~ms, so partitions should be as coarse as worker heap allows).
    # ~512k state rows (~12 MB) per partition keeps the vectorized
    # in-partition fold cheap while capping at the caller's n_parts for
    # web-scale edge sets.
    n_prop_parts = int(max(4, min(n_parts, (n_pairs * 6) // 512_000 + 1)))

    def base(t: pa.Table) -> pa.Table:
        ids = t[id_col].combine_chunks().cast(pa.int64()) \
            if isinstance(t[id_col], pa.ChunkedArray) \
            else t[id_col].cast(pa.int64())
        return pa.table({"id": ids, "rep": ids})

    base_ds = ids_ds.map_batches(base, batch_format="pyarrow")
    if not has_pairs:
        return base_ds
    # Size-gated hybrid: the verified pair list is O(LSH candidates) by
    # banding design, so until it reaches tens of millions of edges an
    # in-memory solve + broadcast lookup (zero shuffles) beats paying
    # ~1-2 s of job-submit latency per propagation round. cluster_mode
    # "driver"/"distributed" force a path (tests pin both identical);
    # "auto" gates on the materialized pair count.
    if cluster_mode == "driver" or (
            cluster_mode == "auto" and n_pairs <= DRIVER_CLUSTER_MAX_PAIRS):
        return _cluster_small(pair_ds, base_ds)

    def to_state(df: pd.DataFrame) -> pd.DataFrame:
        a = df["a"].to_numpy(dtype=np.int64)
        b = df["b"].to_numpy(dtype=np.int64)
        return pd.DataFrame({
            "node": np.concatenate([a, b]),
            "val": np.concatenate([b, a]),
            "kind": np.zeros(2 * len(a), dtype=np.int64)})

    state = pair_ds.map_batches(to_state, batch_format="pandas")

    def step(group: pa.Table) -> pa.Table:
        df = group.to_pandas()
        kind = df["kind"].to_numpy()
        fold_mask = (kind == 1) | (kind == 2)
        own = pd.DataFrame({"node": pd.unique(df["node"])})
        own = own.assign(val=own["node"])
        m = (pd.concat([df.loc[fold_mask, ["node", "val"]], own],
                       ignore_index=True)
             .groupby("node", sort=False)["val"].min().reset_index())
        edges = df.loc[kind == 0, ["node", "val"]]
        msg = edges.merge(m, on="node", suffixes=("_dst", "_lab"))
        # a message can only lower the receiver's label if label < dst
        # (label(dst) <= dst always) — filtering here halves msg volume
        msg = msg[msg["val_lab"].to_numpy() < msg["val_dst"].to_numpy()]
        # pointer-jump replies: requester u (val) asked target t (node)
        # for t's label — reply lowers u only if label(t) < u
        jr = df.loc[kind == 3, ["node", "val"]].merge(
            m, on="node", suffixes=("_req", "_lab"))
        jr = jr[jr["val_lab"].to_numpy() < jr["val_req"].to_numpy()]
        # next round's jump requests: every non-root node asks its label
        nr = m[m["val"].to_numpy() < m["node"].to_numpy()]
        out = pd.concat([
            edges.assign(kind=np.int64(0)),
            m.assign(kind=np.int64(1)),
            pd.DataFrame({"node": msg["val_dst"].to_numpy(dtype=np.int64),
                          "val": msg["val_lab"].to_numpy(dtype=np.int64),
                          "kind": np.int64(2)}),
            pd.DataFrame({"node": jr["val_req"].to_numpy(dtype=np.int64),
                          "val": jr["val_lab"].to_numpy(dtype=np.int64),
                          "kind": np.int64(2)}),
            pd.DataFrame({"node": nr["val"].to_numpy(dtype=np.int64),
                          "val": nr["node"].to_numpy(dtype=np.int64),
                          "kind": np.int64(3)}),
        ], ignore_index=True)
        return pa.Table.from_pandas(out[["node", "val", "kind"]],
                                    preserve_index=False)

    def labsum_partial(t: pa.Table) -> pa.Table:
        mask = pc.equal(t.column("kind"), 1)
        s = pc.sum(pc.filter(t.column("val"), mask)).as_py()
        return pa.table({"s": pa.array([s or 0], type=pa.int64())})

    import os as _os
    import time as _time
    debug = bool(_os.environ.get("PDF_PARSER_DEBUG_CC"))
    # Rounds are chained in blocks of `span` inside ONE lazy plan per
    # materialize + certificate check: each Ray job carries ~0.5-1 s of
    # fixed submit/collect latency, which dominated the loop when every
    # round was its own job pair (measured 14 rounds × ~1.5 s at 7.6k
    # pairs). Equal block-end label sums still certify convergence —
    # labels are monotone non-increasing, so an unchanged sum across a
    # whole block proves no round inside it changed anything; at most
    # span-1 no-op rounds are wasted at the tail.
    span = 4
    prev = None
    for _block in range(0, max_iters, span):
        _t0 = _time.monotonic()
        for _ in range(span):
            state = (add_coarse_part(state, "node", n_prop_parts)
                     .groupby("_kpart")
                     .map_groups(step, batch_format="pyarrow"))
        state = state.materialize()
        cur = state.map_batches(labsum_partial,
                                batch_format="pyarrow").sum("s")
        if debug:
            print(f"[cc] rounds<={_block + span} parts={n_prop_parts} "
                  f"labsum={cur} sec={_time.monotonic() - _t0:.2f}")
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"label propagation did not converge in {max_iters} rounds")

    def labels(t: pa.Table) -> pa.Table:
        sub = t.filter(pc.equal(t.column("kind"), 1))
        return pa.table({"id": sub.column("node").cast(pa.int64()),
                         "rep": sub.column("val").cast(pa.int64())})

    lab_ds = state.map_batches(labels, batch_format="pyarrow")

    def fold(group: pa.Table) -> pa.Table:
        df = (group.to_pandas().groupby("id", sort=False)["rep"]
              .min().reset_index())
        return pa.Table.from_pandas(df, preserve_index=False)

    return (add_coarse_part(base_ds.union(lab_ds), "id", n_parts)
            .groupby("_kpart").map_groups(fold, batch_format="pyarrow"))


# ---------------------------------------------------------------------------
# Distributed exact verification of candidate pairs
# ---------------------------------------------------------------------------


# Auto-mode gate for verify_pairs_distributed: below this many candidate
# pairs the broadcast path wins (the driver holds at most gate-many pair
# ints — a BOUNDED allocation, ~32 MB at 2M pairs, the same measured-gate
# pattern as DRIVER_CLUSTER_MAX_PAIRS); above it the Dataset routing path
# keeps the candidate list off the driver entirely.
DRIVER_VERIFY_MAX_PAIRS = 2_000_000


def _verify_pairs_broadcast(ds, pairs: np.ndarray, id_col: str,
                            payload_batch_fn, pair_ok_fn,
                            pair_ok_batch_fn, n_parts: int) -> np.ndarray:
    """Small-candidate fast path: the pair list and the id→partition
    routing broadcast once — as NUMPY ARRAYS, which ``ray.get`` maps
    zero-copy from the object store per batch (pickled dicts would
    re-deserialize the whole structure on every access and cost several
    pointers per pair; review finding). Each corpus batch filters
    locally and emits payloads straight to their verify partitions — no
    corpus exchange at all (one payload shuffle only). Driver memory is
    O(pairs) flat int64, which the auto gate bounds (~32 MB at 2M)."""
    import ray

    # duplicate candidates (one pair colliding in several bands) dedupe
    # HERE, mirroring the dataset path's global-distinct routing
    pairs = np.unique(pairs, axis=0)
    a, b = pairs[:, 0], pairs[:, 1]
    ppart = (a * 1000003 + b) % n_parts
    order = np.argsort(ppart, kind="stable")
    pairs_sorted = np.ascontiguousarray(pairs[order])
    offsets = np.searchsorted(ppart[order], np.arange(n_parts + 1))
    # routing rows (pid, vpart), lexsorted+unique by construction
    rp = np.unique(np.stack([np.concatenate([a, b]),
                             np.concatenate([ppart, ppart])], axis=1),
                   axis=0)
    rp_pid = np.ascontiguousarray(rp[:, 0])
    rp_part = np.ascontiguousarray(rp[:, 1])
    uid = np.unique(rp_pid)
    route_ref = ray.put((uid, rp_pid, rp_part))
    pairs_ref = ray.put((pairs_sorted, offsets))

    _empty_emit = pd.DataFrame({"vpart": pd.Series(dtype="int64"),
                                "pid": pd.Series(dtype="int64"),
                                "payload": pd.Series(dtype="object")})

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        uid_, rp_pid_, rp_part_ = ray.get(route_ref)
        mask = np.isin(df[id_col].to_numpy(np.int64), uid_)
        sub = df[mask]
        if sub.empty:
            return _empty_emit.copy()
        payloads = payload_batch_fn(sub)
        ids = sub[id_col].to_numpy(np.int64)
        starts = np.searchsorted(rp_pid_, ids, side="left")
        counts = np.searchsorted(rp_pid_, ids, side="right") - starts
        total = int(counts.sum())  # counts >= 1: ids passed the filter
        # vectorized concatenation of [starts_i, starts_i + counts_i)
        take = np.ones(total, dtype=np.int64)
        take[0] = starts[0]
        bound = np.cumsum(counts)[:-1]
        take[bound] = starts[1:] - (starts[:-1] + counts[:-1]) + 1
        take = np.cumsum(take)
        pidx = np.repeat(np.arange(len(ids)), counts)
        return pd.DataFrame({
            "vpart": rp_part_[take],
            "pid": np.repeat(ids, counts),
            "payload": pd.Series([payloads[j] for j in pidx],
                                 dtype="object")})

    def verify(group: pd.DataFrame) -> pd.DataFrame:
        if group.empty:
            return _EMPTY_PAIRS.copy()
        pairs_, offsets_ = ray.get(pairs_ref)
        p = int(group["vpart"].iloc[0])
        todo = pairs_[offsets_[p]:offsets_[p + 1]]
        if len(todo) == 0:
            return _EMPTY_PAIRS.copy()
        by_id = dict(zip(group["pid"], group["payload"]))
        if pair_ok_batch_fn is not None:
            pa_list = [by_id.get(x) for x in todo[:, 0]]
            pb_list = [by_id.get(y) for y in todo[:, 1]]
            have = np.array([x is not None and y is not None
                             for x, y in zip(pa_list, pb_list)])
            ok = np.zeros(len(todo), dtype=bool)
            if have.any():
                ok[have] = np.asarray(pair_ok_batch_fn(
                    [p_ for p_, h in zip(pa_list, have) if h],
                    [p_ for p_, h in zip(pb_list, have) if h]),
                    dtype=bool)
            arr = todo[ok]
            return pd.DataFrame({"a": arr[:, 0], "b": arr[:, 1]})
        ok_a, ok_b = [], []
        for x, y in todo:
            px, py = by_id.get(x), by_id.get(y)
            if px is not None and py is not None and pair_ok_fn(px, py):
                ok_a.append(x)
                ok_b.append(y)
        return pd.DataFrame({"a": pd.Series(ok_a, dtype="int64"),
                             "b": pd.Series(ok_b, dtype="int64")})

    verified = (ds.map_batches(emit, batch_format="pandas")
                .groupby("vpart").map_groups(verify,
                                             batch_format="pandas"))
    return _collect_pairs(verified)


def verify_pairs_distributed(ds, pairs, id_col: str,
                             payload_batch_fn, pair_ok_fn,
                             *, pair_ok_batch_fn=None, n_parts: int = 32,
                             mode: str = "auto"):
    """Exact-verify candidate pairs without collecting the corpus — and,
    past the size gate, without holding the candidate list either.

    Two modes behind one measured gate (the DRIVER_CLUSTER_MAX_PAIRS
    pattern): ``broadcast`` ships the pair list + id→partition map once
    via ``ray.put`` and each corpus batch emits candidate payloads
    straight to their verify partitions — one payload shuffle, zero
    corpus exchanges, driver memory O(pairs) bounded by the gate.
    ``dataset`` (the 100-TB path) keeps candidates a Dataset end to
    end: (a, b) rows hash to a verify partition ``vpart``; a globally
    distinct (pid, vpart) routing projection joins the bloom-pruned
    corpus on id (:func:`..relational.shuffle_join`); pair rows and
    payload rows UNION and ``groupby(vpart)`` co-locates a pair with
    both payloads. ``auto`` counts the (materialized, tiny) pair rows
    and picks. Identical verified output either way.

    ``pairs`` may be an (a, b) Dataset — returns the verified (a, b)
    Dataset — or an (n, 2) ndarray for compatibility (returns ndarray).

    ``payload_batch_fn(sub_df) -> list[bytes]`` maps a filtered batch
    (id, …) to one packed payload per row (bytes travel as Arrow binary
    through the shuffle; decode inside ``pair_ok_fn``).
    ``pair_ok_batch_fn(pa_list, pb_list) -> bool array`` replaces the
    per-pair Python loop with one vectorized call over the partition's
    whole pair list — provide it whenever the check stacks (embedding
    dot products); fall back to ``pair_ok_fn`` for genuinely
    variable-length checks (shingle-set Jaccard).
    """
    from .relational import shuffle_join

    if mode not in ("auto", "broadcast", "dataset"):
        raise ValueError(f"unknown verify mode {mode}")

    as_array = isinstance(pairs, np.ndarray)
    if as_array:
        if len(pairs) == 0:
            return np.empty((0, 2), dtype=np.int64)
        n_parts = max(1, min(n_parts, len(pairs)))
        pair_count = len(pairs)
        pair_arr: np.ndarray | None = pairs
        pair_ds = None
    else:
        # consumed up to three times (routing, pair rows, bloom);
        # leaving it lazy re-executes the whole banding/emit upstream
        # per consumer (the q47 lazy-edge lesson — measured ~3x on q23)
        pair_ds = pairs.materialize()
        pair_count = pair_ds.count()
        pair_arr = None

    if mode == "auto":
        mode = ("broadcast" if pair_count <= DRIVER_VERIFY_MAX_PAIRS
                else "dataset")

    if mode == "broadcast":
        if pair_arr is None:
            pair_arr = _collect_pairs(pair_ds)
        if len(pair_arr) == 0:
            verified_arr = np.empty((0, 2), dtype=np.int64)
        else:
            verified_arr = _verify_pairs_broadcast(
                ds, pair_arr, id_col, payload_batch_fn, pair_ok_fn,
                pair_ok_batch_fn, max(1, min(n_parts, len(pair_arr))))
        if as_array:
            return verified_arr
        return _pairs_dataset(verified_arr)

    if pair_ds is None:
        pair_ds = _pairs_dataset(pair_arr)

    cols = ["vpart", "kind", "pid", "payload", "a", "b"]

    def _frame(vpart, kind, pid, payload, a, b) -> pd.DataFrame:
        return pd.DataFrame({
            "vpart": pd.Series(vpart, dtype="int64"),
            "kind": pd.Series(kind, dtype="int64"),
            "pid": pd.Series(pid, dtype="int64"),
            "payload": pd.Series(payload, dtype="object"),
            "a": pd.Series(a, dtype="int64"),
            "b": pd.Series(b, dtype="int64")})[cols]

    def _vpart(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        return (a * 1000003 + b) % n_parts

    def pair_rows(df: pd.DataFrame) -> pd.DataFrame:
        df = df[["a", "b"]].drop_duplicates()
        vp = _vpart(df["a"].to_numpy(np.int64), df["b"].to_numpy(np.int64))
        n = len(df)
        return _frame(vp, np.ones(n), np.full(n, -1), [b""] * n,
                      df["a"].to_numpy(np.int64), df["b"].to_numpy(np.int64))

    def route_rows(df: pd.DataFrame) -> pd.DataFrame:
        a = df["a"].to_numpy(np.int64)
        b = df["b"].to_numpy(np.int64)
        vp = _vpart(a, b)
        out = pd.DataFrame({"pid": np.concatenate([a, b]),
                            "vpart": np.concatenate([vp, vp])})
        return out.drop_duplicates()

    routing = pair_ds.map_batches(route_rows, batch_format="pandas")

    # GLOBAL distinct on (pid, vpart): a pair colliding in k bands
    # yields identical routing rows in k different blocks — the
    # per-batch drop_duplicates can't see across them, and each
    # surviving duplicate would ship the doc's payload once more
    # through the verify exchange (review finding; the r3 broadcast
    # dict emitted each payload exactly once per partition). One
    # coarsened exchange of two-int rows is far cheaper than k-times
    # the payload bytes on template-heavy corpora.
    from .relational import add_coarse_part

    def _distinct(group: pd.DataFrame) -> pd.DataFrame:
        return group[["pid", "vpart"]].drop_duplicates()

    routing = (add_coarse_part(routing, "pid", n_parts)
               .groupby("_kpart").map_groups(_distinct,
                                             batch_format="pandas"))

    # Bloom semi-join pushdown: at real scale candidates are a tiny
    # fraction of the corpus, but the routing join would still move
    # every corpus row through the exchange once. A FIXED-size bloom of
    # candidate ids (default 2^23 bits = 1 MiB regardless of candidate
    # count; bit positions stream through the driver, O(1) retained)
    # broadcasts once and prunes non-candidate rows BEFORE the shuffle;
    # false positives just drop in the inner merge. In the doubled-
    # corpus oracle tests every id is a candidate, so this prunes
    # nothing there — it pays off on real corpora with rare dups.
    import ray

    m_bits = 1 << 23
    words = np.zeros(m_bits >> 6, dtype=np.uint64)

    def bloom_positions(ids: np.ndarray) -> np.ndarray:
        pos = np.empty(len(ids) * 2, dtype=np.uint64)
        u = ids.astype(np.uint64)
        pos[0::2] = _mix64(u) % np.uint64(m_bits)
        pos[1::2] = _mix64(u ^ np.uint64(0x9E3779B97F4A7C15)) \
            % np.uint64(m_bits)
        return pos

    def pos_rows(df: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(np.concatenate([df["a"].to_numpy(np.int64),
                                        df["b"].to_numpy(np.int64)]))
        return pd.DataFrame({"p": np.unique(bloom_positions(ids))})

    for batch in (pair_ds.map_batches(pos_rows, batch_format="pandas")
                  .iter_batches(batch_format="pandas")):
        p = batch["p"].to_numpy(np.uint64)
        np.bitwise_or.at(words, (p >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (p & np.uint64(63)))
    bloom_ref = ray.put(words)

    def bloom_keep(df: pd.DataFrame) -> pd.DataFrame:
        w = ray.get(bloom_ref)
        ids = df[id_col].to_numpy(np.int64)
        pos = bloom_positions(ids).reshape(-1, 2)
        def bit(p):
            return (w[(p >> np.uint64(6)).astype(np.int64)]
                    >> (p & np.uint64(63))) & np.uint64(1)
        keep = (bit(pos[:, 0]) & bit(pos[:, 1])).astype(bool)
        return df[keep]

    pruned = ds.map_batches(bloom_keep, batch_format="pandas")
    hits = shuffle_join(pruned, routing, left_on=id_col, right_on="pid",
                        n_parts=n_parts)

    def payload_rows(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return _frame([], [], [], [], [], [])
        payloads = payload_batch_fn(df)
        n = len(df)
        return _frame(df["vpart"].to_numpy(np.int64), np.zeros(n),
                      df[id_col].to_numpy(np.int64), payloads,
                      np.full(n, -1), np.full(n, -1))

    stream = (hits.map_batches(payload_rows, batch_format="pandas")
              .union(pair_ds.map_batches(pair_rows,
                                         batch_format="pandas")))

    def verify(group: pd.DataFrame) -> pd.DataFrame:
        todo = group[group["kind"] == 1][["a", "b"]].drop_duplicates()
        if todo.empty:
            return _EMPTY_PAIRS.copy()
        py = group[group["kind"] == 0]
        by_id = dict(zip(py["pid"], py["payload"]))
        if pair_ok_batch_fn is not None:
            # vectorized verify over the whole partition's pair list
            pa_list = [by_id.get(x) for x in todo["a"]]
            pb_list = [by_id.get(y) for y in todo["b"]]
            have = np.array([x is not None and y is not None
                             for x, y in zip(pa_list, pb_list)])
            if not have.any():
                return _EMPTY_PAIRS.copy()
            sub_a = [p for p, h in zip(pa_list, have) if h]
            sub_b = [p for p, h in zip(pb_list, have) if h]
            ok = np.zeros(len(todo), dtype=bool)
            ok[have] = np.asarray(pair_ok_batch_fn(sub_a, sub_b),
                                  dtype=bool)
            return pd.DataFrame({
                "a": todo["a"].to_numpy(np.int64)[ok],
                "b": todo["b"].to_numpy(np.int64)[ok]})
        ok_a, ok_b = [], []
        for x, y in todo.itertuples(index=False):
            px, pyl = by_id.get(x), by_id.get(y)
            if px is not None and pyl is not None and pair_ok_fn(px, pyl):
                ok_a.append(x)
                ok_b.append(y)
        return pd.DataFrame({"a": pd.Series(ok_a, dtype="int64"),
                             "b": pd.Series(ok_b, dtype="int64")})

    verified = stream.groupby("vpart").map_groups(verify,
                                                  batch_format="pandas")
    if as_array:
        return _collect_pairs(verified)
    return verified


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------


class MinHashBandRows:
    """Actor/task UDF: text batch → LSH band rows, one fused pass.

    Output rows: ``(id, band_key, band_part, sig)`` — ``sig`` is the full
    signature packed to bytes (8·num_perm B, shared object across the
    doc's band rows). Permutation params build once per worker."""

    def __init__(self, text_col: str, id_col: str, num_perm: int = 64,
                 bands: int = 16, k: int = 3, seed: int = 13,
                 n_parts: int = 64):
        self.text_col = text_col
        self.id_col = id_col
        self.num_perm = num_perm
        self.bands = bands
        self.rows = num_perm // bands
        self.k = k
        self.n_parts = n_parts
        self.a, self.b = _perm_params(num_perm, seed)

    def _signatures(self, texts) -> np.ndarray:
        sig = np.empty((len(texts), self.num_perm), dtype=np.uint64)
        for i, t in enumerate(texts):
            sig[i] = minhash_signature(shingle_hashes(t, self.k),
                                       self.a, self.b)
        return sig

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({self.id_col: pd.Series(dtype="int64"),
                                 "band_key": pd.Series(dtype="uint64"),
                                 "band_part": pd.Series(dtype="int64"),
                                 "sig": pd.Series(dtype="object")})
        sig = self._signatures(df[self.text_col].fillna("").tolist())
        keys = band_keys_from_sig(sig, self.bands, self.rows)
        n = sig.shape[0]
        # carry the signature truncated to uint32: the verifier only tests
        # component-wise EQUALITY, and 32-bit truncations of 61-bit minhash
        # values collide with prob 2^-32 per component — halves the
        # band-row shuffle volume for free
        sig_bytes = np.array([s.astype(np.uint32).tobytes() for s in sig],
                             dtype=object)
        return pd.DataFrame({
            self.id_col: np.repeat(df[self.id_col].to_numpy(), self.bands),
            "band_key": keys.ravel(),
            "band_part": (keys.ravel() % np.uint64(self.n_parts))
            .astype(np.int64),
            "sig": np.repeat(sig_bytes, self.bands),
        })


def band_keys_from_sig(sig: np.ndarray, bands: int, rows: int) -> np.ndarray:
    """(n, num_perm) signature matrix → (n, bands) mixed uint64 band keys;
    numpy throughout (``rows`` is a tiny fixed loop with vector ops inside)."""
    n = sig.shape[0]
    chunks = sig.reshape(n, bands, rows)
    mixed = np.zeros((n, bands), dtype=np.uint64)
    for ri in range(rows):
        mixed = _mix64(mixed ^ chunks[:, :, ri])
    band_idx = np.broadcast_to(np.arange(bands, dtype=np.uint64), (n, bands))
    return mixed ^ _mix64(band_idx.copy())


def _minhash_verify_partition(id_col: str, num_perm: int, threshold: float,
                              max_bucket: int | None = 256):
    """Partition verifier: vectorized bucket-pair emission + signature-
    agreement estimate over the whole partition frame."""
    def verify(group: pd.DataFrame) -> pd.DataFrame:
        pairs = bucket_pairs(group["band_key"].to_numpy(),
                             group[id_col].to_numpy(),
                             max_bucket=max_bucket)
        if len(pairs) == 0:
            return _EMPTY_PAIRS.copy()
        ids = group[id_col].to_numpy(dtype=np.int64)
        # decode signatures ONLY for ids that occur in a pair — the
        # frombuffer loop is the partition's hot spot and pair ids are a
        # tiny subset of the partition's rows
        uid = np.unique(pairs)
        order = np.argsort(ids, kind="stable")
        row_idx = order[np.searchsorted(ids[order], uid)]
        sig_vals = group["sig"].to_numpy()
        sigmat = np.stack([np.frombuffer(sig_vals[i], dtype=np.uint32)
                           for i in row_idx])
        ai = np.searchsorted(uid, pairs[:, 0])
        bi = np.searchsorted(uid, pairs[:, 1])
        est = (sigmat[ai] == sigmat[bi]).mean(axis=1)
        keep = est >= threshold
        return pd.DataFrame({"a": pairs[keep, 0], "b": pairs[keep, 1]})
    return verify


_BAND_UDF_CACHE: dict = {}


def _minhash_band_fn(df: pd.DataFrame, **kw) -> pd.DataFrame:
    """Task-pool wrapper: per-worker cached :class:`MinHashBandRows` (perm
    params built once per worker process). Task mode fuses with the read
    and uses every core — a fixed actor pool here capped the expensive
    shingling stage (r1 gotcha: small actor pools starve/underuse)."""
    key = tuple(sorted(kw.items()))
    udf = _BAND_UDF_CACHE.get(key)
    if udf is None:
        udf = _BAND_UDF_CACHE[key] = MinHashBandRows(**kw)
    return udf(df)


def minhash_band_dataset(ds, text_col: str, id_col: str, *,
                         num_perm: int = 64, bands: int = 16, k: int = 3,
                         seed: int = 13, n_parts: int = 64,
                         concurrency=None):
    """The fused signature→band-row stage shared by MinHash dedup and the
    n-gram Jaccard candidate generator (kills the r1 double pass).

    ``concurrency`` is accepted for API compatibility but the stage runs
    as a task pool (see :func:`_minhash_band_fn`)."""
    return ds.select_columns([id_col, text_col]).map_batches(
        _minhash_band_fn, fn_kwargs={
            "text_col": text_col, "id_col": id_col, "num_perm": num_perm,
            "bands": bands, "k": k, "seed": seed, "n_parts": n_parts},
        batch_format="pandas")


def minhash_lsh_dedup(ds, text_col: str, id_col: str, *, num_perm: int = 64,
                      bands: int = 16, k: int = 3, threshold: float = 0.8,
                      concurrency=None, n_parts: int = 64,
                      ids=None, max_bucket: int | None = None) -> pd.DataFrame:
    """Full MinHash→LSH→verify→cluster pipeline, banded-shuffle shape.

    One pass over text (fused sig+banding) → ``groupby(band_part)`` shuffle
    of the band rows → in-partition vectorized pair emission + signature
    verification → distributed label propagation over the verified pair
    Dataset (:func:`cluster_pairs_dataset`; nothing O(corpus) touches the
    driver). Returns an ``(id, rep)`` Dataset covering every input id.

    ``max_bucket`` (advisor r4): the hot-bucket pair cap is OPT-IN on
    the one-shot APIs — ``None`` (default) emits every in-bucket pair,
    so a heterogeneous hot bucket (two unrelated clusters colliding on
    one band key) loses no spoke-spoke recall. Set it (e.g. 256) for
    template-heavy crawls where one boilerplate band key collects 10⁴+
    docs and O(b²) pair emission would dominate — the clique+star shape
    and its recall cost are documented at :func:`bucket_pairs`. The
    standing-scale paths (flagship ``near_dedup_records``, the
    incremental band-index probe) keep an explicit 256 default."""
    pair_ds = minhash_verified_pairs(
        ds, text_col, id_col, num_perm=num_perm, bands=bands, k=k,
        threshold=threshold, n_parts=n_parts, max_bucket=max_bucket,
        concurrency=concurrency)
    return cluster_pairs_dataset(pair_ds, _ids_dataset(ds, id_col, ids),
                                 id_col, n_parts=n_parts)


def minhash_verified_pairs(ds, text_col: str, id_col: str, *,
                           num_perm: int = 64, bands: int = 16,
                           k: int = 3, threshold: float = 0.8,
                           n_parts: int = 64,
                           max_bucket: int | None = None,
                           concurrency=None):
    """The shared band→verify chain (fused sig+banding →
    ``groupby(band_part)`` → in-partition pair emission + signature
    agreement ≥ threshold) returning the verified (a, b) pair Dataset —
    one implementation for :func:`minhash_lsh_dedup` and the flagship's
    ``near_dedup_records`` (review finding: the chain was duplicated,
    so verify-path fixes had to land twice)."""
    band_ds = minhash_band_dataset(
        ds, text_col, id_col, num_perm=num_perm, bands=bands, k=k,
        n_parts=n_parts, concurrency=concurrency)
    return band_ds.groupby("band_part").map_groups(
        _minhash_verify_partition(id_col, num_perm, threshold, max_bucket),
        batch_format="pandas")


def minhash_candidate_pairs(ds, text_col: str, id_col: str, *,
                            num_perm: int = 64, bands: int = 16, k: int = 3,
                            n_parts: int = 64, max_bucket: int | None = None,
                            as_dataset: bool = False,
                            concurrency=(1, 4)):
    """Candidate (a, b) pairs from LSH banding alone (threshold-free) —
    feeds exact verifiers (n-gram Jaccard). ``as_dataset`` returns the
    pair Dataset uncollected (may contain cross-band duplicates of a
    pair — they hash to one verify partition and dedupe there); the
    default ndarray return is the driver-side convenience form."""
    band_ds = minhash_band_dataset(
        ds, text_col, id_col, num_perm=num_perm, bands=bands, k=k,
        n_parts=n_parts, concurrency=concurrency)

    def emit(group: pd.DataFrame) -> pd.DataFrame:
        pairs = bucket_pairs(group["band_key"].to_numpy(),
                             group[id_col].to_numpy(),
                             max_bucket=max_bucket)
        if len(pairs) == 0:
            return _EMPTY_PAIRS.copy()
        return pd.DataFrame({"a": pairs[:, 0], "b": pairs[:, 1]})

    pair_ds = band_ds.groupby("band_part").map_groups(
        emit, batch_format="pandas")
    if as_dataset:
        return pair_ds
    return _collect_pairs(pair_ds)


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------


def simhash_dedup(ds, text_col: str, id_col: str, *, max_hamming: int = 3,
                  n_bands: int = 4, n_parts: int = 64,
                  ids=None, max_bucket: int | None = None) -> pd.DataFrame:
    """SimHash banding, banded-shuffle shape: 64-bit sig split into
    ``n_bands`` chunks; rows sharing a chunk meet in a ``band_part``
    partition; full-hamming verification (≤ max_hamming) runs vectorized
    in-partition; clustering is distributed label propagation. Returns an
    ``(id, rep)`` Dataset."""
    width = 64 // n_bands
    mask = np.uint64((1 << width) - 1)

    def band_rows(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                                 "band_key": pd.Series(dtype="uint64"),
                                 "band_part": pd.Series(dtype="int64"),
                                 "sig": pd.Series(dtype="uint64")})
        sigs = simhash64_batch(df[text_col].fillna("").tolist())
        ids = df[id_col].to_numpy()
        frames = []
        for bi in range(n_bands):
            keys = ((np.uint64(bi) << np.uint64(60))
                    | ((sigs >> np.uint64(bi * width)) & mask))
            frames.append(pd.DataFrame({
                id_col: ids, "band_key": keys,
                "band_part": (keys % np.uint64(n_parts)).astype(np.int64),
                "sig": sigs}))
        return pd.concat(frames, ignore_index=True)

    def verify(group: pd.DataFrame) -> pd.DataFrame:
        pairs = bucket_pairs(group["band_key"].to_numpy(),
                             group[id_col].to_numpy(),
                             max_bucket=max_bucket)
        if len(pairs) == 0:
            return _EMPTY_PAIRS.copy()
        ids = group[id_col].to_numpy(dtype=np.int64)
        uid, first_idx = np.unique(ids, return_index=True)
        sigs = group["sig"].to_numpy(dtype=np.uint64)[first_idx]
        ai = np.searchsorted(uid, pairs[:, 0])
        bi = np.searchsorted(uid, pairs[:, 1])
        ham = _popcount64(sigs[ai] ^ sigs[bi])
        keep = ham <= max_hamming
        return pd.DataFrame({"a": pairs[keep, 0], "b": pairs[keep, 1]})

    band_ds = ds.select_columns([id_col, text_col]).map_batches(
        band_rows, batch_format="pandas")
    pair_ds = band_ds.groupby("band_part").map_groups(
        verify, batch_format="pandas")
    return cluster_pairs_dataset(pair_ds, _ids_dataset(ds, id_col, ids),
                                 id_col, n_parts=n_parts)


# ---------------------------------------------------------------------------
# n-gram Jaccard near-dup (LSH candidates + distributed exact verify)
# ---------------------------------------------------------------------------


def ngram_jaccard_dedup(ds, text_col: str, id_col: str, *, k: int = 3,
                        threshold: float = 0.8, num_perm: int = 64,
                        bands: int = 16, n_parts: int = 64,
                        ids=None, max_bucket: int | None = None) -> pd.DataFrame:
    """Exact n-gram-Jaccard verification over MinHash-LSH candidates.

    One banding pass generates candidates; exact verification runs through
    :func:`verify_pairs_distributed` — candidates stay a DATASET end to
    end (r4: banding → routing join → in-partition verify → label
    propagation with no O(candidates) driver allocation anywhere); each
    candidate doc is shingled batch-wise in the workers. Neither texts
    nor shingle sets nor the pair list are ever collected. Returns
    an ``(id, rep)`` Dataset (distributed label propagation)."""
    cand = minhash_candidate_pairs(ds, text_col, id_col, num_perm=num_perm,
                                   bands=bands, k=k, n_parts=n_parts,
                                   max_bucket=max_bucket, as_dataset=True)

    def payloads(sub: pd.DataFrame) -> list:
        return [shingle_hashes(t, k).tobytes()
                for t in sub[text_col].fillna("")]

    def ok(bx: bytes, by: bytes) -> bool:
        sx = np.frombuffer(bx, dtype=np.uint64)
        sy = np.frombuffer(by, dtype=np.uint64)
        inter = len(np.intersect1d(sx, sy, assume_unique=True))
        union = len(sx) + len(sy) - inter
        return (inter / max(1, union)) >= threshold

    verified = verify_pairs_distributed(
        ds.select_columns([id_col, text_col]), cand, id_col, payloads, ok)
    return cluster_pairs_dataset(verified,
                                 _ids_dataset(ds, id_col, ids), id_col,
                                 n_parts=n_parts)


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup (signed-random-projection LSH)
# ---------------------------------------------------------------------------


class SRPBandRows:
    """Batch UDF: embedding batch → signed-random-projection band rows.

    ``n_planes`` random hyperplanes (seeded Gaussian, built lazily at the
    first batch from the observed dimension, once per worker) give each
    vector a sign bitmask; the mask splits into ``bands`` chunks → band
    keys, exactly the SimHash shape. Cosine-identical vectors get
    identical signs, so true duplicates collide in every band
    (deterministic recall for exact-direction dups); near-dups at cosine c
    collide per band w.p. (1 - arccos(c)/π)^(n_planes/bands)."""

    def __init__(self, vec_col: str, id_col: str, n_planes: int = 64,
                 bands: int = 8, seed: int = 29, n_parts: int = 64):
        self.vec_col = vec_col
        self.id_col = id_col
        self.n_planes = n_planes
        self.bands = bands
        self.width = n_planes // bands
        self.seed = seed
        self.n_parts = n_parts
        self.planes: np.ndarray | None = None

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({self.id_col: pd.Series(dtype="int64"),
                                 "band_key": pd.Series(dtype="uint64"),
                                 "band_part": pd.Series(dtype="int64"),
                                 "sig": pd.Series(dtype="uint64")})
        mat = np.stack(df[self.vec_col].to_numpy()).astype(np.float64)
        if self.planes is None:
            rng = np.random.RandomState(self.seed)
            self.planes = rng.standard_normal((self.n_planes, mat.shape[1]))
        bits = (mat @ self.planes.T) > 0  # (n, n_planes) bool
        weights = (np.uint64(1)
                   << np.arange(self.n_planes, dtype=np.uint64))
        packed = (bits.astype(np.uint64) * weights[None, :]).sum(axis=1)
        ids = df[self.id_col].to_numpy()
        mask = np.uint64((1 << self.width) - 1)
        frames = []
        for bi in range(self.bands):
            keys = ((np.uint64(bi) << np.uint64(59))
                    | ((packed >> np.uint64(bi * self.width)) & mask))
            frames.append(pd.DataFrame({
                self.id_col: ids, "band_key": keys,
                "band_part": (keys % np.uint64(self.n_parts))
                .astype(np.int64),
                "sig": packed}))
        return pd.concat(frames, ignore_index=True)


def _srp_band_fn(df: pd.DataFrame, **kw) -> pd.DataFrame:
    """Task-pool wrapper: per-worker cached :class:`SRPBandRows` (plane
    matrix built once per worker)."""
    key = tuple(sorted(kw.items()))
    udf = _BAND_UDF_CACHE.get(("srp", key))
    if udf is None:
        udf = _BAND_UDF_CACHE[("srp", key)] = SRPBandRows(**kw)
    return udf(df)


def embedding_dedup(ds, vec_col: str, id_col: str, *, threshold: float = 0.95,
                    n_planes: int = 64, bands: int = 8,
                    n_parts: int = 64, concurrency=None,
                    ids=None, max_bucket: int | None = None) -> pd.DataFrame:
    """Near-dup by cosine ≥ threshold via SRP-LSH banding + distributed
    exact-cosine verification (r2: replaces the r1 O(N²) broadcast matmul;
    no full-matrix ``ray.put`` anywhere).

    Candidate recall is deterministic for exact-direction duplicates and
    probabilistic (documented on :class:`SRPBandRows`) for angular
    near-dups; raise ``bands`` (narrower chunks) for recall, lower it for
    candidate volume. Returns an ``(id, rep)`` Dataset."""
    band_ds = ds.select_columns([id_col, vec_col]).map_batches(
        _srp_band_fn, fn_kwargs={
            "vec_col": vec_col, "id_col": id_col, "n_planes": n_planes,
            "bands": bands, "n_parts": n_parts},
        batch_format="pandas")

    # In-partition sign-hamming pre-filter: clustered corpora make raw
    # band collisions explode (at sf0.1 the synthetic embeddings give
    # ~290k collisions for 2k vectors). A pair at cosine ≥ t flips each
    # SRP sign bit independently with p = arccos(t)/π, so its hamming
    # distance is ≤ Binomial(n_planes, p). Cut at mean + 4σ (floor 3):
    # the >4σ binomial tail is <~3e-5 per pair, vs the former hard 2×-mean
    # cut whose tail dropped ~0.2-0.5% of genuinely above-threshold pairs
    # at t ≤ 0.95 before exact-cosine verification ever saw them
    # (advisor finding). Exact verify downstream keeps precision exact;
    # this bound only controls recall.
    p_flip = np.arccos(min(1.0, max(-1.0, threshold))) / np.pi
    mu = n_planes * p_flip
    sigma = np.sqrt(n_planes * p_flip * (1.0 - p_flip))
    ham_max = max(3, int(np.ceil(mu + 4.0 * sigma)))

    def emit(group: pd.DataFrame) -> pd.DataFrame:
        pairs = bucket_pairs(group["band_key"].to_numpy(),
                             group[id_col].to_numpy(),
                             max_bucket=max_bucket)
        if len(pairs) == 0:
            return _EMPTY_PAIRS.copy()
        ids = group[id_col].to_numpy(dtype=np.int64)
        uid = np.unique(pairs)
        order = np.argsort(ids, kind="stable")
        row_idx = order[np.searchsorted(ids[order], uid)]
        sigs = group["sig"].to_numpy(dtype=np.uint64)[row_idx]
        ai = np.searchsorted(uid, pairs[:, 0])
        bi = np.searchsorted(uid, pairs[:, 1])
        keep = _popcount64(sigs[ai] ^ sigs[bi]) <= ham_max
        return pd.DataFrame({"a": pairs[keep, 0], "b": pairs[keep, 1]})

    cand = band_ds.groupby("band_part").map_groups(emit,
                                                   batch_format="pandas")

    def payloads(sub: pd.DataFrame) -> list:
        mat = np.stack(sub[vec_col].to_numpy()).astype(np.float64)
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        return [row.tobytes() for row in mat]

    def ok(bx: bytes, by: bytes) -> bool:
        vx = np.frombuffer(bx, dtype=np.float64)
        vy = np.frombuffer(by, dtype=np.float64)
        return float(vx @ vy) >= threshold

    def ok_batch(pa_list, pb_list) -> np.ndarray:
        # one stacked row-wise dot product for the whole partition
        mx = np.stack([np.frombuffer(b, dtype=np.float64)
                       for b in pa_list])
        my = np.stack([np.frombuffer(b, dtype=np.float64)
                       for b in pb_list])
        return np.einsum("ij,ij->i", mx, my) >= threshold

    verified = verify_pairs_distributed(
        ds.select_columns([id_col, vec_col]), cand, id_col, payloads, ok,
        pair_ok_batch_fn=ok_batch)
    return cluster_pairs_dataset(verified,
                                 _ids_dataset(ds, id_col, ids), id_col,
                                 n_parts=n_parts)


# ---------------------------------------------------------------------------
# Persisted fingerprint index — incremental (new-shard vs corpus) dedup
# ---------------------------------------------------------------------------


def build_fingerprint_index(ds, id_col: str, text_col: str,
                            index_dir: str, *, n_buckets: int = 64,
                            batch_size: int = 1024) -> str:
    """Persist the corpus's exact-dedup keys as a bucketed parquet index
    so NEW shards can be deduped against the corpus without rescanning
    it — the incremental-ingest twin of :func:`exact_dedup` (one-shot)
    and the same build-once/probe-many layout as
    ``similarity.IVFIndex`` (`fp_part=` hive dirs, pruned reads).

    Rows (fingerprint, id) land in bucket ``int(fp[:4], 16) %
    n_buckets``; only these two columns are stored, so the index is
    O(corpus ids), not O(payloads). At web scale the index is appended
    per ingest wave — buckets are disjoint by construction, so appends
    never rewrite existing files.

    Single-node note: the ``local://`` scheme plus the probe's
    driver-side directory listing assume every node sees ``index_dir``
    — point it at a shared filesystem / object store on a multi-node
    cluster (same constraint as :func:`build_minhash_band_index`).
    """
    import ray.data

    from .textstats import add_fingerprint

    def fp(df: pd.DataFrame) -> pd.DataFrame:
        out = add_fingerprint(df, text_col)[[id_col, "fingerprint"]]
        out["fp_part"] = (out["fingerprint"].str[:4]
                          .apply(lambda h: int(h, 16) % n_buckets)
                          .astype("int64"))
        return out

    (ds.select_columns([id_col, text_col])
     .map_batches(fp, batch_format="pandas", batch_size=batch_size)
     # bound files per bucket: hive writes emit one file per
     # (block x touched dir) — see build_minhash_band_index
     .repartition(8)
     .write_parquet(f"local://{index_dir}", partition_cols=["fp_part"]))
    return index_dir


def dedup_against_index(new_ds, index_dir: str, id_col: str,
                        text_col: str, *, n_buckets: int = 64,
                        batch_size: int = 1024, as_dataset: bool = False):
    """Check a NEW shard against a :func:`build_fingerprint_index`
    corpus index: returns (id, match_id) for every new doc whose
    fingerprint already exists (match_id = smallest indexed id). Only
    index buckets actually touched by the new shard's fingerprints are
    read — a new wave that is small or skewed prunes most of the index
    from disk, and the join itself is the coarsened big-to-big
    ``shuffle_join`` on the fingerprint, so neither side is collected.

    Default returns a driver pandas frame (O(matched new docs) —
    query-surface convenience); ``as_dataset=True`` keeps the matches a
    Dataset for ingest waves where even the match list is big (the
    per-partition min is already global per id, so only a cross-block
    min fold remains — done with one coarsened groupby).
    """
    import os

    import ray.data

    from .relational import shuffle_join
    from .textstats import add_fingerprint

    def fp(df: pd.DataFrame) -> pd.DataFrame:
        out = add_fingerprint(df, text_col)[[id_col, "fingerprint"]]
        out["fp_part"] = (out["fingerprint"].str[:4]
                          .apply(lambda h: int(h, 16) % n_buckets)
                          .astype("int64"))
        return out

    new_fp = (new_ds.select_columns([id_col, text_col])
              .map_batches(fp, batch_format="pandas",
                           batch_size=batch_size)).materialize()

    touched = set(
        new_fp.select_columns(["fp_part"]).unique("fp_part"))
    paths = [os.path.join(index_dir, f"fp_part={b}")
             for b in sorted(touched)
             if os.path.isdir(os.path.join(index_dir, f"fp_part={b}"))]
    if not paths:
        return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                             "match_id": pd.Series([], dtype="int64")})
    files = [os.path.join(p, f) for p in paths
             for f in sorted(os.listdir(p)) if f.endswith(".parquet")]
    idx = ray.data.read_parquet(files).map_batches(
        lambda df: df.rename(columns={id_col: "idx_id"})
                     [["fingerprint", "idx_id"]],
        batch_format="pandas")

    joined = shuffle_join(new_fp.drop_columns(["fp_part"]), idx,
                          left_on="fingerprint")

    def best(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(id_col, sort=False)["idx_id"].min()
             .rename("match_id").reset_index())
        g["match_id"] = g["match_id"].astype("int64")
        return g

    partials = joined.map_batches(best, batch_format="pandas")
    if as_dataset:
        from .relational import add_coarse_part

        def fold(group: pd.DataFrame) -> pd.DataFrame:
            g = (group.groupby(id_col, sort=False)["match_id"].min()
                 .astype("int64").reset_index())
            return g

        return (add_coarse_part(partials, id_col, 32)
                .groupby("_kpart").map_groups(fold,
                                              batch_format="pandas"))
    parts = partials.to_pandas()
    if not len(parts):
        return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                             "match_id": pd.Series([], dtype="int64")})
    return (parts.groupby(id_col, sort=True)["match_id"].min()
            .astype("int64").reset_index())


def compact_index(index_dir: str, *, max_in_flight: int = 16) -> dict:
    """Compact a persisted index (:func:`build_fingerprint_index`'s
    ``fp_part=`` layout or :func:`build_minhash_band_index`'s
    ``band_part=`` — any single-level hive dir tree): rewrite each
    bucket's accumulated per-wave file set to ONE file per bucket.

    N ingest waves append N file sets per bucket; past ~100 waves the
    probe pays per-file open/footer overhead again (the 4096→512
    lesson). Buckets are disjoint by construction, so compaction is
    embarrassingly parallel — one Ray task per multi-file bucket, each
    reading its own files only. Parameter sidecars (``_index_meta.json``)
    are untouched. Crash-safe: the merged file lands via atomic
    ``os.replace`` before the wave files are unlinked; a crash in
    between leaves duplicate rows that every probe tolerates (fp probe
    takes min match_id; band probe drop-duplicates candidates), and the
    next compact's exact-duplicate-row drop removes them (both index
    schemas are projections whose repeated rows carry zero information,
    so the drop is always safe). Single-node note: same
    shared-filesystem assumption as the builders/probes (documented
    there).

    Returns {"buckets": total, "compacted": rewritten,
    "files_before": n, "files_after": n}.
    """
    import os

    import ray

    @ray.remote
    def compact_bucket(bdir: str) -> tuple[int, int]:
        import pyarrow.parquet as _pq

        files = sorted(f for f in os.listdir(bdir)
                       if f.endswith(".parquet"))
        if len(files) <= 1:
            return len(files), len(files)
        merged = pa.concat_tables(
            [_pq.read_table(os.path.join(bdir, f)) for f in files],
            promote_options="default")
        # drop exact-duplicate rows: a crash between a previous
        # compact's os.replace and its unlinks leaves one wave's rows
        # twice (review finding — without this the duplicates would be
        # folded in permanently)
        merged = pa.Table.from_pandas(
            merged.to_pandas().drop_duplicates(),
            schema=merged.schema, preserve_index=False)
        tmp = os.path.join(bdir, "_compact.tmp")
        _pq.write_table(merged, tmp)
        final = "compacted-000.parquet"
        os.replace(tmp, os.path.join(bdir, final))
        for f in files:
            if f != final:
                os.remove(os.path.join(bdir, f))
        return len(files), 1

    bdirs = [os.path.join(index_dir, d) for d in sorted(os.listdir(index_dir))
             if "=" in d and os.path.isdir(os.path.join(index_dir, d))]
    stats = {"buckets": len(bdirs), "compacted": 0,
             "files_before": 0, "files_after": 0}
    pending, results = [], []
    for bdir in bdirs:
        pending.append(compact_bucket.remote(bdir))
        if len(pending) >= max_in_flight:
            done, pending = ray.wait(pending, num_returns=1)
            results.extend(ray.get(done))
    results.extend(ray.get(pending))
    for before, after in results:
        stats["files_before"] += before
        stats["files_after"] += after
        if before > after:
            stats["compacted"] += 1
    return stats


# ---------------------------------------------------------------------------
# Persisted MinHash band index — incremental NEAR-dup (new-shard vs corpus)
# ---------------------------------------------------------------------------


def build_minhash_band_index(ds, id_col: str, text_col: str,
                             index_dir: str, *, num_perm: int = 64,
                             bands: int = 16, k: int = 3, seed: int = 13,
                             n_buckets: int = 64) -> str:
    """Persist the corpus's LSH band rows as a bucketed parquet index so
    NEW ingest waves can be NEAR-deduped against the corpus without
    re-signing it — the near-dup completion of
    :func:`build_fingerprint_index` (exact) + :func:`minhash_lsh_dedup`
    (one-shot). Rows ``(id, band_key, sig)`` land in hive dirs
    ``band_part=band_key % n_buckets``; buckets are disjoint by
    construction, so per-wave appends never rewrite existing files.

    A ``_index_meta.json`` sidecar pins the banding parameters; the
    probe refuses a mismatched index (wrong params silently produce
    wrong candidates otherwise).

    Single-node note (also applies to the fingerprint index): the
    ``local://`` scheme plus the probe's driver-side directory listing
    assume every node sees ``index_dir`` — point it at a shared
    filesystem / object store on a multi-node cluster.
    """
    import json
    import os

    band_ds = minhash_band_dataset(
        ds.select_columns([id_col, text_col]), text_col, id_col,
        num_perm=num_perm, bands=bands, k=k, seed=seed,
        n_parts=n_buckets)
    # hive writes emit one file per (input block x touched dir): an
    # unbounded block count explodes into n_buckets x blocks tiny files
    # (measured 4096 at sf0.1 — the probe then pays per-file read
    # overhead). Bound the writer to a few blocks of the tiny
    # (id, band_key, sig) projection.
    band_ds.repartition(8).write_parquet(f"local://{index_dir}",
                                         partition_cols=["band_part"])
    meta = {"num_perm": num_perm, "bands": bands, "k": k, "seed": seed,
            "n_buckets": n_buckets, "id_col": id_col}
    with open(os.path.join(index_dir, "_index_meta.json"), "w") as f:
        json.dump(meta, f)
    return index_dir


def dedup_against_band_index(new_ds, index_dir: str, id_col: str,
                             text_col: str, *, threshold: float = 0.8,
                             num_perm: int = 64, bands: int = 16,
                             k: int = 3, seed: int = 13,
                             n_buckets: int = 64,
                             max_bucket: int | None = 256,
                             n_parts: int = 32):
    """NEAR-dup a NEW shard against a :func:`build_minhash_band_index`
    corpus index. Returns the verified match Dataset ``(id_col,
    match_id)`` — one row per (new doc, index doc) pair whose signature
    agreement ≥ ``threshold`` (cross-band duplicates removed); reduce
    downstream (min per id for a q48-style decision, or EXISTS for a
    drop filter).

    Shape: the new shard bands once (same fused signature pass the
    one-shot path uses) and only the index buckets its band keys touch
    are read from disk; index and new band rows union and meet in a
    coarsened ``groupby(band_part)``; candidate generation is a
    vectorized in-partition merge on band_key — new×index ONLY (never
    index×index: the corpus is already deduped) — with the index side
    of each hot key capped to its ``max_bucket`` smallest ids (logged);
    signature verification is the same vectorized slot-agreement test
    as :func:`minhash_lsh_dedup`. Nothing O(corpus) or O(candidates)
    lands on the driver.

    Recall asymmetry of the cap (advisor r4): unlike
    :func:`bucket_pairs`' clique+star shape (where every member keeps a
    hub edge), capping the INDEX side of a hot band key to its
    ``max_bucket`` smallest ids has no hub fallback — a new doc whose
    only true source ranks outside those smallest index ids in EVERY
    band it shares is silently unmatched (warning-logged row counts
    only). With 16 bands this needs the source to lose all 16 races,
    so in practice hot-key misses concentrate on boilerplate clusters
    where *some* small-id template member still matches; pass
    ``max_bucket=None`` to trade O(new×bucket) candidate volume for
    exact banding recall.
    """
    import json
    import os

    import ray.data

    from .relational import add_coarse_part

    meta_path = os.path.join(index_dir, "_index_meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        want = {"num_perm": num_perm, "bands": bands, "k": k,
                "seed": seed, "n_buckets": n_buckets}
        got = {kk: meta.get(kk) for kk in want}
        if got != want:
            raise ValueError(
                f"band-index parameter mismatch: index built with {got}, "
                f"probe called with {want}")

    new_band = minhash_band_dataset(
        new_ds.select_columns([id_col, text_col]), text_col, id_col,
        num_perm=num_perm, bands=bands, k=k, seed=seed,
        n_parts=n_buckets).materialize()

    touched = set(new_band.select_columns(["band_part"])
                  .unique("band_part"))
    files = []
    for b in sorted(touched):
        p = os.path.join(index_dir, f"band_part={b}")
        if os.path.isdir(p):
            files.extend(os.path.join(p, f) for f in sorted(os.listdir(p))
                         if f.endswith(".parquet"))

    empty = pd.DataFrame({id_col: pd.Series(dtype="int64"),
                          "match_id": pd.Series(dtype="int64")})
    if not files:
        return ray.data.from_pandas(empty)

    def tag(side: int):
        def add(df: pd.DataFrame) -> pd.DataFrame:
            # recompute band_part from band_key: hive writes strip the
            # partition column, and the explicit-file read (required —
            # read_parquet won't expand dirs inside a path list) never
            # re-infers it
            bk = df["band_key"].to_numpy().astype(np.uint64)
            out = pd.DataFrame({
                "band_part": (bk % np.uint64(n_buckets)).astype(np.int64),
                "band_key": bk,
                "pid": df[id_col].astype("int64"),
                "sig": df["sig"],
                "side": np.int64(side)})
            return out
        return add

    idx_rows = ray.data.read_parquet(files).map_batches(
        tag(0), batch_format="pandas")
    new_rows = new_band.map_batches(tag(1), batch_format="pandas")

    def probe(group: pd.DataFrame) -> pd.DataFrame:
        newr = group[group["side"] == 1]
        idxr = group[group["side"] == 0]
        if newr.empty or idxr.empty:
            return empty.copy()
        pre = len(idxr)
        if max_bucket is not None:
            idxr = (idxr.sort_values("pid")
                    .groupby("band_key", sort=False).head(max_bucket))
            if len(idxr) < pre:
                import logging
                logging.getLogger(__name__).warning(
                    "dedup_against_band_index: capped hot band keys to "
                    "their %d smallest index ids (%d rows dropped)",
                    max_bucket, pre - len(idxr))
        cand = (newr[["band_key", "pid"]]
                .merge(idxr[["band_key", "pid"]]
                       .rename(columns={"pid": "idx_id"}), on="band_key")
                [["pid", "idx_id"]].drop_duplicates())
        if cand.empty:
            return empty.copy()

        def sig_matrix(frame: pd.DataFrame, need: np.ndarray):
            sub = frame.drop_duplicates("pid")
            sub = sub[sub["pid"].isin(need)]
            pids = sub["pid"].to_numpy(np.int64)
            order = np.argsort(pids)
            pids = pids[order]
            mat = np.stack([np.frombuffer(b, dtype=np.uint32)
                            for b in sub["sig"].to_numpy()[order]])
            return pids, mat

        np_ids, nmat = sig_matrix(newr, cand["pid"].unique())
        ix_ids, imat = sig_matrix(idxr, cand["idx_id"].unique())
        ai = np.searchsorted(np_ids, cand["pid"].to_numpy(np.int64))
        bi = np.searchsorted(ix_ids, cand["idx_id"].to_numpy(np.int64))
        est = (nmat[ai] == imat[bi]).mean(axis=1)
        keep = est >= threshold
        return pd.DataFrame({
            id_col: cand["pid"].to_numpy(np.int64)[keep],
            "match_id": cand["idx_id"].to_numpy(np.int64)[keep]})

    matches = (idx_rows.union(new_rows)
               .groupby("band_part").map_groups(probe,
                                                batch_format="pandas"))

    # one pair can collide in several bands => several band_part
    # partitions; final coarsened dedup on the new id
    def dedupe(group: pd.DataFrame) -> pd.DataFrame:
        return (group[[id_col, "match_id"]]
                .drop_duplicates([id_col, "match_id"]))

    return (add_coarse_part(matches, id_col, n_parts)
            .groupby("_kpart").map_groups(dedupe, batch_format="pandas"))
