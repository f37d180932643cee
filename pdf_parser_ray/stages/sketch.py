"""Mergeable sketches over Dataset columns — the approximate
distinct-count and quantile machinery a 100 TB pipeline needs where the
exact answer (``COUNT(DISTINCT)``, per-key ``quantile_cont``) would be an
all-to-all shuffle of the raw column.

Both sketches follow the pre-aggregate discipline: each batch reduces to a
tiny partial (k hashes / a register array) inside ``map_batches``, partials
merge associatively, and only O(batches × sketch_size) bytes ever move —
never the column. Hashing is md5, so sketch CONTENT is deterministic and
(for KMV) exactly replicable in SQL: the k smallest distinct hashes are
``SELECT DISTINCT md5(col) ORDER BY 1 LIMIT k`` — which makes the sketch
itself oracle-checkable even though the estimate is approximate.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

KMV_K = 64


def _md5_hex(values) -> list[str]:
    return [hashlib.md5(str(v).encode()).hexdigest() for v in values]


def kmv_sketch(ds, col: str, *, k: int = KMV_K) -> list[str]:
    """K-minimum-values sketch: the k lexicographically-smallest distinct
    md5 hex digests of ``col``. Per-batch partial top-k smallest → driver
    merge of O(k × batches) strings."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        hs = sorted(set(_md5_hex(df[col].dropna())))[:k]
        return pd.DataFrame({"h": pd.Series(hs, dtype="object")})

    parts = (ds.select_columns([col])
             .map_batches(partial, batch_format="pandas").to_pandas())
    return sorted(set(parts["h"]))[:k]


def kmv_estimate(hashes: list[str], k: int = KMV_K) -> float:
    """Distinct-count estimate from a KMV sketch: fewer than k hashes means
    the sketch saw every distinct value (exact); otherwise (k-1)/frac(kth)
    where frac maps the hex digest onto [0, 1)."""
    if len(hashes) < k:
        return float(len(hashes))
    kth = int(hashes[k - 1][:16], 16) / float(1 << 64)
    return (k - 1) / max(kth, 1e-18)


def _hll_idx_rank(vals: pd.Series, p: int) -> tuple[np.ndarray, np.ndarray]:
    """(register index, rank) per value: top ``p`` bits of the 64-bit md5
    prefix pick the register; rank = leading zeros of the remaining bits
    + 1 (capped at 64-p+1). Vectorized branchless-CLZ ladder; shared by
    the global and grouped HLL sketches so both pin the same bit law."""
    raw = np.array([int(h[:16], 16) for h in _md5_hex(vals)],
                   dtype=np.uint64)
    idx = (raw >> np.uint64(64 - p)).astype(np.int64)
    rest = (raw << np.uint64(p)) | np.uint64((1 << p) - 1)
    lz = np.zeros(len(raw), dtype=np.uint8)
    work = rest.copy()
    for shift in (32, 16, 8, 4, 2, 1):  # branchless CLZ ladder
        mask = work < (np.uint64(1) << np.uint64(64 - shift))
        lz[mask] += shift
        work[mask] <<= np.uint64(shift)
    rank = np.minimum(lz + 1, 64 - p + 1).astype(np.uint8)
    return idx, rank


def hll_sketch(ds, col: str, *, p: int = 12) -> np.ndarray:
    """HyperLogLog register array (2^p uint8 registers). Register update is
    vectorized numpy over each batch's md5 stream; partials merge by
    elementwise max (the HLL merge law)."""
    m = 1 << p

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        regs = np.zeros(m, dtype=np.uint8)
        vals = df[col].dropna()
        if len(vals):
            idx, rank = _hll_idx_rank(vals, p)
            np.maximum.at(regs, idx, rank)
        return pd.DataFrame({"reg": [regs.tobytes()]})

    parts = (ds.select_columns([col])
             .map_batches(partial, batch_format="pandas").to_pandas())
    merged = np.zeros(m, dtype=np.uint8)
    for blob in parts["reg"]:
        merged = np.maximum(merged, np.frombuffer(blob, dtype=np.uint8))
    return merged


def grouped_hll_registers(ds, key: str, col: str, *, p: int = 12,
                          n_parts: int = 32,
                          batch_size: int = 8192) -> pd.DataFrame:
    """Per-KEY HyperLogLog registers — the mergeable grouped-sketch shape
    for "distinct users per segment" at web scale: each batch reduces to
    SPARSE (key, idx, rank) max-partials (bounded by the batch's distinct
    (key, register) pairs, never the rows), one coarsened
    ``groupby(key-hash)`` exchange max-folds them, and the collected
    result is O(keys × 2^p) — driver-small for report-style key spaces
    (estimate per key via :func:`hll_estimate` on the dense array).
    Register CONTENT is deterministic (same md5 bit law as
    :func:`hll_sketch` via ``_hll_idx_rank``), so a SQL oracle can pin
    the registers exactly, not just the estimate. Returns pandas
    (key, idx, register), sorted. NULL keys raise per batch; NULL
    values are dropped (the q77 ``WHERE col IS NOT NULL`` law)."""
    from .relational import add_coarse_part

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if df[key].isna().any():
            # the grouping-sets discipline: a silently-dropped NULL key
            # diverges from SQL's NULL group — raise loudly per batch
            # (null VALUES are dropped, matching the oracles' WHERE
            # col IS NOT NULL convention)
            raise ValueError(
                "grouped_hll_registers requires non-null keys — "
                "filter or fillna upstream")
        d = df.dropna(subset=[col])
        if not len(d):
            return pd.DataFrame({key: pd.Series(dtype="object"),
                                 "idx": pd.Series(dtype="int64"),
                                 "rank": pd.Series(dtype="int64")})
        idx, rank = _hll_idx_rank(d[col], p)
        g = pd.DataFrame({key: d[key].to_numpy(), "idx": idx,
                          "rank": rank.astype("int64")})
        return (g.groupby([key, "idx"], sort=False)["rank"].max()
                .reset_index())

    parts = ds.select_columns([key, col]).map_batches(
        partial, batch_format="pandas", batch_size=batch_size)

    def fold(group: pd.DataFrame) -> pd.DataFrame:
        return (group.groupby([key, "idx"], sort=False)["rank"].max()
                .rename("register").reset_index())

    out = (add_coarse_part(parts, key, n_parts)
           .groupby("_kpart")
           .map_groups(lambda g: fold(g.drop(columns=["_kpart"])),
                       batch_format="pandas")
           .to_pandas())
    out["idx"] = out["idx"].astype("int64")
    out["register"] = out["register"].astype("int64")
    return out.sort_values([key, "idx"]).reset_index(drop=True)


def grouped_histogram(ds, key: str, value_col: str, *,
                      nbins: int = 64, return_bounds: bool = False):
    """Mergeable per-key equi-width histogram — the sketch-grade swap for
    exact grouped quantiles (``relational.grouped_quantiles`` / q62)
    documented there: instead of shuffling every raw value to its key's
    partition, each batch reduces to at most ``keys × nbins`` counter rows
    and only those partials ever move.

    Two passes over the column, zero shuffles:
      1. per-batch (key, lo, hi) partials → driver min/max merge
         (O(keys) rows — the bounds table is broadcast back via task
         closure; at extreme key cardinality ship it with ``ray.put``),
      2. per-batch vectorized binning → (key, bin_id, n) partials →
         driver sum (each partial ≤ keys × nbins rows regardless of
         batch size).

    Bin arithmetic is plain IEEE float64 — ``width = (hi - lo) / nbins``,
    ``bin = floor((v - lo) / width)`` clamped to ``nbins - 1`` — so the
    histogram CONTENT is bit-exactly replicable in SQL (the q34 oracle),
    like the KMV sketch above. A key whose values are all equal
    (``hi == lo``) lands entirely in bin 0. NULL values are dropped.

    Returns a pandas frame (key, bin_id int64, n int64) sorted by
    (key, bin_id); feed it to :func:`histogram_quantiles` for estimates.
    ``return_bounds`` additionally returns the (key, lo, hi) bounds frame
    histogram_quantiles needs (the sketch alone cannot recover it).
    """
    proj = ds.select_columns([key, value_col])

    def bounds_partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df.dropna(subset=[value_col])
        g = d.groupby(key, sort=False)[value_col].agg(["min", "max"])
        return g.reset_index().rename(columns={"min": "lo", "max": "hi"})

    parts = proj.map_batches(bounds_partial,
                             batch_format="pandas").to_pandas()
    bounds = (parts.groupby(key, sort=False)
              .agg(lo=("lo", "min"), hi=("hi", "max")))
    lo_map = bounds["lo"].to_dict()
    hi_map = bounds["hi"].to_dict()

    def hist_partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df.dropna(subset=[value_col])
        if not len(d):
            return pd.DataFrame({key: pd.Series([], dtype=df[key].dtype),
                                 "bin_id": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64")})
        lo = d[key].map(lo_map).to_numpy(dtype=np.float64)
        hi = d[key].map(hi_map).to_numpy(dtype=np.float64)
        v = d[value_col].to_numpy(dtype=np.float64)
        width = (hi - lo) / float(nbins)
        with np.errstate(divide="ignore", invalid="ignore"):
            raw = np.floor((v - lo) / width)
        raw = np.where(width > 0, raw, 0.0)
        bins = np.minimum(raw, nbins - 1).astype(np.int64)
        g = (pd.DataFrame({key: d[key].to_numpy(), "bin_id": bins})
             .groupby([key, "bin_id"], sort=False).size()
             .rename("n").reset_index())
        g["n"] = g["n"].astype("int64")
        return g

    partials = proj.map_batches(hist_partial,
                                batch_format="pandas").to_pandas()
    out = (partials.groupby([key, "bin_id"], sort=False)["n"].sum()
           .astype("int64").reset_index()
           .sort_values([key, "bin_id"]).reset_index(drop=True))
    if return_bounds:
        return out, bounds.reset_index()
    return out


def histogram_quantiles(hist: pd.DataFrame, key: str,
                        quantiles=(0.5, 0.9, 0.99), *,
                        bounds: pd.DataFrame | None = None,
                        nbins: int = 64) -> pd.DataFrame:
    """Quantile estimates from a :func:`grouped_histogram` sketch by
    linear interpolation inside the containing bin — error bounded by one
    bin width of that key's value range. ``bounds`` is the (key, lo, hi)
    frame; if omitted it cannot be recovered from the sketch and a
    unit-range [0, 1) is assumed (useful only in tests).

    Per-key work is O(nbins); the sketch is already tiny, so this runs
    on the driver.
    """
    rows = []
    for k, g in hist.groupby(key, sort=True):
        counts = np.zeros(nbins, dtype=np.float64)
        counts[g["bin_id"].to_numpy()] = g["n"].to_numpy()
        total = counts.sum()
        if bounds is not None:
            b = bounds.loc[bounds[key] == k]
            lo, hi = float(b["lo"].iloc[0]), float(b["hi"].iloc[0])
        else:
            lo, hi = 0.0, 1.0
        width = (hi - lo) / float(nbins) if hi > lo else 0.0
        cum = np.cumsum(counts)
        row = {key: k}
        for q in quantiles:
            if total == 0 or width == 0.0:
                row[f"q{int(q * 100)}"] = lo
                continue
            target = q * total
            b_idx = int(np.searchsorted(cum, target, side="left"))
            b_idx = min(b_idx, nbins - 1)
            prev = cum[b_idx - 1] if b_idx else 0.0
            frac = ((target - prev) / counts[b_idx]
                    if counts[b_idx] > 0 else 0.0)
            row[f"q{int(q * 100)}"] = lo + width * (b_idx + frac)
        rows.append(row)
    return pd.DataFrame(rows)


def hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimator with the small-range (linear counting)
    correction."""
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


BLOOM_M = 8192
BLOOM_K = 4


def bloom_sketch(ds, col: str, *, m: int = BLOOM_M,
                 k: int = BLOOM_K) -> np.ndarray:
    """Bloom filter over a column — the membership sketch a web pipeline
    uses for URL blocklists and already-seen sets where a shuffle join
    against the full key set would be absurd. Double hashing (Kirsch &
    Mitzenmacher 2006): md5(value) supplies two 32-bit words h1, h2 and
    bit i lands at (h1 + i*h2) % m.

    Per-batch partials are m-bit arrays OR-merged on the driver (the
    Bloom merge law), so only O(batches × m/8) bytes move — never the
    column. Like the KMV sketch, the CONTENT is deterministic and
    SQL-replicable (``CAST('0x' || substr(md5(v),1,8) AS UBIGINT)``), so
    the q36 oracle hash-checks the exact set-bit positions.

    Returns a bool numpy array of length m.
    """
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(m, dtype=bool)
        vals = df[col].dropna().unique()
        if len(vals):
            hx = _md5_hex(vals)
            h1 = np.array([int(h[:8], 16) for h in hx], dtype=np.uint64)
            h2 = np.array([int(h[8:16], 16) for h in hx], dtype=np.uint64)
            for i in range(k):
                bits[((h1 + np.uint64(i) * h2) % np.uint64(m))
                     .astype(np.int64)] = True
        return pd.DataFrame({"bits": [np.packbits(bits).tobytes()]})

    parts = (ds.select_columns([col])
             .map_batches(partial, batch_format="pandas").to_pandas())
    merged = np.zeros((m + 7) // 8 * 8, dtype=np.uint8)
    for blob in parts["bits"]:
        merged |= np.unpackbits(np.frombuffer(blob, dtype=np.uint8))
    return merged[:m].astype(bool)


def bloom_contains(bits: np.ndarray, values, *,
                   k: int = BLOOM_K) -> np.ndarray:
    """Vectorized membership probe: True = possibly present (false-
    positive rate ~(1-e^{-kn/m})^k), False = definitely absent. Use
    inside ``map_batches`` with the bits broadcast once via ``ray.put``
    to filter a stream against a blocklist with zero shuffle."""
    m = len(bits)
    hx = _md5_hex(values)
    h1 = np.array([int(h[:8], 16) for h in hx], dtype=np.uint64)
    h2 = np.array([int(h[8:16], 16) for h in hx], dtype=np.uint64)
    out = np.ones(len(hx), dtype=bool)
    for i in range(k):
        out &= bits[((h1 + np.uint64(i) * h2) % np.uint64(m))
                    .astype(np.int64)]
    return out


CMS_D = 4
CMS_W = 1024


def count_min_sketch(ds, text_col: str, *, d: int = CMS_D,
                     w: int = CMS_W,
                     batch_size: int = 1024) -> np.ndarray:
    """Count-min sketch over the whitespace-token stream of a text
    column — approximate per-token frequencies in O(d × w) memory where
    the exact answer is a full token groupby. Each batch reduces to a
    d × w int64 counter matrix (row r hashes token t to
    ``md5(f"{r}:{t}")[:8] % w``); matrices SUM-merge (the CMS merge
    law), so partials are a fixed 32 KB regardless of batch size.

    Cell contents are exact sums of deterministic hash buckets, so the
    sketch is hash-oracle-checkable (q39) like every sketch in this
    module; only the point estimate (min over rows, upward-biased by
    collisions) is approximate — see :func:`cms_estimate`.
    """
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        mat = np.zeros((d, w), dtype=np.int64)
        toks = df[text_col].fillna("").str.split().explode().dropna()
        if len(toks):
            counts = toks.value_counts()
            for r in range(d):
                cells = np.array(
                    [int(hashlib.md5(f"{r}:{t}".encode())
                         .hexdigest()[:8], 16) % w
                     for t in counts.index], dtype=np.int64)
                np.add.at(mat[r], cells, counts.to_numpy())
        return pd.DataFrame({"m": [mat.tobytes()]})

    parts = (ds.select_columns([text_col])
             .map_batches(partial, batch_format="pandas",
                          batch_size=batch_size).to_pandas())
    merged = np.zeros(d * w, dtype=np.int64)
    for blob in parts["m"]:
        merged += np.frombuffer(blob, dtype=np.int64)
    return merged.reshape(d, w)


def cms_estimate(mat: np.ndarray, tokens, *, w: int = CMS_W) -> np.ndarray:
    """Point frequency estimates: min over the d rows — never an
    undercount, overcounts only on all-row collisions."""
    d = mat.shape[0]
    out = np.empty((d, len(tokens)), dtype=np.int64)
    for r in range(d):
        cells = [int(hashlib.md5(f"{r}:{t}".encode()).hexdigest()[:8],
                     16) % w for t in tokens]
        out[r] = mat[r, cells]
    return out.min(axis=0)
