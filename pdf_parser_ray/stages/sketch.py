"""Mergeable sketches over Dataset columns — approximate distinct-count
machinery a 100 TB pipeline needs where exact ``COUNT(DISTINCT)`` would be
an all-to-all shuffle.

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


def hll_sketch(ds, col: str, *, p: int = 12) -> np.ndarray:
    """HyperLogLog register array (2^p uint8 registers). Register update is
    vectorized numpy over each batch's md5 stream; partials merge by
    elementwise max (the HLL merge law)."""
    m = 1 << p

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        regs = np.zeros(m, dtype=np.uint8)
        vals = df[col].dropna()
        if len(vals):
            raw = np.array([int(h[:16], 16) for h in _md5_hex(vals)],
                           dtype=np.uint64)
            idx = (raw >> np.uint64(64 - p)).astype(np.int64)
            rest = (raw << np.uint64(p)) | np.uint64((1 << p) - 1)
            # leading-zero count of the remaining 64-p bits, via bit-length
            lz = np.zeros(len(raw), dtype=np.uint8)
            work = rest.copy()
            for shift in (32, 16, 8, 4, 2, 1):  # branchless CLZ ladder
                mask = work < (np.uint64(1) << np.uint64(64 - shift))
                lz[mask] += shift
                work[mask] <<= np.uint64(shift)
            rank = np.minimum(lz + 1, 64 - p + 1).astype(np.uint8)
            np.maximum.at(regs, idx, rank)
        return pd.DataFrame({"reg": [regs.tobytes()]})

    parts = (ds.select_columns([col])
             .map_batches(partial, batch_format="pandas").to_pandas())
    merged = np.zeros(m, dtype=np.uint8)
    for blob in parts["reg"]:
        merged = np.maximum(merged, np.frombuffer(blob, dtype=np.uint8))
    return merged


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
