"""Similarity search over an embedding column (``list<float>``).

Brute-force cosine top-k is the baseline: the query matrix is broadcast
once (``ray.put``), each data batch does one numpy matmul and emits its
*local* top-k per query, and a final tiny ``groupby(query_id)`` merges the
per-block candidates — a combiner pattern, so the shuffle carries
``O(queries × k × blocks)`` rows, never the corpus.

The scale path is IVF: k-means-lite centroids (sampled, fit driver-side
once), each row assigned to its nearest centroid at ingest
(``add_ivf_partition``), and queries probe only ``nprobe`` partitions —
same verify math, a fraction of the matmuls.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


class BlockTopK:
    """Actor UDF: local cosine top-k of each batch against the broadcast
    query matrix. Emits (query_id, neighbor_id, cosine) candidate rows."""

    def __init__(self, queries_ref, vec_col: str, id_col: str, k: int):
        import ray
        q = ray.get(queries_ref)
        self.qids = q["ids"]
        self.qmat = _normalize(np.asarray(q["mat"], dtype=np.float64))
        self.vec_col = vec_col
        self.id_col = id_col
        self.k = k

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        mat = _normalize(np.stack(df[self.vec_col].to_numpy()).astype(np.float64))
        sims = self.qmat @ mat.T  # (nq, batch)
        ids = df[self.id_col].to_numpy()
        k = min(self.k, sims.shape[1])
        take = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        out_q, out_n, out_s = [], [], []
        for qi, qid in enumerate(self.qids):
            cols = take[qi]
            out_q += [qid] * len(cols)
            out_n += ids[cols].tolist()
            out_s += sims[qi, cols].tolist()
        return pd.DataFrame({"query_id": out_q, "neighbor_id": out_n,
                             "cosine": out_s})


def knn_topk(ds, queries: dict, *, vec_col: str, id_col: str, k: int = 5,
             batch_size: int = 2048, concurrency=(1, 4)) -> pd.DataFrame:
    """Exact cosine top-k. ``queries`` = {"ids": [...], "mat": ndarray}.

    Returns pandas (query_id, neighbor_id, cosine) with k rows per query,
    cosine computed in float64 and rounded to 6 dp for cross-engine
    comparability.
    """
    import ray

    queries_ref = ray.put(queries)
    cands = ds.select_columns([id_col, vec_col]).map_batches(
        BlockTopK,
        fn_constructor_kwargs={"queries_ref": queries_ref, "vec_col": vec_col,
                               "id_col": id_col, "k": k},
        batch_format="pandas", batch_size=batch_size,
        concurrency=concurrency)

    def merge(group: pa.Table) -> pa.Table:
        # deterministic under cosine ties: smaller neighbor_id wins, the
        # same ORDER BY cosine DESC, vec_id rule the oracle uses
        df = (group.to_pandas()
              .sort_values(["cosine", "neighbor_id"],
                           ascending=[False, True], kind="mergesort")
              .head(k))
        return pa.Table.from_pandas(df, preserve_index=False)

    merged = cands.groupby("query_id").map_groups(merge, batch_format="pyarrow")
    out = merged.to_pandas()
    out["cosine"] = out["cosine"].round(6)
    return (out.sort_values(["query_id", "cosine", "neighbor_id"],
                            ascending=[True, False, True])
            .reset_index(drop=True))


# ---------------------------------------------------------------------------
# IVF (scale path)
# ---------------------------------------------------------------------------


def fit_centroids(ds, vec_col: str, n_centroids: int = 16,
                  sample_rows: int = 4096, iters: int = 8,
                  seed: int = 5) -> np.ndarray:
    """k-means-lite on a driver-side sample (the centroid table is tiny and
    broadcast everywhere; fitting it centrally is the standard IVF shape)."""
    sample = ds.select_columns([vec_col]).limit(sample_rows).to_pandas()
    x = _normalize(np.stack(sample[vec_col].to_numpy()).astype(np.float64))
    rng = np.random.RandomState(seed)
    cent = x[rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ cent.T, axis=1)
        for ci in range(len(cent)):
            members = x[assign == ci]
            if len(members):
                cent[ci] = members.mean(axis=0)
        cent = _normalize(cent)
    return cent


def add_ivf_partition(ds, centroids: np.ndarray, vec_col: str,
                      out_col: str = "ivf_part"):
    """Assign each row to its nearest centroid (broadcast matmul)."""
    import ray

    cent_ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        cent = ray.get(cent_ref)
        m = _normalize(np.stack(df[vec_col].to_numpy()).astype(np.float64))
        df = df.copy()
        df[out_col] = np.argmax(m @ cent.T, axis=1).astype(np.int32)
        return df

    return ds.map_batches(assign, batch_format="pandas")


class IVFIndex:
    """Persisted IVF index: the corpus is scanned ONCE at build time and
    written as ivf_part-bucketed parquet; every search reads only the
    probed partition directories (hive pruning at the read — the r1
    version re-assigned the whole corpus per query call, VERDICT r1 §5).

    Layout: ``index_dir/ivf_part=<p>/*.parquet`` (id + vector columns)
    plus ``index_dir/_centroids.parquet`` so a later process can reopen
    the index without refitting (resume-friendly, like the write-path
    manifests)."""

    def __init__(self, index_dir: str, centroids: np.ndarray,
                 vec_col: str, id_col: str):
        self.index_dir = index_dir
        self.centroids = _normalize(np.asarray(centroids, dtype=np.float64))
        self.vec_col = vec_col
        self.id_col = id_col

    @classmethod
    def build(cls, ds, vec_col: str, id_col: str, index_dir: str, *,
              n_centroids: int = 16, sample_rows: int = 4096,
              iters: int = 8, seed: int = 5) -> "IVFIndex":
        import pyarrow.parquet as _pq

        cent = fit_centroids(ds, vec_col, n_centroids,
                             sample_rows=sample_rows, iters=iters, seed=seed)
        part_ds = add_ivf_partition(
            ds.select_columns([id_col, vec_col]), cent, vec_col)
        part_ds.write_parquet(index_dir, partition_cols=["ivf_part"])
        _pq.write_table(
            pa.table({"centroid": [row.tolist() for row in cent]}),
            f"{index_dir}/_centroids.parquet")
        return cls(index_dir, cent, vec_col, id_col)

    @classmethod
    def open(cls, index_dir: str, vec_col: str, id_col: str) -> "IVFIndex":
        import pyarrow.parquet as _pq

        cent_tbl = _pq.read_table(f"{index_dir}/_centroids.parquet")
        cent = np.stack([np.asarray(c) for c in
                         cent_tbl["centroid"].to_pylist()])
        return cls(index_dir, cent, vec_col, id_col)

    def probed_parts(self, queries: dict, nprobe: int) -> list[int]:
        qmat = _normalize(np.asarray(queries["mat"], dtype=np.float64))
        probe = np.argsort(-(qmat @ self.centroids.T), axis=1)[:, :nprobe]
        return sorted({int(p) for row in probe for p in row})

    def search(self, queries: dict, *, k: int = 5, nprobe: int = 4,
               batch_size: int = 2048) -> pd.DataFrame:
        import os

        import ray.data

        # list the parquet files explicitly: read_parquet expands a single
        # directory path but not directories inside a path LIST
        paths = []
        for p in self.probed_parts(queries, nprobe):
            pdir = os.path.join(self.index_dir, f"ivf_part={p}")
            if os.path.isdir(pdir):
                paths += [os.path.join(pdir, f) for f in sorted(os.listdir(pdir))
                          if f.endswith(".parquet")]
        if not paths:
            return pd.DataFrame({"query_id": [], "neighbor_id": [],
                                 "cosine": []})
        pruned = ray.data.read_parquet(paths)
        return knn_topk(pruned, queries, vec_col=self.vec_col,
                        id_col=self.id_col, k=k, batch_size=batch_size)


def knn_topk_ivf(ds, queries: dict, centroids: np.ndarray, *, vec_col: str,
                 id_col: str, k: int = 5, nprobe: int = 4,
                 batch_size: int = 2048) -> pd.DataFrame:
    """IVF-pruned top-k over an UNINDEXED dataset: assigns partitions on
    the fly (one corpus pass per call). Prefer :class:`IVFIndex` — build
    once, probe-only reads per search.

    Recall < 1.0 by design; the exactness knob is nprobe."""
    cent = _normalize(np.asarray(centroids, dtype=np.float64))
    qmat = _normalize(np.asarray(queries["mat"], dtype=np.float64))
    probe = np.argsort(-(qmat @ cent.T), axis=1)[:, :nprobe]
    parts_needed = sorted({int(p) for row in probe for p in row})

    part_ds = add_ivf_partition(ds, centroids, vec_col)
    needed = set(parts_needed)

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        # vectorized predicate inside map_batches — a row filter would call
        # Python once per row
        return df[df["ivf_part"].isin(needed)]

    pruned = part_ds.map_batches(keep, batch_format="pandas")
    return knn_topk(pruned, queries, vec_col=vec_col, id_col=id_col, k=k,
                    batch_size=batch_size)


def label_centroids(ds, *, vec_col: str, label_col: str,
                    batch_size: int = 2048) -> pd.DataFrame:
    """Per-label mean embedding (class centroids) — the building block of
    k-means refits, prototype classifiers and embedding-drift monitors.

    Pre-aggregate shape: each batch stacks its vectors into one matrix and
    reduces to (label, dim, partial_sum, n) rows — ``labels × dims`` per
    batch regardless of batch size — merged on the driver with a tiny
    groupby. The vector column itself never shuffles.

    Returns pandas (label int64, dim int64, v float64 rounded to 6 dp),
    sorted — the exploded layout the SQL oracle can replicate via
    ``embedding[i]`` subscripting.
    """
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(df[vec_col].to_numpy()).astype(np.float64)
        labels = df[label_col].to_numpy()
        uniq, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), mat.shape[1]), dtype=np.float64)
        np.add.at(sums, inv, mat)
        counts = np.bincount(inv, minlength=len(uniq))
        d = mat.shape[1]
        return pd.DataFrame({
            "label": pd.Series(np.repeat(uniq, d).astype("int64")),
            "dim": pd.Series(np.tile(np.arange(d), len(uniq)),
                             dtype="int64"),
            "s": pd.Series(sums.ravel()),
            "n": pd.Series(np.repeat(counts, d).astype("int64")),
        })

    parts = (ds.select_columns([label_col, vec_col])
             .map_batches(partial, batch_format="pandas",
                          batch_size=batch_size)
             .to_pandas())
    agg = parts.groupby(["label", "dim"], sort=True).agg(
        s=("s", "sum"), n=("n", "sum")).reset_index()
    agg["v"] = (agg["s"] / agg["n"]).round(6)
    return agg[["label", "dim", "v"]].reset_index(drop=True)


def kmeans(ds, *, vec_col: str, id_col: str, k: int = 8, iters: int = 2,
           batch_size: int = 2048):
    """Distributed Lloyd's k-means over an embedding column.

    Each iteration is ONE streaming pass: every batch assigns its vectors
    to the nearest current centroid (vectorized squared-L2 in float64,
    ties to the smaller cluster id) and reduces to (cid, dim, sum, n)
    partials — ``k × dims`` rows per batch — which merge on the driver
    into the next centroids. The vector column never shuffles and no
    iteration materializes the corpus; a final pass emits the assignment
    Dataset. Empty clusters are dropped (ids keep their original values),
    matching the SQL twin where an unassigned cluster simply vanishes
    from the mean.

    Init is deterministic with no RNG: the k smallest ``id_col`` rows, in
    id order, become centroids 0..k-1 — which makes even the iterated
    assignments exactly replicable by the q38 oracle. Centroids are
    captured in the task closure (k × dims floats); at very large k ship
    them with ``ray.put`` instead.

    ULP caveat (advisor): numpy's pairwise-summed squared distances and
    centroid sums can differ from DuckDB's sequential list_sum/AVG by
    last-bit float error, which could flip the assignment of a point
    near-EQUIDISTANT between two centroids and break exact oracle
    parity. Not observed on the synthetic embeddings (no near-ties at
    float64 precision); if q38 ever flakes, compare assignments at a
    distance tolerance rather than exactly. EXACT ties are pinned, not
    caveated: distances bit-equal across two centroids resolve to the
    smaller cluster id on both sides (argmin first-minimum ==
    SQL ``ORDER BY d, cid`` — test_kmeans_equidistant_tie), under any
    block partitioning.

    ``iters`` counts ASSIGNMENT passes: the returned labels are the
    assignment of pass ``iters`` against centroids refit ``iters - 1``
    times (iters=1 = nearest-init-centroid, no refit). Total streaming
    passes over the corpus = ``iters`` (+1 tiny init top-k).

    Returns a Dataset of (id_col, cluster int64).
    """
    from .relational import topk

    proj = ds.select_columns([id_col, vec_col])
    init = (topk(proj, id_col, k, ascending=True)
            .sort_values(id_col).reset_index(drop=True))
    cids = np.arange(len(init), dtype=np.int64)
    cents = np.stack(init[vec_col].to_numpy()).astype(np.float64)

    def nearest(mat: np.ndarray, cids_: np.ndarray,
                cents_: np.ndarray) -> np.ndarray:
        # explicit per-dim difference form mirrors the oracle's
        # list_sum((x_i - c_i)^2); cids_ ascending => argmin's
        # first-minimum rule == the SQL ORDER BY d, cid tie-break
        d = ((mat[:, None, :] - cents_[None, :, :]) ** 2).sum(axis=2)
        return cids_[np.argmin(d, axis=1)]

    for _ in range(max(0, iters - 1)):
        def part(df: pd.DataFrame, cids_=cids,
                 cents_=cents) -> pd.DataFrame:
            mat = np.stack(df[vec_col].to_numpy()).astype(np.float64)
            a = nearest(mat, cids_, cents_)
            uniq, inv = np.unique(a, return_inverse=True)
            sums = np.zeros((len(uniq), mat.shape[1]), dtype=np.float64)
            np.add.at(sums, inv, mat)
            counts = np.bincount(inv, minlength=len(uniq))
            nd = mat.shape[1]
            return pd.DataFrame({
                "cid": pd.Series(np.repeat(uniq, nd), dtype="int64"),
                "dim": pd.Series(np.tile(np.arange(nd), len(uniq)),
                                 dtype="int64"),
                "s": pd.Series(sums.ravel()),
                "n": pd.Series(np.repeat(counts, nd).astype("int64")),
            })

        parts = proj.map_batches(part, batch_format="pandas",
                                 batch_size=batch_size).to_pandas()
        agg = (parts.groupby(["cid", "dim"], sort=True)
               .agg(s=("s", "sum"), n=("n", "sum")).reset_index())
        cids = np.sort(agg["cid"].unique()).astype(np.int64)
        nd = int(agg["dim"].nunique())
        cents = (agg.sort_values(["cid", "dim"])["s"].to_numpy()
                 / agg.sort_values(["cid", "dim"])["n"].to_numpy()
                 ).reshape(len(cids), nd)

    def lab(df: pd.DataFrame, cids_=cids, cents_=cents) -> pd.DataFrame:
        mat = np.stack(df[vec_col].to_numpy()).astype(np.float64)
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            "cluster": nearest(mat, cids_, cents_).astype("int64")})

    return proj.map_batches(lab, batch_format="pandas",
                            batch_size=batch_size)
