"""Graph operators over edge Datasets.

Connected components lives in ``stages/dedup.py:cluster_pairs_dataset``
(it grew out of near-dup clustering and is exposed as q45); this module
holds the rank-propagation family. The shared discipline: edges stream
through ``map_batches`` and reduce to per-node partials — the edge set
itself is never collected.

Two PageRank execution modes share one iteration semantics (identical
float op order up to summation grouping, identical at the 6-dp rounding
every caller applies):

- ``driver``: the rank/outdegree table lives in driver dicts broadcast
  per iteration (``ray.put``). O(nodes) driver memory — right up to the
  ~10^7-node range where a dict is cheaper than two shuffles/iteration.
- ``distributed``: the rank table IS a Dataset; each iteration is a
  ``shuffle_join`` of edges with the weight table on src, a coarsened
  ``groupby(dst)`` contribution fold, and a left ``shuffle_join`` back
  onto the node table — no O(nodes) driver allocation anywhere, the
  10^9-10^10-node web-graph path.

``mode="auto"`` gates on the materialized edge count, the same pattern
as ``dedup.DRIVER_CLUSTER_MAX_PAIRS``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

# Auto-mode gate: above this many edges the node table is assumed too
# big for driver dicts (nodes <= 2*edges; ~100 B/dict entry puts 5M
# edges at <=1 GB driver heap worst case). Force with mode=.
DRIVER_PAGERANK_MAX_EDGES = 5_000_000


def _grouped_sum_ds(ds, key: str, val, *, n_parts: int,
                    batch_size: int):
    """(key, val...) rows → one (key, sum(val)...) row per key, as a
    Dataset. ``val`` may be one column name or a list.

    Per-batch pandas partials prune the exchange; one coarsened
    ``groupby(key-hash)`` shuffle co-locates each key's partials and a
    vectorized in-partition fold finishes (the pre-aggregate pattern —
    never one map_groups call per key)."""
    from .relational import add_coarse_part

    vals = [val] if isinstance(val, str) else list(val)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(key, sort=False)[vals].sum().reset_index()

    parts = ds.map_batches(partial, batch_format="pandas",
                           batch_size=batch_size)

    def combine(group: pa.Table) -> pa.Table:
        df = group.to_pandas()
        out = df.groupby(key, sort=False)[vals].sum().reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    return (add_coarse_part(parts, key, n_parts)
            .groupby("_kpart").map_groups(combine, batch_format="pyarrow"))


def _pagerank_distributed(proj, src: str, dst: str, *, iters: int,
                          damping: float, batch_size: int, n_parts: int):
    """Dataset-native power iteration; returns a (node, outdeg, rank)
    Dataset. ``proj`` must be the materialized (src, dst) projection —
    it is consumed ``iters``+1 times."""
    from .relational import shuffle_join

    def node_deg(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(src, sort=False).size().rename("outdeg")
             .reset_index().rename(columns={src: "node"}))
        d = pd.DataFrame({"node": pd.unique(df[dst].to_numpy()),
                          "outdeg": 0})
        out = pd.concat([g, d], ignore_index=True)
        out["node"] = out["node"].astype("int64")
        out["outdeg"] = out["outdeg"].astype("int64")
        return out

    nodes = _grouped_sum_ds(
        proj.map_batches(node_deg, batch_format="pandas",
                         batch_size=batch_size),
        "node", "outdeg", n_parts=n_parts, batch_size=batch_size)

    def init_rank(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["rank"] = 1.0
        return df

    # materialize per iteration: each pass is consumed by two joins and
    # the next state derives from it — leaving it lazy re-executes the
    # whole chain per consumer (the q47 lazy-edge lesson).
    state = nodes.map_batches(init_rank,
                              batch_format="pandas").materialize()

    for _ in range(iters):
        def weight(df: pd.DataFrame) -> pd.DataFrame:
            m = df[df["outdeg"] > 0]
            return pd.DataFrame({
                "node": m["node"].astype("int64"),
                "w": m["rank"].to_numpy(np.float64)
                     / m["outdeg"].to_numpy(np.float64)})

        wtab = state.map_batches(weight, batch_format="pandas",
                                 batch_size=batch_size)
        hits = shuffle_join(proj, wtab, left_on=src, right_on="node",
                            n_parts=n_parts, batch_size=batch_size)

        # ONE exchange closes the iteration: contribution rows carry
        # (node=dst, s, outdeg=0) and every state row rides along as a
        # zero-contribution row carrying its outdegree — the grouped
        # sum then rebuilds the full (node, s, outdeg) table without a
        # second join (adding 0.0 to an IEEE sum is exact, so rank
        # parity with the driver mode is preserved).
        def contrib(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby(dst, sort=False)["w"].sum().reset_index()
            g = g.rename(columns={dst: "node", "w": "s"})
            g["node"] = g["node"].astype("int64")
            g["outdeg"] = np.int64(0)
            return g

        def zero_rows(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "node": df["node"].astype("int64"),
                "s": 0.0,
                "outdeg": df["outdeg"].astype("int64")})

        merged = _grouped_sum_ds(
            hits.map_batches(contrib, batch_format="pandas",
                             batch_size=batch_size)
            .union(state.map_batches(zero_rows, batch_format="pandas",
                                     batch_size=batch_size)),
            "node", ["s", "outdeg"], n_parts=n_parts,
            batch_size=batch_size)

        def fold(df: pd.DataFrame, _d=damping) -> pd.DataFrame:
            return pd.DataFrame({
                "node": df["node"].astype("int64"),
                "outdeg": df["outdeg"].astype("int64"),
                "rank": (1.0 - _d) + _d * df["s"].to_numpy(np.float64)})

        state = merged.map_batches(fold, batch_format="pandas",
                                   batch_size=batch_size).materialize()
    return state


def pagerank(edges, src: str, dst: str, *, iters: int = 2,
             damping: float = 0.85,
             batch_size: int = 8192,
             mode: str = "auto",
             n_parts: int = 32,
             as_dataset: bool = False):
    """PageRank by power iteration over an edge Dataset (r0 = 1,
    dangling mass dropped — the original Google iteration):

        r_{t+1}(v) = (1 - d) + d * sum_{u->v} r_t(u) / outdeg(u)

    ``mode``: ``driver`` broadcasts the rank/outdegree dicts per
    iteration (O(nodes) driver memory, cheapest while the node table
    fits); ``distributed`` keeps the rank table as a Dataset and joins
    per iteration (no O(nodes) driver state — the web-graph path);
    ``auto`` picks by edge count against DRIVER_PAGERANK_MAX_EDGES.
    Node ids must be integers.

    The damping multiply happens OUTSIDE the contribution sum
    (0.15 + 0.85 * s) in BOTH modes to match the SQL oracle's op order
    exactly; the two modes differ only in float summation grouping
    (identical after the 6-dp round callers apply).

    Returns pandas (node, rank) over all nodes appearing as src or dst,
    or the (node, rank) Dataset when ``as_dataset`` (distributed only).
    """
    import ray

    if mode not in ("auto", "driver", "distributed"):
        raise ValueError(f"unknown pagerank mode {mode}")

    # Iterative consumer: every iteration re-reads the edge set, so pin
    # it once — otherwise a lazy upstream (e.g. the shuffle join that
    # built the edges) re-executes per pass (measured 4x cost on q47).
    # The object store spills if the projection exceeds memory; at
    # persistent-corpus scale, checkpoint the edges to parquet instead.
    proj = edges.select_columns([src, dst]).materialize()

    if mode == "auto":
        mode = ("driver" if proj.count() <= DRIVER_PAGERANK_MAX_EDGES
                else "distributed")

    if mode == "distributed":
        state = _pagerank_distributed(proj, src, dst, iters=iters,
                                      damping=damping,
                                      batch_size=batch_size,
                                      n_parts=n_parts)
        ranks_ds = state.select_columns(["node", "rank"])
        if as_dataset:
            return ranks_ds
        return (ranks_ds.to_pandas().sort_values("node")
                .reset_index(drop=True))

    if as_dataset:
        raise ValueError("as_dataset requires mode='distributed'")

    def node_partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": pd.unique(
            np.concatenate([df[src].to_numpy(), df[dst].to_numpy()]))})

    nodes = pd.unique(proj.map_batches(
        node_partial, batch_format="pandas",
        batch_size=batch_size).to_pandas()["node"])

    def deg_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(src, sort=False).size().rename("n")
        return g.reset_index()

    degs = (proj.map_batches(deg_partial, batch_format="pandas",
                             batch_size=batch_size).to_pandas()
            .groupby(src, sort=False)["n"].sum())
    outdeg = degs.to_dict()

    ranks = {int(v): 1.0 for v in nodes}
    for _ in range(iters):
        table = {u: ranks[u] / outdeg[u] for u in outdeg}
        table_ref = ray.put(table)

        def contrib(df: pd.DataFrame, _ref=table_ref) -> pd.DataFrame:
            t = ray.get(_ref)
            c = df[src].map(t).to_numpy(dtype=np.float64)
            g = (pd.DataFrame({"node": df[dst].to_numpy(), "s": c})
                 .groupby("node", sort=False)["s"].sum())
            return g.reset_index()

        parts = (proj.map_batches(contrib, batch_format="pandas",
                                  batch_size=batch_size).to_pandas()
                 .groupby("node", sort=False)["s"].sum())
        sums = parts.to_dict()
        ranks = {int(v): (1.0 - damping) + damping * sums.get(v, 0.0)
                 for v in nodes}

    out = pd.DataFrame({"node": pd.Series(sorted(ranks), dtype="int64")})
    out["rank"] = out["node"].map(ranks)
    return out
