"""Graph operators over edge Datasets.

Connected components lives in ``stages/dedup.py:cluster_pairs_dataset``
(it grew out of near-dup clustering and is exposed as q45); this module
holds the rank-propagation family. The shared discipline: edges stream
through ``map_batches`` and reduce to per-node partials — the edge set
itself is never collected.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def pagerank(edges, src: str, dst: str, *, iters: int = 2,
             damping: float = 0.85,
             batch_size: int = 8192) -> pd.DataFrame:
    """PageRank by power iteration over an edge Dataset (r0 = 1,
    dangling mass dropped — the original Google iteration):

        r_{t+1}(v) = (1 - d) + d * sum_{u->v} r_t(u) / outdeg(u)

    Each iteration is ONE streaming pass over the edges: the current
    rank/outdegree table is broadcast (``ray.put``), every batch maps
    its edges to r(u)/outdeg(u) contributions and pre-aggregates them
    per destination, and the per-batch partials merge on the driver.
    Per-iteration driver state is O(nodes) — fine into the 10^8-node
    range; past that the rank table itself becomes a Dataset and each
    iteration is a ``shuffle_join`` of edges with ranks on src followed
    by a coarsened groupby(dst) — same pass structure, documented here
    as the 10^9-node path.

    The damping multiply happens OUTSIDE the contribution sum
    (0.15 + 0.85 * s) to match the SQL oracle's op order exactly.

    Returns pandas (node, rank) over all nodes appearing as src or dst.
    """
    import ray

    # Iterative consumer: every iteration re-reads the edge set, so pin
    # it once — otherwise a lazy upstream (e.g. the shuffle join that
    # built the edges) re-executes per pass (measured 4x cost on q47).
    # The object store spills if the projection exceeds memory; at
    # persistent-corpus scale, checkpoint the edges to parquet instead.
    proj = edges.select_columns([src, dst]).materialize()

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
