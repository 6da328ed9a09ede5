"""Iterative graph algorithms over edge-list Datasets.

``pagerank_int``: PageRank in EXACT integer fixed-point, so a k-round
run is bit-reproducible under any partitioning and SQL-checkable by an
unrolled k-iteration oracle (floats would diverge across summation
orders and libm).  Rules, identical on both sides (all BIGINT floor
division on non-negative values):

    n      = |nodes|;  edges are treated UNDIRECTED (both directions)
    r_0(v) = scale // n
    f_t(v) = Σ_{(u,v)} r_t(u) // deg(u)              (whole-unit flow)
    r_t+1(v) = ((100 - d) * scale) // (100 * n) + (d * f_t(v)) // 100

with damping d in percent.  Total mass decays by the per-node floor
truncations (bounded by n + |edges| units per round) — the standard
quantized-PageRank trade for exactness.

100-TB shape: the edge list never leaves the cluster — each round is
one streaming ``map_batches`` over edges (broadcast (nodes, r//deg)
arrays, searchsorted lookup, per-block partial sums) followed by one
node-bounded native groupby-sum; driver state is O(nodes), the same
bound every vertex-program framework (Pregel/GraphX) assumes for a
rank vector's per-partition slice.  Rounds are a driver loop over
distributed jobs, like the k-means loop in ``pipelines/similarity``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def pagerank_int(edges: ray.data.Dataset, num_iters: int = 3,
                 damping_pct: int = 85, scale: int = 10**12,
                 src_col: str = "src", dst_col: str = "dst"
                 ) -> pd.DataFrame:
    """(node_id, rank_fp) after ``num_iters`` exact fixed-point rounds
    over the undirected edge set.  Empty edge list -> empty frame."""
    if not (0 <= damping_pct <= 100):
        raise ValueError("damping_pct must be in [0, 100]")

    def undirect(t: pa.Table) -> pa.Table:
        s = t[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "u": pa.array(np.concatenate([s, d]), pa.int64()),
            "v": pa.array(np.concatenate([d, s]), pa.int64())})

    und = edges.map_batches(undirect, batch_format="pyarrow") \
        .materialize()                     # consumed once per round
    deg_pdf = und.groupby("u").count().to_pandas()
    if not len(deg_pdf):
        return pd.DataFrame({"node_id": pd.Series([], dtype=np.int64),
                             "rank_fp": pd.Series([], dtype=np.int64)})
    cnt_col = [c for c in deg_pdf.columns if c != "u"][0]
    order = np.argsort(deg_pdf["u"].to_numpy())
    nodes = deg_pdf["u"].to_numpy()[order].astype(np.int64)
    deg = deg_pdf[cnt_col].to_numpy()[order].astype(np.int64)
    n = len(nodes)
    base = ((100 - damping_pct) * scale) // (100 * n)
    r = np.full(n, scale // n, dtype=np.int64)

    nodes_ref = ray.put(nodes)          # broadcast the id array ONCE;
    for _ in range(num_iters):          # only r//deg changes per round
        ref = ray.put(r // deg)

        def partial(t: pa.Table, ref=ref, nref=nodes_ref) -> pa.Table:
            nd, contrib = ray.get(nref), ray.get(ref)
            u = t["u"].to_numpy(zero_copy_only=False)
            v = t["v"].to_numpy(zero_copy_only=False)
            c = contrib[np.searchsorted(nd, u)]
            uniq, inv = np.unique(v, return_inverse=True)
            s = np.zeros(len(uniq), np.int64)
            np.add.at(s, inv, c)
            return pa.table({"v": pa.array(uniq, pa.int64()),
                             "partial": pa.array(s, pa.int64())})

        inf_pdf = und.map_batches(partial, batch_format="pyarrow") \
            .groupby("v").sum("partial").to_pandas()
        scol = [c for c in inf_pdf.columns if c != "v"][0]
        flow = np.zeros(n, np.int64)
        vi = np.searchsorted(nodes, inf_pdf["v"].to_numpy().astype(np.int64))
        flow[vi] = inf_pdf[scol].to_numpy().astype(np.int64)
        r = base + (damping_pct * flow) // 100

    return pd.DataFrame({"node_id": nodes, "rank_fp": r})


__all__ = ["pagerank_int"]
