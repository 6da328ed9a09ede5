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

100-TB shape — two paths, bit-identical results (property-tested):

- ``num_parts=None`` (broadcast): each round is one streaming
  ``map_batches`` over edges (broadcast (nodes, r//deg) arrays,
  searchsorted lookup, per-block partial sums) followed by one
  node-bounded native groupby-sum.  Driver state is O(nodes) — fine to
  ~10^8 nodes, the entry's graph class.
- ``num_parts=P`` (partitioned, the multi-billion-node path): the node
  id space is RANGE-PARTITIONED once (P contiguous slices of the
  sorted node array); rank and degree slices live in the object store
  as per-partition refs, never on the driver (the driver holds only P
  boundary ids + refs).  Edges are routed once to their SOURCE
  partition; each round runs P contribution tasks (slice-local
  searchsorted + per-destination partial sums, split by destination
  partition with ``num_returns=P``) and P update tasks (sum incoming
  partials, apply the rank recurrence) — a Pregel superstep where
  every task touches O(nodes/P + edges/P) state.  Rounds are a driver
  loop over distributed jobs, like the k-means loop in
  ``pipelines/similarity``.  (At true extreme scale the final collect
  would be a parquet write per slice; the entry returns a frame.)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


@ray.remote(num_returns=2)
def _pr_slice(tbl: pa.Table, cnt_col: str):
    """One contiguous slice of the sorted (node, degree) table →
    ((first_node, len), (nodes, deg)).  The meta return is driver-tiny;
    the arrays stay in the object store."""
    u = tbl["u"].to_numpy(zero_copy_only=False).astype(np.int64)
    d = tbl[cnt_col].to_numpy(zero_copy_only=False).astype(np.int64)
    meta = (int(u[0]), len(u)) if len(u) else (None, 0)
    return meta, (u, d)


@ray.remote
def _pr_init_rank(slice_ref, r0: int):
    nodes, _deg = slice_ref
    return np.full(len(nodes), r0, dtype=np.int64)


@ray.remote
def _pr_route_edges(tbl: pa.Table, starts: np.ndarray, num_parts: int):
    """Split one undirected edge block by SOURCE partition
    (num_returns=P).  ``starts`` = partition start node ids, sorted."""
    u = tbl["u"].to_numpy(zero_copy_only=False).astype(np.int64)
    p = np.searchsorted(starts, u, side="right") - 1
    out = [tbl.filter(pa.array(p == i)) for i in range(num_parts)]
    return tuple(out) if num_parts > 1 else out[0]


@ray.remote
def _pr_contrib(starts: np.ndarray, num_parts: int, slice_ref,
                rank: np.ndarray, *edge_pieces):
    """One partition's Pregel scatter: contributions r(u)//deg(u) of
    this partition's sources, partial-summed per destination and split
    by destination partition (num_returns=P)."""
    nodes, deg = slice_ref
    empty = pa.table({"v": pa.array([], pa.int64()),
                      "partial": pa.array([], pa.int64())})
    tabs = [t for t in edge_pieces if t.num_rows]
    if not tabs:
        return tuple([empty] * num_parts) if num_parts > 1 else empty
    t = pa.concat_tables(tabs).combine_chunks()
    u = t["u"].to_numpy(zero_copy_only=False).astype(np.int64)
    v = t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
    contrib = rank // deg
    c = contrib[np.searchsorted(nodes, u)]
    uniq, inv = np.unique(v, return_inverse=True)
    s = np.zeros(len(uniq), np.int64)
    np.add.at(s, inv, c)
    p = np.searchsorted(starts, uniq, side="right") - 1
    out = []
    for i in range(num_parts):
        m = p == i
        out.append(pa.table({"v": pa.array(uniq[m], pa.int64()),
                             "partial": pa.array(s[m], pa.int64())}))
    return tuple(out) if num_parts > 1 else out[0]


@ray.remote
def _pr_update(base: int, damping_pct: int, slice_ref, *partial_pieces):
    """One partition's Pregel gather: sum incoming flow partials over
    this partition's node slice, apply the rank recurrence."""
    nodes, _deg = slice_ref
    flow = np.zeros(len(nodes), np.int64)
    for t in partial_pieces:
        if not t.num_rows:
            continue
        vs = t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        ps = t["partial"].to_numpy(zero_copy_only=False).astype(np.int64)
        flow[np.searchsorted(nodes, vs)] += ps
    return base + (damping_pct * flow) // 100


def _pagerank_partitioned(und: ray.data.Dataset, num_iters: int,
                          damping_pct: int, scale: int,
                          num_parts: int) -> pd.DataFrame:
    """Range-partitioned rank-vector path — driver holds only the P
    partition boundaries and object refs."""
    deg_ds = und.groupby("u").count().materialize()
    schema = deg_ds.schema()
    if schema is None or not deg_ds.count():
        return pd.DataFrame({"node_id": pd.Series([], dtype=np.int64),
                             "rank_fp": pd.Series([], dtype=np.int64)})
    cnt_col = [c for c in schema.names if c != "u"][0]
    sliced = deg_ds.sort("u").repartition(num_parts)  # order-preserving
    metas, slices = [], []
    for b in sliced.to_arrow_refs():
        m_ref, s_ref = _pr_slice.remote(b, cnt_col)
        metas.append(m_ref)
        slices.append(s_ref)
    metas = ray.get(metas)
    keep = [i for i, (first, ln) in enumerate(metas) if ln]
    if not keep:
        return pd.DataFrame({"node_id": pd.Series([], dtype=np.int64),
                             "rank_fp": pd.Series([], dtype=np.int64)})
    slices = [slices[i] for i in keep]
    starts = np.array([metas[i][0] for i in keep], dtype=np.int64)
    if not np.all(np.diff(starts) > 0):
        # sort('u').repartition() emitting blocks out of global order
        # would silently misroute every edge via searchsorted — fail
        # loudly instead (order preservation is an executor detail)
        raise AssertionError(
            "pagerank partition starts are not strictly increasing; "
            "repartition no longer preserves sorted block order")
    P = len(slices)
    n = sum(metas[i][1] for i in keep)
    base = ((100 - damping_pct) * scale) // (100 * n)

    ranks = [_pr_init_rank.remote(s, scale // n) for s in slices]

    # route edges to their source partition ONCE (P pieces per block)
    nret = {"num_returns": P} if P > 1 else {}
    routed = [_pr_route_edges.options(**nret).remote(b, starts, P)
              for b in und.to_arrow_refs()]
    if P == 1:
        routed = [[r] for r in routed]
    edge_parts = [[routed[j][p] for j in range(len(routed))]
                  for p in range(P)]

    for _ in range(num_iters):
        outs = [_pr_contrib.options(**nret).remote(
            starts, P, slices[p], ranks[p], *edge_parts[p])
            for p in range(P)]
        if P == 1:
            outs = [[o] for o in outs]
        ranks = [_pr_update.remote(base, damping_pct, slices[q],
                                   *[outs[p][q] for p in range(P)])
                 for q in range(P)]

    node_arrs = [ray.get(s)[0] for s in slices]
    rank_arrs = ray.get(ranks)
    return pd.DataFrame({"node_id": np.concatenate(node_arrs),
                         "rank_fp": np.concatenate(rank_arrs)})


def pagerank_int(edges: ray.data.Dataset, num_iters: int = 3,
                 damping_pct: int = 85, scale: int = 10**12,
                 src_col: str = "src", dst_col: str = "dst",
                 num_parts: int | None = None) -> pd.DataFrame:
    """(node_id, rank_fp) after ``num_iters`` exact fixed-point rounds
    over the undirected edge set.  Empty edge list -> empty frame.
    ``num_parts >= 2`` selects the range-partitioned rank-vector path
    (bit-identical values; see module docstring)."""
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
    if num_parts is not None and num_parts >= 2:
        return _pagerank_partitioned(und, num_iters, damping_pct,
                                     scale, num_parts)
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


__all__ = ["pagerank_int", "triangle_count"]


def triangle_count(edges: ray.data.Dataset,
                   all_nodes: "np.ndarray | None" = None,
                   join_partitions: int = 16,
                   wedge_buckets: int = 64) -> pd.DataFrame:
    """(node_id, n_triangles): per-node triangle membership counts over
    an undirected simple graph given as canonical (src < dst) distinct
    edge rows — the clustering-coefficient / community-density core
    (no reference analogue; the MapReduce formulation is Suri &
    Vassilvitskii, "Counting Triangles and the Curse of the Last
    Reducer", WWW 2011 — public knowledge).

    Algorithm (exact): orient every edge from its lower-(degree, id)
    endpoint to the higher one; each node generates WEDGES (ordered
    pairs of its out-neighbours); a wedge is a triangle iff its
    closing pair is itself an oriented edge.  Orientation bounds any
    node's out-degree by O(sqrt(2m)) — a hub of degree d generates
    O(m) wedges instead of d^2 — so total wedge volume is <= m^{3/2}
    even on skewed web graphs.

    100-TB shape: degrees come from a native 16 B (node, cnt) partial
    groupby; both degree stamps are hash-partitioned ``shuffle_join``s
    on the edge endpoints (never a broadcast — node count is
    corpus-sized); wedges are generated inside bucketed map_groups
    tasks (vectorized triu per out-neighbourhood) and closed by one
    more hash-partitioned join against the oriented edge set keyed on
    the wedge pair; corner counts reduce via per-batch combiners +
    one node-keyed groupby.  The driver holds only the final per-node
    report (pass ``all_nodes`` to include isolated nodes as zeros).
    """
    import pyarrow.compute as pc

    from .joins import drop_empty_blocks, shuffle_join

    def _zeros() -> pd.DataFrame:
        nodes = (np.sort(np.asarray(all_nodes, dtype=np.int64))
                 if all_nodes is not None else np.empty(0, np.int64))
        return pd.DataFrame({"node_id": nodes,
                             "n_triangles": np.zeros(len(nodes),
                                                     np.int64)})

    # 1. degrees: per-batch endpoint combiner -> native groupby-sum
    def deg_partial(t: pa.Table) -> pa.Table:
        both = np.concatenate([
            t["src"].to_numpy(zero_copy_only=False),
            t["dst"].to_numpy(zero_copy_only=False)]).astype(np.int64)
        uniq, cnt = np.unique(both, return_counts=True)
        return pa.table({"node": pa.array(uniq, pa.int64()),
                         "cnt": pa.array(cnt.astype(np.int64))})

    deg_ds = edges.map_batches(deg_partial, batch_format="pyarrow") \
        .groupby("node").sum("cnt").materialize()
    if deg_ds.count() == 0:
        return _zeros()

    def _as_stamp(col: str):
        def f(t: pa.Table) -> pa.Table:
            return pa.table({
                col: t["node"],
                f"deg_{col}": pc.cast(t["sum(cnt)"], pa.int64())})
        return f

    # 2. stamp both endpoint degrees (hash-partitioned joins).  The
    # intermediate materialize keeps the two JoinOperators in SEPARATE
    # execution DAGs: two concurrent join aggregator pools can starve
    # each other under a tight CPU cap (observed as a deadlock in the
    # 4-CPU test session), and the barrier costs one narrow edge table
    # drop_empty_blocks between the joins both scrubs the schema-less
    # empty blocks a join emits for empty hash partitions (they crash
    # the next join's acero key lookup — see joins.drop_empty_blocks)
    # and separates the two joins' execution DAGs (two concurrent
    # aggregator pools starve each other under a tight CPU cap)
    half = drop_empty_blocks(shuffle_join(
        edges, deg_ds.map_batches(_as_stamp("src"),
                                  batch_format="pyarrow"),
        on="src", num_partitions=join_partitions))
    if half is None:
        return _zeros()
    stamped = shuffle_join(
        half, deg_ds.map_batches(_as_stamp("dst"),
                                 batch_format="pyarrow"),
        on="dst", num_partitions=join_partitions)

    # 3. orient low-(deg, id) -> high-(deg, id); keep target degree for
    # wedge-pair orientation downstream
    def orient(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        ds_ = t["deg_src"].to_numpy(zero_copy_only=False)
        dd = t["deg_dst"].to_numpy(zero_copy_only=False)
        fwd = (ds_ < dd) | ((ds_ == dd) & (s < d))
        u = np.where(fwd, s, d)
        v = np.where(fwd, d, s)
        dv = np.where(fwd, dd, ds_)
        return pa.table({"u": pa.array(u), "v": pa.array(v),
                         "dv": pa.array(dv.astype(np.int64)),
                         "bucket": pa.array(u % wedge_buckets)})

    # scrub join empties again (the second join emits its own) and
    # pin the blocks: consumed twice (wedges + closing set)
    oriented = drop_empty_blocks(
        stamped.map_batches(orient, batch_format="pyarrow"))
    if oriented is None:
        return _zeros()

    # 4. wedges per out-neighbourhood, vectorized triu per u segment
    def wedges_of(g: pd.DataFrame) -> pa.Table:
        # emits ARROW tables (even when empty): empty pandas-schema
        # blocks slip through map stages unconverted and crash the
        # closing join's acero key lookup
        out_a, out_b, out_u = [], [], []
        for uval, grp in g.groupby("u", sort=False):
            v = grp["v"].to_numpy(np.int64)
            dv = grp["dv"].to_numpy(np.int64)
            if len(v) < 2:
                continue
            o = np.lexsort((v, dv))       # wedge pair oriented order
            v = v[o]
            ia, ib = np.triu_indices(len(v), k=1)
            out_a.append(v[ia]); out_b.append(v[ib])
            out_u.append(np.full(len(ia), uval, np.int64))
        if not out_a:
            return pa.table({"ea": pa.array([], pa.int64()),
                             "eb": pa.array([], pa.int64()),
                             "w": pa.array([], pa.int64())})
        return pa.table({"ea": pa.array(np.concatenate(out_a)),
                         "eb": pa.array(np.concatenate(out_b)),
                         "w": pa.array(np.concatenate(out_u))})

    # scrub again — the groupby's sort stage emits its own schema-less
    # empties — and skip the closing join outright on wedge-free graphs
    wedges = drop_empty_blocks(oriented.groupby("bucket").map_groups(
        wedges_of, batch_format="pandas"))

    def corners(t: pa.Table) -> pa.Table:
        if "ea" not in t.column_names:      # schema-less empty block
            return pa.table({"node": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        allc = np.concatenate([
            t["ea"].to_numpy(zero_copy_only=False),
            t["eb"].to_numpy(zero_copy_only=False),
            t["w"].to_numpy(zero_copy_only=False)]).astype(np.int64)
        uniq, cnt = np.unique(allc, return_counts=True)
        return pa.table({"node": pa.array(uniq, pa.int64()),
                         "cnt": pa.array(cnt.astype(np.int64))})

    if wedges is not None and wedges.count():
        closing = oriented.map_batches(
            lambda t: pa.table({"ea": t["u"], "eb": t["v"]}),
            batch_format="pyarrow")
        tri = shuffle_join(wedges, closing, on=("ea", "eb"),
                           num_partitions=join_partitions)
        # 5. corner counts: 3 rows per triangle, combined per batch
        cpdf = tri.map_batches(corners, batch_format="pyarrow") \
            .groupby("node").sum("cnt").to_pandas()
    else:
        cpdf = pd.DataFrame()
    out = _zeros() if all_nodes is not None else pd.DataFrame(
        {"node_id": np.sort(deg_ds.to_pandas()["node"]
                            .to_numpy(np.int64)),
         "n_triangles": np.int64(0)})
    if len(cpdf) and "node" in cpdf.columns:
        scol = [c for c in cpdf.columns if c != "node"][0]
        idx = out["node_id"].to_numpy()
        nodes = cpdf["node"].to_numpy(np.int64)
        pos = np.searchsorted(idx, nodes)
        if (pos >= len(idx)).any() or (idx[np.minimum(
                pos, len(idx) - 1)] != nodes).any():
            missing = nodes[(pos >= len(idx))
                            | (idx[np.minimum(pos, len(idx) - 1)]
                               != nodes)]
            raise ValueError(
                "triangle_count: corner nodes missing from all_nodes "
                f"(e.g. {missing[:3].tolist()}) — a blind scatter "
                "would credit the wrong node")
        vals = out["n_triangles"].to_numpy(np.int64).copy()
        vals[pos] = cpdf[scol].to_numpy(np.int64)
        out["n_triangles"] = vals
    return out.reset_index(drop=True)
