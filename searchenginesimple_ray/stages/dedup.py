"""Deduplication operators.

Reference semantics (SURVEY §2.4):

- **A3 exact-by-simhash**: a record whose simhash is 0 is dropped; a
  record whose simhash was already claimed is dropped
  (`include/Page/Page.hpp:127-133`).
- **A4 near-dup**: the reference's ``std::set`` comparator treats
  hamming<=3 as equivalence (`Page.hpp:247-257`) — first arrival wins,
  transitively chained in arrival order.  The distributed rule (SURVEY
  §7.5, shared with the oracle): cluster = connected component of the
  hamming<=3 graph, representative = min ``doc_id`` (global
  ``(conv_id, turn_idx)`` order).  Candidate generation is Manku-style
  block-combination keys (WWW'07): C(threshold+3, 3) ~32-bit keys per
  doc — any pair within hamming<=threshold shares at least one key —
  explode to ``(band_id, band_val)``, count-prefilter, verify hamming
  on candidates, union-find the (small) edge set on the driver.
  (Naive 4x16-bit banding degenerates to all-pairs once the corpus
  outgrows 2^16 docs — measured 15 GB of pair candidates at 600k.)

Also the large-scale training-data dedup family over generic
``(id, text)`` tables: exact (hash + per-group first), MinHash+LSH,
n-gram Jaccard and embedding-cosine near-dup.

Scale notes (100 TB): only ``(doc_id, simhash)`` pairs — 16 bytes/row —
enter the banding shuffle, never the text.  The verified edge list is
O(duplicates); union-find on the driver is the small-result fast path
and is replaced by iterated min-label propagation (a few
``groupby.min`` rounds) when the dup rate makes edges driver-hostile.
The final drop-filter broadcasts the drop-id set (``ray.put`` once);
at extreme dup cardinality this becomes a hash-bucketed anti-join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..functions.hashing import hamming64, simhash_combo_keys
from ..functions.minhash import char_shingles, lsh_band_keys, minhash_signature

# guard: max unique simhash values pairwise-verified within one band group
# (beyond this the group is almost certainly a degenerate band value; we
# verify consecutive sorted neighbours only and log)
_MAX_PAIRWISE = 4096


# ---------------------------------------------------------------- exact

def exact_dedup_first(ds: ray.data.Dataset, key: str,
                      order_col: str) -> ray.data.Dataset:
    """Keep the min-``order_col`` row per ``key`` group (A3 analogue for
    generic tables; hash-partition + per-group first)."""

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(order_col).head(1)

    return ds.groupby(key).map_groups(first, batch_format="pandas")


# ------------------------------------------------------- simhash banded

def _band_explode(batch: pa.Table, threshold: int) -> pa.Table:
    """One row per (doc, combo key) — Manku block-combination keys
    (C(threshold+3, 3) per doc; ~32-bit keys at threshold 3)."""
    h = batch["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
    doc = batch["doc_id"].to_numpy(zero_copy_only=False)
    keys = simhash_combo_keys(h, threshold)      # (n, C)
    n, C = keys.shape
    # keys reinterpreted as int64 (bijective; only equality/grouping
    # matters) — uint64 values > 2^63 make Ray's aggregate fall back to
    # pickled-object blocks
    return pa.table({
        "band_id": pa.array(np.tile(np.arange(C, dtype=np.int32), n)),
        "band_val": pa.array(keys.reshape(-1).view(np.int64), pa.int64()),
        "doc_id": pa.array(np.repeat(doc, C), pa.int64()),
        "simhash": pa.array(np.repeat(h, C), pa.uint64()),
    })


def _group_edges(g: pd.DataFrame, threshold: int) -> pd.DataFrame:
    """Edges within one (band_id, band_val) group.

    Identical simhashes are chained linearly (hamming 0); distinct
    simhash values are pairwise-verified via vectorized popcount over
    their min-doc representatives.
    """
    sims = g["simhash"].to_numpy().astype(np.uint64)
    docs = g["doc_id"].to_numpy().astype(np.int64)
    order = np.lexsort((docs, sims))
    sims, docs = sims[order], docs[order]
    src, dst = [], []
    # chain identical-simhash runs
    same = sims[1:] == sims[:-1]
    src.append(docs[:-1][same])
    dst.append(docs[1:][same])
    # unique representatives (first = min doc per simhash value)
    first_mask = np.concatenate([[True], ~same])
    u_sims = sims[first_mask]
    u_docs = docs[first_mask]
    m = len(u_sims)
    if m > 1:
        if m <= _MAX_PAIRWISE:
            ii, jj = np.triu_indices(m, k=1)
            d = hamming64(u_sims[ii], u_sims[jj])
            hit = d <= threshold
            src.append(u_docs[ii[hit]])
            dst.append(u_docs[jj[hit]])
        else:  # degenerate band value: neighbour-verify only (logged)
            d = hamming64(u_sims[:-1], u_sims[1:])
            hit = d <= threshold
            src.append(u_docs[:-1][hit])
            dst.append(u_docs[1:][hit])
    if not src:
        return pd.DataFrame({"src": [], "dst": []})
    return pd.DataFrame({"src": np.concatenate(src), "dst": np.concatenate(dst)})


def simhash_near_dup_edges(docs: ray.data.Dataset, num_bands: int = 4,
                           threshold: int = 3) -> pd.DataFrame:
    """All verified hamming<=threshold edges among docs (simhash != 0).

    Shape (SCALE): a naive ``groupby(band).map_groups`` makes one Python
    call per band value — almost all singletons.  Instead: (1) a NATIVE
    hash-aggregate counts band-value multiplicity, (2) non-singleton
    band keys (O(duplicates), tiny) are broadcast and the exploded rows
    filtered vectorized, (3) only the surviving candidate rows — a few
    percent of docs by construction — are verified.
    """
    import pyarrow.compute as pc

    slim = docs.select_columns(["doc_id", "simhash"]).map_batches(
        lambda t: t.filter(pc.not_equal(t["simhash"], pa.scalar(0, pa.uint64()))),
        batch_format="pyarrow")
    # ``num_bands`` is vestigial (kept for signature compat): candidate
    # keys come from the threshold-derived block combinations
    exploded = slim.map_batches(
        lambda t: _band_explode(t, threshold), batch_format="pyarrow")
    # consumed twice (counts, then filter): materialize the 28-byte rows
    # once instead of re-reading + re-exploding the corpus.  At extreme
    # scale swap for a parquet spill of the exploded keys.
    exploded = exploded.materialize()

    # fast path: below ~50M band rows (28 B/row => <1.5 GB) the key
    # table fits the driver — verify directly.  The count-shuffle
    # prefilter only pays off beyond that (Ray's hash aggregate over
    # ~n mostly-unique keys costs far more than one driver lexsort:
    # measured 85 s vs 5 s at 12M rows).  Scale path past 50M: replace
    # groupby().count() with a distributed sort + per-block run
    # detection (boundary runs reconciled on the driver).
    if exploded.count() <= 50_000_000:
        cand = exploded.to_pandas()
        if not len(cand):
            return pd.DataFrame({"src": [], "dst": []})
        if len(cand) <= 2_000_000:
            return _edges_from_candidates(cand, threshold)
        # large key table: verify each combo band in its OWN Ray task —
        # driver-bound verification is a fixed cost that wrecks cluster
        # scaling.  A true pair surfaces in several bands (so some
        # hamming work repeats across tasks), but each band's table is
        # 1/C of the total and all C tasks run in parallel; edges are
        # deduped on concat.
        verify = ray.remote(_edges_from_candidates)
        futs = [verify.remote(sub, threshold)
                for _, sub in cand.groupby("band_id", sort=False)]
        parts = [p for p in ray.get(futs) if len(p)]
        if not parts:
            return pd.DataFrame({"src": [], "dst": []})
        return pd.concat(parts).drop_duplicates().reset_index(drop=True)

    counts = exploded.groupby(["band_id", "band_val"]).count()
    hot = counts.map_batches(
        lambda t: t.filter(pc.greater(t["count()"], 1)),
        batch_format="pyarrow").to_pandas()
    if not len(hot):
        return pd.DataFrame({"src": [], "dst": []})
    # per-band sorted hot value arrays, broadcast once
    hot_by_band = {int(b): np.sort(g["band_val"].to_numpy().astype(np.int64))
                   for b, g in hot.groupby("band_id")}
    hot_ref = ray.put(hot_by_band)

    class FilterHot:
        def __init__(self):
            self.hot = ray.get(hot_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            bid = t["band_id"].to_numpy(zero_copy_only=False)
            bval = t["band_val"].to_numpy(zero_copy_only=False).astype(np.int64)
            keep = np.zeros(len(bid), dtype=bool)
            for b, vals in self.hot.items():
                m = bid == b
                if m.any() and len(vals):
                    pos = np.searchsorted(vals, bval[m])
                    pos = np.clip(pos, 0, len(vals) - 1)
                    keep[m] = vals[pos] == bval[m]
            return t.filter(pa.array(keep))

    cand = exploded.map_batches(FilterHot, batch_format="pyarrow",
                                concurrency=(1, 4)).to_pandas()
    if not len(cand):
        return pd.DataFrame({"src": [], "dst": []})
    return _edges_from_candidates(cand, threshold)


def _edges_from_candidates(cand: pd.DataFrame, threshold: int) -> pd.DataFrame:
    """Verify hamming<=threshold over candidate band buckets — fully
    vectorized (no per-bucket Python calls: at 16-bit band width the
    bucket table saturates quickly, so bucket COUNT is O(corpus))."""
    bid = cand["band_id"].to_numpy().astype(np.int64)
    bval = cand["band_val"].to_numpy().astype(np.int64)
    sims = cand["simhash"].to_numpy().astype(np.uint64)
    docs = cand["doc_id"].to_numpy().astype(np.int64)
    order = np.lexsort((docs, sims, bval, bid))
    bid, bval, sims, docs = bid[order], bval[order], sims[order], docs[order]

    same_bucket = (bid[1:] == bid[:-1]) & (bval[1:] == bval[:-1])
    same_sim = same_bucket & (sims[1:] == sims[:-1])
    # 1) identical fingerprints: chain consecutive docs (hamming 0)
    src = [docs[:-1][same_sim]]
    dst = [docs[1:][same_sim]]

    # 2) distinct-fingerprint representatives per bucket: first row of
    # each (bucket, simhash) run; all-pairs within each bucket run
    first = np.concatenate([[True], ~same_sim])
    rb, rv = bid[first], bval[first]
    rs, rd = sims[first], docs[first]
    same_b = (rb[1:] == rb[:-1]) & (rv[1:] == rv[:-1])
    run_id = np.concatenate([[0], np.cumsum(~same_b)])
    sizes = np.bincount(run_id)
    starts = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    # pair generation grouped by run SIZE (python loop over the few
    # distinct sizes only, not over the ~n runs).  All-pairs within a
    # run is quadratic, and on hash-clustered corpora mid-size runs
    # explode — cap the all-pairs run size adaptively so total pairs
    # stay within a fixed budget; larger runs fall back to a sorted
    # neighbour WINDOW (reps are sorted by simhash, so true near-dups
    # are adjacent with high probability; other combo keys give
    # additional chances).
    sel = sizes >= 2
    sz_a = sizes[sel].astype(np.int64)
    st_a = starts[sel]
    PAIR_BUDGET = 10_000_000
    WINDOW = 4
    cap = _MAX_PAIRWISE
    for c in (4096, 1024, 256, 64, 16):
        full = sz_a * (sz_a - 1) // 2
        est = int(np.where(sz_a <= c, full, (sz_a - 1) * WINDOW).sum())
        cap = c
        if est <= PAIR_BUDGET:
            break
    order2 = np.argsort(sz_a, kind="stable")
    sz_s, st_s = sz_a[order2], st_a[order2]
    cut = np.concatenate([[0], np.flatnonzero(np.diff(sz_s)) + 1,
                          [len(sz_s)]])
    pi_parts, pj_parts = [], []
    for a, b in zip(cut[:-1], cut[1:]):
        sz = int(sz_s[a])
        sts_a = st_s[a:b]
        if sz <= cap:
            ii, jj = np.triu_indices(sz, k=1)
        else:  # degenerate run: windowed neighbour verify
            ii_l, jj_l = [], []
            for w in range(1, min(WINDOW, sz - 1) + 1):
                ii_l.append(np.arange(sz - w))
                jj_l.append(np.arange(w, sz))
            ii = np.concatenate(ii_l)
            jj = np.concatenate(jj_l)
        pi_parts.append((sts_a[:, None] + ii[None, :]).ravel())
        pj_parts.append((sts_a[:, None] + jj[None, :]).ravel())
    if pi_parts:
        pi = np.concatenate(pi_parts)
        pj = np.concatenate(pj_parts)
        # the same rep pair surfaces under up to C(B,3) combo keys —
        # dedupe by DOC pair before the popcount pass (~20x less work)
        a = rd[pi]
        b = rd[pj]
        lo = np.minimum(a, b)
        hi = np.maximum(a, b)
        po = np.lexsort((hi, lo))
        keep = np.concatenate([[True], (lo[po][1:] != lo[po][:-1])
                               | (hi[po][1:] != hi[po][:-1])])
        pi, pj = pi[po[keep]], pj[po[keep]]
        d = hamming64(rs[pi], rs[pj])
        hit = d <= threshold
        src.append(rd[pi[hit]])
        dst.append(rd[pj[hit]])
    s = np.concatenate(src)
    t = np.concatenate(dst)
    if not len(s):
        return pd.DataFrame({"src": [], "dst": []})
    return pd.DataFrame({"src": s, "dst": t}).drop_duplicates() \
        .reset_index(drop=True)


class _UnionFind:
    def __init__(self):
        self.parent: dict[int, int] = {}

    def find(self, x: int) -> int:
        root = x
        while self.parent.get(root, root) != root:
            root = self.parent[root]
        while self.parent.get(x, x) != root:  # path compression
            self.parent[x], x = root, self.parent[x]
        return root

    def union(self, a: int, b: int):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # deterministic: smaller id becomes the root => root == min id
            if ra > rb:
                ra, rb = rb, ra
            self.parent[rb] = ra


def components_min_rep(edges: pd.DataFrame) -> dict[int, int]:
    """doc_id -> min-doc_id representative, for every doc in an edge.

    Driver-side union-find over the verified edge set (O(duplicates)).
    Scale path (documented in the module docstring): iterated min-label
    propagation with groupby when edges outgrow the driver.
    """
    uf = _UnionFind()
    for s, d in zip(edges["src"].to_numpy(), edges["dst"].to_numpy()):
        uf.union(int(s), int(d))
    return {x: uf.find(x) for x in list(uf.parent)}


def simhash_near_dedup(docs: ray.data.Dataset, num_bands: int = 4,
                       threshold: int = 3):
    """Returns ``(kept_docs, drop_ids, clusters)``.

    - drops simhash==0 docs (A3, `Page.hpp:129`);
    - drops every near-dup cluster member except the min doc_id.
    """
    import pyarrow.compute as pc

    edges = simhash_near_dup_edges(docs, num_bands, threshold)
    rep = components_min_rep(edges) if len(edges) else {}
    drop_ids = np.array(sorted(d for d, r in rep.items() if d != r),
                        dtype=np.int64)
    drop_ref = ray.put(drop_ids)

    class DropFilter:
        def __init__(self, ref):
            self.drop = ray.get(ref) if not isinstance(ref, np.ndarray) else ref

        def __call__(self, t: pa.Table) -> pa.Table:
            t = t.filter(pc.not_equal(t["simhash"], pa.scalar(0, pa.uint64())))
            if len(self.drop) == 0 or t.num_rows == 0:
                return t
            doc = t["doc_id"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(self.drop, doc)
            pos = np.clip(pos, 0, len(self.drop) - 1)
            keep = self.drop[pos] != doc
            return t.filter(pa.array(keep))

    kept = docs.map_batches(DropFilter, fn_constructor_args=(drop_ref,),
                            batch_format="pyarrow", concurrency=(1, 4))
    return kept, drop_ids, rep


# ------------------------------------------------ MinHash-LSH (generic)

class MinhashStage:
    """(id, text) batch -> (id, band_id, band_key) rows + signature."""

    def __init__(self, num_perm: int = 64, num_bands: int = 16,
                 shingle_k: int = 5, seed: int = 7):
        from ..functions.minhash import _permutations
        self.perms = _permutations(num_perm, seed)
        self.num_perm = num_perm
        self.num_bands = num_bands
        self.k = shingle_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[batch.column_names[0]].to_numpy(zero_copy_only=False)
        texts = batch[batch.column_names[1]].to_pylist()
        n = len(ids)
        all_keys = np.empty((n, self.num_bands), dtype=np.uint64)
        sigs = np.empty((n, self.num_perm), dtype=np.uint32)
        for i, tx in enumerate(texts):
            sig = minhash_signature(char_shingles(tx, self.k),
                                    self.num_perm, perms=self.perms)
            sigs[i] = sig
            all_keys[i] = lsh_band_keys(sig, self.num_bands)
        return pa.table({
            "id": pa.array(np.repeat(ids, self.num_bands), pa.int64()),
            "band_id": pa.array(np.tile(np.arange(self.num_bands, dtype=np.int32), n)),
            # int64 view: uint64 > 2^63 breaks Arrow conversion in
            # Ray's aggregate (pickled-object fallback)
            "band_key": pa.array(all_keys.reshape(-1).view(np.int64),
                                 pa.int64()),
            "sig": pa.array(list(np.repeat(sigs, self.num_bands, axis=0)),
                            pa.list_(pa.uint32())),
        })


def minhash_lsh_dedup(ds: ray.data.Dataset, id_col: str, text_col: str,
                      num_perm: int = 64, num_bands: int = 16,
                      jaccard_threshold: float = 0.8,
                      concurrency=(1, 4)) -> pd.DataFrame:
    """Returns dataframe (id, rep_id) for every doc in a near-dup cluster
    (rep = min id), verified by estimated Jaccard >= threshold."""
    import pyarrow.compute as pc

    sel = ds.select_columns([id_col, text_col])
    exploded = sel.map_batches(MinhashStage, batch_format="pyarrow",
                               fn_constructor_kwargs={"num_perm": num_perm,
                                                      "num_bands": num_bands},
                               concurrency=concurrency)
    exploded = exploded.materialize()   # consumed twice (counts + filter)

    # native count-aggregate -> broadcast hot band keys -> vectorized
    # filter (same shape as simhash_near_dup_edges; avoids one Python
    # call per mostly-singleton bucket)
    counts = exploded.select_columns(["band_id", "band_key"]) \
        .groupby(["band_id", "band_key"]).count()
    hot = counts.map_batches(
        lambda t: t.filter(pc.greater(t["count()"], 1)),
        batch_format="pyarrow").to_pandas()
    if not len(hot):
        return pd.DataFrame({"id": pd.Series([], dtype=np.int64),
                             "rep_id": pd.Series([], dtype=np.int64)})
    hot_by_band = {int(b): np.sort(g["band_key"].to_numpy().astype(np.int64))
                   for b, g in hot.groupby("band_id")}
    hot_ref = ray.put(hot_by_band)

    class FilterHot:
        def __init__(self):
            self.hot = ray.get(hot_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            bid = t["band_id"].to_numpy(zero_copy_only=False)
            bkey = t["band_key"].to_numpy(zero_copy_only=False).astype(np.int64)
            keep = np.zeros(len(bid), dtype=bool)
            for b, vals in self.hot.items():
                m = bid == b
                if m.any() and len(vals):
                    pos = np.clip(np.searchsorted(vals, bkey[m]), 0,
                                  len(vals) - 1)
                    keep[m] = vals[pos] == bkey[m]
            return t.filter(pa.array(keep))

    cand = exploded.map_batches(FilterHot, batch_format="pyarrow",
                                concurrency=concurrency).to_pandas()

    def edges_of_group(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"src": [], "dst": []})
        g = g.sort_values("id")
        ids = g["id"].to_numpy()
        sigs = np.stack(g["sig"].to_numpy())
        src, dst = [], []
        # compare every member against the group minimum (star pattern —
        # candidates in a bucket already share a full band)
        base = sigs[0]
        est = (sigs[1:] == base[None, :]).mean(axis=1)
        hit = est >= jaccard_threshold
        src.extend([ids[0]] * int(hit.sum()))
        dst.extend(ids[1:][hit])
        return pd.DataFrame({"src": np.asarray(src, dtype=np.int64),
                             "dst": np.asarray(dst, dtype=np.int64)})

    edges = cand.groupby(["band_id", "band_key"], sort=False,
                         group_keys=False).apply(edges_of_group) \
        if len(cand) else pd.DataFrame({"src": [], "dst": []})
    rep = components_min_rep(edges.drop_duplicates()) if len(edges) else {}
    rows = sorted((d, r) for d, r in rep.items())
    return pd.DataFrame({"id": [r[0] for r in rows],
                         "rep_id": [r[1] for r in rows]})


# ------------------------------------------------- n-gram Jaccard (generic)

def ngram_jaccard_pairs(ds: ray.data.Dataset, id_col: str, text_col: str,
                        n: int = 3, threshold: float = 0.8) -> pd.DataFrame:
    """Exact n-gram-Jaccard near-dup pairs via a shared-rare-ngram
    candidate join: docs sharing at least one n-gram hash band into the
    same group; exact Jaccard verified per candidate pair against the
    group minimum.  Intended for bounded near-dup rates; the all-pairs
    explosion is avoided by hashing each doc's *least frequent* k
    shingles only (documents with >= threshold Jaccard share most
    shingles, hence almost surely one of the k rarest)."""
    from ..functions.hashing import fnv1a32
    from ..functions.minhash import jaccard, word_ngrams

    K_RAREST = 8

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        texts = batch[text_col].to_pylist()
        out_id, out_key, out_text = [], [], []
        for i, tx in enumerate(texts):
            grams = sorted(word_ngrams(tx.split(), n))
            # deterministic hash (NOT builtin hash(): PYTHONHASHSEED varies
            # across Ray workers)
            keys = sorted(fnv1a32(" ".join(g)) for g in grams)[:K_RAREST]
            for kk in keys:
                out_id.append(ids[i])
                out_key.append(kk)
                out_text.append(tx)
        return pa.table({"id": pa.array(out_id, pa.int64()),
                         "key": pa.array(out_key, pa.int64()),
                         "text": pa.array(out_text, pa.string())})

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"src": [], "dst": [], "jaccard": []})
        g = g.sort_values("id").drop_duplicates("id")
        ids = g["id"].to_numpy()
        texts = g["text"].tolist()
        base = word_ngrams(texts[0].split(), n)
        src, dst, jac = [], [], []
        for i in range(1, len(ids)):
            j = jaccard(base, word_ngrams(texts[i].split(), n))
            if j >= threshold:
                src.append(ids[0]); dst.append(ids[i]); jac.append(j)
        return pd.DataFrame({"src": src, "dst": dst, "jaccard": jac})

    import pyarrow.compute as pc

    sel = ds.select_columns([id_col, text_col])
    exploded = sel.map_batches(explode, batch_format="pyarrow")
    exploded = exploded.materialize()   # consumed twice (counts + filter)
    # native count-agg -> shared-key filter (keys shared by >= 2 docs)
    counts = exploded.select_columns(["key"]).groupby("key").count()
    hot = counts.map_batches(
        lambda t: t.filter(pc.greater(t["count()"], 1)),
        batch_format="pyarrow").to_pandas()
    if not len(hot):
        return pd.DataFrame({"src": pd.Series([], dtype=np.int64),
                             "dst": pd.Series([], dtype=np.int64),
                             "jaccard": pd.Series([], dtype=float)})
    hot_keys = np.sort(hot["key"].to_numpy().astype(np.int64))
    hot_ref = ray.put(hot_keys)

    class FilterHot:
        def __init__(self):
            self.keys = ray.get(hot_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            k = t["key"].to_numpy(zero_copy_only=False)
            pos = np.clip(np.searchsorted(self.keys, k), 0,
                          len(self.keys) - 1)
            return t.filter(pa.array(self.keys[pos] == k))

    cand = exploded.map_batches(FilterHot, batch_format="pyarrow",
                                concurrency=(1, 4)).to_pandas()
    pairs = cand.groupby("key", sort=False, group_keys=False).apply(verify) \
        if len(cand) else pd.DataFrame({"src": [], "dst": [], "jaccard": []})
    if len(pairs):
        pairs = pairs.drop_duplicates(["src", "dst"]).sort_values(["src", "dst"])
    return pairs.reset_index(drop=True)


# ------------------------------------------- embedding-cosine near-dup

def embedding_near_dup_pairs(ds: ray.data.Dataset, id_col: str, vec_col: str,
                             cosine_threshold: float = 0.95,
                             num_buckets: int = 32, seed: int = 5,
                             num_planes: int = 8) -> pd.DataFrame:
    """Near-dup pairs by embedding cosine similarity.

    Scale path: random-hyperplane LSH buckets (SimHash over vectors,
    Charikar 2002) — vectors are only compared within a bucket; brute
    force inside each bucket via numpy matmul.  Vectors near the
    threshold straddling a plane can land in different buckets (recall
    < 1, standard LSH trade-off; raise num_planes/bands for recall).
    """
    def bucketize(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        vecs = np.stack(batch[vec_col].to_numpy(zero_copy_only=False))
        rng = np.random.RandomState(seed)
        planes = rng.randn(vecs.shape[1], num_planes)
        bits = (vecs @ planes) > 0
        bucket = bits @ (1 << np.arange(num_planes))
        return pa.table({"id": pa.array(ids, pa.int64()),
                         "bucket": pa.array(bucket.astype(np.int64)),
                         "vec": batch[vec_col]})

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"src": [], "dst": [], "cosine": []})
        g = g.sort_values("id")
        ids = g["id"].to_numpy()
        V = np.stack(g["vec"].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(V, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        V = V / norms
        S = V @ V.T
        ii, jj = np.triu_indices(len(ids), k=1)
        hit = S[ii, jj] >= cosine_threshold
        return pd.DataFrame({"src": ids[ii[hit]], "dst": ids[jj[hit]],
                             "cosine": S[ii, jj][hit]})

    pairs = ds.select_columns([id_col, vec_col]).map_batches(
        bucketize, batch_format="pyarrow") \
        .groupby("bucket").map_groups(verify, batch_format="pandas").to_pandas()
    if len(pairs):
        pairs = pairs.drop_duplicates(["src", "dst"]).sort_values(["src", "dst"])
    return pairs.reset_index(drop=True)
