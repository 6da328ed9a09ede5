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
O(duplicates); union-find on the driver is the small-result fast path,
and beyond ~20M edges ``components_min_label_distributed`` (iterated
min-label propagation over a task-based bucket shuffle; the driver
routes refs only) takes over — implemented and property-tested against
union-find.  The final drop-filter broadcasts the drop-id set
(``ray.put`` once); at extreme dup cardinality this becomes a
hash-bucketed anti-join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..functions.hashing import hamming64, simhash_combo_keys

# guard: max unique simhash values pairwise-verified within one band group
# (beyond this the group is almost certainly a degenerate band value; we
# verify consecutive sorted neighbours only and log)
_MAX_PAIRWISE = 4096


def _sorted_member_mask(sorted_arr: np.ndarray,
                        ids: np.ndarray) -> np.ndarray:
    """Boolean membership of ``ids`` in a SORTED array — the shared
    broadcast-set kernel (clip + searchsorted + compare) used by every
    drop/keep/candidate filter in this module."""
    if not len(sorted_arr) or not len(ids):
        return np.zeros(len(ids), bool)
    pos = np.clip(np.searchsorted(sorted_arr, ids), 0,
                  len(sorted_arr) - 1)
    return sorted_arr[pos] == ids


# ---------------------------------------------------------------- exact

# two independent 64-bit key-hash seeds (pd.util.hash_pandas_object
# hash_key): both colliding for DISTINCT texts ~ 2^-128 per pair —
# documented residual risk of the hash-key plan
_XD_K1 = "se-ray-dedup-k1!"
_XD_K2 = "se-ray-dedup-k2!"


def _hash_key_batch(batch: pa.Table, key: str, order_col: str) -> pa.Table:
    """(h1, h2, order) triple per row — the ONLY payload that enters
    the dedup exchange (24 B/row; the raw key text never ships).

    Non-string key columns are cast to string FIRST:
    ``hash_pandas_object`` applies ``hash_key`` only to object-dtype
    data (numeric dtypes take a keyless bit-mix path), so without the
    cast h1 == h2 identically and the two-hash 2^-128 guarantee would
    silently collapse to a single 64-bit hash.  The order column keeps
    integer vs floating representation (int64 > 2^53 must not round-
    trip through float64)."""
    import pyarrow.compute as pc
    col = batch[key]
    kt = col.type
    if not (pa.types.is_string(kt) or pa.types.is_large_string(kt)
            or pa.types.is_binary(kt) or pa.types.is_large_binary(kt)):
        col = pc.cast(col, pa.string())
    s = col.to_pandas()
    h1 = pd.util.hash_pandas_object(s, index=False, hash_key=_XD_K1) \
        .to_numpy().view(np.int64)
    h2 = pd.util.hash_pandas_object(s, index=False, hash_key=_XD_K2) \
        .to_numpy().view(np.int64)
    ot = batch[order_col].type
    ord_arr = batch[order_col].cast(
        pa.int64() if (pa.types.is_integer(ot) or pa.types.is_boolean(ot)
                       or pa.types.is_temporal(ot)) else pa.float64())
    return pa.table({"h1": pa.array(h1), "h2": pa.array(h2),
                     "ord": ord_arr})


def _lookup_pairs(wh1: np.ndarray, wh2: np.ndarray, h1: np.ndarray,
                  h2: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized 2-key membership: winners sorted by (h1, h2); returns
    (hit_mask, pos).  h1 runs in the winner table are ~always length 1
    (a run > 1 needs an h1 collision BETWEEN dup groups); longer runs
    resolve with a tiny per-row binary search."""
    left = np.searchsorted(wh1, h1, side="left")
    right = np.searchsorted(wh1, h1, side="right")
    pos = np.clip(left, 0, max(0, len(wh1) - 1))
    multi = right - left > 1
    for i in np.flatnonzero(multi):        # ~never taken
        seg = wh2[left[i]:right[i]]
        j = np.searchsorted(seg, h2[i])
        pos[i] = left[i] + min(j, len(seg) - 1)
    hit = (left < right) & (wh1[pos] == h1) & (wh2[pos] == h2)
    return hit, pos


def _exact_winner_kernel(c1: np.ndarray, c2: np.ndarray, co: np.ndarray,
                         order_col: str
                         ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-(h1, h2) dup-group winners (min ``ord``) of one candidate
    set: one lexsort + run detection.  Returns ``(wh1, wh2, wmin)``
    sorted by (h1, h2).  Refuses ties at the group minimum loudly (the
    winner filter keeps rows by VALUE equality, so a tie would keep
    several rows)."""
    o = np.lexsort((co, c2, c1))
    c1, c2, co = c1[o], c2[o], co[o]
    run_start = np.concatenate(
        [[True], (c1[1:] != c1[:-1]) | (c2[1:] != c2[:-1])])
    run_id = np.cumsum(run_start) - 1
    run_len = np.bincount(run_id)
    starts = run_start.nonzero()[0]
    dup_run = run_len[run_id[starts]] > 1
    dstarts = starts[dup_run]
    tied = co[dstarts + 1] == co[dstarts] if len(dstarts) else \
        np.zeros(0, bool)
    if tied.any():
        raise ValueError(
            f"exact_dedup_first: {int(tied.sum())} duplicate group(s) "
            f"tie at the minimum {order_col!r} value — supply an "
            f"order column that is unique within each key group "
            f"(e.g. a row id)")
    return (c1[run_start][dup_run], c2[run_start][dup_run],
            co[run_start][dup_run])


@ray.remote
def _part_cand_by_h1(tbl: pa.Table, num_buckets: int):
    """Split one candidate block by ``h1 % B`` (num_returns=B) —
    each (h1, h2) group lands wholly in ONE bucket."""
    h1 = tbl["h1"].to_numpy(zero_copy_only=False).astype(np.int64)
    b = h1 % num_buckets
    out = [tbl.filter(pa.array(b == i)) for i in range(num_buckets)]
    return tuple(out) if num_buckets > 1 else out[0]


@ray.remote
def _winner_bucket(order_col: str, *pieces):
    """Resolve ONE h1-bucket's dup-group winners (vectorized kernel)."""
    tabs = [p for p in pieces if p.num_rows]
    if not tabs:
        z = np.zeros(0, np.int64)
        return z, z, z.astype(np.float64)
    t = pa.concat_tables(tabs).combine_chunks()
    return _exact_winner_kernel(
        t["h1"].to_numpy(zero_copy_only=False).astype(np.int64),
        t["h2"].to_numpy(zero_copy_only=False).astype(np.int64),
        t["ord"].to_numpy(zero_copy_only=False), order_col)


def exact_dedup_first(ds: ray.data.Dataset, key: str,
                      order_col: str,
                      driver_limit: int = 2_000_000,
                      num_buckets: int = 64) -> ray.data.Dataset:
    """Keep the min-``order_col`` row per ``key`` group (A3 analogue for
    generic tables).

    SCALE shape (same count-prefilter pattern as the simhash/minhash
    paths): the raw key never enters any exchange.  (1) each batch adds
    two independent 64-bit hashes of the key (vectorized
    ``pd.util.hash_pandas_object``); (2) a NATIVE ``groupby(h1).count``
    finds hot hashes — O(duplicate groups), broadcast once; (3) only
    rows holding a hot hash (dup-rate bounded) hold candidates; their
    per-(h1, h2) winners (min order) resolve with one lexsort — on the
    driver below ``driver_limit`` candidate rows, else bucketed by
    ``h1 % num_buckets`` into parallel Ray tasks (a group's rows share
    h1, so buckets are independent and winner arrays simply
    concatenate); (4) the input streams through a filter keeping every
    row that is not in a dup group, plus each group's winner.  The
    driver holds only the O(dup groups) winner triples — never the
    O(duplicate rows) candidate set (at web dup rates 30-50% of a
    100 TB corpus, the old driver collect was tens of GB).  Two
    distinct keys colliding on BOTH 64-bit hashes (~2^-128 per pair)
    would drop a unique row — the documented residual of not shipping
    text.

    ``order_col`` must be UNIQUE within each key group (a row id /
    doc id): the winner filter keeps rows matching the group-minimum
    VALUE, so a tie at the minimum is refused with a ValueError rather
    than silently keeping several rows."""
    import pyarrow.compute as pc

    slim = ds.map_batches(_hash_key_batch,
                          fn_kwargs={"key": key, "order_col": order_col},
                          batch_format="pyarrow").materialize()
    hot = slim.groupby("h1").count().map_batches(
        lambda t: t.filter(pc.greater(t["count()"], 1)),
        batch_format="pyarrow").to_pandas()
    if not len(hot):
        return ds
    hot_h1 = np.sort(hot["h1"].to_numpy().astype(np.int64))
    hot_ref = ray.put(hot_h1)

    def filter_hot(t: pa.Table) -> pa.Table:
        w = ray.get(hot_ref)
        h1 = t["h1"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(_sorted_member_mask(w, h1)))

    cand = slim.map_batches(filter_hot,
                            batch_format="pyarrow").materialize()
    n_cand = cand.count()
    if n_cand <= driver_limit:
        cpd = cand.to_pandas()
        wh1, wh2, wmin = _exact_winner_kernel(
            cpd["h1"].to_numpy().astype(np.int64),
            cpd["h2"].to_numpy().astype(np.int64),
            cpd["ord"].to_numpy(), order_col)
    else:
        nret = {"num_returns": num_buckets} if num_buckets > 1 else {}
        parts = [_part_cand_by_h1.options(**nret).remote(r, num_buckets)
                 for r in cand.to_arrow_refs()]
        if num_buckets == 1:
            parts = [[p] for p in parts]
        futs = [_winner_bucket.remote(
            order_col, *[parts[j][i] for j in range(len(parts))])
            for i in range(num_buckets)]
        triples = [t for t in ray.get(futs) if len(t[0])]
        if triples:
            wh1 = np.concatenate([t[0] for t in triples])
            wh2 = np.concatenate([t[1] for t in triples])
            wmin = np.concatenate([t[2] for t in triples])
            o = np.lexsort((wh2, wh1))   # _lookup_pairs needs (h1, h2)
            wh1, wh2, wmin = wh1[o], wh2[o], wmin[o]
        else:
            wh1 = wh2 = np.zeros(0, np.int64)
            wmin = np.zeros(0, np.float64)
    if not len(wh1):
        return ds
    win_ref = ray.put((wh1, wh2, wmin))

    def keep_winners(t: pa.Table) -> pa.Table:
        vh1, vh2, vmin = ray.get(win_ref)
        hb = _hash_key_batch(t, key, order_col)
        h1 = hb["h1"].to_numpy()
        h2 = hb["h2"].to_numpy()
        od = hb["ord"].to_numpy()
        hit, pos = _lookup_pairs(vh1, vh2, h1, h2)
        keep = ~hit | (od == vmin[pos])
        return t.filter(pa.array(keep))

    return ds.map_batches(keep_winners, batch_format="pyarrow")


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


def simhash_near_dup_edges(docs: ray.data.Dataset, num_bands: int = 4,
                           threshold: int = 3,
                           driver_limit: int = 2_000_000,
                           band_task_limit: int = 20_000_000,
                           files: list[str] | None = None
                           ) -> pd.DataFrame:
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

    _empty = pd.DataFrame({"src": pd.Series([], dtype=np.int64),
                           "dst": pd.Series([], dtype=np.int64)})
    # path choice on a metadata-only UPPER BOUND (input rows x combo
    # count) — counting the exploded dataset would force an extra full
    # execution just to pick a plan
    from ..functions.hashing import simhash_num_combo_bands
    n_combos = simhash_num_combo_bands(threshold)
    n_docs_est = docs.count()
    n_est = n_docs_est * n_combos
    if n_est == 0:
        return _empty
    # tiny inputs: one driver lexsort beats any distributed plan
    if n_est <= driver_limit:
        cand = exploded.to_pandas()
        if not len(cand):
            return _empty
        return _edges_from_candidates(cand, threshold)

    # mid path (up to ~20M docs per task's memory): BAND-PARALLEL tasks
    # over shared blocks.  The slim (doc_id, simhash) columns — 16 B/doc
    # — materialize once in the object store; each of the C(B,3) tasks
    # zero-copy-reads them, computes only ITS combo key, sorts locally
    # and verifies.  No all-to-all exchange and no driver data pull —
    # a range-partition groupby on a 20-value key was measured slower
    # AND mostly serial (degenerate sort key).  Beyond per-task memory,
    # fall through to the distributed groupby with count-prefilter.
    if n_docs_est <= band_task_limit:
        # consolidate into ONE object-store entry first: each band task
        # then resolves a single shared zero-copy ref instead of paying
        # per-object fetch overhead for every block (measured 10x worse
        # with ~140 blocks).  When the caller can name the parquet
        # files, the consolidate task reads the two pruned columns
        # straight from storage — a multithreaded arrow read beats a
        # full Dataset materialize round-trip for a 16 B/row projection.
        if files is not None:
            # driver-side pruned read: Ray workers run with
            # OMP_NUM_THREADS=1, so an in-task arrow read decodes
            # single-threaded (measured ~10x slower); the driver keeps
            # its full thread pool and the pull is 16 B/doc, bounded by
            # band_task_limit
            import pyarrow.compute as _pc
            import pyarrow.parquet as _pq
            t = _pq.read_table(list(files), columns=["doc_id", "simhash"])
            t = t.filter(_pc.not_equal(t["simhash"],
                                       pa.scalar(0, pa.uint64())))
            t = t.combine_chunks()
            cons = ray.put(
                (t["simhash"].to_numpy(zero_copy_only=False)
                 .astype(np.uint64),
                 t["doc_id"].to_numpy(zero_copy_only=False)
                 .astype(np.int64)))
            del t
        else:
            blocks = [r for r in slim.materialize().to_arrow_refs()]
            cons = _consolidate_slim.remote(blocks)
        futs = [_band_edges_task.remote(cons, k, threshold)
                for k in range(n_combos)]
        parts = [p for p in ray.get(futs) if len(p)]
        if not parts:
            return _empty
        return pd.concat(parts).drop_duplicates().reset_index(drop=True)
    n_rows = n_est

    # DISTRIBUTED verify: the exploded keys never land on the driver.
    # Rows range-partition by combo band (C ~ 20 coarse groups, each
    # ~n_docs rows — no tiny-group trap) and each band verifies its own
    # candidate runs vectorized; only the verified edge list
    # (O(duplicates)) returns.  Beyond 50M rows a native count
    # aggregate prefilters to non-singleton band values first, so the
    # band shuffle moves only genuine candidates.
    work = exploded
    if n_rows > 50_000_000:
        # consumed twice here (counts, then filter): materialize the
        # 28-byte rows once instead of re-exploding the corpus
        exploded = exploded.materialize()
        counts = exploded.groupby(["band_id", "band_val"]).count()
        hot = counts.map_batches(
            lambda t: t.filter(pc.greater(t["count()"], 1)),
            batch_format="pyarrow").to_pandas()
        if not len(hot):
            return _empty
        hot_by_band = {int(b): np.sort(g["band_val"].to_numpy()
                                       .astype(np.int64))
                       for b, g in hot.groupby("band_id")}
        hot_ref = ray.put(hot_by_band)

        class FilterHot:
            def __init__(self):
                self.hot = ray.get(hot_ref)

            def __call__(self, t: pa.Table) -> pa.Table:
                bid = t["band_id"].to_numpy(zero_copy_only=False)
                bval = t["band_val"].to_numpy(zero_copy_only=False) \
                    .astype(np.int64)
                keep = np.zeros(len(bid), dtype=bool)
                for b, vals in self.hot.items():
                    m = bid == b
                    if m.any() and len(vals):
                        pos = np.searchsorted(vals, bval[m])
                        pos = np.clip(pos, 0, len(vals) - 1)
                        keep[m] = vals[pos] == bval[m]
                return t.filter(pa.array(keep))

        work = exploded.map_batches(FilterHot, batch_format="pyarrow",
                                    concurrency=(1, 4))

    edges = work.groupby("band_id").map_groups(
        lambda g: _edges_from_candidates(g, threshold),
        batch_format="pandas").to_pandas()
    if not len(edges):
        return _empty
    return edges.drop_duplicates().reset_index(drop=True)


@ray.remote
def _consolidate_slim(block_refs: list):
    """Concat the slim (doc_id, simhash) blocks into one numpy pair —
    stored as a single object the band tasks share zero-copy."""
    tabs = [t for t in ray.get(list(block_refs)) if t.num_rows]
    if not tabs:
        return (np.empty(0, np.uint64), np.empty(0, np.int64))
    t = pa.concat_tables(tabs).combine_chunks()
    return (t["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64),
            t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64))


@ray.remote
def _consolidate_from_files(files: list):
    """Direct pruned-column read of (doc_id, simhash) -> numpy pair."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    t = pq.read_table(files, columns=["doc_id", "simhash"])
    t = t.filter(pc.not_equal(t["simhash"], pa.scalar(0, pa.uint64())))
    t = t.combine_chunks()
    return (t["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64),
            t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64))


@ray.remote
def _band_edges_task(consolidated, band: int,
                     threshold: int) -> pd.DataFrame:
    """Verify ONE combo band: zero-copy read of the shared
    (simhash, doc_id) arrays, single-band key, local sort + verify."""
    from ..functions.hashing import simhash_combo_key_band
    h, d = consolidated
    if not len(h):
        return pd.DataFrame({"src": np.empty(0, np.int64),
                             "dst": np.empty(0, np.int64)})
    key = simhash_combo_key_band(h, threshold, band).view(np.int64)
    cand = pd.DataFrame({
        "band_id": np.full(len(d), band, dtype=np.int32),
        "band_val": key, "doc_id": d, "simhash": h})
    return _edges_from_candidates(cand, threshold)


def _edges_from_candidates(cand: pd.DataFrame, threshold: int) -> pd.DataFrame:
    """Verify hamming<=threshold over candidate band buckets — fully
    vectorized (no per-bucket Python calls: at 16-bit band width the
    bucket table saturates quickly, so bucket COUNT is O(corpus))."""
    bid = cand["band_id"].to_numpy().astype(np.int64)
    bval = cand["band_val"].to_numpy().astype(np.int64)
    sims = cand["simhash"].to_numpy().astype(np.uint64)
    docs = cand["doc_id"].to_numpy().astype(np.int64)
    if len(bid) and (bid == bid[0]).all():   # single band: 3-key sort
        order = np.lexsort((docs, sims, bval))
    else:
        order = np.lexsort((docs, sims, bval, bid))
    bid, bval, sims, docs = bid[order], bval[order], sims[order], docs[order]

    same_bucket = (bid[1:] == bid[:-1]) & (bval[1:] == bval[:-1])
    same_sim = same_bucket & (sims[1:] == sims[:-1])
    # 1) identical fingerprints: STAR every run member to the run's
    # first (= min, docs ascend within the run) doc.  A consecutive
    # chain built linear paths whose graph diameter equals the
    # duplicate-run length, forcing O(run) min-label rounds at the
    # >20M-edge scale; the star keeps component diameter O(1) at the
    # same edge count.
    first = np.concatenate([[True], ~same_sim])
    hub = docs[np.maximum.accumulate(
        np.where(first, np.arange(len(docs)), 0))]
    member = ~first
    src = [hub[member]]
    dst = [docs[member]]

    # 2) distinct-fingerprint representatives per bucket: first row of
    # each (bucket, simhash) run; all-pairs within each bucket run
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
    if cap < sz_a.max(initial=0):
        import logging
        n_win = int((sz_a > cap).sum())
        logging.getLogger(__name__).warning(
            "simhash verify: %d same-key runs exceed the all-pairs cap "
            "%d (max run %d) — windowed neighbour verification (W=%d) "
            "applied to them; near-dup recall on those runs is "
            "approximate", n_win, cap, int(sz_a.max()), WINDOW)
    order2 = np.argsort(sz_a, kind="stable")
    sz_s, st_s = sz_a[order2], st_a[order2]
    cut = np.concatenate([[0], np.flatnonzero(np.diff(sz_s)) + 1,
                          [len(sz_s)]])
    pi_parts, pj_parts = [], []
    for a, b in zip(cut[:-1], cut[1:]):
        if a == b:          # no runs at all: cut degenerates to [0, 0]
            continue
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
        # dedupe by DOC pair before the popcount pass (~20x less work).
        # With a SINGLE band in the input (the band-parallel task path)
        # every pair occurs exactly once, so the dedup lexsort + the
        # two full-width doc-id gathers are pure overhead (measured
        # ~2/3 of the verify kernel) — skip straight to the popcount
        # and gather ids for the hits only.
        if bid[0] != bid[-1]:
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
        return pd.DataFrame({"src": np.empty(0, np.int64),
                              "dst": np.empty(0, np.int64)})
    return pd.DataFrame({"src": s, "dst": t}).drop_duplicates() \
        .reset_index(drop=True)


def components_min_rep_arrays(
        edges: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized connected components: ``(ids, min_rep)`` arrays over
    every NON-representative node in the edge set, ids sorted
    ascending (component minima are omitted, matching the historical
    union-find dict's key set).

    Min-hooking + pointer doubling over flat numpy arrays
    (Shiloach-Vishkin shape): each outer round relaxes every edge with
    one ``np.minimum.at`` then fully compresses parents by repeated
    ``par = par[par]``; O(E) work per round, O(log V) rounds.  The
    per-edge Python union-find this replaces cost ~12 s of pure
    driver serial time per 1.8M edges — this runs the same input in
    ~0.3 s and keeps the driver's serial share of a build flat as the
    corpus grows.
    """
    s = edges["src"].to_numpy().astype(np.int64, copy=False)
    d = edges["dst"].to_numpy().astype(np.int64, copy=False)
    nodes, inv = np.unique(np.concatenate([s, d]), return_inverse=True)
    si, di = inv[:len(s)], inv[len(s):]
    keep = si != di                     # self-loops merge nothing
    si, di = si[keep], di[keep]
    par = np.arange(len(nodes), dtype=np.int64)
    while len(si):
        ps, pd_ = par[si], par[di]
        hi = np.maximum(ps, pd_)
        lo = np.minimum(ps, pd_)
        np.minimum.at(par, hi, lo)
        while True:                     # pointer doubling to fixpoint
            nxt = par[par]
            if np.array_equal(nxt, par):
                break
            par = nxt
        if np.array_equal(par[si], par[di]):
            break
    # par[i] <= i holds throughout (hooking larger roots onto smaller),
    # so each component's final root is its minimum node index
    rep = nodes[par]
    m = rep != nodes
    return nodes[m], rep[m]


def components_min_rep(edges: pd.DataFrame) -> dict[int, int]:
    """doc_id -> min-doc_id representative, for every doc in an edge
    EXCEPT the component minima (dict view of
    ``components_min_rep_arrays`` — kept for the dict-shaped callers;
    the build's dedup stage uses the array form directly).
    Scale path (documented in the module docstring): iterated min-label
    propagation with groupby when edges outgrow the driver.
    """
    ids, reps = components_min_rep_arrays(edges)
    return dict(zip(ids.tolist(), reps.tolist()))


@ray.remote
def _part_edges(tbl: pa.Table, num_buckets: int):
    """Symmetrize one edge block and split by node hash bucket.
    Returns ``num_buckets`` (node, nbr) array pairs (num_returns=B)."""
    s = tbl["src"].to_numpy(zero_copy_only=False).astype(np.int64)
    d = tbl["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
    node = np.concatenate([s, d])
    nbr = np.concatenate([d, s])
    b = node % num_buckets
    out = []
    for i in range(num_buckets):
        m = b == i
        out.append((node[m], nbr[m]))
    return tuple(out) if num_buckets > 1 else out[0]


@ray.remote
def _concat_shard(*pieces):
    """Combine one bucket's pieces; returns (nodes_sorted_unique,
    edge_node, edge_nbr, init_labels)."""
    node = np.concatenate([p[0] for p in pieces]) if pieces else \
        np.empty(0, np.int64)
    nbr = np.concatenate([p[1] for p in pieces]) if pieces else \
        np.empty(0, np.int64)
    nodes = np.unique(node)
    # init label = min(node, min nbr over its edges)
    lab = nodes.copy()
    pos = np.searchsorted(nodes, node)
    np.minimum.at(lab, pos, nbr)
    return nodes, node, nbr, lab


@ray.remote
def _flow_labels(shard, labels: np.ndarray, num_buckets: int):
    """Send each edge's node-label to its nbr's bucket.  Returns
    ``num_buckets`` (tgt_node, cand_label) pairs."""
    nodes, node, nbr, _ = shard
    lab = labels[np.searchsorted(nodes, node)]
    b = nbr % num_buckets
    out = []
    for i in range(num_buckets):
        m = b == i
        out.append((nbr[m], lab[m]))
    return tuple(out) if num_buckets > 1 else out[0]


@ray.remote(num_returns=2)
def _reduce_labels(shard, labels: np.ndarray, *received):
    """New label per node = min(own, every received candidate).
    Two returns: the label array STAYS in the object store; only the
    (scalar) label sum travels to the driver as convergence witness."""
    nodes = shard[0]
    lab = labels.copy()
    for tgt, cand in received:
        if len(tgt):
            pos = np.searchsorted(nodes, tgt)
            np.minimum.at(lab, pos, cand)
    return lab, int(lab.sum())


@ray.remote
def _request_labels(shard, labels: np.ndarray, num_buckets: int):
    """Pointer-doubling phase 1: every node whose label is another node
    asks that node's bucket for ITS label.  Returns ``num_buckets``
    (requester, queried_label) pairs."""
    nodes = shard[0]
    m = labels != nodes
    req, lbl = nodes[m], labels[m]
    b = lbl % num_buckets
    out = []
    for i in range(num_buckets):
        s = b == i
        out.append((req[s], lbl[s]))
    return tuple(out) if num_buckets > 1 else out[0]


@ray.remote
def _answer_labels(shard, labels: np.ndarray, num_buckets: int,
                   *received):
    """Pointer-doubling phase 2: answer label(lbl) for each request and
    route the answer back to the requester's bucket.  Every label value
    is a node id appearing in the edge set (labels are min-combines of
    node ids), so the lookup always resolves; unknown ids pass through
    unchanged as a defensive no-op."""
    nodes = shard[0]
    req = np.concatenate([r[0] for r in received]) if received \
        else np.empty(0, np.int64)
    lbl = np.concatenate([r[1] for r in received]) if received \
        else np.empty(0, np.int64)
    if len(lbl) and len(nodes):
        pos = np.clip(np.searchsorted(nodes, lbl), 0, len(nodes) - 1)
        ans = np.where(nodes[pos] == lbl, labels[pos], lbl)
    else:
        ans = lbl
    b = req % num_buckets
    out = []
    for i in range(num_buckets):
        s = b == i
        out.append((req[s], ans[s]))
    return tuple(out) if num_buckets > 1 else out[0]


def components_min_label_distributed(edges: ray.data.Dataset,
                                     num_buckets: int = 16,
                                     max_iters: int = 64) -> pd.DataFrame:
    """Connected components via iterated MIN-LABEL PROPAGATION with
    POINTER DOUBLING — the scale path for when the verified edge set
    outgrows the driver's union-find.

    Implemented as a hand-rolled bucket shuffle over raw Ray tasks
    (the one place the Dataset API genuinely fails here: an iterative
    loop of groupby jobs wedged Ray Data's streaming executor after a
    few rounds).  Edges are hash-partitioned by node once; per round
    each bucket task (1) ships its nodes' labels across their edges to
    the target buckets with a min-reduce, then (2) shortcuts
    label := min(label, label(label)) via a request/answer exchange
    (pointer doubling), so rounds = O(log component diameter) instead
    of O(diameter).  The driver only routes O(num_buckets^2) object
    refs, never edge data.  Labels only decrease over a finite domain,
    so the per-bucket label sums witness convergence exactly: the loop
    runs UNTIL a full round leaves the sum unchanged (guaranteed to
    terminate); ``max_iters`` is a hard safety valve — with doubling it
    covers diameters ~2^max_iters, so exhausting it indicates a logic
    error and raises rather than silently under-merging.
    Returns (id, rep_id) for every node appearing in an edge,
    rep = component min id.
    """
    B = num_buckets
    blocks = edges.materialize().to_arrow_refs()
    nret = {"num_returns": B} if B > 1 else {}
    parts = [_part_edges.options(**nret).remote(r, B) for r in blocks]
    if B == 1:
        parts = [[p] for p in parts]
    shards = [_concat_shard.remote(*[parts[j][i] for j in range(len(parts))])
              for i in range(B)]

    @ray.remote
    def _labels_of(shard):
        return shard[3]

    labels = [_labels_of.remote(s) for s in shards]
    prev = None
    converged = False
    for _ in range(max_iters):
        # (1) edge propagation: min over neighbours
        flows = [_flow_labels.options(**nret).remote(shards[i], labels[i], B)
                 for i in range(B)]
        if B == 1:
            flows = [[f] for f in flows]
        results = [_reduce_labels.remote(shards[i], labels[i],
                                         *[flows[j][i] for j in range(B)])
                   for i in range(B)]
        labels = [r[0] for r in results]
        # (2) pointer doubling: label := min(label, label(label))
        reqs = [_request_labels.options(**nret).remote(shards[i], labels[i],
                                                       B)
                for i in range(B)]
        if B == 1:
            reqs = [[r] for r in reqs]
        answers = [_answer_labels.options(**nret).remote(
            shards[i], labels[i], B, *[reqs[j][i] for j in range(B)])
            for i in range(B)]
        if B == 1:
            answers = [[a] for a in answers]
        results = [_reduce_labels.remote(shards[i], labels[i],
                                         *[answers[j][i] for j in range(B)])
                   for i in range(B)]
        labels = [r[0] for r in results]
        cur = sum(ray.get([r[1] for r in results]))
        if prev is not None and cur == prev:
            converged = True
            break
        prev = cur
    if not converged:
        raise RuntimeError(
            f"min-label propagation did not converge in {max_iters} "
            "rounds — with pointer doubling this bounds component "
            "diameter at ~2^rounds, so this indicates corrupt edge "
            "input or a partitioning bug, not a large graph")
    nodes = np.concatenate(ray.get([_nodes_of.remote(s) for s in shards]))
    labs = np.concatenate(ray.get(list(labels)))
    out = pd.DataFrame({"id": nodes, "rep_id": labs})
    return out.sort_values("id").reset_index(drop=True)


@ray.remote
def _nodes_of(shard):
    return shard[0]


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

def minhash_bucket_edges(ids: np.ndarray, sigs: np.ndarray,
                         threshold: float) -> pd.DataFrame:
    """Full PAIRWISE estimated-Jaccard verification within one LSH
    bucket (``ids`` ascending, ``sigs`` the (m, num_perm) signatures).

    Star-vs-min verification (members compared only against the bucket
    minimum) silently drops pairs similar to each other but not to the
    min — buckets are small by construction (members share an entire
    band), so all-pairs is cheap.  Buckets beyond ``_MAX_PAIRWISE``
    members (degenerate band value) fall back to sorted-neighbour
    windows over the signature lexicographic order, and that recall
    degradation is logged."""
    m = len(ids)
    if m <= _MAX_PAIRWISE:
        ii, jj = np.triu_indices(m, k=1)
    else:
        import logging
        logging.getLogger(__name__).warning(
            "minhash bucket of %d members exceeds pairwise cap %d: "
            "falling back to windowed neighbour verify (recall may drop)",
            m, _MAX_PAIRWISE)
        order = np.lexsort(sigs.T[::-1])
        ids, sigs = ids[order], sigs[order]
        W = 8
        ii = np.concatenate([np.arange(m - w) for w in range(1, W + 1)])
        jj = np.concatenate([np.arange(w, m) for w in range(1, W + 1)])
    est = (sigs[ii] == sigs[jj]).mean(axis=1)
    hit = est >= threshold
    a, b = ids[ii[hit]], ids[jj[hit]]
    return pd.DataFrame({"src": np.minimum(a, b).astype(np.int64),
                         "dst": np.maximum(a, b).astype(np.int64)})

class MinhashStage:
    """(id, text) batch -> ONE (id, sig list<uint32>) row per doc.

    The whole batch is shingled in one vectorized pass over the
    column's concatenated utf-8 buffer (``char_shingles_flat``) and
    signatures are per-doc segment minima (``minhash_signatures_flat``)
    — the only per-doc Python left is the rare short-doc (< k chars)
    padding fallback.

    Band keys are deliberately NOT emitted here: exploding to
    ``num_bands`` rows each carrying a copy of the 256-byte signature
    multiplies the exchange payload 16x (the round-1 scale bug).
    ``_bands_batch`` derives the 24-byte (id, band_id, band_key) rows
    from this compact table instead, and the verify step fetches
    signatures only for candidate ids."""

    def __init__(self, num_perm: int = 64, shingle_k: int = 5,
                 seed: int = 7):
        from ..functions.minhash import _permutations
        self.perms = _permutations(num_perm, seed)
        self.num_perm = num_perm
        self.k = shingle_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.minhash import (char_shingles_flat,
                                         minhash_signatures_flat)
        ids = batch[batch.column_names[0]].to_numpy(zero_copy_only=False)
        n = len(ids)
        flat, seg_counts = char_shingles_flat(batch[batch.column_names[1]],
                                              self.k)
        offsets = np.concatenate([[0], np.cumsum(seg_counts)[:-1]]) \
            if n else np.empty(0, np.int64)
        sigs = minhash_signatures_flat(flat, offsets, self.num_perm,
                                       perms=self.perms)
        sig_col = pa.ListArray.from_arrays(
            pa.array(np.arange(n + 1, dtype=np.int32) * self.num_perm),
            pa.array(sigs.reshape(-1)))
        return pa.table({"id": pa.array(ids.astype(np.int64)),
                         "sig": sig_col})


_MH_CACHE: dict = {}


def _minhash_sig_batch(batch: pa.Table, num_perm, shingle_k, seed) -> pa.Table:
    """Task-based MinhashStage with a per-worker memo — no actor-pool
    spawn latency per job (workers persist across jobs)."""
    key = (num_perm, shingle_k, seed)
    st = _MH_CACHE.get(key)
    if st is None:
        st = MinhashStage(num_perm, shingle_k, seed)
        _MH_CACHE.clear()
        _MH_CACHE[key] = st
    return st(batch)


def _bands_batch(t: pa.Table, num_bands: int) -> pa.Table:
    """(id, sig) rows -> (id, band_id, band_key) LSH band rows
    (24 bytes/row; no signature payload enters the exchange)."""
    from ..functions.minhash import lsh_band_keys_batch
    n = t.num_rows
    sig_col = t["sig"]
    if isinstance(sig_col, pa.ChunkedArray):
        sig_col = sig_col.combine_chunks()
    vals = np.asarray(sig_col.flatten())
    sigs = vals.reshape(n, -1) if n else vals.reshape(0, 1)
    keys = lsh_band_keys_batch(sigs.astype(np.uint32), num_bands) if n \
        else np.empty((0, num_bands), np.uint64)
    ids = t["id"].to_numpy(zero_copy_only=False)
    return pa.table({
        "id": pa.array(np.repeat(ids, num_bands), pa.int64()),
        "band_id": pa.array(np.tile(np.arange(num_bands, dtype=np.int32),
                                    n)),
        # int64 view: uint64 > 2^63 breaks Arrow conversion in
        # Ray's aggregate (pickled-object fallback)
        "band_key": pa.array(keys.reshape(-1).view(np.int64), pa.int64()),
    })


def minhash_lsh_dedup(ds: ray.data.Dataset, id_col: str, text_col: str,
                      num_perm: int = 64, num_bands: int = 16,
                      jaccard_threshold: float = 0.8,
                      concurrency=(1, 4),
                      driver_limit: int = 5_000_000) -> pd.DataFrame:
    """Returns dataframe (id, rep_id) for every doc in a near-dup cluster
    (rep = min id), verified by estimated Jaccard >= threshold.
    ``driver_limit``: band rows under which the band table is pulled
    whole (the verify skips singletons for free); above it a
    count-aggregate prefilters to shared band keys first.

    SCALE: the materialized intermediate is the compact per-doc
    signature table (id + num_perm x uint32); the 16x band explosion
    carries only (id, band_id, band_key) 24-byte rows and signatures
    are fetched per candidate id at verify time — no payload
    multiplication in the exchange."""
    import pyarrow.compute as pc

    sel = ds.select_columns([id_col, text_col])
    sigs_ds = sel.map_batches(
        _minhash_sig_batch,
        fn_kwargs={"num_perm": num_perm, "shingle_k": 5, "seed": 7},
        batch_format="pyarrow")
    # consumed twice: band derivation + candidate signature fetch
    sigs_ds = sigs_ds.materialize()
    n_docs = sigs_ds.count()   # metadata-only on a materialized ds

    bands = sigs_ds.map_batches(_bands_batch,
                                fn_kwargs={"num_bands": num_bands},
                                batch_format="pyarrow")
    if n_docs * num_bands <= driver_limit:
        # bounded fast path: the vectorized verify below skips
        # singleton runs for free, so just pull the band rows — the
        # count-aggregate + filter jobs only pay off when the band
        # table outgrows the driver
        cand = bands.to_pandas()
    else:
        # native count-aggregate -> broadcast hot band keys ->
        # vectorized filter (same shape as simhash_near_dup_edges;
        # avoids one Python call per mostly-singleton bucket)
        bands = bands.materialize()   # consumed twice (counts + filter)
        counts = bands.select_columns(["band_id", "band_key"]) \
            .groupby(["band_id", "band_key"]).count()
        hot = counts.map_batches(
            lambda t: t.filter(pc.greater(t["count()"], 1)),
            batch_format="pyarrow").to_pandas()
        if not len(hot):
            return pd.DataFrame({"id": pd.Series([], dtype=np.int64),
                                 "rep_id": pd.Series([], dtype=np.int64)})
        hot_by_band = {int(b): np.sort(g["band_key"].to_numpy()
                                       .astype(np.int64))
                       for b, g in hot.groupby("band_id")}
        hot_ref = ray.put(hot_by_band)

        def filter_hot(t: pa.Table, ref=None) -> pa.Table:
            hot_w = ray.get(ref)
            bid = t["band_id"].to_numpy(zero_copy_only=False)
            bkey = t["band_key"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            keep = np.zeros(len(bid), dtype=bool)
            for b, vals in hot_w.items():
                m = bid == b
                if m.any() and len(vals):
                    pos = np.clip(np.searchsorted(vals, bkey[m]), 0,
                                  len(vals) - 1)
                    keep[m] = vals[pos] == bkey[m]
            return t.filter(pa.array(keep))

        cand = bands.map_batches(filter_hot, fn_kwargs={"ref": hot_ref},
                                 batch_format="pyarrow").to_pandas()

    # verify ALL buckets in one vectorized pass: sort by bucket, build
    # every within-run pair's (i, j) index arrays grouped by run size,
    # then one (n_pairs, num_perm) signature-equality reduction — a
    # per-bucket pandas apply paid ~1 ms x thousands of hot buckets
    rep: dict = {}
    if len(cand):
        cand = cand.sort_values(["band_id", "band_key", "id"]) \
            .reset_index(drop=True)
        bid = cand["band_id"].to_numpy()
        bkey = cand["band_key"].to_numpy()
        ids = cand["id"].to_numpy().astype(np.int64)
        same = (bid[1:] == bid[:-1]) & (bkey[1:] == bkey[:-1])
        run_id = np.concatenate([[0], np.cumsum(~same)])
        sizes = np.bincount(run_id)
        starts = np.concatenate([[0], np.cumsum(sizes)[:-1]])
        sel_r = sizes >= 2
        sz_a, st_a = sizes[sel_r].astype(np.int64), starts[sel_r]
        pi_parts, pj_parts = [], []
        order2 = np.argsort(sz_a, kind="stable")
        sz_s, st_s = sz_a[order2], st_a[order2]
        cuts = np.concatenate([[0], np.flatnonzero(np.diff(sz_s)) + 1,
                               [len(sz_s)]])
        W = 8
        for a, b in zip(cuts[:-1], cuts[1:]):
            sz = int(sz_s[a])
            sts = st_s[a:b]
            if sz <= _MAX_PAIRWISE:
                ii, jj = np.triu_indices(sz, k=1)
            else:   # degenerate bucket: windowed neighbours (logged)
                import logging
                logging.getLogger(__name__).warning(
                    "minhash bucket run of %d exceeds pairwise cap %d: "
                    "windowed verify", sz, _MAX_PAIRWISE)
                ii = np.concatenate([np.arange(sz - w)
                                     for w in range(1, min(W, sz - 1) + 1)])
                jj = np.concatenate([np.arange(w, sz)
                                     for w in range(1, min(W, sz - 1) + 1)])
            pi_parts.append((sts[:, None] + ii[None, :]).ravel())
            pj_parts.append((sts[:, None] + jj[None, :]).ravel())
        if pi_parts:
            pi = np.concatenate(pi_parts)
            pj = np.concatenate(pj_parts)
            # dedupe doc pairs across bands BEFORE the signature compare
            a_id, b_id = ids[pi], ids[pj]
            lo = np.minimum(a_id, b_id)
            hi = np.maximum(a_id, b_id)
            po = np.lexsort((hi, lo))
            keep = np.concatenate([[True], (lo[po][1:] != lo[po][:-1])
                                   | (hi[po][1:] != hi[po][:-1])])
            pi, pj = pi[po[keep]], pj[po[keep]]
            # fetch signatures for the PAIR MEMBERS only (broadcast the
            # sorted needed-id array; the sig table never leaves the
            # cluster whole)
            need = np.unique(ids[np.concatenate([pi, pj])])
            need_ref = ray.put(need)

            def filter_ids(t: pa.Table, ref=None) -> pa.Table:
                w = ray.get(ref)
                idv = t["id"].to_numpy(zero_copy_only=False)
                return t.filter(pa.array(_sorted_member_mask(w, idv)))

            sig_tab = sigs_ds.map_batches(
                filter_ids, fn_kwargs={"ref": need_ref},
                batch_format="pyarrow").to_pandas()
            sid = sig_tab["id"].to_numpy().astype(np.int64)
            so = np.argsort(sid)
            sid_sorted = sid[so]
            S = np.stack(sig_tab["sig"].to_numpy())[so]
            row_sig = np.clip(np.searchsorted(sid_sorted, ids), 0,
                              len(sid_sorted) - 1)
            est = (S[row_sig[pi]] == S[row_sig[pj]]).mean(axis=1)
            hit = est >= jaccard_threshold
            edges = pd.DataFrame({
                "src": np.minimum(ids[pi[hit]], ids[pj[hit]]),
                "dst": np.maximum(ids[pi[hit]], ids[pj[hit]])})
            rep = components_min_rep(edges) if len(edges) else {}
    rows = sorted((d, r) for d, r in rep.items())
    return pd.DataFrame({"id": np.asarray([r[0] for r in rows], np.int64),
                         "rep_id": np.asarray([r[1] for r in rows],
                                              np.int64)})


def _broadcast_drop_filter(ds: ray.data.Dataset, id_col: str,
                           drop_ids: np.ndarray) -> ray.data.Dataset:
    """STREAMING keep filter: the (sorted) drop-id set is
    ``ray.put`` ONCE — O(duplicate docs) — and binary-searched per
    batch; the input dataset streams through unmaterialized, so the
    keep path costs one pass regardless of corpus size."""
    drop = np.sort(np.asarray(drop_ids, np.int64))
    drop_ref = ray.put(drop)

    def keep_batch(t: pa.Table, ref=None) -> pa.Table:
        d = ray.get(ref)
        if not len(d) or not t.num_rows:
            return t
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.filter(pa.array(~_sorted_member_mask(d, ids)))

    return ds.map_batches(keep_batch, fn_kwargs={"ref": drop_ref},
                          batch_format="pyarrow")


def minhash_dedup_keep(ds: ray.data.Dataset, id_col: str, text_col: str,
                       num_perm: int = 64, num_bands: int = 16,
                       jaccard_threshold: float = 0.8) -> ray.data.Dataset:
    """End-to-end fuzzy dedup: MinHash+LSH clusters -> broadcast drop
    set -> streaming keep filter.  Every non-representative cluster
    member is dropped (cluster rep = min id survives — the A3/A4
    arrival-order rule on a generic table); unique docs pass through."""
    clusters = minhash_lsh_dedup(ds, id_col, text_col, num_perm=num_perm,
                                 num_bands=num_bands,
                                 jaccard_threshold=jaccard_threshold)
    return _broadcast_drop_filter(ds, id_col,
                                  clusters["id"].to_numpy())


def ngram_dedup_keep(ds: ray.data.Dataset, id_col: str, text_col: str,
                     n: int = 3, threshold: float = 0.8) -> ray.data.Dataset:
    """End-to-end EXACT n-gram-Jaccard dedup: prefix-filtered exact
    pairs -> min-label connected components -> broadcast drop set ->
    streaming keep filter (rep = min id survives)."""
    pairs = ngram_jaccard_pairs(ds, id_col, text_col, n=n,
                                threshold=threshold)
    rep = components_min_rep(pairs[["src", "dst"]]) if len(pairs) else {}
    return _broadcast_drop_filter(
        ds, id_col, np.fromiter(rep.keys(), np.int64, len(rep)))


# ------------------------------------------------- n-gram Jaccard (generic)

_GRAM_INIT = np.uint64(14695981039346656037)
_GRAM_PRIME = np.uint64(1099511628211)


def _gram_signature(tokens: list[str], token_hash: dict, n: int) -> np.ndarray:
    """Distinct sorted uint64 gram-hash signature of a token list.

    Gram identity = FNV-style fold of the tokens' fnv1a64 hashes
    (vectorized sliding combine — no per-gram string building).  Docs
    with fewer than ``n`` tokens contribute their whole token list as
    one gram (mirrors ``word_ngrams``); empty docs yield an empty set.
    """
    if not tokens:
        return np.empty(0, np.uint64)
    th = np.fromiter((token_hash[t] for t in tokens), np.uint64, len(tokens))
    with np.errstate(over="ignore"):
        if len(th) < n:
            h = _GRAM_INIT
            for v in th:
                h = (h ^ v) * _GRAM_PRIME
            return np.asarray([h], np.uint64)
        g = np.full(len(th) - n + 1, _GRAM_INIT, np.uint64)
        for j in range(n):
            g = (g ^ th[j:len(th) - n + 1 + j]) * _GRAM_PRIME
    return np.unique(g)


def _pair_intersections(flat: np.ndarray, starts: np.ndarray,
                        lens: np.ndarray, pi: np.ndarray,
                        pj: np.ndarray) -> np.ndarray:
    """Exact ``|g_i ∩ g_j|`` for every pair of signature ROWS — fully
    vectorized: gather both sides' gram hashes tagged by pair id, one
    lexsort, count adjacent equals within a pair (each hash occurs at
    most once per side, signatures are distinct-sorted)."""
    npairs = len(pi)
    if not npairs:
        return np.empty(0, np.int64)

    def gather(rows):
        ls = lens[rows]
        total = int(ls.sum())
        if not total:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        base = np.repeat(starts[rows] -
                         np.concatenate([[0], np.cumsum(ls)[:-1]]), ls)
        idx = base + np.arange(total)
        return flat[idx], np.repeat(np.arange(len(rows)), ls)

    vi, pii = gather(pi)
    vj, pjj = gather(pj)
    vals = np.concatenate([vi, vj])
    pid = np.concatenate([pii, pjj])
    o = np.lexsort((vals, pid))
    vals, pid = vals[o], pid[o]
    dup = (pid[1:] == pid[:-1]) & (vals[1:] == vals[:-1])
    return np.bincount(pid[1:][dup], minlength=npairs)


def _pair_intersections_chunked(flat: np.ndarray, starts: np.ndarray,
                                lens: np.ndarray, pi: np.ndarray,
                                pj: np.ndarray,
                                budget: int = 32_000_000) -> np.ndarray:
    """``_pair_intersections`` with bounded peak memory: pairs are
    processed in chunks whose total gathered elements (|g_i| + |g_j|
    summed) stay under ``budget`` (~0.5 GB of work arrays at the
    default), so a hot shared-prefix run of long signatures cannot
    OOM the verify task.  Exact — chunking only splits the lexsort."""
    cost = (lens[pi] + lens[pj]).astype(np.int64)
    if int(cost.sum()) <= budget:
        return _pair_intersections(flat, starts, lens, pi, pj)
    cum = np.cumsum(cost)
    out = np.empty(len(pi), np.int64)
    a = 0
    while a < len(pi):
        base = int(cum[a - 1]) if a else 0
        b = int(np.searchsorted(cum, base + budget, side="right"))
        b = min(max(b, a + 1), len(pi))
        out[a:b] = _pair_intersections(flat, starts, lens,
                                       pi[a:b], pj[a:b])
        a = b
    return out


def _ngram_verify_table(t: pa.Table, threshold: float) -> pd.DataFrame:
    """Verify one candidate table (key, id, grams): run-detect on the
    sorted keys, pair generation grouped by run size (same shape as the
    simhash verify, incl. the degenerate-run window fallback), doc-pair
    dedupe, then ONE vectorized exact-Jaccard pass."""
    import pyarrow.compute as pc
    empty = pd.DataFrame({"src": pd.Series([], dtype=np.int64),
                          "dst": pd.Series([], dtype=np.int64),
                          "jaccard": pd.Series([], dtype=float)})
    if t.num_rows == 0:
        return empty
    grams = t["grams"]
    if isinstance(grams, pa.ChunkedArray):
        grams = grams.combine_chunks()
    lens_o = pc.list_value_length(grams).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    flat = grams.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
    starts_o = np.asarray(grams.offsets)[:-1].astype(np.int64)
    key = t["key"].to_numpy(zero_copy_only=False).astype(np.int64)
    ids = t["id"].to_numpy(zero_copy_only=False).astype(np.int64)

    order = np.lexsort((ids, key))
    key_s, ids_s = key[order], ids[order]
    starts_s, lens_s = starts_o[order], lens_o[order]

    same = key_s[1:] == key_s[:-1]
    run_id = np.concatenate([[0], np.cumsum(~same)])
    sizes = np.bincount(run_id)
    rstarts = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    sel = sizes >= 2
    sz_a, st_a = sizes[sel].astype(np.int64), rstarts[sel]
    if not len(sz_a):
        return empty
    o2 = np.argsort(sz_a, kind="stable")
    sz_s, st_s = sz_a[o2], st_a[o2]
    cuts = np.concatenate([[0], np.flatnonzero(np.diff(sz_s)) + 1,
                           [len(sz_s)]])
    W = 8
    pi_parts, pj_parts = [], []
    for a, b in zip(cuts[:-1], cuts[1:]):
        if a == b:
            continue
        sz = int(sz_s[a])
        sts = st_s[a:b]
        if sz <= _MAX_PAIRWISE:
            ii, jj = np.triu_indices(sz, k=1)
        else:   # degenerate shared-prefix key: windowed neighbours
            import logging
            logging.getLogger(__name__).warning(
                "ngram verify: key run of %d docs exceeds pairwise cap "
                "%d — windowed neighbour verify (W=%d; recall may drop)",
                sz, _MAX_PAIRWISE, W)
            ii = np.concatenate([np.arange(sz - w)
                                 for w in range(1, min(W, sz - 1) + 1)])
            jj = np.concatenate([np.arange(w, sz)
                                 for w in range(1, min(W, sz - 1) + 1)])
        pi_parts.append((sts[:, None] + ii[None, :]).ravel())
        pj_parts.append((sts[:, None] + jj[None, :]).ravel())
    pi = np.concatenate(pi_parts)
    pj = np.concatenate(pj_parts)
    # dedupe doc pairs across keys BEFORE the intersection pass
    a_id, b_id = ids_s[pi], ids_s[pj]
    lo, hi = np.minimum(a_id, b_id), np.maximum(a_id, b_id)
    po = np.lexsort((hi, lo))
    keep = np.concatenate([[True], (lo[po][1:] != lo[po][:-1])
                           | (hi[po][1:] != hi[po][:-1])])
    keep &= lo[po] != hi[po]
    pi, pj = pi[po[keep]], pj[po[keep]]
    # SIZE filter (Arasu et al. VLDB'06): jaccard >= t implies
    # min(|g_i|,|g_j|) >= t * max(|g_i|,|g_j|) — kills most candidate
    # pairs BEFORE their signatures are gathered (the intersection
    # pass is O(sum of gathered lengths), so this is the hot gate)
    li_f, lj_f = lens_s[pi], lens_s[pj]
    ok = np.minimum(li_f, lj_f) >= threshold * np.maximum(li_f, lj_f)
    pi, pj = pi[ok], pj[ok]
    if not len(pi):
        return empty
    inter = _pair_intersections_chunked(flat, starts_s, lens_s, pi, pj)
    li, lj = lens_s[pi], lens_s[pj]
    union = np.maximum(li + lj - inter, 1)
    jac = inter / union
    hit = jac >= threshold
    if not hit.any():
        return empty
    a_id, b_id = ids_s[pi[hit]], ids_s[pj[hit]]
    return pd.DataFrame({"src": np.minimum(a_id, b_id),
                         "dst": np.maximum(a_id, b_id),
                         "jaccard": jac[hit]}) \
        .sort_values(["src", "dst"]).reset_index(drop=True)


@ray.remote
def _part_cand_by_key(tbl: pa.Table, num_buckets: int):
    """Split one candidate block by ``key % B`` (num_returns=B)."""
    key = tbl["key"].to_numpy(zero_copy_only=False).astype(np.int64)
    b = key % num_buckets
    out = [tbl.filter(pa.array(b == i)) for i in range(num_buckets)]
    return tuple(out) if num_buckets > 1 else out[0]


@ray.remote
def _verify_cand_bucket(threshold: float, *pieces) -> pd.DataFrame:
    """Verify ONE key bucket's candidate rows (vectorized kernel)."""
    tabs = [p for p in pieces if p.num_rows]
    if not tabs:
        return pd.DataFrame({"src": pd.Series([], dtype=np.int64),
                             "dst": pd.Series([], dtype=np.int64),
                             "jaccard": pd.Series([], dtype=float)})
    return _ngram_verify_table(pa.concat_tables(tabs).combine_chunks(),
                               threshold)


def ngram_jaccard_pairs(ds: ray.data.Dataset, id_col: str, text_col: str,
                        n: int = 3, threshold: float = 0.8,
                        driver_limit: int = 20_000,
                        num_buckets: int = 32) -> pd.DataFrame:
    """EXACT word-n-gram Jaccard >= threshold pairs via prefix filtering
    (Chaudhuri et al. ICDE'06; Bayardo et al. WWW'07 "All-Pairs";
    Xiao et al. WWW'08 PPJoin).

    Each doc's distinct grams are hashed to uint64 and sorted; under a
    global total order (ascending hash) a pair with J >= t MUST share
    one of each doc's first ``s - ceil(t*s) + 1`` gram hashes, so
    candidate generation is exact.  Only 16-byte ``(id, key)`` rows
    enter the exchange — never the text (the old rarest-k design
    shuffled 8 full copies of every document).  Candidates are verified
    with exact Jaccard over the compact sorted hash signatures
    (``np.intersect1d``); 64-bit hashes make gram collisions
    negligible (~m^2/2^65 per compared pair).

    Scale notes: the signature dataset is ~8 B/gram ≈ the text size and
    stays distributed; hot-key detection is a native count aggregate
    over the prefix rows; only docs holding a shared prefix key — a
    dup-rate-bounded set — hold candidates.  Verification is one
    vectorized kernel (run-detect + pair-size grouping + a single
    lexsort intersection pass, ``_ngram_verify_table``): it runs on the
    driver below ``driver_limit`` candidate rows, else candidates are
    bucketed by ``key % num_buckets`` and verified in parallel Ray
    tasks with a cross-bucket pair dedupe — tested identical to the
    driver path.
    """
    import math

    import pyarrow.compute as pc

    from ..functions.hashing import fnv1a64

    def sig_batch(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        texts = batch[text_col].to_pylist()
        # null text == empty text (same rule as the minhash kernel:
        # None rows would AttributeError the tokenizer mid-task)
        tok_lists = [tx.split() if tx is not None else [] for tx in texts]
        uniq_tokens = set()
        for tl in tok_lists:
            uniq_tokens.update(tl)
        token_hash = {t: fnv1a64(t) for t in uniq_tokens}
        sigs, prefixes = [], []
        for tl in tok_lists:
            g = _gram_signature(tl, token_hash, n)
            s = len(g)
            p = s - math.ceil(threshold * s) + 1 if s else 0
            sigs.append(g.view(np.int64))
            prefixes.append(g[:p].view(np.int64))
        return pa.table({
            "id": pa.array(ids, pa.int64()),
            "prefix": pa.array(prefixes, pa.list_(pa.int64())),
            "grams": pa.array(sigs, pa.list_(pa.int64())),
        })

    sigs = ds.select_columns([id_col, text_col]) \
        .map_batches(sig_batch, batch_format="pyarrow").materialize()

    def explode_prefix(t: pa.Table) -> pa.Table:
        pref = t["prefix"]
        if isinstance(pref, pa.ChunkedArray):
            pref = pref.combine_chunks()
        lens = pc.list_value_length(pref).to_numpy(zero_copy_only=False)
        return pa.table({
            "key": pref.flatten(),
            "id": pa.array(np.repeat(
                t["id"].to_numpy(zero_copy_only=False), lens), pa.int64()),
        })

    counts = sigs.map_batches(explode_prefix, batch_format="pyarrow") \
        .groupby("key").count()
    hot = counts.map_batches(
        lambda t: t.filter(pc.greater(t["count()"], 1)),
        batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame({"src": pd.Series([], dtype=np.int64),
                          "dst": pd.Series([], dtype=np.int64),
                          "jaccard": pd.Series([], dtype=float)})
    if not len(hot):
        return empty
    hot_keys = np.sort(hot["key"].to_numpy().astype(np.int64))
    hot_ref = ray.put(hot_keys)

    def filter_candidates(t: pa.Table) -> pa.Table:
        """Keep only docs holding >= 1 shared prefix key; emit one row
        per (hot key, doc) with the doc's full signature."""
        keys = ray.get(hot_ref)
        pref = t["prefix"]
        if isinstance(pref, pa.ChunkedArray):
            pref = pref.combine_chunks()
        lens = pc.list_value_length(pref).to_numpy(zero_copy_only=False)
        flat = pref.flatten().to_numpy(zero_copy_only=False)
        row = np.repeat(np.arange(len(t), dtype=np.int64), lens)
        if len(keys):
            pos = np.clip(np.searchsorted(keys, flat), 0, len(keys) - 1)
            hit = keys[pos] == flat
        else:
            hit = np.zeros(len(flat), dtype=bool)
        row, flat = row[hit], flat[hit]
        ids = t["id"].to_numpy(zero_copy_only=False)[row]
        grams = t["grams"].to_pylist()
        return pa.table({
            "key": pa.array(flat, pa.int64()),
            "id": pa.array(ids, pa.int64()),
            "grams": pa.array([grams[r] for r in row], pa.list_(pa.int64())),
        })

    # candidate volume is dup-rate bounded; verify with the vectorized
    # kernel — on the driver when small, else bucketed by ``key % B``
    # in parallel Ray tasks (rows route once; pairs dedupe per bucket
    # and once more across buckets, since a pair sharing several
    # prefix keys can land in several buckets)
    cand = sigs.map_batches(filter_candidates,
                            batch_format="pyarrow").materialize()
    n_cand = cand.count()
    if n_cand == 0:
        return empty
    if n_cand <= driver_limit:
        tabs = [t for t in ray.get(cand.to_arrow_refs()) if t.num_rows]
        return _ngram_verify_table(
            pa.concat_tables(tabs).combine_chunks(), threshold)
    nret = {"num_returns": num_buckets} if num_buckets > 1 else {}
    parts = [_part_cand_by_key.options(**nret).remote(r, num_buckets)
             for r in cand.to_arrow_refs()]
    if num_buckets == 1:
        parts = [[p] for p in parts]
    futs = [_verify_cand_bucket.remote(
        threshold, *[parts[j][i] for j in range(len(parts))])
        for i in range(num_buckets)]
    out = [p for p in ray.get(futs) if len(p)]
    if not out:
        return empty
    return pd.concat(out, ignore_index=True) \
        .drop_duplicates(["src", "dst"]) \
        .sort_values(["src", "dst"]).reset_index(drop=True)


# ------------------------------------------- embedding-cosine near-dup

def embedding_pairs_exact(ds: ray.data.Dataset, id_col: str, vec_col: str,
                          cosine_threshold: float = 0.95) -> pd.DataFrame:
    """EXACT cosine >= threshold pairs: every batch is scored against
    the full normalized matrix (broadcast once via ``ray.put``), so the
    O(n^2) compute is distributed across batches while each pair is
    emitted exactly once (batch id < partner id).

    This is the ground-truth / bounded-corpus path (the matrix must fit
    a worker: ~n x dim x 8 B); ``embedding_near_dup_pairs`` (hyperplane
    LSH buckets) is the 100-TB scale path, recall-tested against this
    in pytest."""
    full = ds.select_columns([id_col, vec_col]).to_pandas()
    ids_all = full[id_col].to_numpy().astype(np.int64)
    V_all = np.stack(full[vec_col].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(V_all, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    ref = ray.put((ids_all, V_all / norms))

    def score(batch: pa.Table) -> pa.Table:
        aid, A = ray.get(ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        V = np.stack(batch[vec_col].to_numpy(zero_copy_only=False)) \
            .astype(np.float64)
        n = np.linalg.norm(V, axis=1, keepdims=True)
        n[n == 0] = 1.0
        S = (V / n) @ A.T                       # (batch, all)
        hit = (S >= cosine_threshold) & (ids[:, None] < aid[None, :])
        bi, aj = np.nonzero(hit)
        return pa.table({
            "src": pa.array(ids[bi], pa.int64()),
            "dst": pa.array(aid[aj], pa.int64()),
            "cosine": pa.array(S[bi, aj], pa.float64()),
        })

    pdf = ds.select_columns([id_col, vec_col]).map_batches(
        score, batch_format="pyarrow").to_pandas()
    if len(pdf):
        pdf = pdf.sort_values(["src", "dst"])
    return pdf.reset_index(drop=True)

def embedding_pairs_quantized(ds: ray.data.Dataset, id_col: str,
                              vec_col: str, threshold_num: int = 2,
                              threshold_den: int = 5,
                              scale: float = 1024.0) -> pd.DataFrame:
    """Cosine >= num/den pairs decided in EXACT integer arithmetic over
    scale-quantized components — every edge verdict is bit-reproducible
    between numpy and BIGINT SQL, with NO float threshold boundary.

    Rule (identical on both sides): q_i = floor(x_i * scale + 0.5)
    elementwise (float->double cast, multiply by a power of two, +0.5,
    floor — all IEEE-exact and order-free); edge iff

        na > 0 and nb > 0 and dot >= 0
        and den^2 * dot^2 >= num^2 * na * nb

    where dot = <qa, qb>, na = <qa, qa> (all integers).  dot/norms are
    computed by float64 matmul, exact because every partial sum is an
    integer bounded by sqrt(na*nb) < 2^53 (Cauchy-Schwarz); the final
    comparison runs in int64.  Raises if the quantized norms could
    overflow the int64 comparison (den^2 * nn_max^2 must fit) — lower
    ``scale`` in that case.

    Used by the ``pagerank`` entry: a float cosine-vs-0.4 edge rule can
    flip an edge that lands within 1 ulp of the threshold between two
    summation orders, and one flipped edge cascades into every node's
    rank; this kernel removes the boundary entirely."""
    full = ds.select_columns([id_col, vec_col]).to_pandas()
    ids_all = full[id_col].to_numpy().astype(np.int64)
    if not len(ids_all):
        return pd.DataFrame({"src": pd.Series([], dtype=np.int64),
                             "dst": pd.Series([], dtype=np.int64)})
    V = np.stack(full[vec_col].to_numpy()).astype(np.float64)
    Q = np.floor(V * scale + 0.5)         # integer-valued float64
    nn = (Q * Q).sum(axis=1)
    den2, num2 = threshold_den ** 2, threshold_num ** 2
    nn_max = float(nn.max())
    if den2 * nn_max * nn_max >= 2.0 ** 62:
        raise ValueError(
            f"embedding_pairs_quantized: quantized norm {nn_max:.3g} "
            f"too large for exact int64 comparison — lower scale")
    ref = ray.put((ids_all, Q, nn.astype(np.int64)))

    def score(batch: pa.Table) -> pa.Table:
        aid, A, annb = ray.get(ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        Vb = np.stack(batch[vec_col].to_numpy(zero_copy_only=False)) \
            .astype(np.float64)
        Qb = np.floor(Vb * scale + 0.5)
        nb = (Qb * Qb).sum(axis=1).astype(np.int64)
        dot = (Qb @ A.T).astype(np.int64)       # exact: ints < 2^53
        hit = ((nb[:, None] > 0) & (annb[None, :] > 0) & (dot >= 0)
               & (den2 * dot * dot >= num2 * nb[:, None] * annb[None, :])
               & (ids[:, None] < aid[None, :]))
        bi, aj = np.nonzero(hit)
        return pa.table({
            "src": pa.array(ids[bi], pa.int64()),
            "dst": pa.array(aid[aj], pa.int64()),
        })

    pdf = ds.select_columns([id_col, vec_col]).map_batches(
        score, batch_format="pyarrow").to_pandas()
    if len(pdf):
        pdf = pdf.sort_values(["src", "dst"])
    return pdf.reset_index(drop=True)


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
    # hyperplanes derived once on the driver and broadcast (deterministic
    # per-batch derivation was correct but wasted work per batch)
    probe = ds.take(1)
    if not probe:
        return pd.DataFrame({"src": pd.Series([], dtype=np.int64),
                             "dst": pd.Series([], dtype=np.int64),
                             "cosine": pd.Series([], dtype=float)})
    dim = len(probe[0][vec_col])
    planes_ref = ray.put(
        np.random.RandomState(seed).randn(dim, num_planes))

    def bucketize(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        vecs = np.stack(batch[vec_col].to_numpy(zero_copy_only=False))
        planes = ray.get(planes_ref)
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


# ------------------------------------------- incremental candidate index

KEY_RUN_ROW_GROUP = 65536   # small row groups => real pruning at scale


@ray.remote
def _band_keys_write_task(consolidated, band: int, threshold: int,
                          out_path: str) -> int:
    """Write ONE band's sorted (key, doc_id, simhash) run — the
    persisted candidate index an append probes instead of re-scanning
    every fingerprint.  ``key`` MUST be the first column (row-group
    statistics are looked up positionally by the probe)."""
    import pyarrow.parquet as pq

    from ..functions.hashing import simhash_combo_key_band
    h, d = consolidated
    key = simhash_combo_key_band(h, threshold, band).view(np.int64)
    o = np.argsort(key, kind="stable")
    t = pa.table({"key": pa.array(key[o], pa.int64()),
                  "doc_id": pa.array(d[o], pa.int64()),
                  "simhash": pa.array(h[o], pa.uint64())})
    pq.write_table(t, out_path, row_group_size=KEY_RUN_ROW_GROUP)
    return len(key)


def write_band_key_runs(consolidated_ref, threshold: int,
                        keys_dir: str, run_name: str) -> int:
    """Write all bands' sorted key runs under
    ``keys_dir/band=K/<run_name>.parquet`` (one parallel task each)."""
    import os

    from ..functions.hashing import simhash_num_combo_bands
    n_bands = simhash_num_combo_bands(threshold)
    futs = []
    for k in range(n_bands):
        bd = os.path.join(keys_dir, f"band={k}")
        os.makedirs(bd, exist_ok=True)
        futs.append(_band_keys_write_task.remote(
            consolidated_ref, k, threshold,
            os.path.join(bd, f"{run_name}.parquet")))
    return int(sum(ray.get(futs)))


@ray.remote
def _band_delta_edges_task(old_run_files: list, consolidated_delta,
                           band: int, threshold: int) -> pd.DataFrame:
    """Verified near-dup edges touching the DELTA for one band:
    delta-vs-delta via the usual sorted-run detection, delta-vs-old by
    probing the stored sorted key runs with ROW-GROUP PRUNING — only
    row groups whose [min, max] key range contains a delta key are
    read, so the probe I/O is delta-proportional once runs dwarf the
    delta (row groups are KEY_RUN_ROW_GROUP rows)."""
    import pyarrow.parquet as pq

    from ..functions.hashing import simhash_combo_key_band
    hN, dN = consolidated_delta
    out = [pd.DataFrame({"src": np.empty(0, np.int64),
                         "dst": np.empty(0, np.int64)})]
    if not len(hN):
        return out[0]
    kd = simhash_combo_key_band(hN, threshold, band).view(np.int64)
    o = np.argsort(kd, kind="stable")
    kd, dN_s, hN_s = kd[o], dN[o], hN[o]

    # delta-vs-delta
    cand = pd.DataFrame({"band_id": np.full(len(dN_s), band, np.int32),
                         "band_val": kd, "doc_id": dN_s,
                         "simhash": hN_s})
    out.append(_edges_from_candidates(cand, threshold))

    # delta-vs-old: probe each stored run
    for f in old_run_files:
        pf = pq.ParquetFile(f)
        sel = []
        for g in range(pf.metadata.num_row_groups):
            st = pf.metadata.row_group(g).column(0).statistics
            if st is None:
                sel.append(g)
                continue
            lo = np.searchsorted(kd, st.min, side="left")
            hi = np.searchsorted(kd, st.max, side="right")
            if hi > lo:
                sel.append(g)
        if not sel:
            continue
        t = pf.read_row_groups(sel, columns=["key", "doc_id", "simhash"])
        ko = t["key"].to_numpy()
        do = t["doc_id"].to_numpy()
        ho = t["simhash"].to_numpy().astype(np.uint64)
        lo_i = np.searchsorted(ko, kd, side="left")
        hi_i = np.searchsorted(ko, kd, side="right")
        counts = hi_i - lo_i
        m = counts > 0
        if not m.any():
            continue
        rows = np.repeat(np.flatnonzero(m), counts[m])
        offs = np.concatenate(
            [np.arange(lo_i[i], hi_i[i]) for i in np.flatnonzero(m)])
        ok = hamming64(hN_s[rows], ho[offs]) <= threshold
        if not ok.any():
            continue
        a = dN_s[rows[ok]]
        b = do[offs[ok]]
        out.append(pd.DataFrame({"src": np.minimum(a, b),
                                 "dst": np.maximum(a, b)}))
    res = pd.concat(out, ignore_index=True)
    return res.drop_duplicates().reset_index(drop=True)


def simhash_delta_edges(keys_dir: str, delta_h: np.ndarray,
                        delta_d: np.ndarray,
                        threshold: int = 3,
                        cons_ref=None) -> pd.DataFrame:
    """All verified near-dup edges with at least one DELTA endpoint,
    using the persisted band key runs under ``keys_dir`` (see
    `write_band_key_runs`).  One task per band, delta fingerprints
    broadcast once."""
    import glob as _glob
    import os

    from ..functions.hashing import simhash_num_combo_bands
    n_bands = simhash_num_combo_bands(threshold)
    # reuse the caller's object-store copy of the delta when provided
    cons = cons_ref if cons_ref is not None else ray.put(
        (delta_h.astype(np.uint64), delta_d.astype(np.int64)))
    futs = []
    for k in range(n_bands):
        files = sorted(_glob.glob(
            os.path.join(keys_dir, f"band={k}", "*.parquet")))
        futs.append(_band_delta_edges_task.remote(files, cons, k,
                                                  threshold))
    parts = [p for p in ray.get(futs) if len(p)]
    if not parts:
        return pd.DataFrame({"src": pd.Series([], dtype=np.int64),
                             "dst": pd.Series([], dtype=np.int64)})
    return pd.concat(parts).drop_duplicates().reset_index(drop=True)
