"""Inverted-index (postings) construction — the index-build shuffle.

Reference: ``invert_index_lib_[term][doc] = weight`` built in one
process (`include/Page/Page.hpp:295-321`), TF·IDF weighted
(``IDF = log2(N / (DF+1))``, `Page.hpp:313-321`) and L2-normalized per
doc (`Page.hpp:323-333`).  The Ray-Data-native layout (north star):

- shuffle rows are INT-ONLY: terms are encoded to int32 vocabulary ids
  (rank in the df table) before the exchange, and the term string /
  df are gathered back from broadcast arrays on the group side —
  no strings and no per-row df cross the wire;
- shuffle key: the COARSE pair ``(term_shard, doc_shard)`` where
  ``doc_shard = doc_id % D`` — one pandas group per pair, with
  per-term runs detected inside the group kernel (tiny-group
  map_groups is catastrophically slow).  The doc partition makes
  conjunctive intersection (A8) shard-local at query time and spreads
  a hot term's rows over D groups; ``salt`` does NOT partition the
  exchange — it splits the ENCODED ROWS of terms whose *per-shard*
  postings exceed ``hot_term_df_threshold``, bounding row payloads
  (second-pass merge happens at scorer load: sorted runs are merged
  per (term, doc_shard)).  Skew analysis therefore applies at the
  (term_shard, doc_shard) granularity;
- term sharding parity: ``term_shard = fnv1a(term) % S`` (the
  reference's zone hash, `include/helper/ihsah.hpp:8-27`) is stamped on
  every posting row for layout/debug parity with the reference's dict
  zones;
- per group: sort doc_ids, delta + varbyte encode, block-max metadata
  per ``posting_block_size`` docs (Ding & Suel 2011);
- global term DF (G2) is aggregated first (per-batch partial counts →
  small ``groupby(term).sum``) and broadcast (``ray.put``) into the
  posting rows.  Scale path: at extreme vocab sizes the df map joins by
  ``term_shard`` partition instead of broadcasting.

Output schema::

    postings(term: string, term_shard: int32, doc_shard: int32,
             salt: int32, df: int64, n_local: int32,
             doc_ids_vb: binary, tfs_vb: binary,
             block_last_doc: list<uint64>, block_max_tf: list<uint64>)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..functions.hashing import fnv1a32_array
from ..functions.varbyte import encode_postings


def term_df_from_prepped(prepped: ray.data.Dataset,
                         combine_rows: int = 1_000_000) -> pd.DataFrame:
    """Global DF straight from the per-doc term LISTS (no exploded
    intermediate): a doc's list holds each term once, so flattening the
    list column and Arrow-native ``value_counts`` per batch IS the
    partial df — C++ hash counting instead of ``np.unique`` over a
    Python-object string array, and only the ``terms`` column is read.

    Aggregation is a TREE with NO shuffle barrier: per-block partials
    -> a streaming ``map_batches`` combine whose ``batch_size``
    coalesces ~``combine_rows/vocab`` adjacent partial tables per call
    -> one driver merge over at most ``n_blocks/(combine_rows/vocab) x
    vocab`` rows.  The former ``repartition(32)`` all-to-all on the
    partials measured 14 s of a 22 s stage at 4.8M docs (9.2M partial
    rows exchanged); the streaming coalesce does the same tree level
    for free inside the executor.  A full Ray ``groupby(term)``
    hash-shuffle measured 10.6 s where this takes ~0.2 s at 600k docs
    / 5k vocab; the driver merge is vocab-bounded, the same bound the
    df broadcast already assumes (per-term-shard df service is the
    documented beyond-vocab-bound scale path)."""

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        col = batch["terms"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        vc = pc.value_counts(col.flatten())
        return pa.table({"term": vc.field("values"),
                         "partial_df": pc.cast(vc.field("counts"), "int64")})

    def combine(batch: pa.Table) -> pa.Table:
        agg = batch.group_by("term").aggregate([("partial_df", "sum")])
        return agg.rename_columns(
            ["partial_df" if c == "partial_df_sum" else c
             for c in agg.column_names])

    parts = prepped.select_columns(["terms"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .map_batches(combine, batch_format="pyarrow",
                     batch_size=combine_rows)
    # final merge stays arrow-native (C++ hash agg + sort): the former
    # pandas groupby over combine_partitions x vocab rows cost ~1.5 s
    # of driver serial time per 2.4M-turn build
    tabs = [t for t in ray.get(parts.to_arrow_refs()) if t.num_rows]
    if not tabs:
        return pd.DataFrame({"term": pd.Series([], dtype=object),
                             "df": pd.Series([], dtype=np.int64)})
    agg = pa.concat_tables(tabs, promote_options="default") \
        .group_by("term").aggregate([("partial_df", "sum")]) \
        .sort_by("term")
    return pd.DataFrame({
        "term": agg["term"].to_numpy(zero_copy_only=False),
        "df": agg["partial_df_sum"].to_numpy(zero_copy_only=False)
        .astype(np.int64)})


def _df_arrays(df_map) -> tuple[np.ndarray, np.ndarray]:
    """Normalize a df table to ``(sorted term array, df array)`` —
    accepts the array pair directly (preferred: no vocab-size Python
    loop, ~10x cheaper through the object store) or a legacy dict."""
    if isinstance(df_map, tuple):
        return (np.asarray(df_map[0], dtype=object),
                np.asarray(df_map[1]).astype(np.int64, copy=False))
    vocab = np.array(sorted(df_map), dtype=object)
    return vocab, np.fromiter((df_map[t] for t in vocab), np.int64,
                              len(vocab))


def _vocab_lookup(vocab: np.ndarray, uniq_terms: np.ndarray,
                  missing_ok: bool = False
                  ) -> tuple[np.ndarray, np.ndarray]:
    """(positions, found-mask) of ``uniq_terms`` in the SORTED vocab
    array — one vectorized searchsorted instead of per-term dict hits.
    With ``missing_ok=False`` a miss raises (postings stamp: every
    term was counted into the df table by construction)."""
    u = np.asarray(uniq_terms, dtype=object)
    if not len(u):
        return np.empty(0, np.int64), np.empty(0, bool)
    if not len(vocab):
        if missing_ok:
            return np.zeros(len(u), np.int64), np.zeros(len(u), bool)
        raise KeyError("vocabulary is empty but terms were stamped")
    pos = np.clip(np.searchsorted(vocab, u), 0, len(vocab) - 1)
    found = vocab[pos] == u
    if not missing_ok and not found.all():
        miss = u[~found]
        raise KeyError(f"{len(miss)} term(s) missing from vocabulary "
                       f"(e.g. {miss[:3].tolist()})")
    return pos.astype(np.int64), found


def doc_stats_from_prepped(prepped: ray.data.Dataset, df_map,
                           n_docs: int,
                           num_doc_shards: int = 8) -> ray.data.Dataset:
    """doc_stats WITHOUT a shuffle: every doc's terms live in ONE list
    row, so the G4 norm is a per-row reduction (``np.add.reduceat`` at
    the list offsets) — the explode + ``groupby(doc_id)`` re-aggregation
    the exploded layout forced was pure exchange overhead.
    ``df_map`` may be a dict or a ``(sorted terms, dfs)`` array pair.
    """
    assert n_docs > 0, "doc_stats called with n_docs=0"
    df_ref = ray.put(_df_arrays(df_map))
    n_docs_f = float(n_docs)
    _cache: dict = {}

    def stats_batch(batch: pa.Table, ref=None) -> pa.Table:
        key = ref.hex()
        state = _cache.get(key)
        if state is None:
            state = ray.get(ref)
            _cache.clear()
            _cache[key] = state
        vocab_w, dfv_w = state
        terms = batch["terms"]
        if isinstance(terms, pa.ChunkedArray):
            terms = terms.combine_chunks()
        tfs = batch["tfs"]
        if isinstance(tfs, pa.ChunkedArray):
            tfs = tfs.combine_chunks()
        import pyarrow.compute as pc
        flat = terms.flatten()
        denc = flat.dictionary_encode()
        uniq = denc.dictionary.to_numpy(zero_copy_only=False)
        pos, found = _vocab_lookup(vocab_w, uniq, missing_ok=True)
        df_u = np.where(found, dfv_w[pos] if len(dfv_w) else 0, 0)
        idf_u = np.log2(n_docs_f / (df_u + 1.0))
        idx = denc.indices.to_numpy(zero_copy_only=False)
        tf_flat = tfs.flatten().to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        w2 = (idf_u[idx] * tf_flat) ** 2
        lens = pc.list_value_length(terms).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        offsets = np.concatenate([[0], np.cumsum(lens)[:-1]])
        nz = lens > 0
        sums = np.zeros(len(lens))
        if nz.any():
            sums[nz] = np.add.reduceat(w2, offsets[nz]) if w2.size else 0.0
        doc_id = batch["doc_id"].to_numpy(zero_copy_only=False)
        keep = nz   # docs with zero kept terms have no stats row
        return pa.table({
            "doc_id": pa.array(doc_id[keep], pa.int64()),
            "doc_shard": pa.array(
                (doc_id[keep] % num_doc_shards).astype(np.int32)),
            "doc_len": pa.array(
                batch["doc_len"].to_numpy(zero_copy_only=False)[keep]
                .astype(np.int32), pa.int32()),
            "ref_norm": pa.array(np.sqrt(sums[keep]), pa.float64()),
        })

    return prepped.select_columns(["doc_id", "doc_len", "terms", "tfs"]) \
        .map_batches(stats_batch, fn_kwargs={"ref": df_ref},
                     batch_format="pyarrow")


class StampShards:
    """term string -> int32 ``tid`` + term_shard / doc_shard / salt.

    The vocabulary tables (term -> id, per-id term_shard and salt
    counts) are fetched from the object store once per worker
    (broadcast via ``ray.put``), never per batch.  Only INT columns
    enter the shuffle — ``(tid, doc_id, tf, shards, salt)`` is 24 B/row
    vs ~44 B with the term string and per-row df, and the exchange
    hash/sort runs on int32 keys instead of strings.
    """

    def __init__(self, vocab_ref, num_doc_shards: int):
        v = ray.get(vocab_ref) if not isinstance(vocab_ref, tuple) else vocab_ref
        self.vocab, self.tshard_arr, self.nsalt_arr = v
        self.D = num_doc_shards

    def __call__(self, batch: pa.Table) -> pa.Table:
        terms = batch["term"].to_numpy(zero_copy_only=False)
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(terms, return_inverse=True)
        uids, _ = _vocab_lookup(self.vocab, uniq)
        tid = uids[inv] if len(uniq) else np.empty(0, np.int64)
        dshard = (doc_ids % self.D).astype(np.int32)
        nsalts = self.nsalt_arr[tid]
        salt = np.where(nsalts > 1,
                        (doc_ids // self.D) % np.maximum(nsalts, 1),
                        0).astype(np.int32)
        return pa.table({
            "tid": pa.array(tid.astype(np.int32), pa.int32()),
            "doc_id": batch["doc_id"],
            "tf": batch["tf"],
            "term_shard": pa.array(self.tshard_arr[tid], pa.int32()),
            "doc_shard": pa.array(dshard, pa.int32()),
            "salt": pa.array(salt, pa.int32()),
        })


def build_postings(doc_terms: ray.data.Dataset,
                   df_map: dict[str, int],
                   num_term_shards: int = 10,
                   num_doc_shards: int = 8,
                   hot_term_df_threshold: int = 250_000,
                   posting_block_size: int = 128,
                   prepped: bool = False) -> ray.data.Dataset:
    """doc_terms(doc_id, term, tf, doc_len) -> postings dataset.
    With ``prepped=True`` the input is the PREPPED list layout
    (doc_id, terms: list<str>, tfs: list<int32>) and the explode fuses
    into the stamp stage.

    Vocabulary encoding: terms are int32-id-encoded BEFORE the shuffle
    (ids = lexicographic rank in the already-computed df table, the
    same order ``build_dict`` uses); per-id df / term string / salt
    count live in broadcast numpy arrays gathered back on the group
    side, so the exchange carries no strings and no per-row df.
    """
    vocab, df_arr = _df_arrays(df_map)
    nsalt_arr = np.maximum(
        np.ceil(df_arr / num_doc_shards / hot_term_df_threshold)
        .astype(np.int64), 1)
    tshard_arr = fnv1a32_array(vocab, num_term_shards) if len(vocab) \
        else np.empty(0, np.int32)
    stamp_ref = ray.put((vocab, tshard_arr, nsalt_arr))
    group_ref = ray.put((vocab, df_arr))

    _stamp_cache: dict = {}

    def stamp(batch: pa.Table, ref=None) -> pa.Table:
        # per-worker memo of the broadcast vocab tables (task-based: no
        # per-job actor spawn; workers persist across jobs)
        key = ref.hex()
        st = _stamp_cache.get(key)
        if st is None:
            st = StampShards(ref, num_doc_shards)
            _stamp_cache.clear()
            _stamp_cache[key] = st
        return st(batch)

    if prepped:
        # PREPPED list layout: fuse explode + stamp in one batch fn —
        # the flat term column is dictionary-encoded by Arrow (C++) and
        # only the per-batch UNIQUE terms touch the Python id_map
        def stamp_lists(batch: pa.Table, ref=None) -> pa.Table:
            import pyarrow.compute as pc
            key = ref.hex()
            st = _stamp_cache.get(key)
            if st is None:
                st = ray.get(ref)
                _stamp_cache.clear()
                _stamp_cache[key] = st
            vocab_w, tshard_w, nsalt_w = st
            terms = batch["terms"]
            if isinstance(terms, pa.ChunkedArray):
                terms = terms.combine_chunks()
            tfs = batch["tfs"]
            if isinstance(tfs, pa.ChunkedArray):
                tfs = tfs.combine_chunks()
            lens = pc.list_value_length(terms) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            doc_ids = np.repeat(
                batch["doc_id"].to_numpy(zero_copy_only=False), lens)
            denc = terms.flatten().dictionary_encode()
            uniq = denc.dictionary.to_numpy(zero_copy_only=False)
            uids, _ = _vocab_lookup(vocab_w, uniq)
            tid = uids[denc.indices.to_numpy(zero_copy_only=False)] \
                if len(uniq) else np.empty(0, np.int64)
            nsalts = nsalt_w[tid]
            salt = np.where(nsalts > 1,
                            (doc_ids // num_doc_shards)
                            % np.maximum(nsalts, 1), 0).astype(np.int32)
            return pa.table({
                "tid": pa.array(tid.astype(np.int32), pa.int32()),
                "doc_id": pa.array(doc_ids, pa.int64()),
                "tf": tfs.flatten(),
                "term_shard": pa.array(tshard_w[tid], pa.int32()),
                "doc_shard": pa.array(
                    (doc_ids % num_doc_shards).astype(np.int32)),
                "salt": pa.array(salt, pa.int32()),
            })

        stamped = doc_terms.select_columns(["doc_id", "terms", "tfs"]) \
            .map_batches(stamp_lists, fn_kwargs={"ref": stamp_ref},
                         batch_format="pyarrow")
    else:
        stamped = doc_terms.select_columns(["doc_id", "term", "tf"]) \
            .map_batches(stamp, fn_kwargs={"ref": stamp_ref},
                         batch_format="pyarrow")

    _group_cache: dict = {}

    def build_group(g: pd.DataFrame, ref=None) -> pd.DataFrame:
        # ONE coarse (term_shard, doc_shard) group carries ALL its terms:
        # a per-(term,salt) map_groups would make one pandas call per
        # vocabulary entry — the Ray-side shuffle stays identical but the
        # per-group work is a single int lexsort + run-detection here
        if not len(g):
            # typed empty frame: a schema-less empty bundle would both
            # crash iloc[0] below and trip the streaming executor's
            # "RefBundle with a different schema" warning, masking
            # real schema drift
            return pd.DataFrame({
                "term": pd.Series([], dtype=object),
                "term_shard": pd.Series([], dtype=np.int32),
                "doc_shard": pd.Series([], dtype=np.int32),
                "salt": pd.Series([], dtype=np.int32),
                "df": pd.Series([], dtype=np.int64),
                "n_local": pd.Series([], dtype=np.int32),
                "doc_ids_vb": pd.Series([], dtype=object),
                "tfs_vb": pd.Series([], dtype=object),
                "block_last_doc": pd.Series([], dtype=object),
                "block_max_tf": pd.Series([], dtype=object),
            })
        key = ref.hex()
        vt = _group_cache.get(key)
        if vt is None:
            vt = ray.get(ref)
            _group_cache.clear()
            _group_cache[key] = vt
        vocab_arr, dfs_arr = vt
        tids = g["tid"].to_numpy()
        doc_ids = g["doc_id"].to_numpy().astype(np.int64)
        tfs = g["tf"].to_numpy().astype(np.uint64)
        salts = g["salt"].to_numpy()
        order = np.lexsort((doc_ids, salts, tids))
        t_s = tids[order]
        s_s = salts[order]
        d_s = doc_ids[order].astype(np.uint64)
        tf_s = tfs[order]
        change = np.flatnonzero(
            (t_s[1:] != t_s[:-1]) | (s_s[1:] != s_s[:-1])) + 1
        starts = np.concatenate([[0], change])
        ends = np.concatenate([change, [len(t_s)]])
        out_tid, out_salt, out_n = [], [], []
        out_dvb, out_tvb, out_bl, out_bm = [], [], [], []
        for a, b in zip(starts, ends):
            dvb, tvb, block_last, block_max = encode_postings(
                d_s[a:b], tf_s[a:b], posting_block_size)
            out_tid.append(t_s[a])
            out_salt.append(s_s[a])
            out_n.append(b - a)
            out_dvb.append(dvb)
            out_tvb.append(tvb)
            # plain lists (not ndarray cells): keeps the Arrow/pandas
            # schema metadata round-trippable
            out_bl.append(np.asarray(block_last).tolist())
            out_bm.append(np.asarray(block_max).tolist())
        n = len(out_tid)
        tid_arr = np.asarray(out_tid, dtype=np.int64)
        return pd.DataFrame({
            "term": vocab_arr[tid_arr],
            "term_shard": np.full(n, g["term_shard"].iloc[0], dtype=np.int32),
            "doc_shard": np.full(n, g["doc_shard"].iloc[0], dtype=np.int32),
            "salt": np.asarray(out_salt, dtype=np.int32),
            "df": dfs_arr[tid_arr],
            "n_local": np.asarray(out_n, dtype=np.int32),
            "doc_ids_vb": out_dvb,
            "tfs_vb": out_tvb,
            "block_last_doc": out_bl,
            "block_max_tf": out_bm,
        })

    return stamped.groupby(["term_shard", "doc_shard"]).map_groups(
        build_group, fn_kwargs={"ref": group_ref}, batch_format="pandas")
