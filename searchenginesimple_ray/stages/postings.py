"""Inverted-index (postings) construction — the index-build shuffle.

Reference: ``invert_index_lib_[term][doc] = weight`` built in one
process (`include/Page/Page.hpp:295-321`), TF·IDF weighted
(``IDF = log2(N / (DF+1))``, `Page.hpp:313-321`) and L2-normalized per
doc (`Page.hpp:323-333`).  The Ray-Data-native layout (north star):

- shuffle key: ``(term, doc_shard, salt)`` where
  ``doc_shard = doc_id % D`` — the secondary doc partition makes
  conjunctive intersection (A8) shard-local at query time, and is
  simultaneously the hot-term skew split: a term with global df = N
  lands as D groups of N/D, not one straggler group (SURVEY §4 skew);
  ``salt`` further splits terms whose *per-shard* postings exceed
  ``hot_term_df_threshold`` (second-pass merge happens at scorer load:
  sorted runs are merged per (term, doc_shard));
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


def term_document_frequencies(doc_terms: ray.data.Dataset) -> pd.DataFrame:
    """Global DF per term (G2) via partial per-batch counts."""

    def partial(batch: pa.Table) -> pa.Table:
        terms = batch["term"].to_numpy(zero_copy_only=False)
        uniq, counts = np.unique(terms, return_counts=True)
        return pa.table({"term": pa.array(uniq, pa.string()),
                         "partial_df": pa.array(counts.astype(np.int64))})

    agg = doc_terms.select_columns(["term"]).map_batches(
        partial, batch_format="pyarrow").groupby("term").sum("partial_df")
    pdf = agg.to_pandas()
    col = [c for c in pdf.columns if c != "term"][0]
    return pdf.rename(columns={col: "df"}).sort_values("term").reset_index(drop=True)


class StampShards:
    """Add term_shard / doc_shard / salt / df columns.

    Hot-term map and global-DF map are fetched from the object store
    once per actor (broadcast via ``ray.put``), never per batch/task.
    """

    def __init__(self, hot_ref, df_ref, num_term_shards: int,
                 num_doc_shards: int):
        self.hot = ray.get(hot_ref) if not isinstance(hot_ref, dict) else hot_ref
        self.df = ray.get(df_ref) if not isinstance(df_ref, dict) else df_ref
        self.S = num_term_shards
        self.D = num_doc_shards

    def __call__(self, batch: pa.Table) -> pa.Table:
        terms = batch["term"].to_numpy(zero_copy_only=False)
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        tshard = fnv1a32_array(terms, self.S)
        dshard = (doc_ids % self.D).astype(np.int32)
        salt = np.zeros(len(terms), dtype=np.int32)
        uniq, inv = np.unique(terms, return_inverse=True)
        dfs = np.array([self.df.get(u, 1) for u in uniq], dtype=np.int64)[inv]
        if self.hot:
            nsalts = np.array([self.hot.get(u, 1) for u in uniq], dtype=np.int64)
            hot_rows = nsalts[inv] > 1
            if hot_rows.any():
                salt[hot_rows] = ((doc_ids[hot_rows] // self.D)
                                  % nsalts[inv][hot_rows]).astype(np.int32)
        return (batch
                .append_column("term_shard", pa.array(tshard, pa.int32()))
                .append_column("doc_shard", pa.array(dshard, pa.int32()))
                .append_column("salt", pa.array(salt, pa.int32()))
                .append_column("df", pa.array(dfs, pa.int64())))


def build_postings(doc_terms: ray.data.Dataset,
                   df_map: dict[str, int],
                   num_term_shards: int = 10,
                   num_doc_shards: int = 8,
                   hot_term_df_threshold: int = 250_000,
                   posting_block_size: int = 128) -> ray.data.Dataset:
    """doc_terms(doc_id, term, tf, doc_len) -> postings dataset."""
    hot = {t: int(np.ceil(df / num_doc_shards / hot_term_df_threshold))
           for t, df in df_map.items()
           if df / num_doc_shards > hot_term_df_threshold}
    hot_ref = ray.put(hot)
    df_ref = ray.put(df_map)

    _stamp_cache: dict = {}

    def stamp(batch: pa.Table, refs=None) -> pa.Table:
        # per-worker memo of the broadcast hot/df maps (task-based: no
        # per-job actor spawn; workers persist across jobs)
        key = tuple(r.hex() for r in refs)
        st = _stamp_cache.get(key)
        if st is None:
            st = StampShards(refs[0], refs[1], num_term_shards,
                             num_doc_shards)
            _stamp_cache.clear()
            _stamp_cache[key] = st
        return st(batch)

    stamped = doc_terms.map_batches(
        stamp, fn_kwargs={"refs": (hot_ref, df_ref)},
        batch_format="pyarrow")

    def build_group(g: pd.DataFrame) -> pd.DataFrame:
        # ONE coarse (term_shard, doc_shard) group carries ALL its terms:
        # a per-(term,salt) map_groups would make one pandas call per
        # vocabulary entry — the Ray-side shuffle stays identical but the
        # per-group work is a single lexsort + run-detection here
        terms = g["term"].to_numpy()
        doc_ids = g["doc_id"].to_numpy().astype(np.int64)
        tfs = g["tf"].to_numpy().astype(np.uint64)
        salts = g["salt"].to_numpy()
        dfs_col = g["df"].to_numpy()
        order = np.lexsort((doc_ids, salts, terms))
        t_s = terms[order]
        s_s = salts[order]
        d_s = doc_ids[order].astype(np.uint64)
        tf_s = tfs[order]
        df_s = dfs_col[order]
        change = np.flatnonzero(
            (t_s[1:] != t_s[:-1]) | (s_s[1:] != s_s[:-1])) + 1
        starts = np.concatenate([[0], change])
        ends = np.concatenate([change, [len(t_s)]])
        out_term, out_salt, out_df, out_n = [], [], [], []
        out_dvb, out_tvb, out_bl, out_bm = [], [], [], []
        for a, b in zip(starts, ends):
            dvb, tvb, block_last, block_max = encode_postings(
                d_s[a:b], tf_s[a:b], posting_block_size)
            out_term.append(t_s[a])
            out_salt.append(s_s[a])
            out_df.append(df_s[a])
            out_n.append(b - a)
            out_dvb.append(dvb)
            out_tvb.append(tvb)
            # plain lists (not ndarray cells): keeps the Arrow/pandas
            # schema metadata round-trippable
            out_bl.append(np.asarray(block_last).tolist())
            out_bm.append(np.asarray(block_max).tolist())
        n = len(out_term)
        return pd.DataFrame({
            "term": out_term,
            "term_shard": np.full(n, g["term_shard"].iloc[0], dtype=np.int32),
            "doc_shard": np.full(n, g["doc_shard"].iloc[0], dtype=np.int32),
            "salt": np.asarray(out_salt, dtype=np.int32),
            "df": np.asarray(out_df, dtype=np.int64),
            "n_local": np.asarray(out_n, dtype=np.int32),
            "doc_ids_vb": out_dvb,
            "tfs_vb": out_tvb,
            "block_last_doc": out_bl,
            "block_max_tf": out_bm,
        })

    return stamped.groupby(["term_shard", "doc_shard"]).map_groups(
        build_group, batch_format="pandas")


def doc_stats(doc_terms: ray.data.Dataset, df_map: dict[str, int],
              n_docs: int, num_doc_shards: int = 8) -> ray.data.Dataset:
    """doc_stats(doc_id, doc_shard, doc_len, ref_norm).

    ``ref_norm`` is the reference's per-doc L2 norm over TF·IDF weights
    (`Page.hpp:323-333`): sqrt(sum_t (log2(N/(df_t+1)) * tf_td)^2).
    Computed with per-batch partial sums (broadcast df map) + a small
    groupby(doc_id) combine — no full-text shuffle.
    """
    assert n_docs > 0, "doc_stats called with n_docs=0"
    df_ref = ray.put(df_map)
    n_docs_f = float(n_docs)

    class PartialNorm:
        def __init__(self):
            self.df = ray.get(df_ref)
            self.idf_cache: dict[str, float] = {}

        def __call__(self, batch: pa.Table) -> pa.Table:
            terms = batch["term"].to_numpy(zero_copy_only=False)
            tfs = batch["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
            doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            doc_lens = batch["doc_len"].to_numpy(zero_copy_only=False)
            uniq, inv = np.unique(terms, return_inverse=True)
            idf = np.empty(len(uniq))
            for i, t in enumerate(uniq):
                v = self.idf_cache.get(t)
                if v is None:
                    v = np.log2(n_docs_f / (self.df.get(t, 0) + 1.0))
                    self.idf_cache[t] = v
                idf[i] = v
            w2 = (idf[inv] * tfs) ** 2
            udoc, dinv = np.unique(doc_ids, return_inverse=True)
            s = np.zeros(len(udoc))
            np.add.at(s, dinv, w2)
            dl = np.zeros(len(udoc), dtype=np.int64)
            np.maximum.at(dl, dinv, doc_lens.astype(np.int64))
            return pa.table({"doc_id": pa.array(udoc, pa.int64()),
                             "w2": pa.array(s, pa.float64()),
                             "doc_len": pa.array(dl, pa.int64())})

    partial = doc_terms.map_batches(PartialNorm(), batch_format="pyarrow")
    from ray.data.aggregate import Max, Sum
    agg = partial.groupby("doc_id").aggregate(
        Sum("w2", alias_name="w2_sum"), Max("doc_len", alias_name="doc_len"))

    def finalize(batch: pa.Table) -> pa.Table:
        doc_id = batch["doc_id"].to_numpy(zero_copy_only=False)
        w2 = batch["w2_sum"].to_numpy(zero_copy_only=False)
        dl = batch["doc_len"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(doc_id, pa.int64()),
            "doc_shard": pa.array((doc_id % num_doc_shards).astype(np.int32)),
            "doc_len": pa.array(dl.astype(np.int32), pa.int32()),
            "ref_norm": pa.array(np.sqrt(w2), pa.float64()),
        })

    return agg.map_batches(finalize, batch_format="pyarrow")
