"""Driver-contract operations over the shared testdata tables.

``__ray_entry__.queries()`` callables are built from these functions.
Input tables live in an ``sf_dir`` (``documents``, ``embeddings``, ...).
The full-text engine's own input shape is the transcripts table of
BASELINE.json's ``input_hint``; ``derive_transcripts`` maps the shared
``documents`` table into exactly that shape deterministically
(conv_id = source, turn_idx = dense doc_id rank within source), so the
flagship pipelines run on testdata without synthesizing external data.

Everything here follows the engine design rules: Arrow batches,
vectorized kernels, broadcast small sides, no driver-side row loops on
the big path.  Indexes built for query entries are cached per
``(sf_dir, config)`` under /tmp and reused across calls via the
build pipeline's lineage manifests.
"""

from __future__ import annotations

import hashlib
import os
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data

from ..config import DEFAULT_STOP_WORDS, EngineConfig
from ..functions.textstats import BPE_TOKEN, PUNCT, WS_TOKEN
from ..pipelines.index_build import build_index
from ..pipelines.query import QueryEngine
from ..stages.tokenizer import tokenize_to_doc_terms
from ..stages.docids import AssignDocIds, conv_bases

_CACHE_ROOT = "/tmp/sesr_entry"

# fixed flagship query set over the documents vocabulary (deterministic;
# lowercase ASCII so the M4 transform is the identity and the DuckDB
# oracle stays readable)
FLAGSHIP_QUERIES = [
    "query hash join",
    "merge sort table scan",
    "the data",
    "window filter",
    "slow vector stream",
    "customer line value",
    "spark group row",
    "big batch agg",
]


def _docs_path(sf_dir: str) -> str:
    return os.path.join(sf_dir, "documents.parquet")


def _read_documents(sf_dir: str) -> ray.data.Dataset:
    return ray.data.read_parquet(_docs_path(sf_dir))


# ------------------------------------------------------- transcripts IO

def derive_transcripts(sf_dir: str) -> str:
    """documents -> transcripts-shaped parquet (cached).  Deterministic:
    conv_id = source, turn_idx = rank of doc_id within source."""
    from ..state.lineage import input_fingerprint
    key = hashlib.sha256(
        f"ts|{sf_dir}|{input_fingerprint([_docs_path(sf_dir)])}"
        .encode()).hexdigest()[:12]
    out = os.path.join(_CACHE_ROOT, f"transcripts_{key}")
    marker = os.path.join(out, "_done")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    docs = ray.data.read_parquet(_docs_path(sf_dir),
                                 columns=["doc_id", "text", "source"])

    def to_turns(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        n = len(g)
        tidx = np.arange(n, dtype=np.int32)
        return pd.DataFrame({
            "conv_id": g["source"].to_numpy(),
            "turn_idx": tidx,
            "role": np.where(tidx % 2 == 0, "user", "assistant"),
            "text": g["text"].to_numpy(),
            "tool": np.full(n, "", dtype=object),
            "ts": pd.to_datetime(1_700_000_000_000_000 + tidx.astype(np.int64)
                                 * 1_000_000, unit="us"),
        })

    ts = docs.groupby("source").map_groups(to_turns, batch_format="pandas")
    ts.write_parquet(out)
    with open(marker, "w") as f:
        f.write("ok")
    return out


def transcripts_index(sf_dir: str, near_dedup: bool = False) -> str:
    """Build (or reuse via lineage) the inverted index over the derived
    transcripts.  ``near_dedup=False`` disables A3/A4 entirely so the
    pipeline stays SQL-checkable: simhash-equality dedup has false
    positives (distinct texts, same 64-bit fingerprint — observed on the
    small-vocab documents corpus) that no SQL oracle can reproduce.  The
    dedup path itself is gated by the pytest oracles + ``exact_dedup``."""
    ts_dir = derive_transcripts(sf_dir)
    files = sorted(os.path.join(ts_dir, f) for f in os.listdir(ts_dir)
                   if f.endswith(".parquet"))
    cfg = EngineConfig(dedup_enabled=near_dedup,
                       num_input_buckets=4, num_doc_shards=4)
    key = hashlib.sha256(
        f"idx|{sf_dir}|{cfg.fingerprint()}".encode()).hexdigest()[:12]
    out = os.path.join(_CACHE_ROOT, f"index_{key}")
    build_index(files, out, cfg)   # lineage-resumable: re-runs skip
    return out


# ----------------------------------------------------- query callables

def q_term_df(sf_dir: str) -> pd.DataFrame:
    """(term, df): engine-tokenized document frequency over documents."""
    dt = tokenize_to_doc_terms(
        _read_documents(sf_dir).select_columns(["doc_id", "text"]),
        stop_words=DEFAULT_STOP_WORDS)

    def partial(batch: pa.Table) -> pa.Table:
        terms = batch["term"].to_numpy(zero_copy_only=False)
        uniq, counts = np.unique(terms, return_counts=True)
        return pa.table({"term": pa.array(uniq, pa.string()),
                         "partial": pa.array(counts.astype(np.int64))})

    pdf = dt.map_batches(partial, batch_format="pyarrow") \
        .groupby("term").sum("partial").to_pandas()
    col = [c for c in pdf.columns if c != "term"][0]
    pdf = pdf.rename(columns={col: "df"}).sort_values("term")
    pdf["df"] = pdf["df"].astype(np.int64)
    return pdf.reset_index(drop=True)


def q_term_tf(sf_dir: str) -> pd.DataFrame:
    """(term, total_tf): corpus-total term frequency (dict G5 analogue)."""
    dt = tokenize_to_doc_terms(
        _read_documents(sf_dir).select_columns(["doc_id", "text"]),
        stop_words=DEFAULT_STOP_WORDS)

    def partial(batch: pa.Table) -> pa.Table:
        terms = batch["term"].to_numpy(zero_copy_only=False)
        tfs = batch["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, inv = np.unique(terms, return_inverse=True)
        s = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(s, inv, tfs)
        return pa.table({"term": pa.array(uniq, pa.string()),
                         "partial": pa.array(s)})

    pdf = dt.map_batches(partial, batch_format="pyarrow") \
        .groupby("term").sum("partial").to_pandas()
    col = [c for c in pdf.columns if c != "term"][0]
    pdf = pdf.rename(columns={col: "total_tf"}).sort_values("term")
    pdf["total_tf"] = pdf["total_tf"].astype(np.int64)
    return pdf.reset_index(drop=True)


def q_doc_token_stats(sf_dir: str) -> pd.DataFrame:
    """(doc_id, n_ws_tokens, n_bpe_tokens, n_text_chars) — integer-exact
    token-counting stats (SQL-checkable slice of the text-stats stage)."""

    def stats(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_ws_tokens": pa.array(
                np.fromiter((len(WS_TOKEN.findall(t)) for t in texts),
                            np.int64, len(texts))),
            "n_bpe_tokens": pa.array(
                np.fromiter((len(BPE_TOKEN.findall(t)) for t in texts),
                            np.int64, len(texts))),
            "n_text_chars": pa.array(
                np.fromiter((len(t) for t in texts), np.int64, len(texts))),
        })

    return _read_documents(sf_dir).select_columns(["doc_id", "text"]) \
        .map_batches(stats, batch_format="pyarrow") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)


def q_quality_counts(sf_dir: str) -> pd.DataFrame:
    """(doc_id, n_tokens, n_punct_chars, n_stop_tokens) — integer-exact
    slice of the quality-scoring op."""
    stop = frozenset(DEFAULT_STOP_WORDS)

    def stats(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        n = len(texts)
        n_tok = np.zeros(n, np.int64)
        n_punct = np.zeros(n, np.int64)
        n_stop = np.zeros(n, np.int64)
        for i, t in enumerate(texts):
            toks = WS_TOKEN.findall(t)
            n_tok[i] = len(toks)
            n_punct[i] = len(PUNCT.findall(t))
            n_stop[i] = sum(1 for w in toks if w.lower() in stop)
        return pa.table({"doc_id": batch["doc_id"],
                         "n_tokens": pa.array(n_tok),
                         "n_punct_chars": pa.array(n_punct),
                         "n_stop_tokens": pa.array(n_stop)})

    return _read_documents(sf_dir).select_columns(["doc_id", "text"]) \
        .map_batches(stats, batch_format="pyarrow") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)


def q_exact_dedup(sf_dir: str) -> pd.DataFrame:
    """(doc_id): exact-text dedup survivors — min doc_id per identical
    text (hash-partition + per-group first)."""
    from ..stages.dedup import exact_dedup_first
    kept = exact_dedup_first(
        _read_documents(sf_dir).select_columns(["doc_id", "text"]),
        key="text", order_col="doc_id")
    pdf = kept.select_columns(["doc_id"]).to_pandas()
    return pdf.sort_values("doc_id").reset_index(drop=True)


def q_lang_hist(sf_dir: str) -> pd.DataFrame:
    """(lang_pred, n): language-ID histogram over documents."""
    from ..stages.textstages import text_stats
    st = text_stats(_read_documents(sf_dir).select_columns(["doc_id", "text"]),
                    stop_words=DEFAULT_STOP_WORDS)

    def partial(batch: pa.Table) -> pa.Table:
        langs = batch["lang_pred"].to_numpy(zero_copy_only=False)
        uniq, counts = np.unique(langs, return_counts=True)
        return pa.table({"lang_pred": pa.array(uniq, pa.string()),
                         "partial": pa.array(counts.astype(np.int64))})

    pdf = st.map_batches(partial, batch_format="pyarrow") \
        .groupby("lang_pred").sum("partial").to_pandas()
    col = [c for c in pdf.columns if c != "lang_pred"][0]
    pdf = pdf.rename(columns={col: "n"}).sort_values("lang_pred")
    pdf["n"] = pdf["n"].astype(np.int64)
    return pdf.reset_index(drop=True)


def q_heavy_hitters(sf_dir: str) -> pd.DataFrame:
    """(term, n_occurrences): exact 1/50-heavy-hitters of the document
    token stream via mergeable Misra-Gries + exact recount."""
    from ..stages.sketches import heavy_hitters
    return heavy_hitters(_read_documents(sf_dir), "text",
                         phi_num=1, phi_den=50)


def q_token_len_quantiles(sf_dir: str) -> pd.DataFrame:
    """(source, n_docs, min/p25/p50/p75/max token counts): exact
    grouped quantiles via a bounded-domain histogram combine."""
    from ..stages.sketches import token_count_quantiles
    return token_count_quantiles(_read_documents(sf_dir), "text", "source")


def q_distinct_tokens(sf_dir: str) -> pd.DataFrame:
    """(source, n_distinct_terms): exact per-group distinct token
    counts via per-block dedup before the exchange."""
    from ..stages.sketches import grouped_distinct_tokens
    return grouped_distinct_tokens(_read_documents(sf_dir), "text", "source")


def q_source_top_docs(sf_dir: str) -> pd.DataFrame:
    """(source, n_chars, doc_id): top-3 longest docs per source
    (row_number window semantics, doc_id tiebreak)."""
    from ..stages.sampling import topk_by_group
    ds = _read_documents(sf_dir).select_columns(
        ["source", "n_chars", "doc_id"])
    pdf = topk_by_group(ds, "source", "n_chars", 3,
                        key="doc_id").to_pandas()
    return pdf[["source", "n_chars", "doc_id"]] \
        .sort_values(["source", "doc_id"]).reset_index(drop=True)


def q_semdedup(sf_dir: str) -> pd.DataFrame:
    """(vec_id, cluster, keep): SemDeDup semantic dedup over the
    embeddings table.  k-means is iterative (not SQL-expressible) so
    this entry is rows-only at the driver; the within-cluster greedy
    kernel is exactness-tested in pytest against an independent
    reference on identical cluster assignments."""
    from .similarity import semdedup
    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                               columns=["vec_id", "embedding"])
    pdf = semdedup(ds, "vec_id", "embedding",
                   threshold=0.95, n_clusters=16).to_pandas()
    pdf["cluster"] = pdf["cluster"].astype(np.int64)
    return pdf.sort_values("vec_id").reset_index(drop=True)


def q_nation_revenue(sf_dir: str) -> pd.DataFrame:
    """(n_name, r_name, revenue_x10k): lineitem revenue rolled up to
    the customer's nation/region — the TPC-H-Q5 join shape exercising
    both join strategies in `stages/joins.py`:

    - lineitem is pre-aggregated per order INSIDE each batch (combiner
      before any exchange), then fact-x-fact shuffle-joined with
      orders and customer (hash-partitioned native joins);
    - nation x region (genuine dimension tables at any scale) joined
      driver-side and BROADCAST into the stream.

    Revenue is integer-exact: price/discount cents via the same
    floor(x*100 + 0.5) double arithmetic as the SQL oracle, summed in
    int64 (units: dollars x 10^-4), so the value-hash is bit-stable
    regardless of partitioning.
    """
    from ..stages.joins import broadcast_join, shuffle_join

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def rev_partial(batch: pa.Table) -> pa.Table:
        price_c = np.floor(
            batch["l_extendedprice"].to_numpy() * 100 + 0.5).astype(np.int64)
        disc_c = np.floor(
            batch["l_discount"].to_numpy() * 100 + 0.5).astype(np.int64)
        t = pa.table({"l_orderkey": batch["l_orderkey"],
                      "rev": pa.array(price_c * (100 - disc_c), pa.int64())})
        return t.group_by("l_orderkey").aggregate([("rev", "sum")]) \
            .rename_columns(["l_orderkey", "rev"])

    li_agg = li.map_batches(rev_partial, batch_format="pyarrow")
    orders = ray.data.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                                   columns=["o_orderkey", "o_custkey"])
    j1 = shuffle_join(li_agg, orders, on="l_orderkey",
                      right_on="o_orderkey", num_partitions=8)
    cust = ray.data.read_parquet(os.path.join(sf_dir, "customer.parquet"),
                                 columns=["c_custkey", "c_nationkey"])
    j2 = shuffle_join(j1, cust, on="o_custkey", right_on="c_custkey",
                      num_partitions=8)
    nat = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    reg = pq.read_table(os.path.join(sf_dir, "region.parquet"))
    dim = nat.join(reg, keys=["n_regionkey"],
                   right_keys=["r_regionkey"]) \
        .select(["n_nationkey", "n_name", "r_name"])
    j3 = broadcast_join(j2, dim, keys="c_nationkey",
                        right_keys="n_nationkey")

    def agg_partial(batch: pa.Table) -> pa.Table:
        return batch.group_by(["n_name", "r_name"]) \
            .aggregate([("rev", "sum")]) \
            .rename_columns(["n_name", "r_name", "rev"])

    pdf = j3.map_batches(agg_partial, batch_format="pyarrow").to_pandas()
    out = pdf.groupby(["n_name", "r_name"], as_index=False)["rev"].sum() \
        .rename(columns={"rev": "revenue_x10k"})
    out["revenue_x10k"] = out["revenue_x10k"].astype(np.int64)
    return out.sort_values("n_name").reset_index(drop=True)


def q_pii_scrub(sf_dir: str) -> pd.DataFrame:
    """(doc_id, n_email, n_url, n_ipv4, clean_text): PII redaction.
    The testdata corpus is synthetic and PII-free, so a deterministic
    injection stage (pure doc_id arithmetic, replicated as string
    concat in the SQL oracle) dirties each doc first — the scrub then
    demonstrably finds and redacts nonzero spans."""
    from ..stages.textstages import pii_scrub

    def inject(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        s = ids.astype(str)
        dirty = (pd.Series(batch["text"].to_pylist())
                 + " contact user" + s + "@example.com or http://ex.org/p/"
                 + s + " from 10.0." + (ids % 256).astype(str) + ".7")
        return pa.table({"doc_id": pa.array(ids),
                         "text": pa.array(dirty, pa.string())})

    ds = _read_documents(sf_dir).select_columns(["doc_id", "text"]) \
        .map_batches(inject, batch_format="pyarrow")
    return pii_scrub(ds).to_pandas()


def q_repetition_stats(sf_dir: str) -> pd.DataFrame:
    """(doc_id, n_tokens, n_distinct_tokens, top_bigram_count,
    n_dup_trigrams): Gopher-style word-repetition counters per doc."""
    from ..stages.textstages import repetition_stats
    return repetition_stats(_read_documents(sf_dir)) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)


DECONTAM_BENCH_MOD = 50   # doc_id % MOD == 0 plays the benchmark set


def q_decontaminate(sf_dir: str) -> pd.DataFrame:
    """(doc_id, n_grams, n_overlap): 13-gram benchmark-contamination
    counts for every corpus doc (benchmark = doc_id % 50 == 0 docs,
    a deterministic stand-in for an external eval set)."""
    from ..stages.textstages import decontaminate
    docs = _read_documents(sf_dir)

    def split(t: pa.Table, bench_side: bool) -> pa.Table:
        m = t["doc_id"].to_numpy(zero_copy_only=False) \
            % DECONTAM_BENCH_MOD == 0
        return t.filter(pa.array(m if bench_side else ~m))

    bench = docs.map_batches(split, fn_kwargs={"bench_side": True},
                             batch_format="pyarrow")
    corpus = docs.map_batches(split, fn_kwargs={"bench_side": False},
                              batch_format="pyarrow")
    return decontaminate(corpus, bench, n=13) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)


def q_transcript_prep(sf_dir: str) -> pd.DataFrame:
    """(doc_id, conv_id, turn_idx, text): doc-prep output (A5 docids +
    min-length filter) over the derived transcripts — the per-turn text
    equality invariant surface."""
    ts_dir = derive_transcripts(sf_dir)
    ds = ray.data.read_parquet(ts_dir, columns=["conv_id", "turn_idx", "text"])
    bases = conv_bases(ds)
    bases_ref = ray.put(bases)
    out = ds.map_batches(
        lambda t: t.filter(pc.greater_equal(pc.utf8_length(t["text"]), 10)),
        batch_format="pyarrow").map_batches(
        AssignDocIds, fn_constructor_args=(bases_ref,),
        batch_format="pyarrow", concurrency=(1, 4))
    pdf = out.to_pandas()[["doc_id", "conv_id", "turn_idx", "text"]]
    pdf["turn_idx"] = pdf["turn_idx"].astype(np.int64)
    return pdf.sort_values("doc_id").reset_index(drop=True)


def q_ts_doc_len(sf_dir: str) -> pd.DataFrame:
    """(doc_id, doc_len): built-index doc stats over derived transcripts
    (exact-dedup config => SQL-checkable)."""
    idx = transcripts_index(sf_dir)
    import glob
    files = sorted(glob.glob(os.path.join(idx, "doc_stats", "**",
                                          "*.parquet"), recursive=True))
    t = pq.read_table(files, columns=["doc_id", "doc_len"])
    pdf = t.to_pandas().sort_values("doc_id").reset_index(drop=True)
    pdf["doc_len"] = pdf["doc_len"].astype(np.int64)
    return pdf


def q_bm25_topk(sf_dir: str) -> pd.DataFrame:
    """(query_id, rank, doc_id, score_u): conjunctive BM25 top-10 for the
    flagship query set over the transcripts index (exact-dedup config).
    ``score_u = floor(score * 1e6)`` — integer micro-score so the
    driver's value-hash is immune to float formatting."""
    import math
    idx = transcripts_index(sf_dir)
    eng = QueryEngine(idx, num_actors=4)
    try:
        rows = []
        for qid, q in enumerate(FLAGSHIP_QUERIES):
            for r in eng.bm25_topk(q, k=10):
                rows.append((qid, r["rank"], r["doc_id"],
                             int(math.floor(r["score"] * 1e6))))
    finally:
        eng.shutdown()
    return pd.DataFrame(
        rows, columns=["query_id", "rank", "doc_id", "score_u"]) \
        .astype(np.int64)


def q_ref_cosine_topk(sf_dir: str) -> pd.DataFrame:
    """(query_id, rank, doc_id): reference-literal cosine top-10 (sign
    quirks intact).  SQL-checkable for the lowercase flagship set, where
    the raw-vs-transformed uppercase-miss quirk is the identity; the
    quirk path itself is pytest-covered (test_query)."""
    idx = transcripts_index(sf_dir)
    eng = QueryEngine(idx, num_actors=4)
    try:
        rows = []
        for qid, q in enumerate(FLAGSHIP_QUERIES):
            for r in eng.ref_cosine_topk(q, k=10):
                rows.append((qid, r["rank"], r["doc_id"]))
    finally:
        eng.shutdown()
    return pd.DataFrame(rows, columns=["query_id", "rank", "doc_id"]) \
        .astype(np.int64)


def _query_vectors(sf_dir: str, n: int = 3):
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    flt = t.filter(pc.less(t["vec_id"], n))
    ids = flt["vec_id"].to_numpy(zero_copy_only=False)
    vecs = np.stack([np.asarray(v, dtype=np.float64)
                     for v in flt["embedding"].to_pylist()])
    order = np.argsort(ids)
    return ids[order], vecs[order]


def q_ann_topk(sf_dir: str) -> pd.DataFrame:
    """(query_id, rank, vec_id): exact cosine top-10 over embeddings for
    query vectors = embeddings 0..2 (scores omitted: rank is the
    contract; ordering quantized to 1e-9 with vec_id tie-break)."""
    from ..pipelines.similarity import brute_force_topk
    qids, qvecs = _query_vectors(sf_dir)
    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                               columns=["vec_id", "embedding"])
    pdf = brute_force_topk(ds, "vec_id", "embedding", qids.tolist(), qvecs,
                           k=10)
    # re-rank under the quantized order for oracle parity
    pdf["qc"] = pdf["cosine"].round(9)
    pdf = pdf.sort_values(["query_id", "qc", "vec_id"],
                          ascending=[True, False, True])
    pdf["rank"] = pdf.groupby("query_id").cumcount().astype(np.int64)
    return pdf[["query_id", "rank", "vec_id"]].astype(np.int64) \
        .reset_index(drop=True)


def ivf_index_dir(sf_dir: str, n_centroids: int = 16) -> str:
    """Build (or reuse) the hive-partitioned IVF index for ``sf_dir``."""
    from ..pipelines.similarity import build_ivf_index
    from ..state.lineage import input_fingerprint
    emb = os.path.join(sf_dir, "embeddings.parquet")
    key = hashlib.sha256(
        f"ivf|{sf_dir}|{n_centroids}|{input_fingerprint([emb])}"
        .encode()).hexdigest()[:12]
    out = os.path.join(_CACHE_ROOT, f"ivf_{key}")
    if not os.path.exists(os.path.join(out, "_done")):
        ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                                   columns=["vec_id", "embedding"])
        build_ivf_index(ds, "vec_id", "embedding", out,
                        n_centroids=n_centroids)
    return out


def q_ivf_topk(sf_dir: str) -> pd.DataFrame:
    """(query_id, rank, vec_id): IVF ANN over the partition-pruned
    parquet index.  The driver entry probes ALL centroids, which makes
    the result exact (== the brute-force ANN SQL oracle) while still
    exercising the index build + probed-partition read path; partial
    probes (pruned reads < full file set) are asserted in pytest."""
    from ..pipelines.similarity import ivf_topk_pruned
    qids, qvecs = _query_vectors(sf_dir)
    n_centroids = 16
    idx = ivf_index_dir(sf_dir, n_centroids)
    pdf = ivf_topk_pruned(idx, "vec_id", "embedding", qids.tolist(), qvecs,
                          k=10, nprobe=n_centroids)
    return pdf[["query_id", "rank", "vec_id"]].astype(np.int64) \
        .reset_index(drop=True)


def q_minhash_pairs(sf_dir: str) -> pd.DataFrame:
    """(id, rep_id): MinHash+LSH near-dup clusters over documents
    (rows-only check)."""
    from ..stages.dedup import minhash_lsh_dedup
    return minhash_lsh_dedup(_read_documents(sf_dir), "doc_id", "text",
                             jaccard_threshold=0.8)


def _kept_docs_to_df(kept: ray.data.Dataset) -> pd.DataFrame:
    """(doc_id, text_len) projection shared by the dedup-keep entries
    (one source of truth for the ★-checked output shape)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def project(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"],
            "text_len": pc.cast(pc.utf8_length(t["text"]), pa.int64()),
        })

    pdf = kept.map_batches(project, batch_format="pyarrow").to_pandas()
    return pdf.sort_values("doc_id").reset_index(drop=True)


def q_minhash_dedup_keep(sf_dir: str) -> pd.DataFrame:
    """(doc_id, text_len) of documents surviving end-to-end MinHash
    fuzzy dedup (cluster rep = min id kept, other members dropped).
    The keep filter streams; only the drop set is broadcast."""
    from ..stages.dedup import minhash_dedup_keep
    return _kept_docs_to_df(
        minhash_dedup_keep(_read_documents(sf_dir), "doc_id", "text",
                           jaccard_threshold=0.8))


def q_ngram_dedup_keep(sf_dir: str) -> pd.DataFrame:
    """(doc_id, text_len) surviving end-to-end exact n-gram dedup
    (prefix-filtered pairs -> components -> streaming keep)."""
    from ..stages.dedup import ngram_dedup_keep
    return _kept_docs_to_df(
        ngram_dedup_keep(_read_documents(sf_dir), "doc_id", "text",
                         n=3, threshold=0.8))


def q_ngram_jaccard(sf_dir: str) -> pd.DataFrame:
    """(src, dst): EXACT word-3-gram Jaccard >= 0.8 near-dup pairs
    (prefix-filter candidates are exact, so the all-pairs DuckDB SQL is
    a true oracle; src < dst)."""
    pdf = __import__(
        "searchenginesimple_ray.stages.dedup", fromlist=["ngram_jaccard_pairs"]
    ).ngram_jaccard_pairs(_read_documents(sf_dir), "doc_id", "text",
                          n=3, threshold=0.8)
    return pdf[["src", "dst"]].astype(np.int64) if len(pdf) else \
        pd.DataFrame({"src": pd.Series([], dtype=np.int64),
                      "dst": pd.Series([], dtype=np.int64)})


def q_simhash_fingerprints(sf_dir: str) -> pd.DataFrame:
    """(doc_id, simhash_hex): 64-bit simhash per doc (rows-only)."""
    from ..stages.simhash import add_simhash
    ds = add_simhash(_read_documents(sf_dir).select_columns(["doc_id", "text"]),
                     stop_words=tuple(DEFAULT_STOP_WORDS))

    def to_hex(batch: pa.Table) -> pa.Table:
        h = batch["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table({"doc_id": batch["doc_id"],
                         "simhash_hex": pa.array([f"{x:016x}" for x in h])})

    return ds.map_batches(to_hex, batch_format="pyarrow") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)


def _embedding_pairs(sf_dir: str, threshold: float) -> pd.DataFrame:
    from ..stages.dedup import embedding_pairs_exact
    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                               columns=["vec_id", "embedding"])
    pdf = embedding_pairs_exact(ds, "vec_id", "embedding",
                                cosine_threshold=threshold)
    return pdf[["src", "dst"]].astype(np.int64) if len(pdf) else \
        pd.DataFrame({"src": pd.Series([], dtype=np.int64),
                      "dst": pd.Series([], dtype=np.int64)})


def q_embedding_near_dup(sf_dir: str) -> pd.DataFrame:
    """(src, dst): embedding-cosine >= 0.95 near-dup pairs, EXACT
    (distributed all-pairs vs the broadcast matrix; SQL-checkable — a
    0-row result is proven correct by the oracle rather than
    unverifiable).  The hyperplane-LSH bucketed variant is the 100-TB
    scale path, recall-tested against this exact kernel in pytest."""
    return _embedding_pairs(sf_dir, 0.95)


def q_embedding_sim_pairs(sf_dir: str) -> pd.DataFrame:
    """(src, dst): exact cosine >= 0.4 pairs — same kernel at a
    threshold the testdata actually crosses, so the oracle check
    covers nonzero output values too."""
    return _embedding_pairs(sf_dir, 0.4)


def q_img_stats(sf_dir: str) -> pd.DataFrame:
    """(media_id, width, height, mean_u, std_u): the multimodal image
    decode/feature stage over a media table derived deterministically
    from documents (payload = utf-8 text bytes, dims from payload
    length — ``media_table_from_texts``).  mean/std are the fake-codec
    tiled-byte statistics quantized to 1e-6 ints; the arithmetic is
    integer-exact so the DuckDB oracle reproduces it bit-for-bit."""
    from ..stages.multimodal import decode_images, media_table_from_texts

    def to_media(batch: pa.Table) -> pa.Table:
        return media_table_from_texts(
            batch["doc_id"].to_numpy(zero_copy_only=False),
            batch["text"].to_pylist(), "image")

    media = _read_documents(sf_dir).select_columns(["doc_id", "text"]) \
        .map_batches(to_media, batch_format="pyarrow")
    feats = decode_images(media, batch_size=64)

    def finalize(t: pa.Table) -> pa.Table:
        mean = t["img_mean"].to_numpy(zero_copy_only=False)
        std = t["img_std"].to_numpy(zero_copy_only=False)
        return pa.table({
            "media_id": t["media_id"],
            "width": pc.cast(t["width"], pa.int64()),
            "height": pc.cast(t["height"], pa.int64()),
            "mean_u": pa.array(np.floor(1e6 * mean).astype(np.int64)),
            "std_u": pa.array(np.floor(1e6 * std).astype(np.int64)),
        })

    return feats.map_batches(finalize, batch_format="pyarrow") \
        .to_pandas().sort_values("media_id").reset_index(drop=True)


def q_video_stats(sf_dir: str) -> pd.DataFrame:
    """(media_id, n_sampled, mean_first_u, mean_last_u): the multimodal
    video frame-sample stage (stride=2, max 16 frames) over a media
    table derived from documents (payload = utf-8 text bytes).  Frame
    means are exact integer byte sums over the tiled stream, quantized
    to 1e-6 ints — the DuckDB oracle reproduces them via modular
    prefix sums."""
    from ..stages.multimodal import (media_table_from_texts,
                                     sample_video_frames)

    def to_media(batch: pa.Table) -> pa.Table:
        return media_table_from_texts(
            batch["doc_id"].to_numpy(zero_copy_only=False),
            batch["text"].to_pylist(), "video")

    media = _read_documents(sf_dir).select_columns(["doc_id", "text"]) \
        .map_batches(to_media, batch_format="pyarrow")
    feats = sample_video_frames(media, batch_size=64)

    def finalize(t: pa.Table) -> pa.Table:
        means = t["frame_mean"].to_pylist()
        first = np.array([m[0] for m in means])
        last = np.array([m[-1] for m in means])
        return pa.table({
            "media_id": t["media_id"],
            "n_sampled": pc.cast(t["n_sampled"], pa.int64()),
            "mean_first_u": pa.array(np.floor(1e6 * first).astype(np.int64)),
            "mean_last_u": pa.array(np.floor(1e6 * last).astype(np.int64)),
        })

    return feats.map_batches(finalize, batch_format="pyarrow") \
        .to_pandas().sort_values("media_id").reset_index(drop=True)


def q_audio_stats(sf_dir: str) -> pd.DataFrame:
    """(media_id, n_frames, rms_first_u, rms_last_u): the multimodal
    audio frame-sample stage over a media table derived from documents
    (payload = utf-8 text bytes — ``media_table_from_texts``).  Frame
    RMS uses exact integer sums of (byte-128)^2 (frame_len=256,
    hop=128), quantized to 1e-6 ints, so the DuckDB oracle reproduces
    first/last-frame RMS bit-for-bit."""
    from ..stages.multimodal import frame_audio, media_table_from_texts

    def to_media(batch: pa.Table) -> pa.Table:
        return media_table_from_texts(
            batch["doc_id"].to_numpy(zero_copy_only=False),
            batch["text"].to_pylist(), "audio")

    media = _read_documents(sf_dir).select_columns(["doc_id", "text"]) \
        .map_batches(to_media, batch_format="pyarrow")
    feats = frame_audio(media, batch_size=64,
                        frame_len=256, hop=128, max_frames=64)

    def finalize(t: pa.Table) -> pa.Table:
        rms = t["frame_rms"].to_pylist()
        first = np.array([r[0] for r in rms])
        last = np.array([r[-1] for r in rms])
        return pa.table({
            "media_id": t["media_id"],
            "n_frames": pc.cast(t["n_frames"], pa.int64()),
            "rms_first_u": pa.array(np.floor(1e6 * first).astype(np.int64)),
            "rms_last_u": pa.array(np.floor(1e6 * last).astype(np.int64)),
        })

    return feats.map_batches(finalize, batch_format="pyarrow") \
        .to_pandas().sort_values("media_id").reset_index(drop=True)


# fixed misspelled queries over the documents vocabulary (ASCII-only so
# the DuckDB byte-level levenshtein oracle agrees with the engine's
# codepoint-level distance; CJK parity is covered in pytest)
SUGGEST_QUERIES = ["querry", "hsah", "jion", "tabel", "windoww",
                   "vectro", "agg", "strem"]


def q_suggest_topk(sf_dir: str) -> pd.DataFrame:
    """(query_id, rank, term, distance): edit-distance suggestion top-10
    (G9) over the engine-tokenized dict of the documents corpus;
    candidates share >= 1 codepoint with the query (A9)."""
    from .suggest import Suggester, build_char_index, build_dict
    dt = tokenize_to_doc_terms(
        _read_documents(sf_dir).select_columns(["doc_id", "text"]),
        stop_words=DEFAULT_STOP_WORDS)
    d = build_dict(dt)
    s = Suggester(d, build_char_index(d))
    rows = []
    for qid, q in enumerate(SUGGEST_QUERIES):
        for rank, r in enumerate(s.suggest(q, k=10)):
            rows.append((qid, rank, r["term"], r["distance"]))
    return pd.DataFrame(rows, columns=["query_id", "rank", "term",
                                       "distance"]) \
        .astype({"query_id": np.int64, "rank": np.int64,
                 "distance": np.int64})


# --------------------------------------------------- events operators

def _read_events(sf_dir: str) -> ray.data.Dataset:
    return ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "event_type", "value"])


def q_value_quantiles(sf_dir: str) -> pd.DataFrame:
    """Exact quantile_disc over the UNBOUNDED double column
    events.value — KLL sketch proposes rank windows, an exact recount
    pass answers (the unbounded-domain scale path the bounded-domain
    histogram of token_len_quantiles cannot cover)."""
    from ..stages.sketches import exact_quantiles_unbounded
    ds = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["value"])
    return exact_quantiles_unbounded(
        ds, "value", qs=(0.25, 0.5, 0.75, 0.9, 0.99))


def q_json_props_agg(sf_dir: str) -> pd.DataFrame:
    """(event_type, n_events, sum_k): JSON record-parse of the events
    ``props`` column + per-type integer aggregate."""
    from ..stages.events import json_props_agg
    return json_props_agg(ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "props"]))


def q_event_window_agg(sf_dir: str) -> pd.DataFrame:
    """Tumbling 1h window x event_type counts + exact cent sums."""
    from ..stages.events import event_window_agg
    pdf = event_window_agg(_read_events(sf_dir), window_sec=3600) \
        .to_pandas()
    return pdf.sort_values(["window_start_us", "event_type"]) \
        .reset_index(drop=True)


def q_sessionize(sf_dir: str) -> pd.DataFrame:
    """Per-user 30-min-gap sessions with exact integer stats."""
    from ..stages.events import sessionize_events
    pdf = sessionize_events(_read_events(sf_dir), gap_sec=1800) \
        .to_pandas()
    return pdf.sort_values(["user_id", "session_idx"]) \
        .reset_index(drop=True)


def q_asof_join(sf_dir: str) -> pd.DataFrame:
    """purchase ASOF LEFT JOIN signup per user (backward, -1 fill)."""
    from ..stages.events import asof_join_events
    pdf = asof_join_events(_read_events(sf_dir)).to_pandas()
    return pdf.sort_values("event_id").reset_index(drop=True)


def q_hash_split(sf_dir: str) -> pd.DataFrame:
    """(doc_id, split): deterministic 80/10/10 train/val/test assignment
    by the int64-exact multiplicative hash (stages/sampling.py) — the
    same arithmetic the BIGINT SQL oracle runs."""
    from ..stages.sampling import hash_split
    pdf = hash_split(
        _read_documents(sf_dir).select_columns(["doc_id"]),
        key="doc_id", splits={"train": 0.8, "val": 0.1, "test": 0.1},
        seed=0).to_pandas()
    return pdf.sort_values("doc_id").reset_index(drop=True)


def q_source_quota(sf_dir: str) -> pd.DataFrame:
    """(doc_id, source): per-source quota sample (<=10 docs per source,
    smallest split-hash first) — deterministic corpus balancing."""
    from ..stages.sampling import quota_by_group
    pdf = quota_by_group(
        ray.data.read_parquet(_docs_path(sf_dir),
                              columns=["doc_id", "source"]),
        group_col="source", quota=10, key="doc_id", seed=0).to_pandas()
    return pdf[["doc_id", "source"]].sort_values("doc_id") \
        .reset_index(drop=True)


DUP_SPAN_WINDOW = 40
DUP_SPAN_STRIDE = 10


def q_dup_spans(sf_dir: str) -> pd.DataFrame:
    """(doc_id, pos): substring-level duplicate spans — every 40-char
    window (stride 10, 0-based char offsets) whose exact text occurs in
    >= 2 distinct documents (windowed form of suffix-array substring
    dedup; hash-grouped candidates, exact text verify)."""
    from ..stages.spans import dup_spans
    pdf = dup_spans(_read_documents(sf_dir).select_columns(
        ["doc_id", "text"]), window=DUP_SPAN_WINDOW,
        stride=DUP_SPAN_STRIDE).to_pandas()
    return pdf.sort_values(["doc_id", "pos"]).reset_index(drop=True)


PACK_SEQ_LEN = 256


def q_pack_sequences(sf_dir: str) -> pd.DataFrame:
    """(doc_id, n_tokens, start_offset, start_seq, end_seq):
    concat-and-chunk sequence packing map — docs in doc_id order packed
    into 256-token training windows (two-level prefix sums, the A5
    docid-assignment shape)."""
    from ..stages.packing import pack_sequences
    pdf = pack_sequences(_read_documents(sf_dir),
                         seq_len=PACK_SEQ_LEN).to_pandas()
    return pdf.sort_values("doc_id").reset_index(drop=True)


GOPHER_MIN_TOKENS = 30


def q_gopher_quality_keep(sf_dir: str) -> pd.DataFrame:
    """(doc_id, n_tokens, word_chars, n_stop_distinct,
    top_bigram_count, n_dup_trigrams, rule_bits, keep): Gopher-rule
    quality verdicts (Rae et al. 2021 table A1, word-level
    integer-exact form) — the end-to-end quality FILTER a pretraining
    pipeline runs before tokenization."""
    from ..stages.textstages import gopher_quality
    pdf = gopher_quality(
        _read_documents(sf_dir), stop_words=DEFAULT_STOP_WORDS,
        min_tokens=GOPHER_MIN_TOKENS).to_pandas()
    return pdf.sort_values("doc_id").reset_index(drop=True)


SHUFFLE_SEED = 17


def q_global_shuffle(sf_dir: str) -> pd.DataFrame:
    """(doc_id, shuffle_pos): deterministic seeded global training
    order — rank under (hash_u32(doc_id, seed), doc_id), computed with
    bucketed two-level prefix sums (no global sort)."""
    from ..stages.sampling import global_shuffle_order
    pdf = global_shuffle_order(
        _read_documents(sf_dir).select_columns(["doc_id"]),
        seed=SHUFFLE_SEED).to_pandas()
    return pdf.sort_values("doc_id").reset_index(drop=True)


FUNNEL_WINDOW_SEC = 604_800   # 7 days


def q_funnel(sf_dir: str) -> pd.DataFrame:
    """(user_id, step1_us, step2_us, step3_us): first-touch
    view -> click -> purchase funnel completions within 7 days
    (greedy chain anchored at the user's first view)."""
    from ..stages.events import funnel_events
    pdf = funnel_events(_read_events(sf_dir),
                        steps=("view", "click", "purchase"),
                        window_sec=FUNNEL_WINDOW_SEC).to_pandas()
    cols = ["user_id", "step1_us", "step2_us", "step3_us"]
    if pdf.empty:        # to_pandas drops schema on empty datasets
        return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                             for c in cols})
    return pdf.sort_values("user_id").reset_index(drop=True)


TOKEN_BUDGET = 600
TOKEN_BUDGET_SEED = 5


def q_token_budget_sample(sf_dir: str) -> pd.DataFrame:
    """(doc_id, source, n_tokens): per-source token-budget carve —
    docs taken in deterministic hash-priority order until each
    source's running token total reaches the budget (kept iff the
    total BEFORE the doc is < budget).  Sketch + exact-boundary
    resolution; rows never shuffle."""
    from ..stages.sampling import token_budget_sample
    pdf = token_budget_sample(
        _read_documents(sf_dir), budget=TOKEN_BUDGET,
        seed=TOKEN_BUDGET_SEED).to_pandas()
    return pdf.sort_values("doc_id").reset_index(drop=True)


BAD_SOURCE_N_DROP = 3


def q_bad_source_filter(sf_dir: str) -> pd.DataFrame:
    """(doc_id, source): docs remaining after dropping every doc of
    the 3 sources with the lowest scaled-integer mean n_chars
    (CCNet/C4-style source-level blocklist: tiny aggregate pass ->
    driver decision -> broadcast streaming anti-filter)."""
    from ..stages.filtering import bad_source_filter
    pdf = bad_source_filter(
        _read_documents(sf_dir), group_col="source",
        metric_col="n_chars", n_drop=BAD_SOURCE_N_DROP).to_pandas()
    return pdf.sort_values("doc_id").reset_index(drop=True)


def q_outlier_clip(sf_dir: str) -> pd.DataFrame:
    """(doc_id, n_tokens): docs inside the global exact
    [1/16, 15/16] quantile_disc band of whitespace-token counts
    (length-outlier removal; bounded-domain histogram pass + broadcast
    cut filter)."""
    from ..stages.filtering import outlier_clip
    pdf = outlier_clip(_read_documents(sf_dir)).to_pandas()
    return pdf.sort_values("doc_id").reset_index(drop=True)


def q_lag_deltas(sf_dir: str) -> pd.DataFrame:
    """(user_id, n_events, n_gaps, max_gap_us, sum_gap_us): per-user
    inter-event gap aggregate — the LAG() window primitive over the
    events stream (coarse user-bucket shuffle + one vectorized
    lexsort/diff kernel per bucket)."""
    from ..stages.events import lag_deltas_events
    pdf = lag_deltas_events(_read_events(sf_dir)).to_pandas()
    return pdf.sort_values("user_id").reset_index(drop=True)


PRICING_CUTOFF_US = 904_694_400_000_000  # 1998-09-02 00:00:00 UTC


def q_pricing_summary(sf_dir: str) -> pd.DataFrame:
    """TPC-H-Q1-shape pricing summary: per (returnflag, linestatus)
    integer-exact sums over lineitems shipped <= the cutoff
    (per-batch combiner -> tiny reduce; no shuffle)."""
    from ..stages.joins import pricing_summary
    li = ray.data.read_parquet(os.path.join(sf_dir, "lineitem.parquet"))
    return pricing_summary(li, cutoff_us=PRICING_CUTOFF_US)


def q_vocab_build(sf_dir: str) -> pd.DataFrame:
    """(term, token_id, df): frequency-ranked whitespace-token
    vocabulary with ROW_NUMBER-(df DESC, term) id assignment —
    tokenizer/vocab-training primitive.  driver_limit=0 forces the
    DISTRIBUTED two-level sample-split rank (the 100-TB path) so the
    oracle gates it, not the driver-sort shortcut."""
    from ..stages.sketches import vocab_build
    return vocab_build(_read_documents(sf_dir), driver_limit=0)


def q_retention(sf_dir: str) -> pd.DataFrame:
    """(cohort_week, weeks_since, n_users): weekly retention triangle
    over the events stream — per-user first-week anchor + distinct
    active weeks, derived in ONE bucket kernel (no self-join)."""
    from ..stages.events import retention_cohorts
    return retention_cohorts(_read_events(sf_dir))


def q_curation_keep(sf_dir: str) -> pd.DataFrame:
    """(doc_id, split): the end-to-end curation composition — Gopher
    quality filter -> exact first-wins text dedup -> deterministic
    80/10/10 split — as ONE streaming chain (pipelines/curation.py)."""
    from .curation import curate_df
    return curate_df(_read_documents(sf_dir),
                     stop_words=DEFAULT_STOP_WORDS,
                     min_tokens=GOPHER_MIN_TOKENS, seed=0)


def q_rollup(sf_dir: str) -> pd.DataFrame:
    """(event_type, day_us, n_events, sum_value_cents) at FOUR grains
    (GROUPING SETS): finest exchanged once, coarser grains derived —
    sentinel keys 'ALL' / -1."""
    from ..stages.events import rollup_events
    return rollup_events(_read_events(sf_dir))


def q_label_centroids(sf_dir: str) -> pd.DataFrame:
    """(label, dim, sum_fp, n): per-label embedding centroid as exact
    fixed-point component sums (floor(x*1e6+0.5) quantization, int64
    sums — bit-stable under any partitioning)."""
    from .similarity import label_centroids
    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                               columns=["label", "embedding"])
    return label_centroids(ds)


def q_cooc_pairs(sf_dir: str) -> pd.DataFrame:
    """(term_a, term_b, n_docs): top-20 document-co-occurrent token
    pairs (PMI/collocation counting core) — vectorized pair expansion
    + per-batch combiner."""
    from ..stages.sketches import cooc_pairs_topk
    return cooc_pairs_topk(_read_documents(sf_dir), k=20)


def flagship_entry(sf_dir: str = "/root/testdata/sf0.001") -> pd.DataFrame:
    """Flagship: transcripts -> index build -> BM25 top-k query set."""
    return q_bm25_topk(sf_dir)


def q_lm_surprisal(sf_dir: str) -> pd.DataFrame:
    """(doc_id, n_tok, sum_bits, keep): whole-bit unigram-LM surprisal
    verdicts (CCNet-style model-based quality band, stages/lm.py) —
    self-trained add-one unigram model, per-token floor(log2) surprisal
    in exact integer bit-length arithmetic, keep = mean surprisal
    <= 4.03 bits/token by integer cross-compare (the band that splits
    the synthetic corpus; real pipelines tune this)."""
    from ..stages.lm import lm_surprisal
    pdf = lm_surprisal(_read_documents(sf_dir),
                       max_mean_centibits=403).to_pandas()
    return pdf.sort_values("doc_id").reset_index(drop=True)


def q_bpe_pair_counts(sf_dir: str) -> pd.DataFrame:
    """(left, right, n): top-50 adjacent-character pair counts inside
    whitespace words, weighted by word occurrences — the round-0 BPE
    merge-candidate table (stages/bpe.pair_counts; distributed word
    counts, vectorized vocab-side pair kernel)."""
    from ..stages.bpe import pair_counts
    return pair_counts(_read_documents(sf_dir), top_k=50)


def q_bpe_merges(sf_dir: str) -> pd.DataFrame:
    """(rank, left, right, merged, n): first 12 greedy BPE merges —
    iterative (each merge changes the next round's symbolization), so
    no SQL oracle exists; exactness is pytest-gated against an
    independent per-word pure-Python reference (tests/test_bpe_chunk)."""
    from ..stages.bpe import bpe_train
    return bpe_train(_read_documents(sf_dir), n_merges=12)


def q_chunk_text(sf_dir: str) -> pd.DataFrame:
    """(doc_id, chunk_idx, start_tok, n_tok, chunk_text): overlapping
    20-token windows at stride 10 (RAG retrieval-corpus prep,
    stages/chunking.py — repeat/cumsum enumeration + one Arrow take +
    binary_join per batch, no shuffle)."""
    from ..stages.chunking import chunk_text
    pdf = chunk_text(_read_documents(sf_dir), size=20, stride=10) \
        .to_pandas()
    return pdf.sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)


def q_pagerank(sf_dir: str) -> pd.DataFrame:
    """(node_id, rank_fp): 3-round exact integer fixed-point PageRank
    over the undirected cosine>=2/5 embedding-similarity graph.  The
    edge rule is the QUANTIZED integer comparison
    (stages/dedup.embedding_pairs_quantized) so the edge set is
    bit-identical between numpy and the BIGINT SQL oracle — a float
    cosine threshold could flip a 1-ulp boundary pair and cascade into
    every node's rank.  Ranks run on the range-PARTITIONED rank-vector
    path (stages/graph.pagerank_int num_parts=4 — per-partition slices
    in the object store, Pregel supersteps; pytest-asserted identical
    to the broadcast path); the oracle is the same recurrence unrolled
    in BIGINT SQL."""
    from ..stages.dedup import embedding_pairs_quantized
    from ..stages.graph import pagerank_int
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"])
    edges = embedding_pairs_quantized(ds, "vec_id", "embedding",
                                      threshold_num=2, threshold_den=5)
    return pagerank_int(ray.data.from_pandas(edges), num_iters=3,
                        num_parts=4)


def q_curation_lm_keep(sf_dir: str) -> pd.DataFrame:
    """(doc_id, split): the CCNet+Gopher curation composition — Gopher
    rules -> unigram-LM surprisal band (self-trained on the kept
    subset) -> exact first-wins dedup -> deterministic split
    (pipelines/curation.curate_lm)."""
    from .curation import curate_lm
    pdf = curate_lm(_read_documents(sf_dir),
                    stop_words=DEFAULT_STOP_WORDS,
                    min_tokens=GOPHER_MIN_TOKENS,
                    max_mean_centibits=403, seed=0).to_pandas()
    if not len(pdf):
        return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                             "split": pd.Series([], dtype=object)})
    return pdf.sort_values("doc_id").reset_index(drop=True)


def q_late_events(sf_dir: str) -> pd.DataFrame:
    """(event_id, ts_us, watermark_us, is_late): streaming watermark /
    late-data verdicts with arrival order = event_id — a distributed
    prefix scan (per-bucket max + driver exclusive prefix + in-bucket
    cummax; stages/events.watermark_late_events)."""
    from ..stages.events import watermark_late_events
    pdf = watermark_late_events(_read_events(sf_dir),
                                lateness_sec=3600).to_pandas()
    if not len(pdf):      # to_pandas drops a 0-row dataset's schema
        return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                             for c in ("event_id", "ts_us",
                                       "watermark_us", "is_late")})
    return pdf.sort_values("event_id").reset_index(drop=True)


def q_distinctive_terms(sf_dir: str) -> pd.DataFrame:
    """(group, rank, term, tf, score): top-10 c-TF-IDF distinctive
    terms per source — tf x whole-bit idf, all integer arithmetic
    (stages/sketches.distinctive_terms).  broadcast_limit=0 forces
    the term-hash-partitioned df JOIN (the beyond-broadcast-vocab
    path) so the oracle gates it, not the broadcast shortcut."""
    from ..stages.sketches import distinctive_terms
    return distinctive_terms(_read_documents(sf_dir), k=10,
                             broadcast_limit=0, join_partitions=8)


def q_compression_ratio(sf_dir: str) -> pd.DataFrame:
    """(doc_id, n_bytes, n_compressed, ratio_u): zlib-compressibility
    quality signal (rows-only — no SQL zlib; kernel pytest-gated
    against direct zlib; stages/textstages.compression_ratio)."""
    from ..stages.textstages import compression_ratio
    pdf = compression_ratio(_read_documents(sf_dir)).to_pandas()
    return pdf.sort_values("doc_id").reset_index(drop=True)


def q_quantize_embeddings(sf_dir: str) -> pd.DataFrame:
    """(vec_id, scale_u, q_sum, q_min, q_max): int8 scalar-quantization
    stats per embedding — all IEEE +,-,*,/,floor, bit-identical to the
    SQL oracle (pipelines/similarity.quantize_embeddings_stats)."""
    from .similarity import quantize_embeddings_stats
    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                               columns=["vec_id", "embedding"])
    pdf = quantize_embeddings_stats(ds).to_pandas()
    return pdf.sort_values("vec_id").reset_index(drop=True)


def q_interval_join(sf_dir: str) -> pd.DataFrame:
    """(event_id, user_id, ts_us, n_probe): per purchase event, the
    same user's clicks inside the 1h lookback window — the RANGE-join
    custom-operator class (stages/events.interval_join_events: one
    coarse shuffle + a merge-count interval stab, no per-row loops)."""
    from ..stages.events import interval_join_events
    pdf = interval_join_events(_read_events(sf_dir)).to_pandas()
    return pdf.sort_values("event_id").reset_index(drop=True)


# ------------------------------------------- round-4 second op wave

def q_sft_pairs(sf_dir: str) -> pd.DataFrame:
    """(conv_id, prompt_turn_idx, prompt_chars, prompt_tokens,
    response_chars, response_tokens): SFT prompt/response pair mining
    over the derived transcripts — user turn followed by the adjacent
    assistant turn (LEAD window per conversation; text never enters
    the exchange — per-turn lengths are computed pre-shuffle)."""
    from ..stages.transcript_ops import sft_pairs
    ts = ray.data.read_parquet(derive_transcripts(sf_dir))
    pdf = sft_pairs(ts).to_pandas()
    return pdf.sort_values(["conv_id", "prompt_turn_idx"]) \
        .reset_index(drop=True)


def q_conv_assemble(sf_dir: str) -> pd.DataFrame:
    """(conv_id, n_turns, n_chars, dialog_md5): ordered conversation
    assembly — each conversation's turns joined by \\n in turn order,
    witnessed by an order-sensitive md5 (byte-identical concatenation
    check against string_agg(... ORDER BY turn_idx))."""
    from ..stages.transcript_ops import conv_assemble
    ts = ray.data.read_parquet(derive_transcripts(sf_dir))
    pdf = conv_assemble(ts).to_pandas()
    return pdf.sort_values("conv_id").reset_index(drop=True)


def q_rolling_window(sf_dir: str) -> pd.DataFrame:
    """(event_id, user_id, win_n, win_sum_c): per-user rolling ROWS
    window (last 5 events by ts) — SQL's ROWS BETWEEN 4 PRECEDING AND
    CURRENT ROW as a coarse-bucket shuffle + cumsum-difference
    kernel; exact integer cents."""
    from ..stages.events import rolling_window_events
    pdf = rolling_window_events(_read_events(sf_dir)).to_pandas()
    return pdf.sort_values("event_id").reset_index(drop=True)


Q3_CUTOFF_US = 900_000_000_000_000   # 1998-07-09 16:00:00 UTC
Q3_SEGMENT = "AUTOMOBILE"


def q_tpch_q3(sf_dir: str) -> pd.DataFrame:
    """TPC-H-Q3 shape (shipping priority): top-10 open orders by
    revenue for one customer segment — broadcast semi-join into the
    orders scan, per-batch lineitem revenue combiner, ONE fact x fact
    shuffle join on orderkey, order-bounded groupby-sum, partial
    top-k pushdown (stages/joins.shipping_priority_topk)."""
    from ..stages.joins import shipping_priority_topk
    cust = ray.data.read_parquet(os.path.join(sf_dir, "customer.parquet"))
    orders = ray.data.read_parquet(os.path.join(sf_dir, "orders.parquet"))
    li = ray.data.read_parquet(os.path.join(sf_dir, "lineitem.parquet"))
    return shipping_priority_topk(cust, orders, li, Q3_SEGMENT,
                                  Q3_CUTOFF_US, k=10)


def q_kmeans_assign(sf_dir: str) -> pd.DataFrame:
    """(vec_id, cluster_id, dist_q): fixed-centroid cluster assignment
    (k-means E-step) over the embeddings — centroids = vec_id < 8,
    quantized-int64 squared-L2 argmin so the entry is integer-exact
    (pipelines/similarity.kmeans_assign)."""
    from .similarity import kmeans_assign
    emb = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    pdf = kmeans_assign(emb).to_pandas()
    return pdf.sort_values("vec_id").reset_index(drop=True)


def q_snapshot_diff(sf_dir: str) -> pd.DataFrame:
    """(status, n_docs): content-level diff of two corpus snapshots
    (incremental-corpus audit).  Snapshots are derived
    deterministically from documents: OLD drops doc_id%10==3, NEW
    drops doc_id%10==7 and rewrites text of doc_id%5==0 (' v2'
    suffix); the diff engine itself (stages/snapshot.snapshot_diff)
    never sees the rules — only two keyed datasets."""
    from ..stages.snapshot import snapshot_diff

    docs = ray.data.read_parquet(_docs_path(sf_dir),
                                 columns=["doc_id", "text"])

    def old_fn(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        return b.filter(pa.array(ids % 10 != 3))

    def new_fn(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        b = b.filter(pa.array(ids % 10 != 7))
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        txt = pc.binary_join_element_wise(
            b["text"].cast(pa.string()),
            pa.array(np.where(ids % 5 == 0, " v2", ""), pa.string()), "")
        return pa.table({"doc_id": b["doc_id"], "text": txt})

    old = docs.map_batches(old_fn, batch_format="pyarrow")
    new = docs.map_batches(new_fn, batch_format="pyarrow")
    return snapshot_diff(old, new).sort_values("status") \
        .reset_index(drop=True)


def q_typo_pairs(sf_dir: str) -> pd.DataFrame:
    """(term_a, term_b): all unordered vocabulary pairs at Levenshtein
    distance exactly 1 — deletion-neighborhood blocking + exact
    verify (stages/fuzzy.py) over the deterministic noisy vocabulary
    (hash-injected insert/delete/substitute typos so the fixed-vocab
    testdata has real positives; same hash rule in the oracle)."""
    from ..stages.fuzzy import typo_pairs
    return typo_pairs(_read_documents(sf_dir))


# -------------------------------------------- round-4 third op wave

def q_collocations(sf_dir: str) -> pd.DataFrame:
    """(term_a, term_b, n_ab, n_a, n_b): statistically-associated
    token pairs — document-lift >= 21/20 with n_ab >= 5, verdict by
    integer cross-multiplication (the PMI-threshold collocation-mining
    step on top of the cooc counting core;
    stages/sketches.collocations).  The threshold is set inside the
    synthetic corpus's near-independent lift band (max ~1.09) so the
    entry has real positives AND real negatives."""
    from ..stages.sketches import collocations
    return collocations(_read_documents(sf_dir), min_count=5,
                        lift_num=21, lift_den=20)


def q_doc_tfidf_topk(sf_dir: str) -> pd.DataFrame:
    """(doc_id, rank, term, tf, score): per-document top-5 keywords by
    whole-bit tf-idf (stages/sketches.doc_tfidf_topk) — df partials +
    one idf broadcast, then a pure streaming scoring/top-k map (a
    doc's tokens live in its row, so no shuffle anywhere)."""
    from ..stages.sketches import doc_tfidf_topk
    pdf = doc_tfidf_topk(_read_documents(sf_dir)).to_pandas()
    return pdf.sort_values(["doc_id", "rank"]).reset_index(drop=True)


def q_value_histogram(sf_dir: str) -> pd.DataFrame:
    """(bin, n, sum_c): fixed-width ($10 buckets, exact integer cents)
    histogram over the events value column — per-batch combiner,
    rows never shuffle (stages/events.value_histogram)."""
    from ..stages.events import value_histogram
    return value_histogram(_read_events(sf_dir))


def q_bigram_surprisal(sf_dir: str) -> pd.DataFrame:
    """(doc_id, n_pairs, sum_bits): per-doc whole-bit surprisal under
    an add-one-smoothed CONDITIONAL bigram LM (stages/lm.
    bigram_surprisal) — the 2-gram step of CCNet-style model scoring;
    exact bit-length arithmetic on both sides."""
    from ..stages.lm import bigram_surprisal
    pdf = bigram_surprisal(_read_documents(sf_dir)).to_pandas()
    return pdf.sort_values("doc_id").reset_index(drop=True)


def q_rolling_anomaly(sf_dir: str) -> pd.DataFrame:
    """(user_id, n_events, n_anomalies): trailing-window anomaly flags
    — events whose value beats 3x the mean of the user's previous 4
    events, verdict by integer cross-product (stages/events.
    rolling_anomaly_counts; SQL frame ROWS BETWEEN 4 PRECEDING AND
    1 PRECEDING)."""
    from ..stages.events import rolling_anomaly_counts
    pdf = rolling_anomaly_counts(_read_events(sf_dir)).to_pandas()
    return pdf.sort_values("user_id").reset_index(drop=True)


def q_bpe_encode(sf_dir: str) -> pd.DataFrame:
    """(doc_id, n_words, n_bpe_tokens): tokenizer INFERENCE — the
    12-merge table trained by the bpe_merges entry applied back to the
    corpus (stages/bpe.bpe_encode).  Rows-only: the merge table is the
    output of an iterative trainer; the encode kernel is pytest-gated
    against an independent per-word reference."""
    from ..stages.bpe import bpe_encode, bpe_train
    docs = _read_documents(sf_dir)
    merges = bpe_train(docs, n_merges=12)
    pdf = bpe_encode(docs, merges).to_pandas()
    return pdf.sort_values("doc_id").reset_index(drop=True)


SEG_DEDUP_WORDS = 10


def q_segment_dedup(sf_dir: str) -> pd.DataFrame:
    """(doc_id, clean_text, n_segs, n_removed): C4/RefinedWeb-style
    cross-document segment dedup — every 10-word segment whose exact
    text occurs in >= 2 distinct docs is removed from ALL docs and the
    doc re-joined from the survivors (stages/linededup.segment_dedup;
    sketch-then-verify, text never enters the wide exchange)."""
    from ..stages.linededup import segment_dedup
    pdf = segment_dedup(_read_documents(sf_dir),
                        seg_words=SEG_DEDUP_WORDS).to_pandas()
    return pdf.sort_values("doc_id").reset_index(drop=True)


def q_stratified_sample(sf_dir: str) -> pd.DataFrame:
    """(doc_id, source, keep): exact per-stratum 1/4 sample — within
    every source, the ceil(n/4) docs ranking first under
    (hash_u32(doc_id), doc_id) keep=1 (stages/sampling.
    stratified_sample; bucketed two-level prefix ranks, integer-exact
    rational boundary)."""
    from ..stages.sampling import stratified_sample
    pdf = stratified_sample(_read_documents(sf_dir), "source",
                            num=1, den=4).to_pandas()
    return pdf.sort_values("doc_id").reset_index(drop=True)


def q_source_overlap(sf_dir: str) -> pd.DataFrame:
    """(src_a, src_b, n_shared): cross-source content-overlap matrix —
    distinct 10-word segment texts shared by each source pair
    (stages/linededup.source_overlap; mirror/syndication diagnostic,
    sketch-then-verify, exact)."""
    from ..stages.linededup import source_overlap
    return source_overlap(_read_documents(sf_dir),
                          seg_words=SEG_DEDUP_WORDS).to_pandas()


def q_pq_encode(sf_dir: str) -> pd.DataFrame:
    """(vec_id, code_0..code_3, dist_q): product-quantization encode of
    the embeddings — 4 subspaces x 8 codewords, integer-exact argmin
    (pipelines/similarity.pq_encode; the PQ compression path for
    100-TB vector stores)."""
    from .similarity import pq_encode
    emb = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    pdf = pq_encode(emb).to_pandas()
    return pdf.sort_values("vec_id").reset_index(drop=True)


def q_pq_adc_topk(sf_dir: str) -> pd.DataFrame:
    """(query_id, rank, vec_id, adc_q): PQ asymmetric-distance top-10 —
    queries = embeddings 0..2 score the whole corpus through the
    per-query subspace lookup tables (pipelines/similarity.pq_adc_topk;
    integer-exact, no float boundary anywhere)."""
    from .similarity import pq_adc_topk
    emb = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return pq_adc_topk(emb, query_ids=[0, 1, 2], k=10)


def q_winnow_fingerprints(sf_dir: str) -> pd.DataFrame:
    """(doc_id, pos, fp): winnowing fingerprint sets (Schleimer et al.
    2003, MOSS) — 3-word grams, window 4, rightmost-minimal selection;
    fp = DuckDB-parity signed md5 low half, so VALUES are
    oracle-checked (stages/winnow.winnow_fingerprints)."""
    from ..stages.winnow import winnow_fingerprints
    pdf = winnow_fingerprints(_read_documents(sf_dir), n=3, w=4) \
        .to_pandas()
    if "doc_id" not in pdf.columns:     # all-empty: schema dropped
        return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                             "pos": pd.Series([], dtype=np.int64),
                             "fp": pd.Series([], dtype=np.int64)})
    return pdf.sort_values(["doc_id", "pos"]).reset_index(drop=True)


def q_winnow_overlap(sf_dir: str) -> pd.DataFrame:
    """(doc_a, doc_b, n_shared): MOSS overlap report — doc pairs
    sharing >= 2 distinct winnowing fingerprints, boilerplate
    fingerprints (> 32 docs) suppressed (stages/winnow.
    winnow_overlap_pairs)."""
    from ..stages.winnow import winnow_overlap_pairs
    return winnow_overlap_pairs(_read_documents(sf_dir), n=3, w=4,
                                min_shared=2, max_docs_per_fp=32)


def q_graph_components(sf_dir: str) -> pd.DataFrame:
    """(node_id, component_id): connected components of the undirected
    cosine>=2/5 embedding-similarity graph (component id = min vec_id
    reachable; isolated vectors are their own component).  Exposes the
    engine's distributed CC primitive (stages/dedup.
    components_min_rep_arrays — min-hooking + pointer doubling, the
    kernel behind every dedup cluster resolution) as a first-class
    operator; edge rule shared bit-identically with pagerank."""
    from ..stages.dedup import (components_min_rep_arrays,
                                embedding_pairs_quantized)
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"])
    all_ids = np.sort(ds.select_columns(["vec_id"]).to_pandas()
                      ["vec_id"].to_numpy(np.int64))
    edges = embedding_pairs_quantized(ds, "vec_id", "embedding",
                                      threshold_num=2, threshold_den=5)
    comp = all_ids.copy()                      # default: own component
    if len(edges):
        ids, rep = components_min_rep_arrays(edges)
        pos = np.searchsorted(all_ids, ids)
        comp[pos] = rep
    return pd.DataFrame({"node_id": all_ids,
                         "component_id": comp.astype(np.int64)})


def q_ivfpq_topk(sf_dir: str) -> pd.DataFrame:
    """(query_id, rank, vec_id, adc_q): IVFADC top-10 — coarse
    quantizer (8 lists, kmeans_assign seed rule) + shared residual PQ
    codebook + per-probed-list ADC, nprobe=2; fully integer-exact
    (pipelines/similarity.ivfpq_topk — the production ANN layout)."""
    from .similarity import ivfpq_topk
    emb = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return ivfpq_topk(emb, query_ids=[0, 1, 2], k=10)


def q_conv_stats(sf_dir: str) -> pd.DataFrame:
    """(conv_id, n_turns, n_user, n_assistant, sum_chars, max_turn_idx):
    per-conversation rollup over the derived transcripts — the
    conversation-health table an agent-transcript pipeline reports
    (turn balance, size) before indexing.  Distributive aggregates
    only: per-batch Arrow group_by partials, one tiny conv-bounded
    combine; role = turn_idx parity (the derivation's own rule)."""
    import pyarrow.compute as pc
    ts_dir = derive_transcripts(sf_dir)
    ds = ray.data.read_parquet(ts_dir,
                               columns=["conv_id", "turn_idx", "text"])

    def partial(t: pa.Table) -> pa.Table:
        ti = t["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        # null text contributes 0 chars (SQL sum(length(text)) skips
        # NULLs); a bare astype would cast the NaN to garbage
        chars = pc.coalesce(pc.utf8_length(t["text"]),
                            pa.scalar(0, pa.int32())) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        user = (ti % 2 == 0).astype(np.int64)
        tt = pa.table({"conv_id": t["conv_id"],
                       "n": pa.array(np.ones(len(ti), np.int64)),
                       "u": pa.array(user),
                       "a": pa.array(1 - user),
                       "c": pa.array(chars),
                       "m": pa.array(ti)})
        return tt.group_by("conv_id").aggregate(
            [("n", "sum"), ("u", "sum"), ("a", "sum"),
             ("c", "sum"), ("m", "max")])

    pdf = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    # dropna=False: SQL GROUP BY keeps the NULL conv group
    out = pdf.groupby("conv_id", as_index=False, dropna=False).agg(
        n_turns=("n_sum", "sum"), n_user=("u_sum", "sum"),
        n_assistant=("a_sum", "sum"), sum_chars=("c_sum", "sum"),
        max_turn_idx=("m_max", "max"))
    for c in ["n_turns", "n_user", "n_assistant", "sum_chars",
              "max_turn_idx"]:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("conv_id").reset_index(drop=True)


def q_hashed_features(sf_dir: str) -> pd.DataFrame:
    """(doc_id, f_0..f_7): hashing-trick document count vectors —
    bucket = floored md5_low64(word) mod 8, md5-parity with the SQL
    oracle (stages/winnow.hashed_features; the vocabulary-free
    featurizer of Weinberger et al. 2009)."""
    from ..stages.winnow import hashed_features
    pdf = hashed_features(_read_documents(sf_dir), n_buckets=8) \
        .to_pandas()
    return pdf.sort_values("doc_id").reset_index(drop=True)


def q_ngram_novelty(sf_dir: str) -> pd.DataFrame:
    """(doc_id, n_grams, n_novel): per-doc distinct 3-grams and how
    many appear in NO other document — the originality audit
    (stages/winnow.ngram_novelty; md5-parity gram identity)."""
    from ..stages.winnow import ngram_novelty
    return ngram_novelty(_read_documents(sf_dir), n=3)


def q_triangle_count(sf_dir: str) -> pd.DataFrame:
    """(node_id, n_triangles): per-node triangle membership counts
    over the undirected cosine>=2/5 embedding-similarity graph (edge
    rule bit-shared with pagerank/graph_components, so the graph is
    SQL-identical).  Exposes the degree-oriented wedge-close counter
    (stages/graph.triangle_count — Suri & Vassilvitskii WWW'11 shape:
    degree stamps and the wedge-closing probe are hash-partitioned
    joins, never a node-table broadcast)."""
    from ..stages.dedup import embedding_pairs_quantized
    from ..stages.graph import triangle_count
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"])
    all_ids = np.sort(ds.select_columns(["vec_id"]).to_pandas()
                      ["vec_id"].to_numpy(np.int64))
    edges = embedding_pairs_quantized(ds, "vec_id", "embedding",
                                      threshold_num=2, threshold_den=5)
    if not len(edges):
        return pd.DataFrame({"node_id": all_ids,
                             "n_triangles": np.zeros(len(all_ids),
                                                     np.int64)})
    eds = ray.data.from_pandas(
        edges[["src", "dst"]].astype(np.int64)).repartition(4)
    return triangle_count(eds, all_nodes=all_ids, join_partitions=8)


def q_lang_pivot(sf_dir: str) -> pd.DataFrame:
    """(source, n_de, n_en, n_es, n_fr, n_zh, n_other, n_total):
    language x source count matrix over documents — the per-source
    language-mix report every multilingual curation recipe starts
    from (stages/relops.pivot_counts: per-batch Arrow combiner, one
    native (row, col) groupby, report-sized driver widening)."""
    from ..stages.relops import pivot_counts
    return pivot_counts(
        _read_documents(sf_dir).select_columns(["source", "lang"]),
        "source", "lang", ["de", "en", "es", "fr", "zh"])


def q_event_rank(sf_dir: str) -> pd.DataFrame:
    """(event_id, value_rank): exact SQL rank() OVER (ORDER BY value)
    for every event WITHOUT a global sort — value-range-bucketed
    Blelloch selection (stages/relops.global_rank: per-bucket counts,
    O(B) driver prefix, one narrow exchange; ties share a bucket so
    tie ranks are exact)."""
    from ..stages.relops import global_rank
    ev = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["event_id", "value"])
    return global_rank(ev, "event_id", "value").to_pandas() \
        .sort_values("event_id").reset_index(drop=True)


def q_event_type_median(sf_dir: str) -> pd.DataFrame:
    """(group, n, median): exact per-event-type quantile_disc(0.5)
    over event values — grouped selection without sorting or
    materializing any group (stages/relops.group_median: (group,
    value-bucket) cell counts, driver O(groups x B) target walk,
    pass-2 touches only target cells)."""
    from ..stages.relops import group_median
    ev = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["event_type", "value"])
    return group_median(ev, "event_type", "value")


def q_bloom_user_filter(sf_dir: str) -> pd.DataFrame:
    """(event_id, user_id): events whose user is NOT flagged — flagged
    users are those with any purchase of value > 95.  Exact ANTI
    semi-join through a Bloom prefilter (stages/relops.
    bloom_semi_join): the flagged-key Bloom broadcasts at fixed
    num_bits/8 bytes regardless of key count, bloom-negative rows
    skip the exchange entirely, and only bloom-positive candidates
    enter the hash-partitioned verify join — exactness restored by
    the verify, scan volume bounded by the FP rate."""
    import pyarrow.compute as pc

    from ..stages.relops import bloom_semi_join
    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "event_type", "value"])

    def flagged(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.equal(t["event_type"], "purchase"),
                    pc.greater(t["value"], 95.0))
        return pa.table({"user_id": t.filter(m)["user_id"]})

    flagged_keys = ev.map_batches(flagged, batch_format="pyarrow")
    kept = bloom_semi_join(
        ev.select_columns(["event_id", "user_id"]), flagged_keys,
        on="user_id", anti=True, num_bits=1 << 16, join_partitions=8)
    return kept.to_pandas().sort_values("event_id") \
        .reset_index(drop=True)


def q_event_type_rank(sf_dir: str) -> pd.DataFrame:
    """(event_id, event_type, value_rank): exact SQL rank() OVER
    (PARTITION BY event_type ORDER BY value) — the windowed sibling
    of event_rank (stages/relops.group_rank: (group, value-bucket)
    cell counts, per-group driver prefixes, one narrow exchange)."""
    from ..stages.relops import group_rank
    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "event_type", "value"])
    return group_rank(ev, "event_id", "event_type", "value") \
        .to_pandas().sort_values("event_id").reset_index(drop=True)


def q_event_dense_rank(sf_dir: str) -> pd.DataFrame:
    """(event_id, dense_rank): exact SQL dense_rank() OVER (ORDER BY
    value) — 1 + distinct smaller values, no gaps after ties
    (stages/relops.global_order: the DISTINCT-prefix variant of the
    bucket-selection machinery)."""
    from ..stages.relops import global_order
    ev = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["event_id", "value"])
    return global_order(ev, "event_id", "value",
                        method="dense_rank").to_pandas() \
        .sort_values("event_id").reset_index(drop=True)


def q_event_row_number(sf_dir: str) -> pd.DataFrame:
    """(event_id, row_num): exact SQL row_number() OVER (ORDER BY
    value, event_id) — a deterministic total order without a global
    sort (stages/relops.global_order)."""
    from ..stages.relops import global_order
    ev = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["event_id", "value"])
    return global_order(ev, "event_id", "value",
                        method="row_number").to_pandas() \
        .sort_values("event_id").reset_index(drop=True)


def q_orders_pivot(sf_dir: str) -> pd.DataFrame:
    """(o_orderpriority, c_F, c_O, c_P, c_other, c_total): order value
    by priority x status — a weighted wide rollup over the TPC-H fact
    table in exact integer cents (stages/relops.pivot_sum_cents; the
    floor(x*100+0.5) money rule shared with nation_revenue)."""
    from ..stages.relops import pivot_sum_cents
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderpriority", "o_orderstatus", "o_totalprice"])
    return pivot_sum_cents(orders, "o_orderpriority", "o_orderstatus",
                           ["F", "O", "P"], "o_totalprice")


def q_dup_cluster_hist(sf_dir: str) -> pd.DataFrame:
    """(cluster_size, n_clusters): exact-duplicate cluster-size
    histogram over documents — the dedup health report
    (stages/relops.dup_cluster_hist; 128-bit md5 cluster identity,
    bucket-resolved, text never exchanged)."""
    from ..stages.relops import dup_cluster_hist
    return dup_cluster_hist(
        _read_documents(sf_dir).select_columns(["text"]))
