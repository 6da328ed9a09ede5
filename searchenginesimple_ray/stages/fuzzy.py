"""Edit-distance-1 fuzzy term join (typo mining / spell-key linking).

The string-similarity self-join every query-log / OCR / user-text
cleaning pipeline needs: find all UNORDERED pairs of distinct
vocabulary terms at Levenshtein distance exactly 1.  A naive
all-pairs join is O(V^2) edit-distance calls; the scalable plan is
deletion-neighborhood blocking (the SymSpell / Norvig key scheme):

    ed(a, b) <= 1  =>  D(a) ∩ D(b) != ∅,
    D(t) = {t} ∪ {t with one character deleted}

(substitution at position i: both sides share the delete-at-i key;
insert/delete: the longer word's deletion key IS the shorter word).
The implication is one-directional — sharing a key does NOT imply
ed <= 1: ed-2 pairs can collide (e.g. "abx"/"ayb" share "ab") — so
every candidate is verified with an exact ed==1 check.  Blocking is
a recall-complete candidate generator, never the verdict.

Scale shape: candidate generation is a streaming map over the
DISTINCT vocabulary (each term emits len(t)+1 keys of ~16 B hash +
term), one coarse ``key_hash % B`` shuffle groups shared keys, and
the per-bucket kernel is a lexsort + segment pair expansion (the
cooc_pairs shape) + exact verify.  Every per-term and per-pair loop
is VOCAB-bounded, not corpus-bounded — the corpus-proportional token
stream is reduced to the distinct vocabulary before any of this runs.

The noisy-vocabulary derivation (``noisy_doc_terms``) exists so the
fixed testdata corpus (31 clean words — no natural typos) exercises
real positives: a deterministic hash of (doc_id, first char, length)
injects insert/delete/substitute typos, with the SAME integer-exact
rule (``stages/sampling.hash_u32``) reproduced in the SQL oracle.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..functions.hashing import fnv1a64
from .sampling import hash_u32

_TYPO_SEED = 5
_TOKEN_RE = r"[a-z]+"

# typed empty kernel output: Ray's block sizing chokes on 0-length
# object columns, so empties go out as Arrow string tables
_EMPTY_PAIRS = pa.table({"term_a": pa.array([], pa.string()),
                         "term_b": pa.array([], pa.string())})


def noisy_doc_terms(docs: ray.data.Dataset, min_len: int = 4,
                    max_len: int = 16) -> ray.data.Dataset:
    """documents -> DISTINCT noisy (doc_id, term) stream.

    Base tokens: ``[a-z]+`` over lower(text), length in
    [min_len, max_len], distinct per doc.  Each (doc, term) pair then
    passes the deterministic typo rule
    ``cls = hash_u32(doc_id*131 + ord(term[0])*7 + len(term), 5) % 8``:
    cls 0 -> first char doubled (insertion), 1 -> last char dropped
    (deletion), 2 -> first char replaced by 'x' (substitution),
    else unchanged — identical arithmetic in the SQL oracle.

    Vectorization: polars extract_all/explode does the token work;
    the typo surgery builds 4 variants per *unique* term (vocab-
    bounded loop) and gathers rows via a (unique_idx, cls) fancy
    index — no per-token Python.
    """
    import polars as pl

    def per_batch(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select(["doc_id", "text"]))
        toks = (df.with_columns(
                    pl.col("text").str.to_lowercase()
                      .str.extract_all(_TOKEN_RE).alias("term"))
                .drop("text").explode("term")
                .filter(pl.col("term").str.len_chars()
                        .is_between(min_len, max_len))
                .unique(subset=["doc_id", "term"]))
        if not len(toks):
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "term": pa.array([], pa.string())})
        doc = toks["doc_id"].to_numpy().astype(np.int64)
        terms = toks["term"].to_numpy().astype(object)
        uniq, inv = np.unique(terms, return_inverse=True)
        ord0 = np.fromiter((ord(t[0]) for t in uniq), np.int64,
                           count=len(uniq))
        tlen = np.fromiter((len(t) for t in uniq), np.int64,
                           count=len(uniq))
        # variants[u, c]: c in {0: doubled-first, 1: drop-last,
        # 2: x-substituted, 3: unchanged}
        variants = np.empty((len(uniq), 4), dtype=object)
        for i, t in enumerate(uniq):
            variants[i, 0] = t[0] + t
            variants[i, 1] = t[:-1]
            variants[i, 2] = "x" + t[1:]
            variants[i, 3] = t
        h = hash_u32(doc * 131 + ord0[inv] * 7 + tlen[inv], _TYPO_SEED)
        cls = np.minimum(h % 8, 3).astype(np.int64)
        out = variants[inv, cls]
        return pa.table({"doc_id": pa.array(doc),
                         "term": pa.array(out, pa.string())})

    return docs.select_columns(["doc_id", "text"]).map_batches(
        per_batch, batch_format="pyarrow")


def distinct_terms(doc_terms: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, term) -> distinct term, via per-batch dedup (uniques
    ≪ rows on Zipf vocab) then one term-key exchange of unique rows."""
    def batch_uniq(batch: pa.Table) -> pa.Table:
        u = np.unique(batch["term"].to_numpy(zero_copy_only=False))
        return pa.table({"term": pa.array(u, pa.string())})

    return doc_terms.map_batches(batch_uniq, batch_format="pyarrow") \
        .groupby("term").count().select_columns(["term"])


def _ed1(a: str, b: str) -> bool:
    """Exact ed==1 check (candidates only — vocab-bounded)."""
    la, lb = len(a), len(b)
    if la == lb:
        return sum(x != y for x, y in zip(a, b)) == 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    if lb - la != 1:
        return False
    # b = a with one insertion: split at first mismatch
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1:]


def ed1_pairs(vocab: ray.data.Dataset, n_buckets: int = 32
              ) -> pd.DataFrame:
    """Distinct-term dataset -> all unordered (term_a < term_b) pairs
    with Levenshtein distance exactly 1, via deletion-neighborhood
    blocking + exact verify.  Result and final dedup are
    vocab-bounded (pairs across buckets can repeat when a pair shares
    several deletion keys; the driver unique is over the pair set,
    never the corpus)."""

    def keys(batch: pa.Table) -> pa.Table:
        terms = batch["term"].to_numpy(zero_copy_only=False)
        out_h, out_t = [], []
        for t in terms:                      # vocab-bounded
            out_h.append(fnv1a64(t))
            out_t.append(t)
            for i in range(len(t)):
                out_h.append(fnv1a64(t[:i] + t[i + 1:]))
                out_t.append(t)
        h = np.asarray(out_h, dtype=np.uint64).view(np.int64)
        return pa.table({
            "key_hash": pa.array(h),
            "term": pa.array(out_t, pa.string()),
            "bucket": pa.array((h % n_buckets).astype(np.int32)),
        })

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return _EMPTY_PAIRS
        kh = g["key_hash"].to_numpy()
        tm = g["term"].to_numpy().astype(object)
        order = np.lexsort((tm, kh))
        kh, tm = kh[order], tm[order]
        # drop duplicate (key, term) rows (a term can reach the same
        # key via two deletions, e.g. "aab" -> "ab" twice)
        keep = np.concatenate(([True],
                               (kh[1:] != kh[:-1]) | (tm[1:] != tm[:-1])))
        kh, tm = kh[keep], tm[keep]
        starts = np.flatnonzero(
            np.concatenate(([True], kh[1:] != kh[:-1])))
        ends = np.append(starts[1:], len(kh))
        sizes = ends - starts
        multi = sizes >= 2
        if not multi.any():
            return _EMPTY_PAIRS
        # within-segment pair expansion: the loop is over segments of
        # terms SHARING a deletion key — vocab-bounded and tiny (a key
        # is shared by at most |alphabet|+2 ed-1 neighbors)
        a_parts, b_parts = [], []
        for s, e in zip(starts[multi], ends[multi]):
            seg = tm[s:e]                    # sorted (lexsort above)
            m = len(seg)
            ii = np.repeat(np.arange(m - 1), np.arange(m - 1, 0, -1))
            jj = np.concatenate([np.arange(i + 1, m)
                                 for i in range(m - 1)])
            a_parts.append(seg[ii])
            b_parts.append(seg[jj])
        a = np.concatenate(a_parts)
        b = np.concatenate(b_parts)
        # dedupe candidate pairs within the bucket, then exact verify
        both = np.char.add(np.char.add(a.astype(str), "\x00"),
                           b.astype(str))
        _, first = np.unique(both, return_index=True)
        a, b = a[first], b[first]
        ok = np.fromiter((_ed1(x, y) for x, y in zip(a, b)), bool,
                         count=len(a))
        return pa.table({"term_a": pa.array(a[ok], pa.string()),
                         "term_b": pa.array(b[ok], pa.string())})

    parts = vocab.map_batches(keys, batch_format="pyarrow") \
        .groupby("bucket").map_groups(bucket_pairs,
                                      batch_format="pandas").to_pandas()
    if not len(parts):
        return pd.DataFrame({"term_a": pd.Series([], dtype=object),
                             "term_b": pd.Series([], dtype=object)})
    parts = parts.drop_duplicates().sort_values(["term_a", "term_b"])
    return parts.reset_index(drop=True)


def typo_pairs(docs: ray.data.Dataset, min_len: int = 4,
               max_len: int = 16) -> pd.DataFrame:
    """End-to-end: documents -> noisy distinct vocabulary -> exact
    ed==1 unordered pairs."""
    return ed1_pairs(distinct_terms(noisy_doc_terms(
        docs, min_len=min_len, max_len=max_len)))
