"""Unigram language-model surprisal scoring / filtering.

The model-based quality gate of CCNet-style curation (Wenzek et al.
2020 score documents with a KenLM perplexity and keep the
low-perplexity band): train token counts on a corpus, score every
document by its mean per-token surprisal under the add-one-smoothed
unigram model, keep documents whose mean surprisal is below a
threshold.  (The reference engine has no model-based scoring at all —
this is part of the training-data suite, not a port; the closest
reference analogue is the tokenize+TF pipeline it feeds into,
/root/reference/include/Page/Page.hpp tokenisation.)

Exactness device — WHOLE-BIT QUANTIZED SURPRISAL.  A float
``ln``-based perplexity cannot be oracle-checked bit-for-bit across
numpy and DuckDB (different libm, different summation order), so the
score is quantized at the per-token level to whole bits:

    s(t) = floor(log2(D / (c(t) + 1)))        D = T + V  (add-one mass)

which is computable in EXACT integer arithmetic from bit lengths:

    k = bitlen(D) - bitlen(c+1);  s = k - [D < (c+1) * 2^k]

(numpy: ``frexp`` exponents are exact for integers <= 2^53; DuckDB:
``length(bin(x))``).  Per-doc score = sum of s over token OCCURRENCES;
the keep rule compares integer cross-products
``sum_bits * 100 <= max_centibits * n_tok`` so no float boundary
exists on either side.  A float perplexity (``2^(sum_bits/n)``) is
derivable by the caller from the exact columns.

Tokenization matches the Gopher / n-gram oracles: RE2 ``\\s+`` split
of ``lower(coalesce(text, ''))`` with empty tokens dropped — Arrow's
``split_pattern_regex`` and DuckDB's ``string_split_regex`` are both
RE2, so the oracle agrees token-for-token.

100-TB shape: PASS 1 reduces the corpus to (token, count) partials via
per-batch Arrow ``value_counts`` (exchange rows bounded by
vocab x blocks, never corpus size) and combines them on the driver;
the combined vocabulary is broadcast ONCE (``ray.put``) and PASS 2 is
a pure streaming map using Arrow ``index_in`` (vectorized hash lookup)
— no shuffle, nothing materializes.  ``max_vocab_broadcast`` guards
the driver/broadcast bound loudly; past it, keep the counts as a
Dataset and score via the hash-partitioned ``Dataset.join`` in
``stages/joins.py`` (explode tokens -> join -> re-aggregate), trading
one shuffle for unbounded vocabulary.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

_TOKEN_SPLIT = r"\s+"


def _flat_tokens(batch: pa.Table, text_col: str):
    """(flat token StringArray, parent row indices) with empty tokens
    removed — RE2 split, all-Arrow, no per-row Python."""
    lc = pc.utf8_lower(pc.fill_null(batch[text_col], ""))
    toks = pc.split_pattern_regex(lc, pattern=_TOKEN_SPLIT)
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks)
    nonempty = pc.not_equal(flat, "")
    return flat.filter(nonempty), parents.filter(nonempty)


def unigram_counts(ds: ray.data.Dataset, text_col: str = "text",
                   max_vocab_broadcast: int = 50_000_000
                   ) -> tuple[pa.Array, np.ndarray]:
    """PASS 1: corpus token counts -> (vocab StringArray, int64 counts).

    Per-batch Arrow ``value_counts`` partials; the driver combine is
    bounded by the vocabulary, not the corpus.  Raises loudly past
    ``max_vocab_broadcast`` distinct partial rows (the documented
    switch point to the Dataset.join scoring path)."""

    def partial(batch: pa.Table) -> pa.Table:
        flat, _ = _flat_tokens(batch, text_col)
        vc = flat.value_counts()
        return pa.table({"t": vc.field("values"),
                         "c": vc.field("counts").cast(pa.int64())})

    parts = ds.select_columns([text_col]).map_batches(
        partial, batch_format="pyarrow").to_arrow_refs()
    tabs = [t for t in ray.get(parts) if t.num_rows]
    if not tabs:
        return pa.array([], pa.string()), np.empty(0, np.int64)
    allp = pa.concat_tables(tabs)
    if allp.num_rows > max_vocab_broadcast:
        raise ValueError(
            f"unigram vocabulary partials ({allp.num_rows} rows) exceed "
            f"max_vocab_broadcast={max_vocab_broadcast}; score via the "
            "hash-partitioned Dataset.join path instead of broadcast")
    comb = allp.group_by("t").aggregate([("c", "sum")])
    return comb["t"].combine_chunks(), \
        comb["c_sum"].to_numpy(zero_copy_only=False).astype(np.int64)


def _bitlen(x: np.ndarray) -> np.ndarray:
    """Exact bit length of positive int64 values <= 2^53 (frexp
    exponents are exact there: x = m * 2^e with 0.5 <= m < 1)."""
    _, e = np.frexp(x.astype(np.float64))
    return e.astype(np.int64)


def surprisal_bits(counts: np.ndarray, denom: int) -> np.ndarray:
    """Exact ``floor(log2(denom / (counts + 1)))`` per token, via bit
    lengths + one exact power-of-two-scaled compare (all values are
    <= 2^53, so every float64 step below is exact)."""
    c1 = counts.astype(np.int64) + 1
    k = _bitlen(np.array([denom], np.int64))[0] - _bitlen(c1)
    adjust = float(denom) < c1.astype(np.float64) * np.exp2(
        k.astype(np.float64))
    return k - adjust.astype(np.int64)


def lm_surprisal(ds: ray.data.Dataset, id_col: str = "doc_id",
                 text_col: str = "text",
                 max_mean_centibits: int = 1200,
                 counts_from: ray.data.Dataset | None = None,
                 keep_filter: bool = False,
                 max_vocab_broadcast: int = 50_000_000
                 ) -> ray.data.Dataset:
    """Score every document by whole-bit unigram surprisal and mark the
    low-surprisal band as kept.

    Returns (id, n_tok, sum_bits, keep) rows where ``keep = 1`` iff
    ``n_tok > 0 AND sum_bits * 100 <= max_mean_centibits * n_tok``
    (mean surprisal at most ``max_mean_centibits / 100`` bits/token —
    exact integer cross-compare, no float boundary).  Empty documents
    are dropped rows in spirit: they get keep = 0.

    ``counts_from``: train the model on a DIFFERENT corpus (the CCNet
    arrangement — train on trusted text, score the crawl); defaults to
    self-training on ``ds``.  Tokens unseen in training score with
    c = 0 (the add-one floor).  ``keep_filter=True`` returns the
    surviving input rows instead of verdicts (composable streaming
    filter, same contract as ``gopher_quality``)."""
    vocab, counts = unigram_counts(counts_from or ds, text_col,
                                   max_vocab_broadcast)
    denom = int(counts.sum()) + len(counts)     # T + V (add-one mass)
    if denom > 2**53:
        raise OverflowError(
            "add-one mass T + V exceeds 2^53; the exact float64 "
            "bit-length arithmetic no longer applies — shard the "
            "training corpus or switch to a 128-bit kernel")
    model_ref = ray.put((vocab, counts)) if len(counts) else None

    def score(batch: pa.Table, ref=None) -> pa.Table:
        n = batch.num_rows
        flat, parents = _flat_tokens(batch, text_col)
        par = parents.to_numpy(zero_copy_only=False)
        n_tok = np.bincount(par, minlength=n).astype(np.int64) \
            if len(par) else np.zeros(n, np.int64)
        if ref is not None and len(par):
            v, c = ray.get(ref)
            idx = pc.index_in(flat, value_set=v)   # null = OOV (c = 0)
            hit = pc.is_valid(idx).to_numpy(zero_copy_only=False)
            idx_i = pc.fill_null(idx, 0).to_numpy(
                zero_copy_only=False).astype(np.int64)
            tok_c = np.where(hit, c[idx_i], 0)
            s = surprisal_bits(tok_c, denom)
            sum_bits = np.bincount(par, weights=s,
                                   minlength=n).astype(np.int64)
            keep = ((n_tok > 0)
                    & (sum_bits * 100 <= max_mean_centibits * n_tok)) \
                .astype(np.int64)
        else:
            # empty training vocabulary: no model evidence, keep
            # nothing (the SQL oracle's NULL-mass CASE agrees)
            sum_bits = np.zeros(n, np.int64)
            keep = np.zeros(n, np.int64)
        if keep_filter:
            return batch.filter(pa.array(keep == 1))
        return pa.table({
            id_col: batch[id_col],
            "n_tok": pa.array(n_tok),
            "sum_bits": pa.array(sum_bits),
            "keep": pa.array(keep)})

    sel = ds if keep_filter else ds.select_columns([id_col, text_col])
    return sel.map_batches(score, fn_kwargs={"ref": model_ref},
                           batch_format="pyarrow")


__all__ = ["unigram_counts", "surprisal_bits", "lm_surprisal"]


def surprisal_bits_vec(counts: np.ndarray,
                       denoms: np.ndarray) -> np.ndarray:
    """``floor(log2(denoms / (counts + 1)))`` with PER-ELEMENT
    denominators (the conditional-model generalization of
    ``surprisal_bits``); exact for values <= 2^53."""
    c1 = counts.astype(np.int64) + 1
    k = _bitlen(denoms.astype(np.int64)) - _bitlen(c1)
    adjust = denoms.astype(np.float64) < c1.astype(np.float64) \
        * np.exp2(k.astype(np.float64))
    return k - adjust.astype(np.int64)


def bigram_counts(ds: ray.data.Dataset, text_col: str = "text",
                  max_vocab_broadcast: int = 50_000_000
                  ) -> tuple[pa.Array, np.ndarray]:
    """Corpus bigram counts -> ('w1 w2' joined-key array, int64
    counts) for adjacent in-document token pairs (tokens are
    \\s+-split, so the ' '-joined key is collision-free and directly
    index_in-able by the scoring pass).  Same partial/combine shape as
    ``unigram_counts``: exchange rows bounded by the BIGRAM vocabulary
    x blocks (the loud ``max_vocab_broadcast`` guard marks the switch
    point to a hash-partitioned Dataset.join scoring path)."""

    def partial(batch: pa.Table) -> pa.Table:
        flat, parents = _flat_tokens(batch, text_col)
        if len(flat) < 2:
            return pa.table({"k": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        p = parents.to_numpy(zero_copy_only=False)
        adj = p[1:] == p[:-1]
        if not adj.any():
            return pa.table({"k": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        idx = np.flatnonzero(adj)
        w1 = flat.take(pa.array(idx))
        w2 = flat.take(pa.array(idx + 1))
        # tokens are \s+-split so ' ' cannot occur inside one — the
        # joined key is collision-free
        keys = pc.binary_join_element_wise(w1, w2, " ")
        vc = keys.value_counts()
        return pa.table({"k": vc.field("values"),
                         "c": vc.field("counts").cast(pa.int64())})

    parts = ds.select_columns([text_col]).map_batches(
        partial, batch_format="pyarrow").to_arrow_refs()
    tabs = [t for t in ray.get(parts) if t.num_rows]
    if not tabs:
        return pa.array([], pa.string()), np.empty(0, np.int64)
    allp = pa.concat_tables(tabs)
    if allp.num_rows > max_vocab_broadcast:
        raise ValueError(
            f"bigram partials ({allp.num_rows} rows) exceed "
            f"max_vocab_broadcast={max_vocab_broadcast}; score via the "
            "hash-partitioned Dataset.join path instead of broadcast")
    comb = allp.group_by("k").aggregate([("c", "sum")])
    return comb["k"].combine_chunks(), \
        comb["c_sum"].to_numpy(zero_copy_only=False).astype(np.int64)


def bigram_surprisal(ds: ray.data.Dataset, id_col: str = "doc_id",
                     text_col: str = "text",
                     max_vocab_broadcast: int = 50_000_000
                     ) -> ray.data.Dataset:
    """Per-document whole-bit surprisal under an add-one-smoothed
    CONDITIONAL bigram model — the next step up from ``lm_surprisal``
    toward KenLM-style CCNet scoring:

        s(w1 w2) = floor(log2((c(w1) + V) / (c(w1, w2) + 1)))

    (add-one over the V-token follow-set of w1; every step is the
    exact bit-length arithmetic of ``surprisal_bits``, so the DuckDB
    oracle matches bit-for-bit).  Output: (id, n_pairs, sum_bits) for
    every document with >= 2 tokens.

    Scale shape: TWO count passes reduce the corpus to the unigram and
    bigram vocabularies (per-batch Arrow value_counts partials); both
    models broadcast ONCE as sorted key arrays; the scoring pass is a
    pure streaming map (index_in lookups + vectorized bit math +
    one reduceat per batch) — no shuffle, nothing materializes.
    """
    vocab, uni_c = unigram_counts(ds, text_col, max_vocab_broadcast)
    V = len(vocab)
    big_keys, big_c = bigram_counts(ds, text_col, max_vocab_broadcast)
    model_ref = ray.put((vocab, uni_c, big_keys, big_c, V))

    def score(batch: pa.Table, ref=None) -> pa.Table:
        vocab, uni_c, big_keys, big_c, V = ray.get(ref)
        flat, parents = _flat_tokens(batch, text_col)
        ids = batch[id_col].cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        empty = pa.table({id_col: pa.array([], pa.int64()),
                          "n_pairs": pa.array([], pa.int64()),
                          "sum_bits": pa.array([], pa.int64())})
        if len(flat) < 2:
            return empty
        p = parents.to_numpy(zero_copy_only=False)
        adj = np.flatnonzero(p[1:] == p[:-1])
        if not len(adj):
            return empty
        w1 = flat.take(pa.array(adj))
        keys = pc.binary_join_element_wise(
            w1, flat.take(pa.array(adj + 1)), " ")
        # self-trained: every token/pair is in the model; fill_null 0
        # keeps the cross-corpus case (unseen -> add-one floor) sound
        u_idx = pc.index_in(w1, value_set=vocab)
        c1 = np.where(u_idx.is_valid().to_numpy(zero_copy_only=False),
                      uni_c[pc.fill_null(u_idx, 0)
                            .to_numpy(zero_copy_only=False)], 0)
        b_idx = pc.index_in(keys, value_set=big_keys)
        c12 = np.where(b_idx.is_valid().to_numpy(zero_copy_only=False),
                       big_c[pc.fill_null(b_idx, 0)
                             .to_numpy(zero_copy_only=False)], 0)
        bits = surprisal_bits_vec(c12, c1 + V)
        gp = p[adj]
        starts = np.flatnonzero(
            np.concatenate(([True], gp[1:] != gp[:-1])))
        ends = np.append(starts[1:], len(gp))
        return pa.table({
            id_col: pa.array(ids[gp[starts]]),
            "n_pairs": pa.array((ends - starts).astype(np.int64)),
            "sum_bits": pa.array(np.add.reduceat(bits, starts)
                                 .astype(np.int64))})

    import functools
    return ds.select_columns([id_col, text_col]).map_batches(
        functools.partial(score, ref=model_ref), batch_format="pyarrow")
