"""Text-analysis Dataset stages over generic ``(id, text)`` tables:
language-ID, quality scoring, token counting, document fingerprinting.

Part of the large-scale training-data operator suite (no reference
analogue — the reference's only text analytics is tokenize+TF,
`include/Page/Page.hpp:283-309`).  Design rules: compiled regexes and
marker sets built once per actor in ``__init__``; one pass per batch;
output columns are plain Arrow scalars so downstream groupbys stay
cheap.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..functions.textstats import (BPE_TOKEN, LANG_MARKERS, PUNCT, WS_TOKEN,
                                   lang_id, rolling_fingerprint)


class TextStatsStage:
    """(id, text) batch -> batch + n_ws_tokens, n_bpe_tokens, n_chars,
    punct_ratio, stop_ratio, mean_token_len, quality_score, lang,
    fingerprint columns."""

    def __init__(self, stop_words=(), fingerprint_window: int = 16,
                 id_col: str = "doc_id", text_col: str = "text"):
        self.stop = frozenset(w.lower() for w in stop_words)
        self.window = fingerprint_window
        self.id_col = id_col
        self.text_col = text_col
        self.ws = WS_TOKEN.findall
        self.bpe = BPE_TOKEN.findall
        self.punct = PUNCT.findall

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        n = len(texts)
        n_ws = np.zeros(n, np.int64)
        n_bpe = np.zeros(n, np.int64)
        n_chars = np.zeros(n, np.int64)
        punct_ratio = np.zeros(n, np.float64)
        stop_ratio = np.zeros(n, np.float64)
        mean_tok = np.zeros(n, np.float64)
        langs: list[str] = []
        fps = np.zeros(n, np.uint64)
        for i, tx in enumerate(texts):
            toks = self.ws(tx)
            lower = [t.lower() for t in toks]
            nt = len(toks)
            nc = len(tx)
            n_ws[i] = nt
            n_bpe[i] = len(self.bpe(tx))
            n_chars[i] = nc
            punct_ratio[i] = (len(self.punct(tx)) / nc) if nc else 0.0
            stop_ratio[i] = (sum(1 for t in lower if t in self.stop) / nt) if nt else 0.0
            mean_tok[i] = (sum(len(t) for t in toks) / nt) if nt else 0.0
            langs.append(lang_id(tx))
            fps[i] = rolling_fingerprint(tx, self.window)
        # quality score in [0,1]: length band + punctuation + stopword
        # evidence (C4/Gopher-style heuristic rules, public recipes)
        len_ok = np.clip(n_ws / 20.0, 0.0, 1.0)
        punct_ok = 1.0 - np.clip((punct_ratio - 0.2) * 5.0, 0.0, 1.0)
        stop_ok = np.clip(stop_ratio * 5.0, 0.0, 1.0)
        quality = (len_ok + punct_ok + stop_ok) / 3.0
        return (batch
                .append_column("n_ws_tokens", pa.array(n_ws))
                .append_column("n_bpe_tokens", pa.array(n_bpe))
                .append_column("n_text_chars", pa.array(n_chars))
                .append_column("punct_ratio", pa.array(punct_ratio))
                .append_column("stop_ratio", pa.array(stop_ratio))
                .append_column("mean_token_len", pa.array(mean_tok))
                .append_column("quality_score", pa.array(quality))
                .append_column("lang_pred", pa.array(langs, pa.string()))
                .append_column("fingerprint", pa.array(fps, pa.uint64())))


def text_stats(ds: ray.data.Dataset, stop_words=(), id_col: str = "doc_id",
               text_col: str = "text", concurrency=(1, 8),
               batch_size: int = 1024) -> ray.data.Dataset:
    return ds.map_batches(
        TextStatsStage,
        fn_constructor_kwargs={"stop_words": tuple(stop_words),
                               "id_col": id_col, "text_col": text_col},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


def lang_histogram(ds: ray.data.Dataset, text_col: str = "text"):
    """(lang, n) corpus language histogram — a LEAN pass computing only
    the n-gram-marker language id per doc (the full TextStatsStage
    would pay BPE tokenization + fingerprinting just to discard them)."""
    def partial(batch: pa.Table) -> pa.Table:
        langs = [lang_id(tx) for tx in batch[text_col].to_pylist()]
        uniq, counts = np.unique(np.asarray(langs, dtype=object),
                                 return_counts=True)
        return pa.table({"lang": pa.array(list(uniq), pa.string()),
                         "n_partial": pa.array(counts.astype(np.int64))})

    pdf = ds.select_columns([text_col]) \
        .map_batches(partial, batch_format="pyarrow").to_pandas()
    out = pdf.groupby("lang", as_index=False)["n_partial"].sum() \
        .rename(columns={"n_partial": "n"})
    out["n"] = out["n"].astype(np.int64)
    return out.sort_values("lang").reset_index(drop=True)


# --------------------------------------------- repetition / contamination

# RE2's ASCII \S — used where the SQL oracle's whitespace definition
# must match exactly.  RE2's \s is [\t\n\f\r ] — NO vertical tab —
# so \v must be a WORD character here (verified vs DuckDB
# string_split_regex); Python str.split / \s are Unicode-aware and
# also differ.
_ASCII_NONWS = re.compile(r"[^ \t\n\r\f]+")


def _flat_token_hashes(texts: list[str], token_re=None):
    """Whitespace-split every text; returns (flat uint64 token hashes,
    per-row counts).  Token identity = fnv1a64, one dict probe per
    token occurrence; all downstream n-gram work is numpy over the
    flat array (no per-row Python in the gram/count kernels).
    ``token_re`` overrides the default Unicode ``str.split`` (e.g.
    ``_ASCII_NONWS`` for RE2-parity tokenization)."""
    from ..functions.hashing import fnv1a64

    if token_re is None:
        tok_lists = [tx.split() for tx in texts]
    else:
        tok_lists = [token_re.findall(tx) for tx in texts]
    token_hash: dict = {}
    for tl in tok_lists:
        for t in tl:
            if t not in token_hash:
                token_hash[t] = fnv1a64(t)
    counts = np.fromiter((len(tl) for tl in tok_lists), np.int64,
                         len(tok_lists))
    flat = np.fromiter((token_hash[t] for tl in tok_lists for t in tl),
                       np.uint64, int(counts.sum()))
    return flat, counts


def _gram_keys(flat: np.ndarray, rows: np.ndarray, n: int):
    """FNV-fold n-gram keys over a flat token-hash array; grams that
    would span row boundaries are masked out.  Returns (keys, row_of_key).
    Same gram identity as ``dedup._gram_signature`` (collision odds
    ~m^2/2^65 per doc — the accepted ngram_jaccard_pairs trade)."""
    from .dedup import _GRAM_INIT, _GRAM_PRIME
    m = flat.size - n + 1
    if m <= 0:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    with np.errstate(over="ignore"):
        g = np.full(m, _GRAM_INIT, np.uint64)
        for j in range(n):
            g = (g ^ flat[j: m + j]) * _GRAM_PRIME
    ok = rows[: m] == rows[n - 1:]
    return g[ok], rows[: m][ok]


def _per_row_distinct(keys: np.ndarray, rows: np.ndarray, n_rows: int):
    """(#occurrences, #distinct, max-multiplicity) of ``keys`` per row,
    via one lexsort + run detection — no per-row loop."""
    total = np.bincount(rows, minlength=n_rows).astype(np.int64)
    dist = np.zeros(n_rows, np.int64)
    top = np.zeros(n_rows, np.int64)
    if keys.size:
        o = np.lexsort((keys, rows))
        k, r = keys[o], rows[o]
        new = np.concatenate([[True], (r[1:] != r[:-1]) | (k[1:] != k[:-1])])
        starts = np.flatnonzero(new)
        run_rows = r[starts]
        run_len = np.diff(np.concatenate([starts, [k.size]]))
        np.add.at(dist, run_rows, 1)
        np.maximum.at(top, run_rows, run_len)
    return total, dist, top


def _repetition_batch(batch: pa.Table, id_col: str, text_col: str) -> pa.Table:
    """(id, text) batch -> per-doc repetition counters (all int64, so
    the driver value-hash is dtype-stable):

    - n_tokens / n_distinct_tokens: whitespace tokens and their
      distinct count (Gopher's word-level repetition signals, Rae et
      al. 2021 "Scaling Language Models", table A1 — public recipe);
    - top_bigram_count: occurrences of the most frequent word 2-gram
      (0 when fewer than 2 tokens);
    - n_dup_trigrams: 3-gram occurrences minus distinct 3-grams
      (0 when fewer than 3 tokens)."""
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    texts = batch[text_col].to_pylist()
    n = len(texts)
    flat, counts = _flat_token_hashes(texts)
    rows = np.repeat(np.arange(n, dtype=np.int64), counts)
    n_tok, n_dist, _ = _per_row_distinct(flat, rows, n)
    k2, r2 = _gram_keys(flat, rows, 2)
    _, _, top2 = _per_row_distinct(k2, r2, n)
    k3, r3 = _gram_keys(flat, rows, 3)
    t3, d3, _ = _per_row_distinct(k3, r3, n)
    return pa.table({
        id_col: pa.array(ids, pa.int64()),
        "n_tokens": pa.array(n_tok),
        "n_distinct_tokens": pa.array(n_dist),
        "top_bigram_count": pa.array(top2),
        "n_dup_trigrams": pa.array(t3 - d3),
    })


def repetition_stats(ds: ray.data.Dataset, id_col: str = "doc_id",
                     text_col: str = "text",
                     batch_size: int = 4096) -> ray.data.Dataset:
    """Per-doc word-repetition counters for quality filtering.  Pure
    streaming map — no shuffle; each batch is one lexsort over its
    flat token-hash array."""
    return ds.select_columns([id_col, text_col]).map_batches(
        _repetition_batch,
        fn_kwargs={"id_col": id_col, "text_col": text_col},
        batch_format="pyarrow", batch_size=batch_size)


def decontaminate(ds: ray.data.Dataset, benchmark: ray.data.Dataset,
                  id_col: str = "doc_id", text_col: str = "text",
                  n: int = 13, batch_size: int = 4096) -> ray.data.Dataset:
    """Benchmark decontamination: per corpus doc, how many of its
    distinct word ``n``-grams appear in the benchmark set (GPT-3
    appendix C / PaLM-style 13-gram overlap check, public recipe).

    The benchmark gram set is aggregated ONCE (distinct gram hashes per
    block -> driver union -> sorted array in the object store via
    ``ray.put``) and every corpus task does a vectorized searchsorted
    membership probe against the broadcast — a shuffle-free semi-join,
    the small-side-broadcast shape the 100-TB design calls for
    (benchmarks are MBs; the corpus never moves).  Docs with fewer than
    ``n`` tokens have no grams and report 0.  Output columns (all
    int64): doc_id, n_grams (distinct n-grams), n_overlap.
    """
    def bench_grams(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        flat, counts = _flat_token_hashes(texts)
        rows = np.repeat(np.arange(len(texts), dtype=np.int64), counts)
        k, _ = _gram_keys(flat, rows, n)
        return pa.table({"g": pa.array(np.unique(k).view(np.int64))})

    parts = benchmark.select_columns([text_col]) \
        .map_batches(bench_grams, batch_format="pyarrow").to_pandas()
    bench_sorted = np.unique(parts["g"].to_numpy().astype(np.int64))
    bench_ref = ray.put(bench_sorted)

    def probe(batch: pa.Table, ref=None) -> pa.Table:
        bg = ray.get(ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        texts = batch[text_col].to_pylist()
        m = len(texts)
        flat, counts = _flat_token_hashes(texts)
        rows = np.repeat(np.arange(m, dtype=np.int64), counts)
        k, r = _gram_keys(flat, rows, n)
        n_grams = np.zeros(m, np.int64)
        n_over = np.zeros(m, np.int64)
        if k.size:
            o = np.lexsort((k, r))
            k, r = k[o], r[o]
            new = np.concatenate([[True],
                                  (r[1:] != r[:-1]) | (k[1:] != k[:-1])])
            k, r = k[new].view(np.int64), r[new]
            np.add.at(n_grams, r, 1)
            if bg.size:
                pos = np.clip(np.searchsorted(bg, k), 0, bg.size - 1)
                hit = bg[pos] == k
                np.add.at(n_over, r[hit], 1)
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "n_grams": pa.array(n_grams),
                         "n_overlap": pa.array(n_over)})

    return ds.select_columns([id_col, text_col]).map_batches(
        probe, fn_kwargs={"ref": bench_ref},
        batch_format="pyarrow", batch_size=batch_size)


# PII patterns: RE2 syntax, valid verbatim in BOTH Arrow
# (count_substring_regex / replace_substring_regex) and DuckDB
# (regexp_extract_all / regexp_replace 'g') — the parity the SQL
# oracle depends on.  Applied in ORDER: each pattern is counted on
# the text as left by the previous replacement.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("url", r"https?://[^\s]+", "<URL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def pii_scrub(ds: ray.data.Dataset, id_col: str = "doc_id",
              text_col: str = "text") -> ray.data.Dataset:
    """Redact PII-looking spans (emails, URLs, IPv4s) and count them:
    (id, n_email, n_url, n_ipv4, clean_text).

    C4 / RefinedWeb-style cleaning step (public recipes).  Pure Arrow
    RE2 kernels — zero-copy batches in, one vectorized count + replace
    per pattern, no Python row loop, no state, no shuffle: the op
    streams at read speed and scales embarrassingly.
    """
    import pyarrow.compute as pc

    def scrub(batch: pa.Table) -> pa.Table:
        txt = batch[text_col]
        cols: dict = {id_col: batch[id_col]}
        for name, pat, repl in PII_PATTERNS:
            cols[f"n_{name}"] = pc.cast(
                pc.count_substring_regex(txt, pat), pa.int64())
            txt = pc.replace_substring_regex(txt, pat, repl)
        cols["clean_text"] = txt
        return pa.table(cols)

    return ds.select_columns([id_col, text_col]) \
        .map_batches(scrub, batch_format="pyarrow")


# Gopher-style quality rules (Rae et al. 2021 "Scaling Language
# Models", table A1 — public recipe), word-level form.  Every rule is
# INTEGER arithmetic (ratio thresholds are expressed as integer
# percentages and cross-multiplied), so the DuckDB oracle reproduces
# the verdicts bit-for-bit with no float rounding.  Bit i of
# ``rule_bits`` set = rule i FAILED; ``keep`` = no rule failed.
GOPHER_RULES = (
    "n_tokens < min_tokens",
    "n_tokens > max_tokens",
    "mean word length < min (word_chars < min_mean_len * n_tokens)",
    "mean word length > max (word_chars > max_mean_len * n_tokens)",
    "fewer than min_stop_distinct distinct stop words",
    "top bigram occurrences > top_bigram_pct% of (n_tokens - 1)",
    "duplicate trigram occurrences > dup_trigram_pct% of (n_tokens - 2)",
)


def gopher_quality(ds: ray.data.Dataset, id_col: str = "doc_id",
                   text_col: str = "text", stop_words=(),
                   min_tokens: int = 50, max_tokens: int = 100_000,
                   min_mean_len: int = 3, max_mean_len: int = 10,
                   min_stop_distinct: int = 2, top_bigram_pct: int = 20,
                   dup_trigram_pct: int = 30,
                   batch_size: int = 4096,
                   keep_filter: bool = False) -> ray.data.Dataset:
    """Per-doc Gopher-rule quality verdicts: (doc_id, n_tokens,
    word_chars, n_stop_distinct, top_bigram_count, n_dup_trigrams,
    rule_bits, keep).  Tokens are lowercased whitespace words under
    RE2's ASCII whitespace definition (``_ASCII_NONWS``, NOT Python's
    Unicode ``str.split``), so the SQL oracle's
    ``string_split_regex(text, '\\s+')`` agrees token-for-token;
    ``word_chars`` counts non-whitespace characters under the same
    RE2 ``\\s``.  NULL text = empty string on both sides.  Pure
    streaming map — no shuffle, one lexsort per batch.

    ``keep_filter=True`` returns the SURVIVING (id, text) rows instead
    of verdicts — the composable streaming-filter form (the keep
    decision never leaves the batch, so downstream stages chain with
    no join and no materialization)."""
    import pyarrow.compute as pc

    from ..functions.hashing import fnv1a64
    from .dedup import _sorted_member_mask
    stop_sorted = np.sort(np.fromiter(
        (fnv1a64(w.lower()) for w in stop_words), np.uint64,
        len(tuple(stop_words)))) if stop_words else np.empty(0, np.uint64)

    def verdicts(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        texts = [(t or "").lower() for t in batch[text_col].to_pylist()]
        n = len(texts)
        flat, counts = _flat_token_hashes(texts, token_re=_ASCII_NONWS)
        rows = np.repeat(np.arange(n, dtype=np.int64), counts)
        n_tok, _, _ = _per_row_distinct(flat, rows, n)
        sm = _sorted_member_mask(stop_sorted, flat)
        _, n_stop_dist, _ = _per_row_distinct(flat[sm], rows[sm], n)
        k2, r2 = _gram_keys(flat, rows, 2)
        _, _, top2 = _per_row_distinct(k2, r2, n)
        k3, r3 = _gram_keys(flat, rows, 3)
        t3, d3, _ = _per_row_distinct(k3, r3, n)
        dup3 = t3 - d3
        wc = pc.cast(pc.utf8_length(pc.replace_substring_regex(
            pc.fill_null(batch[text_col], ""), r"\s", "")), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        bits = (
            (n_tok < min_tokens).astype(np.int64)
            | ((n_tok > max_tokens).astype(np.int64) << 1)
            | ((wc < min_mean_len * n_tok).astype(np.int64) << 2)
            | ((wc > max_mean_len * n_tok).astype(np.int64) << 3)
            | ((n_stop_dist < min_stop_distinct).astype(np.int64) << 4)
            | ((100 * top2 > top_bigram_pct
                * np.maximum(n_tok - 1, 0)).astype(np.int64) << 5)
            | ((100 * dup3 > dup_trigram_pct
                * np.maximum(n_tok - 2, 0)).astype(np.int64) << 6))
        if keep_filter:
            return batch.filter(pa.array(bits == 0))
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "n_tokens": pa.array(n_tok),
            "word_chars": pa.array(wc, pa.int64()),
            "n_stop_distinct": pa.array(n_stop_dist),
            "top_bigram_count": pa.array(top2),
            "n_dup_trigrams": pa.array(dup3),
            "rule_bits": pa.array(bits, pa.int64()),
            "keep": pa.array((bits == 0).astype(np.int64), pa.int64())})

    return ds.select_columns([id_col, text_col]).map_batches(
        verdicts, batch_format="pyarrow", batch_size=batch_size)


__all__ = ["TextStatsStage", "text_stats", "lang_histogram",
           "compression_ratio",
           "repetition_stats", "decontaminate", "pii_scrub",
           "gopher_quality", "GOPHER_RULES",
           "PII_PATTERNS", "LANG_MARKERS"]


def compression_ratio(ds: ray.data.Dataset, id_col: str = "doc_id",
                      text_col: str = "text", level: int = 6,
                      batch_size: int = 4096) -> ray.data.Dataset:
    """zlib-compressibility quality signal: (id, n_bytes,
    n_compressed, ratio_u) with ``ratio_u = n_compressed * 1e6 //
    max(n_bytes, 1)`` (int fixed-point; LOW = highly
    repetitive/templated text).  The MassiveText/RefinedWeb-family
    pipelines threshold on exactly this to drop boilerplate that
    n-gram repetition rules miss.

    Streaming map, no shuffle; the per-row ``zlib.compress`` is a
    C call per document (there is no vectorized zlib) — the bytes
    never leave the batch, only the 4 int64 stats columns do.  No SQL
    analogue exists (DuckDB has no zlib), so the driver entry is
    rows-only and the kernel is pytest-gated against direct zlib."""
    import zlib

    def stats(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        raw = np.fromiter(
            (len((t or "").encode("utf-8")) for t in texts),
            np.int64, len(texts))
        comp = np.fromiter(
            (len(zlib.compress((t or "").encode("utf-8"), level))
             for t in texts), np.int64, len(texts))
        return pa.table({
            id_col: batch[id_col],
            "n_bytes": pa.array(raw),
            "n_compressed": pa.array(comp),
            "ratio_u": pa.array(comp * 1_000_000
                                // np.maximum(raw, 1))})

    return ds.select_columns([id_col, text_col]).map_batches(
        stats, batch_format="pyarrow", batch_size=batch_size)
