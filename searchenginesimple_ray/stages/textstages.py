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
    """lang_pred -> doc count (groupby over the stage output)."""
    stats = text_stats(ds, text_col=text_col)
    return stats.groupby("lang_pred").count()


__all__ = ["TextStatsStage", "text_stats", "lang_histogram",
           "LANG_MARKERS"]
