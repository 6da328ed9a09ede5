"""Transcript-native training-data operators: SFT pair extraction and
ordered conversation assembly.

The engine's input is the transcripts table of BASELINE.json's
``input_hint`` (conv_id, turn_idx, role, text, tool, ts).  These two
operators are what an LLM post-training pipeline runs over exactly
that shape:

- ``sft_pairs``: extract (user turn -> immediately-following assistant
  turn) prompt/response pairs — the supervised-fine-tuning example
  miner.  The LEAD()-window primitive per conversation.
- ``conv_assemble``: rebuild each conversation's full dialog in stable
  turn order (the "document assembly" step before long-context
  packing), verified by an order-sensitive digest.

Scale shape (100 TB): both need one conversation co-located and
turn-sorted, so they hash-partition on a COARSE ``hash(conv_id) %
n_buckets`` key — the same partitioning contract as
``stages/events.sessionize_events`` (a conversation must fit a bucket;
buckets scale with conversation count).  ``sft_pairs`` computes
per-turn lengths BEFORE the exchange so text never shuffles (rows are
~30 B); ``conv_assemble`` must move text by definition (its output is
a function of the concatenated bytes), which is the irreducible cost
of assembly — it still streams bucket-by-bucket and the digest is
computed without materializing more than one bucket at a time.

The reference engine has no transcript semantics (it indexes flat
pages, ``src/PageLib/``); these operators exist because the north
rule's corpus is conversational.
"""
from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

# whitespace-token count, matching the SQL oracle's
# length(regexp_extract_all(text, '\S+'))
_WS_TOKEN = r"\S+"


def _conv_bucket(conv: pa.ChunkedArray, n_buckets: int) -> pa.Array:
    """Coarse conversation bucket: FNV-1a over the *unique* conv_ids
    in the batch (turns repeat their conv_id heavily, so uniques ≪
    rows), gathered back — deterministic across workers/processes
    (``functions/hashing.fnv1a32_array``), never seen by the oracle."""
    from ..functions.hashing import fnv1a32_array
    return pa.array(fnv1a32_array(
        conv.to_numpy(zero_copy_only=False), num_shards=n_buckets))


def sft_pairs(ts: ray.data.Dataset, n_buckets: int = 64
              ) -> ray.data.Dataset:
    """(conv_id, prompt_turn_idx, prompt_chars, prompt_tokens,
    response_chars, response_tokens) for every adjacent turn pair
    where role(t) = 'user' and role(t+1) = 'assistant' and
    turn_idx(t+1) = turn_idx(t) + 1.

    Text never enters the exchange: per-turn char/token counts are
    computed vectorized inside the first ``map_batches`` and only
    (bucket, conv_id, turn_idx, role_bit, n_chars, n_tokens) rows
    shuffle (~40 B/row).  The pairing kernel is one lexsort + shifted
    compare per bucket.
    """

    def narrow(batch: pa.Table) -> pa.Table:
        # null text counts as '' (0 chars / 0 tokens) — without the
        # fill, nulls propagate through the counts and degrade the
        # int64 output columns to float64 NaN
        text = pc.fill_null(batch["text"], "")
        n_chars = pc.utf8_length(text).cast(pa.int64())
        # \S+ is greedy, so each non-overlapping match is one maximal
        # whitespace-delimited token — same count as the oracle's
        # length(regexp_extract_all(text, '\S+'))
        n_tokens = pc.count_substring_regex(text, _WS_TOKEN) \
            .cast(pa.int64())
        # 3-way role code — 'system'/'tool'/anything else must pair
        # with NOTHING (neither prompt nor response)
        role = batch["role"]
        role_code = pc.add(
            pc.equal(role, "user").cast(pa.int8()),
            pc.multiply(pc.equal(role, "assistant").cast(pa.int8()),
                        pa.scalar(2, pa.int8())))
        return pa.table({
            "bucket": _conv_bucket(batch["conv_id"], n_buckets),
            "conv_id": batch["conv_id"],
            "turn_idx": batch["turn_idx"].cast(pa.int64()),
            "role_code": role_code,
            "n_chars": n_chars,
            "n_tokens": n_tokens,
        })

    def pair_kernel(g: pd.DataFrame) -> pd.DataFrame:
        cols = ["conv_id", "prompt_turn_idx", "prompt_chars",
                "prompt_tokens", "response_chars", "response_tokens"]
        if not len(g):
            return pd.DataFrame({c: pd.Series(
                [], dtype=object if c == "conv_id" else np.int64)
                for c in cols})
        conv = g["conv_id"].to_numpy()
        tidx = g["turn_idx"].to_numpy()
        order = np.lexsort((tidx, conv))
        conv, tidx = conv[order], tidx[order]
        role = g["role_code"].to_numpy()[order]
        nc = g["n_chars"].to_numpy()[order]
        nt = g["n_tokens"].to_numpy()[order]
        if len(conv) < 2:
            return pd.DataFrame({c: pd.Series(
                [], dtype=object if c == "conv_id" else np.int64)
                for c in cols})
        same = conv[1:] == conv[:-1]
        adjacent = tidx[1:] == tidx[:-1] + 1
        ok = same & adjacent & (role[:-1] == 1) & (role[1:] == 2)
        i = np.flatnonzero(ok)
        return pd.DataFrame({
            "conv_id": conv[i],
            "prompt_turn_idx": tidx[i],
            "prompt_chars": nc[i],
            "prompt_tokens": nt[i],
            "response_chars": nc[i + 1],
            "response_tokens": nt[i + 1],
        })

    return ts.select_columns(["conv_id", "turn_idx", "role", "text"]) \
        .map_batches(narrow, batch_format="pyarrow") \
        .groupby("bucket").map_groups(pair_kernel, batch_format="pandas")


def conv_assemble(ts: ray.data.Dataset, n_buckets: int = 64,
                  sep: str = "\n") -> ray.data.Dataset:
    """(conv_id, n_turns, n_chars, dialog_md5): each conversation's
    turns joined by ``sep`` in turn_idx order, reduced to an
    order-sensitive md5 digest (the assembly-correctness witness —
    equal digests mean byte-identical ordered concatenation).

    Text MUST move here (the digest is a function of the bytes); the
    exchange is one coarse conv-bucket shuffle and each bucket's
    kernel joins per-conversation slices with one Arrow ``binary_join``
    after a single lexsort.  md5 per conversation is a C-speed call on
    the already-joined buffer — conversation-bounded, not
    turn-bounded.
    """

    def narrow(batch: pa.Table) -> pa.Table:
        return pa.table({
            "bucket": _conv_bucket(batch["conv_id"], n_buckets),
            "conv_id": batch["conv_id"],
            "turn_idx": batch["turn_idx"].cast(pa.int64()),
            # null turns assemble as '' — the digest stays total (the
            # SQL oracle spells the same rule: coalesce(text, ''))
            "text": pc.fill_null(batch["text"], ""),
        })

    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({
                "conv_id": pd.Series([], dtype=object),
                "n_turns": pd.Series([], dtype=np.int64),
                "n_chars": pd.Series([], dtype=np.int64),
                "dialog_md5": pd.Series([], dtype=object)})
        conv = g["conv_id"].to_numpy()
        tidx = g["turn_idx"].to_numpy()
        order = np.lexsort((tidx, conv))
        conv = conv[order]
        # large_string + int64 offsets: no int32 row cap, no 2 GB
        # bucket-text cap — a bucket is sized by the shuffle, not us
        texts = pa.array(g["text"].to_numpy()[order], pa.large_string())
        starts = np.flatnonzero(
            np.concatenate(([True], conv[1:] != conv[:-1])))
        ends = np.append(starts[1:], len(conv))
        # per-conversation ordered join in ONE Arrow kernel
        offsets = pa.array(np.concatenate((starts, [len(conv)]))
                           .astype(np.int64))
        lists = pa.LargeListArray.from_arrays(offsets, texts)
        joined = pc.binary_join(lists, pa.scalar(sep, pa.large_string()))
        n_chars = pc.utf8_length(joined).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        digests = [hashlib.md5(s.encode()).hexdigest()
                   for s in joined.to_pylist()]
        return pd.DataFrame({
            "conv_id": conv[starts],
            "n_turns": (ends - starts).astype(np.int64),
            "n_chars": n_chars,
            "dialog_md5": digests,
        })

    return ts.select_columns(["conv_id", "turn_idx", "text"]) \
        .map_batches(narrow, batch_format="pyarrow") \
        .groupby("bucket").map_groups(assemble, batch_format="pandas")
