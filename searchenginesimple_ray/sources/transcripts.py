"""Deterministic synthetic transcript corpus (FIXTURES.md F1/F2).

Schema per BASELINE.json ``input_hint``::

    transcripts(conv_id: string, turn_idx: int32, role: string,
                text: string, tool: string, ts: timestamp[us])

Pure function of ``(seed, n_convs, ...)``; no external data.  Injected,
seeded properties recorded in a ``truth_duplicates`` sidecar:

- ~1% exact duplicate turns (byte-identical text, different key) — A3;
- ~1% near duplicates crafted so simhash hamming distance <= 3
  (verified at generation time by retrying candidate edits) — A4/T3;
- short texts (len < 10) exercising the drop rule (M8 analogue);
- hot terms: the top-5 vocab terms appear in >30% of turns (skew);
- a fixed 50-term stop list (build-side filter M5).

Vectorized generation (numpy Zipf-ish sampling over a 5k vocab with ~2%
CJK tokens) so bench-scale corpora (millions of turns) generate in
seconds; output is written as ``n_files`` parquet files (the resumable
build's input buckets are file ranges).  A params manifest makes
regeneration idempotent: matching manifest => reuse on-disk corpus.
"""

from __future__ import annotations

import json
import os
import string

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.hashing import hamming64
from ..functions.simhash import simhash_of_text

# fixed 50-term stop list (FIXTURES F1) — the SAME set as the engine
# default config, so hamming guarantees verified at generation time hold
# inside the build pipeline; all lowercase => M4-transform stable
from ..config import DEFAULT_STOP_WORDS

STOP_50 = list(DEFAULT_STOP_WORDS)
assert len(STOP_50) == 50

ROLES = np.array(["user", "assistant", "system", "tool"])
TOOLS = np.array(["", "bash", "search", "browser", "editor"])
TS_BASE_US = 1_700_000_000_000_000  # fixed epoch base (2023-11-14), no wall clock


def make_vocab(size: int = 5000, seed: int = 42, cjk: int = 120) -> list[str]:
    """Deterministic lowercase-ASCII vocab + ``cjk`` single CJK chars."""
    rng = np.random.default_rng(seed)
    letters = np.array(list(string.ascii_lowercase))
    words: list[str] = []
    seen = set(STOP_50)
    while len(words) < size - cjk:
        ln = int(rng.integers(3, 10))
        w = "".join(rng.choice(letters, ln))
        if w not in seen:
            seen.add(w)
            words.append(w)
    cjk_words = [chr(0x4E00 + 7 * i + 3) for i in range(cjk)]
    return words[: size - cjk] + cjk_words


def _zipf_probs(n: int, s: float = 1.1) -> np.ndarray:
    p = 1.0 / np.arange(1, n + 1) ** s
    return p / p.sum()


def generate_transcripts(
    out_dir: str,
    n_convs: int = 200,
    seed: int = 42,
    min_turns: int = 4,
    max_turns: int = 16,
    n_files: int = 8,
    vocab_size: int = 5000,
    skew_hot_frac: float = 0.0,
    conv_prefix: str = "conv-",
) -> str:
    """Generate (or reuse) the corpus under ``out_dir``.  Returns out_dir.

    ``skew_hot_frac > 0`` prepends the hottest vocab term to that
    fraction of turns (e.g. 0.5 => one term in half of all docs) — the
    skew fixture for the hot-term salt path."""
    params = dict(n_convs=n_convs, seed=seed, min_turns=min_turns,
                  max_turns=max_turns, n_files=n_files, vocab_size=vocab_size,
                  skew_hot_frac=skew_hot_frac, conv_prefix=conv_prefix,
                  version=7)
    manifest_path = os.path.join(out_dir, "_corpus_manifest.json")
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            if json.load(f) == params:
                return out_dir
    os.makedirs(out_dir, exist_ok=True)

    rng = np.random.default_rng(seed)
    vocab = np.array(make_vocab(vocab_size, seed))
    probs = _zipf_probs(vocab_size)
    stop_arr = np.array(STOP_50)

    n_turns_per_conv = rng.integers(min_turns, max_turns + 1, size=n_convs)
    total = int(n_turns_per_conv.sum())
    conv_ids = np.repeat(
        np.array([f"{conv_prefix}{i:06d}" for i in range(n_convs)]), n_turns_per_conv
    )
    turn_idx = np.concatenate([np.arange(n) for n in n_turns_per_conv]).astype(np.int32)

    # roles: alternate user/assistant, ~5% system, ~8% tool
    role_pick = rng.random(total)
    roles = np.where(turn_idx % 2 == 0, "user", "assistant").astype(object)
    roles[role_pick < 0.05] = "system"
    tool_rows = role_pick > 0.92
    roles[tool_rows] = "tool"
    tools = np.full(total, "", dtype=object)
    tools[tool_rows] = rng.choice(TOOLS[1:], size=int(tool_rows.sum()))

    # token counts per turn; hot terms = vocab[0:5] (Zipf head) appear in
    # >30% of turns by construction; ~10% of tokens are stop words; CJK
    # tokens ride in via the vocab tail (~2% of the vocab mass is adjusted
    # by explicit substitution below)
    n_tok = rng.integers(5, 46, size=total)
    tok_total = int(n_tok.sum())
    tok_idx = rng.choice(vocab_size, size=tok_total, p=probs)
    toks = vocab[tok_idx].astype(object)
    stop_mask = rng.random(tok_total) < 0.10
    toks[stop_mask] = rng.choice(stop_arr, size=int(stop_mask.sum()))
    cjk_mask = rng.random(tok_total) < 0.02
    toks[cjk_mask] = rng.choice(vocab[vocab_size - 120:], size=int(cjk_mask.sum()))

    offsets = np.concatenate([[0], np.cumsum(n_tok)])
    texts = np.empty(total, dtype=object)
    toks_list = toks.tolist()
    for i in range(total):
        texts[i] = " ".join(toks_list[offsets[i]:offsets[i + 1]])

    if skew_hot_frac > 0:
        # prepend the Zipf-head term to a fixed fraction of turns
        # BEFORE duplicate crafting, so truth-pair hamming guarantees
        # are computed over the final texts
        skew_rows = rng.random(total) < skew_hot_frac
        hot_w = str(vocab[0])
        for i in np.flatnonzero(skew_rows):
            texts[i] = hot_w + " " + texts[i]

    # short texts (~0.5%): dropped by the min_text_len rule
    short_mask = rng.random(total) < 0.005
    texts[short_mask] = "ok"

    # exact duplicates (~1%): copy an earlier turn's text verbatim.
    # ``taken`` protects every position participating in a truth pair
    # (dup OR src) from later mutation, preserving recorded relations.
    stop_set = frozenset(STOP_50)
    truth_rows = []
    taken: set[int] = set()
    eligible = np.flatnonzero(~short_mask)
    pool = eligible[eligible > 10]
    n_exact = min(max(1, int(0.01 * total)), len(pool))
    dup_pos = rng.choice(pool, size=n_exact, replace=False)
    taken.update(int(p) for p in dup_pos)
    # ascending: a src that is itself a dup position is then already
    # FINAL when copied (unsorted iteration could overwrite texts[src]
    # after the pair was recorded, breaking the byte-identity truth)
    for p in sorted(int(x) for x in dup_pos):
        src = int(rng.integers(0, p))
        if short_mask[src]:
            continue
        texts[p] = texts[src]
        taken.add(src)
        truth_rows.append((conv_ids[p], int(turn_idx[p]), conv_ids[src],
                           int(turn_idx[src]), "exact", 0))

    # near duplicates (~1%): craft edits verified to keep simhash within
    # hamming <= 3 of the source (retry over candidate edits).  Verified
    # under the engine's stop-word set — the build pipeline computes
    # simhash on stop-filtered term frequencies, so the guarantee must
    # hold in that space.
    n_near = max(1, int(0.01 * total))
    near_pos = [int(p) for p in rng.choice(
                    pool, size=min(3 * n_near, len(pool)), replace=False)
                if int(p) not in taken][:n_near]
    made = 0
    for p in near_pos:
        if p in taken:
            # p became the SRC of an earlier near pair during this
            # loop; mutating it now would invalidate that pair's
            # recorded hamming guarantee
            continue
        src = int(rng.integers(0, p))
        if short_mask[src] or src in taken:
            continue
        base = str(texts[src])
        h_src = simhash_of_text(base, stop_words=stop_set)
        if h_src == 0:
            continue
        base_toks = base.split(" ")
        candidates = []
        # edit 1: append a fresh rare token (usually leaves top-5 intact)
        candidates.append(base + " " + str(vocab[vocab_size - 121]))
        # edit 2..4: drop one low-frequency token
        for j in (len(base_toks) - 1, len(base_toks) // 2, 0):
            if len(base_toks) > 6:
                candidates.append(" ".join(base_toks[:j] + base_toks[j + 1:]))
        # edit 5: swap two adjacent tokens (tf-invariant => simhash equal)
        if len(base_toks) > 3:
            sw = base_toks[:]
            sw[0], sw[1] = sw[1], sw[0]
            candidates.append(" ".join(sw))
        for cand in candidates:
            if cand == base:
                continue
            h_cand = simhash_of_text(cand, stop_words=stop_set)
            if int(hamming64(h_cand, h_src)) <= 3:
                texts[p] = cand
                truth_rows.append((conv_ids[p], int(turn_idx[p]), conv_ids[src],
                                   int(turn_idx[src]), "near",
                                   int(hamming64(h_cand, h_src))))
                taken.add(p)
                taken.add(src)
                made += 1
                break

    # timestamps: base + 1h per conv + 1s per turn (monotone per conv)
    conv_num = np.repeat(np.arange(n_convs, dtype=np.int64), n_turns_per_conv)
    ts = TS_BASE_US + conv_num * 3_600_000_000 + turn_idx.astype(np.int64) * 1_000_000

    table = pa.table({
        "conv_id": pa.array(conv_ids, pa.string()),
        "turn_idx": pa.array(turn_idx, pa.int32()),
        "role": pa.array(roles, pa.string()),
        "text": pa.array(texts, pa.string()),
        "tool": pa.array(tools, pa.string()),
        "ts": pa.array(ts, pa.timestamp("us")),
    })

    # n_files parquet files split on conv boundaries (input buckets)
    file_conv_edges = np.linspace(0, n_convs, n_files + 1).astype(int)
    row_edges = np.concatenate([[0], np.cumsum(n_turns_per_conv)])
    for f in range(n_files):
        lo, hi = row_edges[file_conv_edges[f]], row_edges[file_conv_edges[f + 1]]
        pq.write_table(table.slice(lo, hi - lo),
                       os.path.join(out_dir, f"part-{f:04d}.parquet"))

    truth = pa.table({
        "dup_conv_id": pa.array([r[0] for r in truth_rows], pa.string()),
        "dup_turn_idx": pa.array([r[1] for r in truth_rows], pa.int32()),
        "src_conv_id": pa.array([r[2] for r in truth_rows], pa.string()),
        "src_turn_idx": pa.array([r[3] for r in truth_rows], pa.int32()),
        "kind": pa.array([r[4] for r in truth_rows], pa.string()),
        "hamming": pa.array([r[5] for r in truth_rows], pa.int32()),
    })
    pq.write_table(truth, os.path.join(out_dir, "_truth_duplicates.parquet"))
    with open(manifest_path, "w") as f:
        json.dump(params, f)
    return out_dir


def generate_queries(seed: int = 42, n_queries: int = 100,
                     vocab_size: int = 5000) -> list[str]:
    """Reference query set (FIXTURES F2): hot / rare / absent / mixed-case
    / CJK / stop-word-bearing queries, 1-6 tokens each."""
    rng = np.random.default_rng(seed + 1)
    vocab = make_vocab(vocab_size, seed)
    hot = vocab[:5]
    rare = vocab[vocab_size // 2: vocab_size // 2 + 200]
    cjk = vocab[-120:]
    absent = ["zzzzabsent", "qqqmissing"]
    queries = []
    for i in range(n_queries):
        kind = i % 6
        n = int(rng.integers(1, 7))
        if kind == 0:
            toks = list(rng.choice(hot, n))
        elif kind == 1:
            toks = list(rng.choice(rare, n))
        elif kind == 2:
            toks = list(rng.choice(hot, max(1, n - 1))) + [absent[i % 2]]
        elif kind == 3:  # mixed-case: exercises the fold quirk (G7)
            toks = [w.capitalize() if j % 2 == 0 else w
                    for j, w in enumerate(rng.choice(vocab[:200], n))]
        elif kind == 4:
            toks = list(rng.choice(cjk, n))
        else:  # stop-word-bearing (no query-side stop filter)
            toks = list(rng.choice(STOP_50, max(1, n - 2))) + list(rng.choice(hot, 2))
        queries.append(" ".join(str(t) for t in toks))
    return queries


def transcripts_files(corpus_dir: str) -> list[str]:
    """Sorted data files of a generated corpus (bucket-able input list)."""
    return sorted(
        os.path.join(corpus_dir, f) for f in os.listdir(corpus_dir)
        if f.startswith("part-") and f.endswith(".parquet")
    )


# -------------------------------------------------- alternate sources

TRANSCRIPT_SCHEMA = {
    "conv_id": "string", "turn_idx": "int32", "role": "string",
    "text": "string", "tool": "string", "ts": "timestamp[us]",
}


def read_transcripts_jsonl(paths: list[str] | str):
    """JSONL transcripts source -> Dataset with the canonical schema.

    Training-data drops commonly land as JSONL before any parquet
    conversion; this reader lets the same build pipeline ingest them
    directly.  Each line is an object with the ``input_hint`` fields;
    ``ts`` accepts epoch micros (int) or ISO-8601 strings.  The
    normalization is a vectorized Arrow cast per batch — the read
    itself streams via ``ray.data.read_json`` (one block per file
    chunk, same backpressure as the parquet path).
    """
    import pyarrow.compute as pc

    import ray.data

    def normalize(batch: pa.Table) -> pa.Table:
        cols = {}
        for name in ("conv_id", "role", "text", "tool"):
            c = batch[name] if name in batch.column_names else \
                pa.nulls(batch.num_rows, pa.string())
            cols[name] = pc.cast(c, pa.string())
        cols["turn_idx"] = pc.cast(batch["turn_idx"], pa.int32())
        ts = batch["ts"] if "ts" in batch.column_names else \
            pa.nulls(batch.num_rows, pa.int64())
        # one cast covers every landed shape: epoch micros, inferred
        # timestamps, and ISO strings WITH fractional seconds (a fixed
        # strptime format would silently null the fractional ones)
        cols["ts"] = pc.cast(ts, pa.timestamp("us"))
        order = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
        return pa.table({k: cols[k] for k in order})

    ds = ray.data.read_json(paths)
    return ds.map_batches(normalize, batch_format="pyarrow")


def read_transcripts_csv(paths: list[str] | str):
    """CSV transcripts source -> Dataset with the canonical schema.

    The third common landing format (after parquet and JSONL); the
    same vectorized normalization as ``read_transcripts_jsonl`` runs
    per batch, so ``ts`` accepts epoch micros or ISO strings and
    missing optional columns null-fill.  Streams via
    ``ray.data.read_csv`` (Arrow CSV reader, block-per-chunk
    backpressure)."""
    import pyarrow.compute as pc

    import ray.data

    def normalize(batch: pa.Table) -> pa.Table:
        cols = {}
        for name in ("conv_id", "role", "text", "tool"):
            c = batch[name] if name in batch.column_names else \
                pa.nulls(batch.num_rows, pa.string())
            cols[name] = pc.cast(c, pa.string())
        cols["turn_idx"] = pc.cast(batch["turn_idx"], pa.int32())
        ts = batch["ts"] if "ts" in batch.column_names else \
            pa.nulls(batch.num_rows, pa.int64())
        cols["ts"] = pc.cast(ts, pa.timestamp("us"))
        order = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
        return pa.table({k: cols[k] for k in order})

    ds = ray.data.read_csv(paths)
    return ds.map_batches(normalize, batch_format="pyarrow")
