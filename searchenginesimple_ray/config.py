"""Engine configuration.

Replaces the reference's fixed-shape JSON config `conf/files.json:1-11`
(text dirs / stop files / zone count / output path, loaded at
`include/Dictionary/Dictionary.hpp:148-170` and
`include/Page/Page.hpp:390-403`) with an explicit dataclass.  Defaults
mirror the reference's hard-coded constants where one exists
(zone=10, top-k=10, simhash topN=5, hamming<=3).
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, field, asdict


# The reference loads stop words from config files (`Page.hpp:395-402`).
# We ship a fixed 50-term English stop list as the default (shared with
# the fixture corpus generator, FIXTURES.md F1 — the near-dup hamming
# guarantee is verified at generation time under THIS set); it is part
# of the engine config fingerprint so lineage invalidates on change.
DEFAULT_STOP_WORDS = (
    "the a an and or of to in is are was were be been on at by for with as "
    "it this that these those from not no yes if then else when while do "
    "does did done has have had having i you he she we they them his"
).split()
assert len(DEFAULT_STOP_WORDS) == 50


@dataclass
class EngineConfig:
    # bump when a pipeline change alters checkpoint SCHEMAS/semantics —
    # part of the lineage fingerprint, so stale checkpoints invalidate
    pipeline_version: int = 2

    # ---- partitioning ----
    num_doc_shards: int = 8          # postings + doc_stats partition: doc_id % D
    num_term_shards: int = 10        # dict "zone" parity: fnv1a(term) % S (conf/files.json:9)
    num_input_buckets: int = 4       # resumable build granularity over the input file list

    # ---- doc prep ----
    min_text_len: int = 10           # drop shorter turns (Page.hpp:143-146 analogue, M8)
    stop_words: tuple = tuple(DEFAULT_STOP_WORDS)
    # registry.py names (§2.9 user-extension surface) — part of the
    # fingerprint, so swapping a stage invalidates lineage checkpoints
    tokenizer: str = "ref"           # registry "tokenizer" entry
    dedup_policy: str = "simhash"    # registry "dedup" entry (A4 edges)

    # ---- simhash / dedup ----
    simhash_top_n: int = 0           # 0 = all-term simhash (default);
                                     # 5 = reference keyword count (Page.hpp:94)
    hamming_threshold: int = 3       # near-dup bits (Simhasher.hpp:109)
    num_bands: int = 4               # pigeonhole bands over 64-bit simhash
    dedup_enabled: bool = True       # False: skip A3/A4 entirely (keeps the
                                     # index SQL-oracle-checkable — simhash
                                     # equality has false positives no SQL
                                     # can reproduce)
    dedup_key_index: bool = False    # persist per-band SORTED key runs
                                     # (dedup/keys/band=K/run-*.parquet);
                                     # appends then probe only the delta's
                                     # key ranges (row-group pruned)
                                     # instead of re-scanning every
                                     # fingerprint — costs ~480 B/doc of
                                     # extra storage

    # ---- postings ----
    posting_block_size: int = 128    # docs per block-max block
    hot_term_df_threshold: int = 250_000   # per-doc-shard salt split beyond this local df
    # ---- scoring ----
    bm25_k1: float = 1.2
    bm25_b: float = 0.75
    top_k: int = 10                  # WebPageQuery.hpp:121

    # ---- execution ----
    tokenize_batch_size: int = 2048
    tokenize_concurrency: int = 8    # actor-pool size for the tokenizer stage
    simhash_concurrency: int = 8

    def fingerprint(self) -> str:
        """Stable hash of semantic config (used in lineage manifests)."""
        d = asdict(self)
        # execution knobs don't change results; exclude from fingerprint
        for k in ("tokenize_batch_size", "tokenize_concurrency", "simhash_concurrency"):
            d.pop(k, None)
        blob = json.dumps(d, sort_keys=True, default=list).encode()
        return hashlib.sha256(blob).hexdigest()[:16]
