"""Pipeline-stage registry (SURVEY §2.9 user-extension surface).

The reference sketches — but never implements — three extension hooks:
an abstract ``SplitTool::cut()`` tokenizer interface
(`include/Dictionary/SplitTool.hpp:7-10`), a dependency-injected index
loader (`include/Dictionary/KeyRecommander.hpp:19-23`), and the
MapReduce skeleton's unused ``mapf``/``reducef`` UDF parameters
(`src/MapReduce/woker.cc:78-82`).  This module is the working
equivalent for the Ray engine: named registries for the three stages a
user most plausibly swaps —

- ``tokenizer``: ``factory(stop_words=..., apply_stop=...) -> counter``
  where the counter exposes ``doc_counts(text) -> Counter`` (and is
  used batch-wise by the prep/tokenize stages).  Selected by
  ``EngineConfig.tokenizer``; the name is part of the config
  fingerprint, so changing it invalidates lineage checkpoints.
- ``dedup``: ``policy(docs_raw, cfg, files=None) -> edges DataFrame
  (id_a, id_b)`` — the near-duplicate edge generator the build's
  connected-components/drop step consumes.  Selected by
  ``EngineConfig.dedup_policy``.
- ``scorer``: ``fn(engine, sentence, k) -> list[dict]`` — dispatched by
  ``QueryEngine.topk(sentence, scorer=name)``; the callable receives
  the engine facade (actor pool, meta) and runs driver-side.

Resolution happens on the DRIVER and the resolved callable is shipped
to workers by value (cloudpickle), so custom stages registered in user
code work without being importable on every worker.
"""

from __future__ import annotations

from collections import Counter
from typing import Callable

_KINDS = ("tokenizer", "scorer", "dedup")
_REGISTRIES: dict[str, dict[str, Callable]] = {k: {} for k in _KINDS}


def register(kind: str, name: str) -> Callable[[Callable], Callable]:
    """Decorator: ``@register("tokenizer", "mine")``."""
    if kind not in _REGISTRIES:
        raise ValueError(f"unknown registry kind {kind!r}; one of {_KINDS}")

    def deco(fn: Callable) -> Callable:
        _REGISTRIES[kind][name] = fn
        return fn

    return deco


def resolve(kind: str, name: str) -> Callable:
    if kind not in _REGISTRIES:
        raise ValueError(f"unknown registry kind {kind!r}; one of {_KINDS}")
    try:
        return _REGISTRIES[kind][name]
    except KeyError:
        raise KeyError(
            f"no {kind} named {name!r}; registered: "
            f"{sorted(_REGISTRIES[kind])}") from None


def available(kind: str) -> list[str]:
    if kind not in _REGISTRIES:
        raise ValueError(f"unknown registry kind {kind!r}; one of {_KINDS}")
    return sorted(_REGISTRIES[kind])


# ---- built-in tokenizers --------------------------------------------------

@register("tokenizer", "ref")
def _ref_tokenizer(stop_words=(), apply_stop: bool = True):
    """The reference-exact M2+M3+M4+M5 tokenizer (default)."""
    from .stages.tokenizer import TokenCounter
    return TokenCounter(stop_words=stop_words, apply_stop=apply_stop)


class WhitespaceCounter:
    """Plain lowercase whitespace tokenizer — the simplest alternative
    stage, used to prove the injection path end-to-end (a swapped
    tokenizer changes term_df/postings and the fingerprint)."""

    def __init__(self, stop_words=(), apply_stop: bool = True):
        self.stop = frozenset(stop_words) if apply_stop else frozenset()

    def doc_counts(self, text: str) -> Counter:
        return Counter(
            t for t in text.lower().split() if t and t not in self.stop)


@register("tokenizer", "whitespace")
def _ws_tokenizer(stop_words=(), apply_stop: bool = True):
    return WhitespaceCounter(stop_words=stop_words, apply_stop=apply_stop)


# ---- built-in dedup policies ----------------------------------------------

@register("dedup", "simhash")
def _simhash_policy(docs_raw, cfg, files=None):
    """Default A3/A4 policy: simhash hamming<=n candidate edges."""
    from .stages.dedup import simhash_near_dup_edges
    return simhash_near_dup_edges(docs_raw, cfg.num_bands,
                                  cfg.hamming_threshold, files=files)


@register("dedup", "exact_simhash")
def _exact_simhash_policy(docs_raw, cfg, files=None):
    """Exact-fingerprint-equality only (hamming threshold 0)."""
    from .stages.dedup import simhash_near_dup_edges
    return simhash_near_dup_edges(docs_raw, cfg.num_bands, 0, files=files)


@register("dedup", "none")
def _no_dedup_policy(docs_raw, cfg, files=None):
    import pandas as pd
    return pd.DataFrame({"id_a": [], "id_b": []}, dtype="int64")


# ---- built-in scorers -----------------------------------------------------

@register("scorer", "bm25")
def _bm25_scorer(engine, sentence: str, k=None):
    return engine.bm25_topk(sentence, k)


@register("scorer", "ref_cosine")
@register("scorer", "ref")          # historical alias
def _ref_cosine_scorer(engine, sentence: str, k=None):
    return engine.ref_cosine_topk(sentence, k)
