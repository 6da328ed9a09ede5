"""Corpus-level filters driven by GLOBAL statistics.

Two training-data curation primitives the per-record filters
(``stages/textstages.py``) cannot express, because the keep decision
depends on an aggregate over the whole corpus:

- ``bad_source_filter``: drop every document from the N lowest-quality
  SOURCES (quality = per-source mean of a metric column) — the
  source-level blocklist step of CCNet/C4-style pipelines, where a
  domain whose average quality is poor is removed wholesale.
- ``outlier_clip``: keep only documents whose whitespace-token count
  lies inside a global [q_lo, q_hi] exact-quantile band — length
  outlier removal.

Both share the same 100-TB shape: PASS 1 reduces the corpus to a tiny
aggregate (one row per source / one row per distinct token count —
bounded by source count / max doc length, NOT corpus size), the keep
rule is decided once on the driver, and PASS 2 is a pure streaming
filter against a broadcast decision (``ray.put`` once, read per task).
Rows never shuffle; nothing materializes.

Determinism: source ranking compares scaled-integer means
(``sum*SCALE // n``, identical to BIGINT SQL integer division) and the
quantile rule is DuckDB ``quantile_disc`` (smallest value with
cumulative count >= ceil(q*n)); q_lo/q_hi default to 1/16-multiples so
``ceil(q*n)`` has no float-boundary ambiguity vs the SQL oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

# fixed-point scale for mean comparisons (4 decimal digits)
MEAN_SCALE = 10_000


def source_mean_table(ds: ray.data.Dataset, group_col: str,
                      metric_col: str) -> pd.DataFrame:
    """One row per source: (group, n_docs, sum_metric, scaled_mean).

    Per-batch Arrow group_by partials -> driver merge; the exchange
    carries one row per (source, block)."""

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"g": batch[group_col],
                      "m": batch[metric_col].cast(pa.int64())})
        return t.group_by("g").aggregate([("m", "sum"), ("m", "count")]) \
            .rename_columns(["g", "s", "n"])

    part = ds.select_columns([group_col, metric_col]) \
        .map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = part.groupby("g", as_index=False).sum()
    s = agg["s"].to_numpy().astype(np.int64)
    if len(s) and s.max() > (2**63 - 1) // MEAN_SCALE:
        # a single source holding > ~900 TB of metric mass would wrap
        # the fixed-point multiply; fail loudly (the SQL oracle's
        # HUGEINT->BIGINT cast raises at the same point)
        raise OverflowError(
            "source metric sum too large for the x10000 fixed-point "
            "mean; reduce MEAN_SCALE or pre-scale the metric")
    agg["scaled_mean"] = (s * MEAN_SCALE) // agg["n"].to_numpy()
    return agg


def bad_source_filter(ds: ray.data.Dataset, group_col: str = "source",
                      metric_col: str = "n_chars",
                      key_col: str = "doc_id",
                      n_drop: int = 3) -> ray.data.Dataset:
    """Drop all docs of the ``n_drop`` sources with the LOWEST scaled
    integer mean of ``metric_col`` (ties broken by source name, so the
    blocklist is total-order deterministic).  Returns the kept
    (key_col, group_col) rows as a streaming filter."""
    agg = source_mean_table(ds, group_col, metric_col)
    order = agg.sort_values(["scaled_mean", "g"], kind="mergesort")
    blocked = frozenset(order["g"].head(n_drop).tolist())
    blocked_ref = ray.put(pa.array(sorted(blocked)))

    def keep(batch: pa.Table, ref=None) -> pa.Table:
        bad = pc.is_in(batch[group_col], value_set=ray.get(ref))
        return batch.filter(pc.invert(bad))

    return ds.select_columns([key_col, group_col]) \
        .map_batches(keep, batch_format="pyarrow",
                     fn_kwargs={"ref": blocked_ref})


def token_count_cuts(hist: pd.DataFrame, q_lo: float,
                     q_hi: float) -> tuple[int, int]:
    """quantile_disc cut values from a (v, n) histogram frame."""
    hist = hist.sort_values("v")
    v = hist["v"].to_numpy()
    cum = hist["n"].to_numpy().cumsum()
    n = int(cum[-1])
    lo_rank = max(int(np.ceil(q_lo * n)), 1)
    hi_rank = max(int(np.ceil(q_hi * n)), 1)
    return (int(v[np.searchsorted(cum, lo_rank)]),
            int(v[np.searchsorted(cum, hi_rank)]))


def outlier_clip(ds: ray.data.Dataset, text_col: str = "text",
                 key_col: str = "doc_id", q_lo: float = 1 / 16,
                 q_hi: float = 15 / 16) -> ray.data.Dataset:
    """Keep docs whose whitespace-token count is within the global
    exact [q_lo, q_hi] quantile_disc band (inclusive both ends).

    PASS 1 is the bounded-domain histogram combine of
    ``sketches.token_count_quantiles`` without the group key: one
    exchange row per distinct token count.  Returns kept
    (key_col, n_tokens) rows."""

    def hist_partial(batch: pa.Table) -> pa.Table:
        n_tok = pc.count_substring_regex(batch[text_col], r"\S+")
        t = pa.table({"v": n_tok.cast(pa.int64())})
        return t.group_by("v").aggregate([("v", "count")]) \
            .rename_columns(["v", "n"])

    part = ds.select_columns([text_col]) \
        .map_batches(hist_partial, batch_format="pyarrow").to_pandas()
    hist = part.groupby("v", as_index=False)["n"].sum()
    lo, hi = token_count_cuts(hist, q_lo, q_hi)

    def keep(batch: pa.Table) -> pa.Table:
        n_tok = pc.count_substring_regex(batch[text_col], r"\S+") \
            .cast(pa.int64())
        m = pc.and_(pc.greater_equal(n_tok, lo), pc.less_equal(n_tok, hi))
        return pa.table({key_col: batch[key_col],
                         "n_tokens": n_tok}).filter(m)

    return ds.select_columns([key_col, text_col]) \
        .map_batches(keep, batch_format="pyarrow")


__all__ = ["bad_source_filter", "outlier_clip", "source_mean_table",
           "token_count_cuts", "MEAN_SCALE"]
