"""Deterministic global doc-id assignment (A5).

The reference assigns docids sequentially in single-process arrival
order (`include/Page/Page.hpp:156-157`).  The distributed replacement
(SURVEY §2.4 A5, §7.5) fixes global order = ``(conv_id, turn_idx)``:

1. a cheap metadata pass reads ONLY ``(conv_id, turn_idx)`` columns and
   computes per-conversation turn capacity (max turn_idx + 1);
2. an exclusive prefix sum over conversations sorted by ``conv_id``
   yields each conversation's base offset;
3. ``doc_id = base[conv_id] + turn_idx`` — assigned per batch with a
   broadcast lookup (``ray.put`` once, read per actor/task), no sort of
   the full data and no shuffle of the text payload.

Scale note: the base table has one row per conversation.  At 10^12-turn
scale (~10^10 convs) the broadcast dict is replaced by a hash-bucketed
join of the base table against the input keyed by ``conv_id`` (same
deterministic ids); the broadcast path implemented here is the
small/medium-cluster fast path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def conv_bases(transcripts: ray.data.Dataset) -> dict[str, int]:
    """conv_id -> exclusive-prefix-sum base offset (deterministic)."""
    return conv_bases_and_ceiling(transcripts)[0]


def conv_bases_and_ceiling(
        transcripts: ray.data.Dataset) -> tuple[dict[str, int], int]:
    """Like ``conv_bases`` but also returns the docid CEILING (one past
    the last assignable id) — the append point for incremental index
    updates."""

    def partial_max(batch: pa.Table) -> pa.Table:
        # per-batch partial: max turn_idx per conv (convs are contiguous in
        # well-formed input but we do not rely on it)
        import pyarrow.compute as pc  # noqa: F401
        conv = batch["conv_id"].to_numpy(zero_copy_only=False)
        tidx = batch["turn_idx"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(conv, return_inverse=True)
        mx = np.zeros(len(uniq), dtype=np.int64)
        np.maximum.at(mx, inv, tidx.astype(np.int64))
        return pa.table({"conv_id": pa.array(uniq, pa.string()),
                         "max_turn": pa.array(mx, pa.int64())})

    partials = transcripts.select_columns(["conv_id", "turn_idx"]).map_batches(
        partial_max, batch_format="pyarrow")
    agg = partials.groupby("conv_id").max("max_turn")
    pdf = agg.to_pandas()  # one row per conversation — small relative to turns
    col = "max(max_turn)" if "max(max_turn)" in pdf.columns else "max_turn"
    pdf = pdf.sort_values("conv_id").reset_index(drop=True)
    sizes = (pdf[col].to_numpy() + 1).astype(np.int64)
    bases = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    ceiling = int(sizes.sum())
    return dict(zip(pdf["conv_id"].tolist(), bases.tolist())), ceiling


class AssignDocIds:
    """Actor-pool stage: stamp ``doc_id = base[conv_id] + turn_idx``.

    The base map is fetched from the object store once per actor
    (broadcast via ``ray.put``), not re-shipped per batch.  It may be
    a ``conv_id -> base`` dict or, preferred, a ``(sorted conv array,
    base array)`` pair — the array form pickles ~10x faster through
    the object store and turns per-batch lookups into one vectorized
    ``searchsorted``.
    """

    def __init__(self, bases_ref):
        bases = bases_ref if isinstance(bases_ref, (dict, tuple)) \
            else ray.get(bases_ref)
        if isinstance(bases, dict):
            conv = np.array(sorted(bases), dtype=object)
            base = np.array([bases[c] for c in conv], dtype=np.int64)
        else:
            conv, base = bases
        self.conv, self.base = conv, base

    def __call__(self, batch: pa.Table) -> pa.Table:
        conv = batch["conv_id"].to_numpy(zero_copy_only=False)
        tidx = batch["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, inv = np.unique(conv, return_inverse=True)
        pos = np.searchsorted(self.conv, uniq)
        pos_c = np.clip(pos, 0, len(self.conv) - 1)
        if len(self.conv) == 0 or not (self.conv[pos_c] == uniq).all():
            missing = uniq if len(self.conv) == 0 else \
                uniq[self.conv[pos_c] != uniq]
            raise KeyError(
                f"{len(missing)} conv_id(s) missing from the base map "
                f"(e.g. {missing[:3].tolist()})")
        base_u = self.base[pos_c]
        doc_id = base_u[inv] + tidx
        return batch.append_column("doc_id", pa.array(doc_id, pa.int64()))


def assign_doc_ids(transcripts: ray.data.Dataset,
                   bases: dict[str, int] | None = None) -> ray.data.Dataset:
    if bases is None:
        bases = conv_bases(transcripts)
    ref = ray.put(bases)
    return transcripts.map_batches(AssignDocIds, fn_constructor_args=(ref,),
                                   batch_format="pyarrow", concurrency=(1, 4))
