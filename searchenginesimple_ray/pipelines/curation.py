"""End-to-end pretraining-data curation: quality filter -> exact
dedup -> deterministic split, composed from the engine's streaming
stages.

This is the composition a real LM data pipeline runs before
tokenization, expressed the Ray-Data-first way: every stage is a lazy
transform on the SAME streaming Dataset —

1. ``gopher_quality(keep_filter=True)`` — the 7 integer-exact Gopher
   rules as a pure per-batch filter (the verdict never leaves the
   batch: no join, no verdict materialization);
2. ``exact_dedup_first`` — first-wins exact text dedup; the text
   column never enters an exchange (double-64-bit hash keys, native
   count prefilter, winners resolved only for duplicate groups);
3. ``hash_split`` — stateless int64-exact multiplicative-hash split
   assignment (a streaming map, no RNG, no shuffle).

Between stages nothing materializes and no stage needs another pass
over the corpus; at 100 TB the whole chain is one streaming scan plus
the dedup candidate exchange (O(duplicate groups)).
"""

from __future__ import annotations

import pandas as pd
import ray.data



def _survivors(ds: ray.data.Dataset, stop_words, min_tokens: int,
               id_col: str, text_col: str,
               lm_centibits: int | None = None) -> ray.data.Dataset:
    """Shared chain core: Gopher keep filter -> (optional) unigram-LM
    surprisal band -> exact first-wins text dedup.  All three public
    curation entry points wire THIS, so chain semantics live in one
    place."""
    from ..stages.dedup import exact_dedup_first
    from ..stages.textstages import gopher_quality

    kept = gopher_quality(
        ds.select_columns([id_col, text_col]), id_col=id_col,
        text_col=text_col, stop_words=stop_words,
        min_tokens=min_tokens, keep_filter=True)
    if lm_centibits is not None:
        from ..stages.lm import lm_surprisal
        kept = lm_surprisal(kept, id_col=id_col, text_col=text_col,
                            max_mean_centibits=lm_centibits,
                            keep_filter=True)
    return exact_dedup_first(kept, key=text_col, order_col=id_col)


def curate(ds: ray.data.Dataset, stop_words=(), min_tokens: int = 50,
           splits: dict | None = None, seed: int = 0,
           id_col: str = "doc_id",
           text_col: str = "text") -> ray.data.Dataset:
    """documents(id, text) -> (id, split) for the docs that survive
    Gopher quality + exact first-wins dedup, with their deterministic
    train/val/test assignment."""
    from ..stages.sampling import hash_split
    uniq = _survivors(ds, stop_words, min_tokens, id_col, text_col)
    return hash_split(
        uniq.select_columns([id_col]), key=id_col,
        splits=splits or {"train": 0.8, "val": 0.1, "test": 0.1},
        seed=seed)


def curate_write(ds: ray.data.Dataset, out_dir: str, stop_words=(),
                 min_tokens: int = 50, splits: dict | None = None,
                 seed: int = 0, id_col: str = "doc_id",
                 text_col: str = "text",
                 lm_centibits: int | None = None) -> dict:
    """Run the curation chain and WRITE the surviving (id, text, split)
    rows as hive-partitioned parquet (one directory per split) —
    the resumable-output form: a failed run re-executes into a fresh
    temp dir and publishes atomically, and consumers read only the
    split they train on.  Returns {"out": dir, "n_rows": int}."""
    import os

    from ..stages.sampling import hash_split

    uniq = _survivors(ds, stop_words, min_tokens, id_col, text_col,
                      lm_centibits=lm_centibits)
    stamped = hash_split(
        uniq, key=id_col,
        splits=splits or {"train": 0.8, "val": 0.1, "test": 0.1},
        seed=seed)
    tmp = out_dir + ".tmp"
    import shutil
    shutil.rmtree(tmp, ignore_errors=True)
    stamped.write_parquet(tmp, partition_cols=["split"])
    import glob

    import pyarrow.parquet as pq
    n = sum(pq.read_metadata(f).num_rows for f in glob.glob(
        os.path.join(tmp, "**", "*.parquet"), recursive=True))
    # publish with two atomic renames so a crash never destroys the
    # previously published set: worst case out_dir is briefly absent
    # while the old copy survives at .old for manual recovery
    old = out_dir + ".old"
    shutil.rmtree(old, ignore_errors=True)
    if os.path.isdir(out_dir):
        os.replace(out_dir, old)
    os.replace(tmp, out_dir)
    shutil.rmtree(old, ignore_errors=True)
    return {"out": out_dir, "n_rows": n}


def curate_df(ds: ray.data.Dataset, id_col: str = "doc_id",
              **kw) -> pd.DataFrame:
    pdf = curate(ds, id_col=id_col, **kw).to_pandas()
    if not len(pdf):
        # zero survivors lose the schema through to_pandas — return a
        # typed empty frame so callers see stable columns
        import numpy as np
        return pd.DataFrame({id_col: pd.Series([], dtype=np.int64),
                             "split": pd.Series([], dtype=object)})
    return pdf.sort_values(id_col).reset_index(drop=True)


def curate_lm(ds: ray.data.Dataset, stop_words=(), min_tokens: int = 50,
              max_mean_centibits: int = 403, splits: dict | None = None,
              seed: int = 0, id_col: str = "doc_id",
              text_col: str = "text") -> ray.data.Dataset:
    """The CCNet+Gopher composition: rule quality filter -> unigram-LM
    surprisal band -> exact dedup -> split.

    The LM stage self-trains on the Gopher-kept subset, which costs a
    second streaming scan (model pass + score pass) but still never
    materializes the corpus; production CCNet trains the model on a
    separate trusted corpus instead — pass that via
    ``stages/lm.lm_surprisal(counts_from=...)`` when composing by
    hand."""
    from ..stages.sampling import hash_split

    uniq = _survivors(ds, stop_words, min_tokens, id_col, text_col,
                      lm_centibits=max_mean_centibits)
    return hash_split(
        uniq.select_columns([id_col]), key=id_col,
        splits=splits or {"train": 0.8, "val": 0.1, "test": 0.1},
        seed=seed)
