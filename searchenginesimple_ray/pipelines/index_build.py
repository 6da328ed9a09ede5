"""Index-build pipeline: transcripts Parquet -> sharded inverted index.

Replaces the reference's single-threaded ``page`` entry point
(`src/page.cc:3-11` -> `PageLibPreprocessor` -> `cutRedundantPage` ->
`buildDict` -> `storeOnDisk`, SURVEY §3.1) with streaming Ray Data
stages.  Layout under ``out_dir``::

    conv_bases/bases.parquet         global docid bases (A5; + ceiling json)
    docs_raw/bucket=K/*.parquet      prep + simhash + term lists, per bucket
    dedup/{drop_ids,clusters}.parquet  near-dup verdicts (A3/A4)
    docs/*.parquet                   deduped doc store (S5 analogue)
    term_df/*.parquet                global DF (G2)
    doc_stats/*.parquet              doc_len + ref L2 norm (G4), by doc_shard
    postings/doc_shard=D/*.parquet   compressed postings (A6), by doc shard
    meta.json                        N, avgdl, config, per-stage metrics

Every partition dir is written atomically and sealed with a
``_lineage.json`` (input fingerprint + config fingerprint + row count)
— a killed ``ray job submit`` run resumes by skipping every sealed
partition, re-tokenizing nothing completed (north rule; see
``state/lineage.py``).  Input buckets are contiguous ranges of the
input file list, so at cluster scale a bucket is a range of S3 keys.
"""

from __future__ import annotations

import glob
import json
import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data

from ..config import EngineConfig
from ..registry import resolve as registry_resolve
from ..stages.dedup import components_min_rep_arrays
from ..stages.postings import (build_postings, doc_stats_from_prepped,
                               term_df_from_prepped)
from ..stages.prep import prep_transcripts
from ..stages.tokenizer import doc_terms_from_prepped
from ..state import lineage


@dataclass
class BuildResult:
    out_dir: str
    n_docs_raw: int = 0
    n_docs: int = 0
    n_dropped: int = 0
    n_terms: int = 0
    n_posting_rows: int = 0
    avgdl: float = 0.0
    stages_run: list = field(default_factory=list)
    stages_skipped: list = field(default_factory=list)
    metrics: dict = field(default_factory=dict)


import threading as _threading

_DS_CONSTRUCT_LOCK = _threading.Lock()


def _read_parquet(paths, **kw):
    """`ray.data.read_parquet` with construction serialized: datasource
    init probes `fsspec.implementations.http`, whose import FAILS here
    (no aiohttp) — concurrent failing imports race into a plain
    ImportError that Ray's ModuleNotFoundError guard misses.  Only the
    (cheap) construction is locked; execution stays lazy + parallel."""
    with _DS_CONSTRUCT_LOCK:
        return ray.data.read_parquet(paths, **kw)


def _pq_files(d: str) -> list[str]:
    """Committed parquet files only — a killed run's uncommitted
    ``*.tmp-<nonce>`` partition dirs must never feed downstream stages.
    (Use ``_count_rows`` inside an atomic tmp dir: the tmp dir itself
    carries ``.tmp-`` in its name.)"""
    return sorted(
        f for f in glob.glob(os.path.join(d, "**", "*.parquet"),
                             recursive=True)
        if ".tmp-" not in f)


def _count_rows(d: str) -> int:
    """Row count over ALL parquet under ``d`` (no tmp filtering — used
    on a just-written atomic tmp dir before its commit rename)."""
    return sum(pq.read_metadata(f).num_rows
               for f in glob.glob(os.path.join(d, "**", "*.parquet"),
                                  recursive=True))


def _bucket_ranges(files: list[str], n_buckets: int) -> list[list[str]]:
    return [list(c) for c in np.array_split(files, n_buckets) if len(c)]


@ray.remote
def _sum_col_task(files: list[str], col: str) -> int:
    return sum(int(pc.sum(pq.read_table(f, columns=[col])[col]).as_py()
                   or 0) for f in files)


def _sum_doc_len(stats_dir: str) -> int:
    """Corpus total ``doc_len`` over a doc_stats dir — fanned out as
    Ray tasks (one per file group); the driver adds a handful of ints
    instead of decoding every stats file serially."""
    # tmp-filter on the path RELATIVE to stats_dir: the atomic-write
    # tmp dir itself carries ".tmp-" in its name and is a valid target
    files = [f for f in glob.glob(os.path.join(stats_dir, "**",
                                               "*.parquet"),
                                  recursive=True)
             if ".tmp-" not in os.path.relpath(f, stats_dir)]
    if not files:
        return 0
    groups = [list(g) for g in np.array_split(
        np.asarray(files, object), min(len(files), 32)) if len(g)]
    return sum(ray.get([_sum_col_task.remote(g, "doc_len")
                        for g in groups]))


# task-based drop filter with per-worker memo of the broadcast drop
# array (same rationale as stages.prep._prep_batch: no actor pools for
# trivial state => no per-job actor spawn overhead)
_DROP_CACHE: dict = {}


def apply_drop(t: pa.Table, drop_ref=None) -> pa.Table:
    """A3 filter: drop simhash==0 rows and near-dup cluster members."""
    key = drop_ref.hex()
    drop = _DROP_CACHE.get(key)
    if drop is None:
        drop = ray.get(drop_ref)
        _DROP_CACHE.clear()
        _DROP_CACHE[key] = drop
    t = t.filter(pc.not_equal(t["simhash"], pa.scalar(0, pa.uint64())))
    if len(drop) == 0 or t.num_rows == 0:
        return t
    doc = t["doc_id"].to_numpy(zero_copy_only=False)
    pos = np.clip(np.searchsorted(drop, doc), 0, len(drop) - 1)
    return t.filter(pa.array(drop[pos] != doc))


def index_doc_terms(index_dir: str) -> ray.data.Dataset:
    """Deduped ``doc_terms`` view of a BUILT index: docs_raw's per-doc
    term lists, drop-filtered and list-exploded lazily (the forward
    index is derived, not materialized — the former ``doc_terms/``
    parquet intermediate was pure serial-time cost)."""
    drop = pq.read_table(os.path.join(
        index_dir, "dedup", "drop_ids.parquet"))["doc_id"].to_numpy()
    drop_ref = ray.put(np.sort(drop.astype(np.int64)))
    ds = _read_parquet(
        _pq_files(os.path.join(index_dir, "docs_raw")),
        columns=["doc_id", "simhash", "doc_len", "terms", "tfs"])
    ds = ds.map_batches(apply_drop, fn_kwargs={"drop_ref": drop_ref},
                        batch_format="pyarrow")
    return doc_terms_from_prepped(ds)


@ray.remote
def _conv_meta_task(files: list[str]):
    """Per-file-group metadata scan: (unique conv_ids, max turn_idx)
    over the two pruned columns only."""
    t = pq.read_table(files, columns=["conv_id", "turn_idx"])
    conv = t["conv_id"].to_numpy(zero_copy_only=False)
    tidx = t["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
    uniq, inv = np.unique(conv, return_inverse=True)
    mx = np.zeros(len(uniq), dtype=np.int64)
    np.maximum.at(mx, inv, tidx)
    return uniq, mx


def _conv_bases_of(input_files: list[str],
                   start: int = 0
                   ) -> tuple[np.ndarray, np.ndarray, int]:
    """(sorted conv_id array, base array, ceiling) over
    ``input_files``, bases starting at ``start`` (append point for
    incremental updates).

    The row scan fans out as one Ray task per file group — the driver
    only merges per-group (conv, max_turn) summaries (one row per
    conversation, ~10x smaller than turns), so its serial share stays
    flat as the corpus grows.  The former driver-side whole-corpus
    read cost ~5 s of serial time per 2.4M turns."""
    files = sorted(input_files)
    if not files:
        return (np.empty(0, object), np.empty(0, np.int64), start)
    n_groups = min(len(files), 64)
    refs = [_conv_meta_task.remote(list(g))
            for g in np.array_split(np.asarray(files, object), n_groups)
            if len(g)]
    parts = ray.get(refs)
    conv = np.concatenate([p[0] for p in parts])
    mx = np.concatenate([p[1] for p in parts])
    uniq, inv = np.unique(conv, return_inverse=True)
    m2 = np.zeros(len(uniq), dtype=np.int64)
    np.maximum.at(m2, inv, mx)
    sizes = m2 + 1
    off = np.concatenate([[0], np.cumsum(sizes)[:-1]]) + start
    return uniq, off.astype(np.int64), start + int(sizes.sum())


def _write_bases_files(dst_dir: str, conv: np.ndarray, base: np.ndarray,
                       ceiling: int) -> None:
    """bases.parquet (conv_id, base) + a tiny bases.json carrying the
    ceiling.  The former single-json format serialized one dict entry
    per conversation (~2 s of driver time per 240k convs)."""
    pq.write_table(
        pa.table({"conv_id": pa.array(conv.tolist(), pa.string()),
                  "base": pa.array(base, pa.int64())}),
        os.path.join(dst_dir, "bases.parquet"))
    with open(os.path.join(dst_dir, "bases.json"), "w") as f:
        json.dump({"ceiling": int(ceiling), "format": 2}, f)


def _load_bases(bases_dir: str
                ) -> tuple[np.ndarray, np.ndarray, int | None]:
    """(sorted conv array, base array, ceiling) in any historical
    format: format-2 parquet, the dict-with-ceiling json, or the
    pre-append flat-dict json (ceiling None => append unsupported)."""
    with open(os.path.join(bases_dir, "bases.json")) as f:
        obj = json.load(f)
    if isinstance(obj, dict) and obj.get("format") == 2:
        t = pq.read_table(os.path.join(bases_dir, "bases.parquet"))
        return (t["conv_id"].to_numpy(zero_copy_only=False),
                t["base"].to_numpy(zero_copy_only=False).astype(np.int64),
                int(obj["ceiling"]))
    if isinstance(obj, dict) and "bases" in obj and "ceiling" in obj:
        d, ceiling = obj["bases"], int(obj["ceiling"])
    else:
        d, ceiling = obj, None
    conv = np.array(sorted(d), dtype=object)
    base = np.array([d[c] for c in conv], dtype=np.int64)
    return conv, base, ceiling


def _stage_runner(res: BuildResult, in_fp: str, cfg_fp: str):
    """Chained-lineage stage executor shared by build and append: each
    stage's fingerprint folds in the manifest hashes of its upstream
    stages, so a recomputed-and-DIFFERENT upstream invalidates
    downstream, while a deterministic identical recompute re-seals the
    same hash and downstream stays skippable."""
    import hashlib
    import threading
    stage_hashes: dict[str, str] = {}
    _lock = threading.Lock()

    def run_or_skip(stage: str, part, part_dir: str, fn, deps: list = ()):
        """fn(tmp_dir) -> (row_count, extra); returns manifest dict.

        Thread-safe: independent partitions of a stage run concurrently
        (each is its own Ray Data job; the streaming executor
        interleaves them across the cluster — per-job fixed overhead
        would otherwise serialize at small scale)."""
        import time as _time
        with _lock:
            dep_h = ",".join(stage_hashes[d] for d in deps)
        fp = in_fp + ("|" + dep_h if dep_h else "")
        key = f"{stage}/{part}"
        if lineage.is_complete(part_dir, stage, fp, cfg_fp):
            m = lineage.read_manifest(part_dir)
            with _lock:
                res.stages_skipped.append(key)
        else:
            t0 = _time.perf_counter()
            with lineage.atomic_dir(part_dir) as tmp:
                row_count, extra = fn(tmp)
            m = lineage.seal(part_dir, stage, part, fp, cfg_fp,
                             row_count, extra)
            with _lock:
                res.stages_run.append(key)
                res.metrics[f"wall/{key}"] = round(
                    _time.perf_counter() - t0, 2)
        with _lock:
            stage_hashes[key] = hashlib.sha256(
                json.dumps(m, sort_keys=True).encode()).hexdigest()[:12]
        return m

    return run_or_skip


def build_index(input_files: list[str], out_dir: str,
                cfg: EngineConfig | None = None) -> BuildResult:
    cfg = cfg or EngineConfig()
    os.makedirs(out_dir, exist_ok=True)
    if glob.glob(os.path.join(out_dir, "docs_raw", "bucket=app-*")):
        # a full build would recompute conv_bases WITHOUT the appended
        # conversations (reverting the docid ceiling) while the
        # downstream stages still ingest the committed app buckets —
        # a later append would then assign colliding doc_ids
        raise ValueError(
            f"{out_dir} contains appended partitions; a full rebuild "
            "must go to a fresh directory (or delete this index) — "
            "use append_index to extend it")
    lineage.gc_tmp_dirs(out_dir)   # drop a killed run's uncommitted writes
    in_fp = lineage.input_fingerprint(input_files)
    cfg_fp = cfg.fingerprint()
    res = BuildResult(out_dir=out_dir)
    stop = tuple(cfg.stop_words)

    run_or_skip = _stage_runner(res, in_fp, cfg_fp)
    buckets = _bucket_ranges(sorted(input_files), cfg.num_input_buckets)

    # ---- stage 0: global docid bases (metadata-only pass, A5) ----------
    bases_dir = os.path.join(out_dir, "conv_bases")

    def compute_bases(tmp):
        conv, base, ceiling = _conv_bases_of(input_files)
        _write_bases_files(tmp, conv, base, ceiling)
        return len(conv), {}

    run_or_skip("conv_bases", "global", bases_dir, compute_bases)
    conv, base, _ = _load_bases(bases_dir)
    bases_ref = ray.put((conv, base))

    # ---- stage 1: per-bucket doc prep + simhash (M8, A5, T1/T2) --------
    # buckets are independent -> submit their (small) Dataset jobs from a
    # thread pool so fixed per-job latency overlaps; Ray's streaming
    # executor schedules all of them over the same CPU pool
    from concurrent.futures import ThreadPoolExecutor
    try:
        # pre-warm: read_parquet lazily imports this; two threads racing
        # the first import can see a partially-initialized module
        from fsspec.implementations.http import HTTPFileSystem  # noqa: F401
    except ImportError:
        pass
    min_len = cfg.min_text_len
    # concurrent bucket jobs sized to the cluster: enough to overlap
    # per-job fixed latency, few enough not to thrash a small cluster
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    # floor of 2: even on a tiny cluster one job's fixed startup
    # (planning, worker handshake) overlaps the other's compute; prep
    # jobs are task-based so excess jobs just queue, they can't
    # deadlock the CPU pool the way actor pools could
    job_threads = max(2, min(8, len(buckets), ncpu // 2))

    def prep_bucket(k_files):
        k, bucket_files = k_files
        part_dir = os.path.join(out_dir, "docs_raw", f"bucket={k}")

        def prep(tmp):
            ds = _read_parquet(
                bucket_files, columns=["conv_id", "turn_idx", "text"])
            # ONE fused actor pool (filter+docids+simhash+text_len): with
            # several bucket jobs in flight, one pool per sub-step would
            # pin every CPU in actors and starve the read/write tasks
            ds = prep_transcripts(ds, bases_ref, stop_words=stop,
                                  top_n=cfg.simhash_top_n, min_len=min_len,
                                  batch_size=cfg.tokenize_batch_size,
                                  tokenizer=cfg.tokenizer)
            ds.write_parquet(tmp)
            return _count_rows(tmp), {}

        return k, run_or_skip("docs_raw", f"bucket={k}", part_dir,
                              prep, deps=["conv_bases/global"])

    with ThreadPoolExecutor(job_threads) as pool:
        for k, m in pool.map(prep_bucket, enumerate(buckets)):
            res.metrics[f"docs_raw/bucket={k}"] = m["row_count"]
    res.n_docs_raw = sum(res.metrics[f"docs_raw/bucket={k}"]
                         for k in range(len(buckets)))

    all_raw_deps = [f"docs_raw/bucket={k}" for k in range(len(buckets))]
    return _run_downstream(out_dir, cfg, res, run_or_skip,
                           all_raw_deps, in_fp, cfg_fp)


def _dedup_stage(out_dir: str, cfg: EngineConfig, res: BuildResult,
                 run_or_skip, raw_deps: list) -> np.ndarray:
    """Stage 2 (A3/A4): global near-dedup over ALL docs_raw
    partitions (16-byte (doc_id, simhash) rows only).  Returns the
    sorted int64 drop-id array."""
    # ---- stage 2: global near-dedup (A3/A4) ----------------------------
    dedup_dir = os.path.join(out_dir, "dedup")

    def dedup(tmp):
        import time as _t

        import pandas as pd
        subs = {}
        if cfg.dedup_enabled:
            t0 = _t.perf_counter()
            raw_files = _pq_files(os.path.join(out_dir, "docs_raw"))
            docs_raw = _read_parquet(
                raw_files,
                columns=["doc_id", "simhash"])   # never read the text
            # §2.9 injectable dedup policy (default: simhash A3/A4)
            policy = registry_resolve("dedup", cfg.dedup_policy)
            edges = policy(docs_raw, cfg, files=raw_files)
            subs["edges_sec"] = round(_t.perf_counter() - t0, 2)
            t0 = _t.perf_counter()
            if len(edges) > 20_000_000:
                # edge set too big for a driver union-find: iterated
                # min-label propagation over task-sharded buckets
                from ..stages.dedup import components_min_label_distributed
                comp = components_min_label_distributed(
                    ray.data.from_arrow(
                        pa.Table.from_pandas(edges, preserve_index=False)))
                ids = comp["id"].to_numpy().astype(np.int64)
                reps = comp["rep_id"].to_numpy().astype(np.int64)
                m = ids != reps
                o = np.argsort(ids[m], kind="stable")
                ids, reps = ids[m][o], reps[m][o]
            elif len(edges):
                ids, reps = components_min_rep_arrays(edges)
            else:
                ids = reps = np.empty(0, np.int64)
            subs["unionfind_sec"] = round(_t.perf_counter() - t0, 2)
        else:
            ids = reps = np.empty(0, np.int64)
        n_clusters = len(np.unique(reps))
        drop = ids                       # sorted, reps excluded by spec
        pq.write_table(pa.table({"doc_id": drop}),
                       os.path.join(tmp, "drop_ids.parquet"))
        cl = pd.DataFrame({"doc_id": ids, "rep_id": reps})
        pq.write_table(pa.Table.from_pandas(cl, preserve_index=False),
                       os.path.join(tmp, "clusters.parquet"))
        if (cfg.dedup_enabled and cfg.dedup_key_index
                and cfg.dedup_policy == "simhash"):
            # persist the per-band SORTED key runs so appends probe
            # the delta's key ranges instead of re-scanning (see
            # stages/dedup.write_band_key_runs).  Fingerprints are
            # consolidated in a TASK — the corpus-sized array never
            # lands in the driver heap
            from ..stages.dedup import (_consolidate_from_files,
                                        write_band_key_runs)
            cons = _consolidate_from_files.remote(
                _pq_files(os.path.join(out_dir, "docs_raw")))
            write_band_key_runs(cons, cfg.hamming_threshold,
                                os.path.join(tmp, "keys"), "run-full")
        return len(drop), {"n_clusters": int(n_clusters), **subs}

    m = run_or_skip("dedup", "global", dedup_dir, fn=dedup,
                    deps=list(raw_deps))
    res.metrics["dedup/dropped"] = m["row_count"]

    drop_ids = pq.read_table(
        os.path.join(dedup_dir, "drop_ids.parquet"))["doc_id"].to_numpy()
    return np.sort(drop_ids.astype(np.int64))


def _dedup_stage_append(index_dir: str, cfg: EngineConfig,
                        res: BuildResult, run_or_skip, raw_deps: list,
                        app_files: list, tag: str,
                        ceiling: int) -> np.ndarray:
    """Append-time dedup with ARRIVAL-ORDER semantics: verdicts of
    pre-append docs are FROZEN (the reference's first-wins rule,
    `Page.hpp:247-257` — everything old "arrived" first), and only
    appended docs can be dropped.  This keeps pre-append postings
    exactly valid; a new doc that bridges two previously-distinct old
    clusters is itself dropped while both old clusters stay — the one
    case where an append diverges from a from-scratch rebuild's
    global connected-component rule (which could merge them and
    newly drop an old representative whose posting rows already
    exist).

    Candidate edges touching the delta come from the persisted
    sorted-key runs (``dedup/keys``, row-group-pruned probe —
    delta-proportional I/O) when `EngineConfig.dedup_key_index` wrote
    them; otherwise from the global fingerprint re-scan.  When the
    key index is enabled, old runs are HARDLINKED forward and one new
    run per band is appended (LSM-style, no data copied)."""
    import pyarrow.compute as _pc

    dedup_dir = os.path.join(index_dir, "dedup")
    keys_dir = os.path.join(dedup_dir, "keys")
    have_keys = (cfg.dedup_enabled and cfg.dedup_key_index
                 and cfg.dedup_policy == "simhash"
                 and os.path.isdir(keys_dir))

    def dedup(tmp):
        import time as _t

        import pandas as pd

        from ..stages.dedup import (components_min_rep,
                                    simhash_delta_edges,
                                    write_band_key_runs)
        old_drop = pq.read_table(
            os.path.join(dedup_dir, "drop_ids.parquet"))["doc_id"]             .to_numpy().astype(np.int64)
        old_cl = pq.read_table(
            os.path.join(dedup_dir, "clusters.parquet")).to_pandas()
        subs = {"mode": "delta" if have_keys else "global",
                "frozen_old_drops": len(old_drop)}
        rep = {}
        hN = dN = None
        if cfg.dedup_enabled:
            t0 = _t.perf_counter()
            if have_keys or cfg.dedup_key_index:
                t = pq.read_table(app_files,
                                  columns=["doc_id", "simhash"])
                t = t.filter(_pc.not_equal(
                    t["simhash"], pa.scalar(0, pa.uint64())))
                t = t.combine_chunks()
                hN = t["simhash"].to_numpy(zero_copy_only=False) \
                    .astype(np.uint64)
                dN = t["doc_id"].to_numpy(zero_copy_only=False) \
                    .astype(np.int64)
            cons_ref = None
            if hN is not None:
                cons_ref = ray.put((hN, dN))
            if have_keys:
                new_edges = simhash_delta_edges(
                    keys_dir, hN, dN, cfg.hamming_threshold,
                    cons_ref=cons_ref)
                # old star edges carry component anchors so a new doc
                # near an old dup maps to the OLD representative
                old_edges = pd.DataFrame(
                    {"src": old_cl["rep_id"].astype(np.int64),
                     "dst": old_cl["doc_id"].astype(np.int64)}) \
                    if len(old_cl) else pd.DataFrame(
                        {"src": pd.Series([], dtype=np.int64),
                         "dst": pd.Series([], dtype=np.int64)})
                edges = pd.concat([old_edges, new_edges],
                                  ignore_index=True)
                subs["delta_docs"] = int(len(hN))
                subs["delta_edges"] = int(len(new_edges))
            else:
                raw_files = _pq_files(
                    os.path.join(index_dir, "docs_raw"))
                docs_raw = _read_parquet(
                    raw_files, columns=["doc_id", "simhash"])
                policy = registry_resolve("dedup", cfg.dedup_policy)
                edges = policy(docs_raw, cfg, files=raw_files)
            subs["edges_sec"] = round(_t.perf_counter() - t0, 2)
            if len(edges):
                rep = components_min_rep(edges)
        # ARRIVAL-ORDER clamp: old verdicts frozen, only new ids drop
        drop_new = np.array(
            sorted(d for d, r in rep.items()
                   if d != r and d >= ceiling), dtype=np.int64)
        drop = np.union1d(old_drop, drop_new)
        pq.write_table(pa.table({"doc_id": drop}),
                       os.path.join(tmp, "drop_ids.parquet"))
        cl = pd.DataFrame(sorted(rep.items()),
                          columns=["doc_id", "rep_id"])
        pq.write_table(pa.Table.from_pandas(cl, preserve_index=False),
                       os.path.join(tmp, "clusters.parquet"))
        if (cfg.dedup_enabled and cfg.dedup_key_index
                and cfg.dedup_policy == "simhash"):
            from ..stages.dedup import _consolidate_from_files
            if os.path.isdir(keys_dir):
                # carry the candidate index forward: hardlink old
                # runs (no copy), append one delta run per band
                for band in sorted(os.listdir(keys_dir)):
                    src_bd = os.path.join(keys_dir, band)
                    dst_bd = os.path.join(tmp, "keys", band)
                    os.makedirs(dst_bd, exist_ok=True)
                    for f in sorted(os.listdir(src_bd)):
                        if f.endswith(".parquet"):
                            os.link(os.path.join(src_bd, f),
                                    os.path.join(dst_bd, f))
                write_band_key_runs(cons_ref, cfg.hamming_threshold,
                                    os.path.join(tmp, "keys"),
                                    f"run-{tag}")
            else:
                # no index to carry forward (defense in depth — the
                # config-fingerprint gate should make this
                # unreachable): seed FULL-corpus runs, never
                # delta-only ones a later append would probe as if
                # they were complete
                full = _consolidate_from_files.remote(
                    _pq_files(os.path.join(index_dir, "docs_raw")))
                write_band_key_runs(full, cfg.hamming_threshold,
                                    os.path.join(tmp, "keys"),
                                    "run-full")
        return len(drop), subs

    m = run_or_skip("dedup", "global", dedup_dir, fn=dedup,
                    deps=list(raw_deps))
    res.metrics["dedup/dropped"] = m["row_count"]
    drop_ids = pq.read_table(
        os.path.join(dedup_dir, "drop_ids.parquet"))["doc_id"].to_numpy()
    return np.sort(drop_ids.astype(np.int64))


def _run_downstream(out_dir: str, cfg: EngineConfig, res: BuildResult,
                    run_or_skip, all_raw_deps: list, in_fp: str,
                    cfg_fp: str) -> BuildResult:
    """Stages 2-6 + meta: everything downstream of the per-bucket
    prep.  Reads ALL committed docs_raw partitions, so it serves both
    the full build and the incremental append (which only preps NEW
    buckets and re-runs this global tail)."""
    from concurrent.futures import ThreadPoolExecutor
    drop_ids = _dedup_stage(out_dir, cfg, res, run_or_skip, all_raw_deps)
    res.n_dropped = len(drop_ids)
    drop_ref = ray.put(drop_ids)

    def prepped_ds():
        """Lazy deduped PREPPED rows (per-doc term lists) from docs_raw
        — each consumer streams read -> drop-filter -> its own fused
        kernel; the 55M-row ``doc_terms`` parquet intermediate (written
        once, re-read by three consumers) was pure serial-time cost."""
        ds = _read_parquet(
            _pq_files(os.path.join(out_dir, "docs_raw")),
            columns=["doc_id", "simhash", "doc_len", "terms", "tfs"])
        return ds.map_batches(apply_drop, fn_kwargs={"drop_ref": drop_ref},
                              batch_format="pyarrow")

    # ---- stage 3: doc store CONCURRENT with term_df --------------------
    # the doc store (S5) depends only on dedup; term_df reads docs_raw
    # directly.  ONE job for the whole store: per-bucket doc-store jobs
    # paid ~8x Ray job startup latency for trivial filter+rewrite work
    # (resume granularity stays per-bucket where it matters — the
    # expensive tokenize stage docs_raw — while the cheap store is
    # recomputed whole on a resume miss).
    docs_dir = os.path.join(out_dir, "docs")

    def mk_docs(tmp):
        ds = _read_parquet(
            _pq_files(os.path.join(out_dir, "docs_raw")),
            columns=["conv_id", "turn_idx", "text", "doc_id",
                     "simhash", "text_len"])
        ds = ds.map_batches(apply_drop, fn_kwargs={"drop_ref": drop_ref},
                            batch_format="pyarrow")
        ds.write_parquet(tmp)
        return _count_rows(tmp), {}

    df_dir = os.path.join(out_dir, "term_df")
    df_deps = all_raw_deps + ["dedup/global"]

    def mk_df(tmp):
        # slim read: term_df needs only the drop-filter columns + terms
        # (doc_len/tfs ride along in prepped_ds for the other consumers)
        def slim_prepped():
            ds = _read_parquet(
                _pq_files(os.path.join(out_dir, "docs_raw")),
                columns=["doc_id", "simhash", "terms"])
            return ds.map_batches(apply_drop,
                                  fn_kwargs={"drop_ref": drop_ref},
                                  batch_format="pyarrow")

        df_pdf = term_df_from_prepped(slim_prepped())
        pq.write_table(pa.Table.from_pandas(df_pdf, preserve_index=False),
                       os.path.join(tmp, "term_df.parquet"))
        return len(df_pdf), {}

    # ---- stage 5: doc_stats (doc_len, ref L2 norm — G4) ----------------
    stats_dir = os.path.join(out_dir, "doc_stats")
    stats_deps = df_deps + ["term_df/global"]

    def mk_stats_with(df_map, n_docs):
        def mk_stats(tmp):
            st = doc_stats_from_prepped(prepped_ds(), df_map,
                                        n_docs=n_docs,
                                        num_doc_shards=cfg.num_doc_shards)
            st.write_parquet(tmp, partition_cols=["doc_shard"])
            # total doc_len rides in the manifest so meta never
            # re-scans the stats files on the driver
            return _count_rows(tmp), {"tot_len": _sum_doc_len(tmp)}
        return mk_stats

    # ---- stage 6: postings (A1/A6 + skew salt) -------------------------
    postings_dir = os.path.join(out_dir, "postings")

    def mk_postings_with(df_map):
        def mk_postings(tmp):
            po = build_postings(
                prepped_ds(), df_map,
                num_term_shards=cfg.num_term_shards,
                num_doc_shards=cfg.num_doc_shards,
                hot_term_df_threshold=cfg.hot_term_df_threshold,
                posting_block_size=cfg.posting_block_size,
                prepped=True)
            po.write_parquet(tmp, partition_cols=["doc_shard"])
            per_shard = {}
            for f in glob.glob(os.path.join(tmp, "**", "*.parquet"),
                               recursive=True):
                shard = os.path.basename(os.path.dirname(f))
                per_shard[shard] = per_shard.get(shard, 0) \
                    + pq.read_metadata(f).num_rows
            return sum(per_shard.values()), {"per_shard_rows": per_shard}
        return mk_postings

    # BARRIER-FREE TAIL: the doc store feeds nothing downstream except
    # the scalar n_docs (doc_stats' idf N), and postings needs only
    # term_df.  So docs ∥ term_df start together; postings launches
    # the moment term_df lands (overlapping the doc-store write — the
    # former docs barrier idled ~2 of 4 cores for its tail); doc_stats
    # launches when docs lands.  One join at the end.
    with ThreadPoolExecutor(4) as pool:
        fut_docs = pool.submit(run_or_skip, "docs", "global", docs_dir,
                               mk_docs, df_deps)
        fut_df = pool.submit(run_or_skip, "term_df", "global", df_dir,
                             mk_df, df_deps)
        m = fut_df.result()
        res.n_terms = m["row_count"]
        df_tab = pq.read_table(os.path.join(df_dir, "term_df.parquet"))
        df_map = (df_tab["term"].to_numpy(zero_copy_only=False),
                  df_tab["df"].to_numpy(zero_copy_only=False)
                  .astype(np.int64))   # sorted-array pair, not a dict
        fut_post = pool.submit(run_or_skip, "postings", "global",
                               postings_dir, mk_postings_with(df_map),
                               stats_deps)
        m_docs = fut_docs.result()
        res.metrics["docs/rows"] = m_docs["row_count"]
        res.n_docs = m_docs["row_count"]
        fut_stats = pool.submit(run_or_skip, "doc_stats", "global",
                                stats_dir,
                                mk_stats_with(df_map, res.n_docs),
                                stats_deps)
        m_stats = fut_stats.result()
        n_stats = m_stats["row_count"]
        m = fut_post.result()
    res.n_posting_rows = m["row_count"]
    res.metrics["postings/per_shard"] = m["extra"].get("per_shard_rows", {})

    # ---- meta ----------------------------------------------------------
    tot_len = m_stats.get("extra", {}).get("tot_len")
    if tot_len is None:   # stage sealed by a pre-round-3 build
        tot_len = _sum_doc_len(stats_dir)
    res.avgdl = (tot_len / n_stats) if n_stats else 0.0
    meta = {
        "n_docs": res.n_docs, "n_docs_raw": res.n_docs_raw,
        "n_dropped": res.n_dropped, "n_terms": res.n_terms,
        "n_docs_with_terms": n_stats,
        "avgdl": res.avgdl,
        "num_doc_shards": cfg.num_doc_shards,
        "num_term_shards": cfg.num_term_shards,
        "bm25_k1": cfg.bm25_k1, "bm25_b": cfg.bm25_b,
        "config_fingerprint": cfg_fp, "input_fingerprint": in_fp,
        "metrics": res.metrics,
    }
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    return res


def append_index(new_files: list[str], index_dir: str,
                 cfg: EngineConfig | None = None) -> BuildResult:
    """Incrementally index NEW conversations into an existing index —
    delta-proportional work: no re-tokenize, no postings re-shuffle.

    Semantics and scale shape:

    - New conversations get docids starting at the stored ceiling
      (append order).  Files containing already-indexed conv_ids are
      refused — append adds conversations, it does not mutate them.
    - Only the new files run prep/tokenize (the dominant build cost),
      as namespaced ``docs_raw/bucket=app-*`` partitions with their
      own lineage seals (a killed append resumes like a killed build).
    - Postings and the doc store are FILE-APPEND-ONLY: the delta is
      encoded alone and its parquet files move into the existing
      shard dirs.  Valid because posting payloads store raw tf and
      block-max-TF — the df/N-dependent impact is computed at query
      load — and the shard actor already merges multiple rows per
      term (the hot-term salt path), taking ``max`` of the stored
      dfs.  Pre-append rows are never rewritten.
    - term_df merges the old table with delta partials (idempotent
      via an applied-appends marker).  The one corpus-proportional
      recompute is ``doc_stats``: the reference L2 norm is
      IDF-weighted and df/N change for every doc — but that pass is
      shuffle-free (streaming reduceat over stored term lists).
    - Cross-set near-dups use ARRIVAL-ORDER semantics (see
      `_dedup_stage_append`): pre-append verdicts are frozen, only
      appended docs can be dropped — an append can never remove a
      previously indexed doc, so pre-append postings stay exactly
      valid.  With `EngineConfig.dedup_key_index` the candidate
      probe reads only row groups covering the delta's keys from the
      persisted sorted runs (delta-proportional); otherwise dedup is
      a fingerprint-only corpus re-scan.  doc_stats stays the one
      corpus-proportional recompute either way.
    - Equality contract (tested): if the appended conv_ids sort after
      every existing one, queries, term_df, doc_stats, the doc store
      and the DECODED postings are value-equal to a full rebuild over
      the union (physical posting rows differ — the delta lives in
      its own rows/files); otherwise the docid assignment differs
      (append order vs globally sorted) but the index is semantically
      equivalent.
    """
    cfg = cfg or EngineConfig()
    meta_path = os.path.join(index_dir, "meta.json")
    if not os.path.exists(meta_path):
        raise FileNotFoundError(
            f"{index_dir} is not a built index (no meta.json); "
            "use build_index")
    with open(meta_path) as f:
        meta = json.load(f)
    cfg_fp = cfg.fingerprint()
    if meta.get("config_fingerprint") != cfg_fp:
        raise ValueError(
            "append config fingerprint differs from the built index "
            f"({cfg_fp} != {meta.get('config_fingerprint')}); an index "
            "must be appended with the config it was built with")
    lineage.gc_tmp_dirs(index_dir)

    bases_dir = os.path.join(index_dir, "conv_bases")
    old_conv, old_base, ceiling = _load_bases(bases_dir)
    if ceiling is None:
        raise ValueError(
            "index predates append support (bases.json has no docid "
            "ceiling); rebuild once with the current engine")
    new_files = sorted(new_files)
    new_conv, new_base, new_ceiling = _conv_bases_of(new_files,
                                                     start=ceiling)
    overlap = np.intersect1d(new_conv, old_conv)
    if len(overlap) and len(overlap) < len(new_conv):
        raise ValueError(
            f"append supports new conversations only; {len(overlap)} "
            f"of {len(new_conv)} conv_ids already indexed "
            f"(e.g. {overlap[:3].tolist()})")

    app_fp = lineage.input_fingerprint(new_files)
    if meta["input_fingerprint"].endswith("+" + app_fp):
        in_fp = meta["input_fingerprint"]      # idempotent re-append
    else:
        in_fp = meta["input_fingerprint"] + "+" + app_fp
    if len(overlap):
        # every conv already has a base — legitimate only as a RESUME
        # of THIS exact append (same input fingerprint), detected via
        # the completed meta or the conv_bases seal of a killed run.
        # A changed fingerprint (same convs, touched/re-exported
        # files) would re-prep the same doc_ids under a new tag and
        # silently duplicate them in docs/postings — refuse.
        bm = lineage.read_manifest(bases_dir) or {}
        started = bm.get("input_fingerprint") == in_fp
        completed = meta["input_fingerprint"].endswith("+" + app_fp)
        if not (started or completed):
            raise ValueError(
                f"all {len(new_conv)} conv_ids are already indexed "
                "but the input fingerprint differs from any prior "
                "append of them — re-appending modified files would "
                "duplicate documents; build a fresh index instead")
        m_conv, m_base, new_ceiling = old_conv, old_base, ceiling
    else:
        cat = np.concatenate([old_conv, new_conv])
        o = np.argsort(cat, kind="stable")
        m_conv = cat[o]
        m_base = np.concatenate([old_base, new_base])[o]
    res = BuildResult(out_dir=index_dir)
    run_or_skip = _stage_runner(res, in_fp, cfg_fp)

    # stage 0': merged bases (re-sealed under the combined fingerprint,
    # so a stale full build over the original file list recomputes
    # instead of silently reading the merged map)
    def write_bases(tmp):
        _write_bases_files(tmp, m_conv, m_base, new_ceiling)
        return len(m_conv), {"appended_convs": len(new_conv)}

    run_or_skip("conv_bases", "global", bases_dir, write_bases)
    bases_ref = ray.put((m_conv, m_base))

    # stage 1': prep ONLY the new files, namespaced buckets
    from concurrent.futures import ThreadPoolExecutor
    tag = app_fp[:12]
    stop = tuple(cfg.stop_words)
    buckets = _bucket_ranges(new_files, cfg.num_input_buckets)
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    job_threads = max(2, min(8, len(buckets), ncpu // 2))

    def prep_bucket(k_files):
        k, bucket_files = k_files
        part = f"bucket=app-{tag}-{k}"
        part_dir = os.path.join(index_dir, "docs_raw", part)

        def prep(tmp):
            ds = _read_parquet(
                bucket_files, columns=["conv_id", "turn_idx", "text"])
            ds = prep_transcripts(ds, bases_ref, stop_words=stop,
                                  top_n=cfg.simhash_top_n,
                                  min_len=cfg.min_text_len,
                                  batch_size=cfg.tokenize_batch_size,
                                  tokenizer=cfg.tokenizer)
            ds.write_parquet(tmp)
            return _count_rows(tmp), {}

        return part, run_or_skip("docs_raw", part, part_dir, prep,
                                 deps=["conv_bases/global"])

    with ThreadPoolExecutor(job_threads) as pool:
        app_deps = []
        for part, m in pool.map(prep_bucket, enumerate(buckets)):
            res.metrics[f"docs_raw/{part}"] = m["row_count"]
            app_deps.append(f"docs_raw/{part}")

    # raw doc count = everything now under docs_raw (old + appended)
    res.n_docs_raw = sum(pq.read_metadata(f).num_rows
                         for f in _pq_files(
                             os.path.join(index_dir, "docs_raw")))

    # ---- incremental tail ----------------------------------------------
    # dedup is global (a fingerprint-only scan); drops below the old
    # ceiling are a deterministic recompute of the original verdicts
    # (old-old pairs unchanged; old-new pairs always drop the NEW id),
    # so pre-append postings/docs rows remain exactly valid.
    old_meta = meta
    app_files = [f for f in _pq_files(os.path.join(index_dir, "docs_raw"))
                 if f"bucket=app-{tag}-" in f]
    drop_ids = _dedup_stage_append(index_dir, cfg, res, run_or_skip,
                                   app_deps, app_files, tag, ceiling)
    res.n_dropped = len(drop_ids)
    drop_ref = ray.put(drop_ids)

    def new_prepped_ds():
        ds = _read_parquet(app_files, columns=["doc_id", "simhash",
                                               "doc_len", "terms", "tfs"])
        ds = ds.map_batches(apply_drop, fn_kwargs={"drop_ref": drop_ref},
                            batch_format="pyarrow")
        # coalesce the delta before the postings exchange: the staged
        # app buckets split into O(files x 2) tiny blocks, and the
        # groupby sort spawns a map+reduce task PER BLOCK PAIR — at a
        # 440k-row delta the 160-block sort was 87% idle scheduling
        # (11.7 s wall for ~2 s of remote work; measured, see
        # BASELINE.md round-4 session notes).  ~64k prepped rows per
        # block keeps the sort dense at any delta size.
        app_rows = sum(pq.read_metadata(f).num_rows for f in app_files)
        ncpu = max(int(ray.cluster_resources().get("CPU", 8)), 1)
        return ds.repartition(max(ncpu, -(-app_rows // 65536)))

    def all_prepped_ds():
        ds = _read_parquet(_pq_files(os.path.join(index_dir, "docs_raw")),
                           columns=["doc_id", "simhash", "doc_len",
                                    "terms", "tfs"])
        return ds.map_batches(apply_drop, fn_kwargs={"drop_ref": drop_ref},
                              batch_format="pyarrow")

    def _file_append(stage_dir: str, build_tmp_writer, flat: bool):
        """Idempotent file-level append into an existing stage dir:
        delete any half-moved ``app-<tag>-*`` files, build the delta
        under a tmp dir, then move each file in as
        ``app-<tag>-<i>.parquet`` (same hive layout when ``flat`` is
        False).  Crash-safe: a re-run cleans and redoes the moves."""
        for f in glob.glob(os.path.join(stage_dir, "**",
                                        f"app-{tag}-*.parquet"),
                           recursive=True):
            os.remove(f)
        import tempfile
        with tempfile.TemporaryDirectory(
                dir=os.path.dirname(stage_dir),
                prefix=f".tmp-app-{tag}-") as tmp:
            n = build_tmp_writer(tmp)
            moved = 0
            for f in sorted(glob.glob(os.path.join(tmp, "**", "*.parquet"),
                                      recursive=True)):
                rel = os.path.relpath(os.path.dirname(f), tmp)
                dest_dir = stage_dir if (flat or rel == ".") \
                    else os.path.join(stage_dir, rel)
                os.makedirs(dest_dir, exist_ok=True)
                os.replace(f, os.path.join(
                    dest_dir, f"app-{tag}-{moved}.parquet"))
                moved += 1
        return n, {"files_appended": moved}

    dedup_dep = app_deps + ["dedup/global"]

    # stage 3': doc store — append ONLY the new kept docs
    def mk_docs_delta(tmp):
        ds = _read_parquet(app_files,
                           columns=["conv_id", "turn_idx", "text",
                                    "doc_id", "simhash", "text_len"])
        ds = ds.map_batches(apply_drop, fn_kwargs={"drop_ref": drop_ref},
                            batch_format="pyarrow")
        ds.write_parquet(tmp)
        return _count_rows(tmp), {}

    docs_marker = os.path.join(index_dir, "docs_appends", tag)

    def docs_append(marker_tmp):
        n, extra = _file_append(os.path.join(index_dir, "docs"),
                                lambda t: mk_docs_delta(t)[0], flat=True)
        return n, extra

    # stage 4': term_df — merge old table with the delta partials
    df_dir = os.path.join(index_dir, "term_df")

    def mk_df_merged(tmp):
        applied_path = os.path.join(df_dir, "applied.json")
        applied = []
        if os.path.exists(applied_path):
            with open(applied_path) as f:
                applied = json.load(f)
        old_df = pq.read_table(
            os.path.join(df_dir, "term_df.parquet")).to_pandas()
        if app_fp in applied:
            merged_df = old_df          # crash-window replay: no-op
        else:
            import pandas as pd
            def slim_new_prepped():
                ds = _read_parquet(app_files,
                                   columns=["doc_id", "simhash", "terms"])
                return ds.map_batches(apply_drop,
                                      fn_kwargs={"drop_ref": drop_ref},
                                      batch_format="pyarrow")
            new_df = term_df_from_prepped(slim_new_prepped())
            # arrow-native merge (C++ hash agg + sort): the pandas
            # groupby here was vocab-proportional driver serial time
            agg = pa.concat_tables([
                pa.Table.from_pandas(old_df, preserve_index=False),
                pa.Table.from_pandas(new_df, preserve_index=False)],
                promote_options="default") \
                .group_by("term").aggregate([("df", "sum")]) \
                .sort_by("term")
            merged_df = pd.DataFrame({
                "term": agg["term"].to_numpy(zero_copy_only=False),
                "df": agg["df_sum"].to_numpy(zero_copy_only=False)
                .astype(np.int64)})
            applied = applied + [app_fp]
        pq.write_table(pa.Table.from_pandas(merged_df,
                                            preserve_index=False),
                       os.path.join(tmp, "term_df.parquet"))
        with open(os.path.join(tmp, "applied.json"), "w") as f:
            json.dump(applied, f)
        return len(merged_df), {}

    # barrier-free append tail (mirrors _run_downstream): docs_append
    # ∥ term_df run first; postings_append launches when term_df
    # lands; doc_stats launches when docs_append lands (it needs the
    # post-append doc count for its idf N).
    from concurrent.futures import ThreadPoolExecutor as _TPE
    _tail_pool = _TPE(4)
    try:
        fut_docs = _tail_pool.submit(run_or_skip, "docs_append", tag,
                                     docs_marker, docs_append,
                                     dedup_dep)
        m = run_or_skip("term_df", "global", df_dir, mk_df_merged,
                        deps=dedup_dep)
        res.n_terms = m["row_count"]
        df_tab = pq.read_table(os.path.join(df_dir, "term_df.parquet"))
        df_map = (df_tab["term"].to_numpy(zero_copy_only=False),
                  df_tab["df"].to_numpy(zero_copy_only=False)
                  .astype(np.int64))
    except BaseException:
        # a term_df failure must not leave docs_append mutating the
        # index from an unsupervised thread (nor its error unobserved)
        _tail_pool.shutdown(wait=True)
        raise

    # stage 5': doc_stats — the ONE corpus-proportional recompute: the
    # reference L2 norm is IDF-weighted, and appending changes df/N for
    # every document.  Shuffle-free (per-row reduceat), so the cost is
    # a streaming read of term lists, not an exchange.  doc_len alone
    # would be append-only; correctness of the ref-cosine scorer wins.
    stats_dir = os.path.join(index_dir, "doc_stats")

    def mk_stats(tmp):
        st = doc_stats_from_prepped(all_prepped_ds(), df_map,
                                    n_docs=res.n_docs,
                                    num_doc_shards=cfg.num_doc_shards)
        st.write_parquet(tmp, partition_cols=["doc_shard"])
        return _count_rows(tmp), {"tot_len": _sum_doc_len(tmp)}

    stats_deps = dedup_dep + ["term_df/global"]

    # stage 6': postings — encode ONLY the delta, file-append into the
    # doc_shard dirs.  Valid because posting payloads carry raw tf and
    # block-max-TF (impact = f(df, N) is computed at query load), and
    # the shard actor already merges multiple rows per term (the salt
    # path); its df pick is max(rows), and df only grows on append.
    def mk_postings_delta(tmp):
        po = build_postings(new_prepped_ds(), df_map,
                            num_term_shards=cfg.num_term_shards,
                            num_doc_shards=cfg.num_doc_shards,
                            hot_term_df_threshold=cfg.hot_term_df_threshold,
                            posting_block_size=cfg.posting_block_size,
                            prepped=True)
        po.write_parquet(tmp, partition_cols=["doc_shard"])
        return _count_rows(tmp), {}

    post_marker = os.path.join(index_dir, "postings_appends", tag)

    def postings_append(marker_tmp):
        return _file_append(os.path.join(index_dir, "postings"),
                            lambda t: mk_postings_delta(t)[0], flat=False)

    try:
        fut_post = _tail_pool.submit(run_or_skip, "postings_append",
                                     tag, post_marker, postings_append,
                                     stats_deps)
        fut_docs.result()
        # count the store itself (metadata-only), NOT old_meta + delta:
        # a skipped re-append must not double-count the sealed delta
        res.n_docs = sum(
            pq.read_metadata(f).num_rows
            for f in _pq_files(os.path.join(index_dir, "docs")))
        m_stats = run_or_skip("doc_stats", "global", stats_dir,
                              mk_stats, stats_deps)
        n_stats = m_stats["row_count"]
        m = fut_post.result()
    finally:
        _tail_pool.shutdown(wait=True)
    res.n_posting_rows = m["row_count"]

    # ---- meta ------------------------------------------------------
    tot_len = m_stats.get("extra", {}).get("tot_len")
    if tot_len is None:
        tot_len = _sum_doc_len(stats_dir)
    res.avgdl = (tot_len / n_stats) if n_stats else 0.0
    meta_out = {
        "n_docs": res.n_docs, "n_docs_raw": res.n_docs_raw,
        "n_dropped": res.n_dropped, "n_terms": res.n_terms,
        "n_docs_with_terms": n_stats,
        "avgdl": res.avgdl,
        "num_doc_shards": cfg.num_doc_shards,
        "num_term_shards": cfg.num_term_shards,
        "bm25_k1": cfg.bm25_k1, "bm25_b": cfg.bm25_b,
        "config_fingerprint": cfg_fp, "input_fingerprint": in_fp,
        "appended": old_meta.get("appended", []) + (
            [tag] if tag not in old_meta.get("appended", []) else []),
        "metrics": res.metrics,
    }
    with open(os.path.join(index_dir, "meta.json"), "w") as f:
        json.dump(meta_out, f, indent=1)
    return res


@ray.remote
def _compact_shard_task(files: list, block_size: int,
                        num_doc_shards: int = 1,
                        hot_term_df_threshold: int = 0) -> pa.Table:
    """Merge all posting rows of one doc shard: decode every run of a
    term (append deltas, salted sub-lists), concat + sort by doc id,
    re-encode.  df := max over rows (append rows carry the grown
    global value).

    Hot terms are RE-SPLIT at re-encode time: a merged term whose
    local postings exceed ``hot_term_df_threshold`` is emitted as
    ``ceil(n_local/threshold)`` salted rows with the build stage's
    salt arithmetic (``(doc_id // D) % nsalts``,
    `stages/postings.py` StampShards), so compaction preserves the
    bounded-row-payload invariant the salt exists to enforce instead
    of re-creating one giant varbyte row per hot term."""
    from ..functions.varbyte import decode_postings, encode_postings
    t = pq.read_table(files)
    terms = t["term"].to_pylist()
    tsh = t["term_shard"].to_numpy()
    dfs = t["df"].to_numpy()
    nloc = t["n_local"].to_numpy()
    dvb = t["doc_ids_vb"].to_pylist()
    tvb = t["tfs_vb"].to_pylist()
    runs: dict[str, list] = {}
    meta: dict[str, tuple] = {}
    for i, term in enumerate(terms):
        ids, tfs = decode_postings(dvb[i], tvb[i], int(nloc[i]))
        runs.setdefault(term, []).append((ids, tfs))
        prev = meta.get(term)
        meta[term] = (int(tsh[i]),
                      max(int(dfs[i]), prev[1]) if prev else int(dfs[i]))
    out = {k: [] for k in ("term", "term_shard", "salt", "df", "n_local",
                           "doc_ids_vb", "tfs_vb", "block_last_doc",
                           "block_max_tf")}
    for term in sorted(runs):
        rs = runs[term]
        if len(rs) == 1:
            ids, tfs = rs[0]
        else:
            ids = np.concatenate([r[0] for r in rs])
            tfs = np.concatenate([r[1] for r in rs])
            o = np.argsort(ids)
            ids, tfs = ids[o], tfs[o]
        nsalts = 1
        if hot_term_df_threshold > 0:
            nsalts = max(1, -(-len(ids) // hot_term_df_threshold))
        if nsalts == 1:
            pieces = [(0, ids, tfs)]
        else:
            salt_of = (np.asarray(ids, np.int64)
                       // max(num_doc_shards, 1)) % nsalts
            pieces = [(s, ids[salt_of == s], tfs[salt_of == s])
                      for s in range(nsalts)]
        for s, p_ids, p_tfs in pieces:
            if not len(p_ids):
                continue
            d, v, bl, bm = encode_postings(p_ids, p_tfs, block_size)
            out["term"].append(term)
            out["term_shard"].append(meta[term][0])
            out["salt"].append(s)
            out["df"].append(meta[term][1])
            out["n_local"].append(len(p_ids))
            out["doc_ids_vb"].append(d)
            out["tfs_vb"].append(v)
            out["block_last_doc"].append(np.asarray(bl).tolist())
            out["block_max_tf"].append(np.asarray(bm).tolist())
    return pa.table({
        "term": pa.array(out["term"], pa.string()),
        "term_shard": pa.array(out["term_shard"], pa.int32()),
        "salt": pa.array(out["salt"], pa.int32()),
        "df": pa.array(out["df"], pa.int64()),
        "n_local": pa.array(out["n_local"], pa.int32()),
        "doc_ids_vb": pa.array(out["doc_ids_vb"], pa.binary()),
        "tfs_vb": pa.array(out["tfs_vb"], pa.binary()),
        "block_last_doc": pa.array(out["block_last_doc"],
                                   pa.list_(pa.uint64())),
        "block_max_tf": pa.array(out["block_max_tf"],
                                 pa.list_(pa.uint64())),
    })


def compact_index(index_dir: str,
                  cfg: EngineConfig | None = None) -> dict:
    """LSM-style maintenance after a chain of appends: merge every
    term's posting runs back into ONE row per (term, doc_shard) and
    every dedup key band's runs into one sorted run.

    Logical content is unchanged (decoded postings, verdicts, query
    results — tested); what changes is physical row count and the
    per-term run fan-in the shard actors pay at load.  One task per
    doc shard / key band; each dir swaps atomically, so a kill leaves
    either the old or the new layout, never a mix.
    """
    cfg = cfg or EngineConfig()
    meta_path = os.path.join(index_dir, "meta.json")
    with open(meta_path) as f:
        meta = json.load(f)
    if meta.get("config_fingerprint") != cfg.fingerprint():
        raise ValueError("compact config differs from the built index")
    stats = {"shards": 0, "rows_before": 0, "rows_after": 0,
             "key_runs_merged": 0}

    post_dir = os.path.join(index_dir, "postings")
    shard_dirs = sorted(glob.glob(os.path.join(post_dir, "doc_shard=*")))
    futs, names = [], []
    for sd in shard_dirs:
        files = _pq_files(sd)
        stats["rows_before"] += sum(pq.read_metadata(f).num_rows
                                    for f in files)
        futs.append(_compact_shard_task.remote(
            files, cfg.posting_block_size, cfg.num_doc_shards,
            cfg.hot_term_df_threshold))
        names.append(sd)
    for sd, fut in zip(names, futs):
        t = ray.get(fut)
        stats["rows_after"] += t.num_rows
        stats["shards"] += 1
        with lineage.atomic_dir(sd) as tmp:
            pq.write_table(t, os.path.join(tmp, "compacted.parquet"))

    keys_dir = os.path.join(index_dir, "dedup", "keys")
    if os.path.isdir(keys_dir):
        for bd in sorted(glob.glob(os.path.join(keys_dir, "band=*"))):
            files = _pq_files(bd)
            if len(files) <= 1:
                continue
            t = pq.read_table(files)
            o = pa.compute.sort_indices(t["key"])
            t = t.take(o)
            with lineage.atomic_dir(bd) as tmp:
                pq.write_table(t, os.path.join(tmp, "run-full.parquet"),
                               row_group_size=65536)
            stats["key_runs_merged"] += len(files)

    meta["n_posting_rows"] = stats["rows_after"]
    meta["compacted"] = True
    with open(meta_path, "w") as f:
        json.dump(meta, f, indent=1)
    return stats
