"""Command-line entry points: ``python -m searchenginesimple_ray``.

The runnable equivalent of the reference's binaries (index builder +
servers, `/root/reference/src`): build / append / compact an index,
run ad-hoc queries and suggestions, or start the HTTP gateway.

This module OWNS the Ray session (library code never calls
``ray.init``); every command initialises local Ray unless a session
already exists.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys


def _init_ray(num_cpus: int | None):
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False


def _input_files(path: str) -> list[str]:
    """A parquet/jsonl file, a directory of them, or a glob."""
    if os.path.isdir(path):
        # skip underscore-prefixed sidecars (_manifest, _truth_* ...,
        # the hadoop convention for non-data files)
        files = sorted(
            f for f in glob.glob(os.path.join(path, "*.parquet"))
            if not os.path.basename(f).startswith("_")) or \
            sorted(glob.glob(os.path.join(path, "*.jsonl"))) or \
            sorted(glob.glob(os.path.join(path, "*.csv")))
    elif os.path.exists(path):
        files = [path]
    else:
        files = sorted(glob.glob(path))
    if not files:
        raise SystemExit(f"no input files under {path!r}")
    return files


def _config(args) -> "EngineConfig":
    from .config import EngineConfig
    kw = {}
    if getattr(args, "doc_shards", None):
        kw["num_doc_shards"] = args.doc_shards
    if getattr(args, "buckets", None):
        kw["num_input_buckets"] = args.buckets
    return EngineConfig(**kw)


def _load_inputs(files: list[str], staging_root: str) -> list[str]:
    """JSONL/CSV inputs stage once to canonical-schema parquet (the
    build pipeline consumes parquet file lists); parquet passes
    through."""
    ext = os.path.splitext(files[0])[1]
    if ext not in (".jsonl", ".csv"):
        return files
    import hashlib

    from .sources.transcripts import (read_transcripts_csv,
                                      read_transcripts_jsonl)
    from .state.lineage import input_fingerprint
    fp = hashlib.sha256(input_fingerprint(files).encode()) \
        .hexdigest()[:16]
    # content-addressed per input set: a build and a later append with
    # different staged deltas never reuse each other's staging
    stage = os.path.join(staging_root, f"{ext[1:]}_staging_{fp}")
    if not os.path.isdir(stage) or not os.listdir(stage):
        # write to a temp dir and rename into place: a run killed mid
        # write_parquet must not leave a partial parquet set that a
        # later build/append silently reuses (dropping input rows)
        import shutil
        tmp = stage + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)
        reader = read_transcripts_jsonl if ext == ".jsonl" \
            else read_transcripts_csv
        reader(files).write_parquet(tmp)
        shutil.rmtree(stage, ignore_errors=True)   # stale empty dir
        os.replace(tmp, stage)
    return sorted(glob.glob(os.path.join(stage, "*.parquet")))


def cmd_build(args) -> int:
    _init_ray(args.num_cpus)
    from .pipelines.index_build import build_index
    files = _load_inputs(_input_files(args.input), args.out)
    res = build_index(files, args.out, _config(args))
    print(json.dumps({"out": args.out, "n_docs": res.n_docs,
                      "stages_run": res.stages_run}))
    return 0


def cmd_append(args) -> int:
    _init_ray(args.num_cpus)
    from .pipelines.index_build import append_index
    files = _load_inputs(_input_files(args.input), args.index)
    res = append_index(files, args.index, _config(args))
    print(json.dumps({"index": args.index,
                      "n_new_docs": getattr(res, "n_docs", None)}))
    return 0


def cmd_compact(args) -> int:
    _init_ray(args.num_cpus)
    from .pipelines.index_build import compact_index
    compact_index(args.index)
    print(json.dumps({"index": args.index, "compacted": True}))
    return 0


def _engine(args):
    from .pipelines.query import QueryEngine
    return QueryEngine(args.index, num_actors=args.actors,
                       num_cpus_per_actor=args.actor_cpus)


def cmd_query(args) -> int:
    _init_ray(args.num_cpus)
    eng = _engine(args)
    for hit in eng.topk(args.sentence, scorer=args.scorer, k=args.k):
        print(json.dumps(hit))
    return 0


def _suggester(index_dir: str):
    """Build (or load the cached) suggestion dict + char index from the
    index's doc store; artifacts live under <index>/suggest/."""
    import pyarrow.parquet as pq
    import ray.data

    from .config import DEFAULT_STOP_WORDS
    from .pipelines.suggest import (Suggester, build_char_index,
                                    build_dict)
    from .stages.tokenizer import tokenize_to_doc_terms
    sdir = os.path.join(index_dir, "suggest")
    if not os.path.exists(os.path.join(sdir, "dict.parquet")):
        docs = ray.data.read_parquet(
            os.path.join(index_dir, "docs"), columns=["doc_id", "text"])
        d = build_dict(tokenize_to_doc_terms(
            docs, stop_words=DEFAULT_STOP_WORDS))
        c = build_char_index(d)
        tmp = sdir + ".tmp"
        os.makedirs(tmp, exist_ok=True)
        import pyarrow as pa
        pq.write_table(pa.Table.from_pandas(d),
                       os.path.join(tmp, "dict.parquet"))
        pq.write_table(pa.Table.from_pandas(c),
                       os.path.join(tmp, "char_index.parquet"))
        os.replace(tmp, sdir)    # atomic publish; reused on next run
    return Suggester(sdir)


def cmd_suggest(args) -> int:
    _init_ray(args.num_cpus)
    s = _suggester(args.index)
    for hit in s.suggest(args.query, k=args.k):
        print(json.dumps(hit))
    return 0


def cmd_serve(args) -> int:
    _init_ray(args.num_cpus)
    from .pipelines.serve import SearchGateway, start_server
    gw = SearchGateway(_engine(args), _suggester(args.index),
                       clicks_dir=os.path.join(args.index, "clicks"))
    server, thread = start_server(gw, port=args.port)
    print(json.dumps({"port": server.server_address[1]}), flush=True)
    try:
        thread.join()
    except KeyboardInterrupt:       # pragma: no cover - interactive
        server.shutdown()
    return 0


def cmd_curate(args) -> int:
    _init_ray(args.num_cpus)
    import ray.data

    from .config import DEFAULT_STOP_WORDS
    from .pipelines.curation import curate_write
    ds = ray.data.read_parquet(_input_files(args.input))
    r = curate_write(ds, args.out, stop_words=DEFAULT_STOP_WORDS,
                     min_tokens=args.min_tokens, seed=args.seed,
                     id_col=args.id_col, text_col=args.text_col,
                     lm_centibits=args.lm_centibits)
    print(json.dumps(r))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="searchenginesimple_ray")
    p.add_argument("--num-cpus", type=int, default=None, dest="num_cpus")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build an index from transcripts")
    b.add_argument("--input", required=True)
    b.add_argument("--out", required=True)
    b.add_argument("--doc-shards", type=int, dest="doc_shards")
    b.add_argument("--buckets", type=int, dest="buckets")
    b.set_defaults(fn=cmd_build)

    a = sub.add_parser("append", help="append new conversations")
    a.add_argument("--input", required=True)
    a.add_argument("--index", required=True)
    a.add_argument("--doc-shards", type=int, dest="doc_shards")
    a.add_argument("--buckets", type=int, dest="buckets")
    a.set_defaults(fn=cmd_append)

    c = sub.add_parser("compact", help="merge append runs (LSM compact)")
    c.add_argument("--index", required=True)
    c.set_defaults(fn=cmd_compact)

    q = sub.add_parser("query", help="top-k query against an index")
    q.add_argument("--index", required=True)
    q.add_argument("--scorer", default="bm25")
    q.add_argument("-k", type=int, default=10)
    q.add_argument("--actors", type=int, default=None,
                   help="scorer pool size (default: one per doc shard)")
    q.add_argument("--actor-cpus", type=float, default=1.0,
                   dest="actor_cpus")
    q.add_argument("sentence")
    q.set_defaults(fn=cmd_query)

    s = sub.add_parser("suggest", help="edit-distance suggestions")
    s.add_argument("--index", required=True)
    s.add_argument("-k", type=int, default=10)
    s.add_argument("query")
    s.set_defaults(fn=cmd_suggest)

    u = sub.add_parser(
        "curate", help="quality-filter + dedup + split a documents "
        "table to hive-partitioned parquet (one dir per split)")
    u.add_argument("--input", required=True,
                   help="parquet file/dir/glob with (doc_id, text)")
    u.add_argument("--out", required=True)
    u.add_argument("--min-tokens", type=int, default=50,
                   dest="min_tokens")
    u.add_argument("--lm-centibits", type=int, default=None,
                   dest="lm_centibits",
                   help="also apply the unigram-LM surprisal band at "
                   "this max mean centibits/token (CCNet-style)")
    u.add_argument("--seed", type=int, default=0)
    u.add_argument("--id-col", default="doc_id", dest="id_col")
    u.add_argument("--text-col", default="text", dest="text_col")
    u.set_defaults(fn=cmd_curate)

    v = sub.add_parser("serve", help="HTTP gateway (/s /sug /link)")
    v.add_argument("--index", required=True)
    v.add_argument("--port", type=int, default=0)
    v.add_argument("--actors", type=int, default=None)
    v.add_argument("--actor-cpus", type=float, default=1.0,
                   dest="actor_cpus")
    v.set_defaults(fn=cmd_serve)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
