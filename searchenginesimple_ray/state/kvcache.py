"""Durable query-result cache (S8 full parity).

The reference backs its 30-entry in-process LRU caches with a shared
Redis store: on a cache miss it tries ``GET key``; on a Redis miss it
computes, ``SET``s the pair, and returns (`src/Server/KeyServer.cc:
165-219`).  This module is that durable tier for the Ray engine — a
keyed parquet store with read-through semantics:

- segments are APPEND-ONLY parquet files (``seg-<n>-<nonce>.parquet``
  with ``key``/``value`` string columns) written via tmp-file +
  ``os.replace`` so readers never see a torn segment;
- ``get`` serves from the in-memory map loaded once at construction
  (query caches are traffic-bounded, exactly like the reference's
  Redis working set);
- ``put`` buffers and flushes every ``flush_every`` new entries, so a
  crashed process loses at most one small buffer — the same
  best-effort durability as the reference's fire-and-forget
  ``resp->Redis("SET", ...)``;
- last-write-wins across segments (segment sequence number, then row
  order), so re-putting a key after an index rebuild supersedes the
  stale value without a rewrite;
- ``compact()`` folds all segments into one (run it offline; readers
  opened before a compact still hold a consistent map).
"""

from __future__ import annotations

import glob
import json
import os
import uuid

import pyarrow as pa
import pyarrow.parquet as pq


class DurableKVCache:
    """Parquet-backed string key -> string value store."""

    def __init__(self, cache_dir: str, flush_every: int = 32):
        self.dir = cache_dir
        self.flush_every = max(int(flush_every), 1)
        os.makedirs(self.dir, exist_ok=True)
        self._map: dict[str, str] = {}
        self._pending: list[tuple[str, str]] = []
        self._seq = 0
        for f in self._segments():
            t = pq.read_table(f, columns=["key", "value"])
            for k, v in zip(t["key"].to_pylist(), t["value"].to_pylist()):
                self._map[k] = v          # later segments/rows win
            self._seq = max(self._seq, self._seg_no(f) + 1)

    def _segments(self) -> list[str]:
        return sorted(glob.glob(os.path.join(self.dir, "seg-*.parquet")),
                      key=self._seg_no)

    @staticmethod
    def _seg_no(path: str) -> int:
        return int(os.path.basename(path).split("-")[1])

    def __len__(self) -> int:
        return len(self._map)

    def get(self, key: str) -> str | None:
        return self._map.get(key)

    def put(self, key: str, value: str) -> None:
        self._map[key] = value
        self._pending.append((key, value))
        if len(self._pending) >= self.flush_every:
            self.flush()

    def flush(self) -> None:
        if not self._pending:
            return
        t = pa.table({
            "key": pa.array([k for k, _ in self._pending], pa.string()),
            "value": pa.array([v for _, v in self._pending], pa.string()),
        })
        name = f"seg-{self._seq}-{uuid.uuid4().hex[:8]}.parquet"
        tmp = os.path.join(self.dir, f".tmp-{name}")
        pq.write_table(t, tmp)
        os.replace(tmp, os.path.join(self.dir, name))
        self._seq += 1
        self._pending = []

    def compact(self) -> None:
        """Fold every segment (and the pending buffer) into one."""
        old = self._segments()
        self._pending = list(self._map.items())
        if self._pending:
            self.flush()
        for f in old:
            os.remove(f)

    # -- JSON convenience (query results are list/dict payloads) -----

    def get_json(self, key: str):
        v = self.get(key)
        return None if v is None else json.loads(v)

    def put_json(self, key: str, value) -> None:
        self.put(key, json.dumps(value, ensure_ascii=False,
                                 sort_keys=True))


__all__ = ["DurableKVCache"]
