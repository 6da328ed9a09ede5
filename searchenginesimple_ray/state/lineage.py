"""Per-partition checkpoint lineage (north rule: resumable builds).

The reference's only persistence is a single final cereal snapshot
(`include/Page/Page.hpp:376-381`); a killed build restarts from zero.
Here every build stage writes partitioned Parquet under its own
directory, committed ATOMICALLY (write to ``<dir>.tmp-<nonce>``, fsync,
``os.rename``) and sealed with a ``_lineage.json`` manifest::

    {"stage": ..., "partition": ..., "input_fingerprint": ...,
     "config_fingerprint": ..., "row_count": ..., "extra": {...}}

Resume rule: a partition whose manifest exists and whose two
fingerprints match the current run is SKIPPED (its Parquet is reused);
anything else is recomputed and atomically replaced.  The input
fingerprint covers the input file list (name + size per file), so
changed inputs invalidate downstream checkpoints.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import uuid

MANIFEST = "_lineage.json"


def input_fingerprint(files: list[str]) -> str:
    """Per-file fingerprint: name + size + mtime_ns.  Size alone lets a
    regenerated input whose byte count happens to match silently pass
    ``is_complete`` and resume over stale checkpoints; mtime_ns changes
    on any rewrite."""
    h = hashlib.sha256()
    for f in sorted(files):
        st = os.stat(f)
        h.update(f"{os.path.basename(f)}:{st.st_size}:"
                 f"{st.st_mtime_ns}\n".encode())
    return h.hexdigest()[:16]


def manifest_path(part_dir: str) -> str:
    return os.path.join(part_dir, MANIFEST)


def is_complete(part_dir: str, stage: str, input_fp: str, config_fp: str) -> bool:
    p = manifest_path(part_dir)
    if not os.path.exists(p):
        return False
    try:
        with open(p) as f:
            m = json.load(f)
    except (json.JSONDecodeError, OSError):
        return False
    return (m.get("stage") == stage
            and m.get("input_fingerprint") == input_fp
            and m.get("config_fingerprint") == config_fp)


def read_manifest(part_dir: str) -> dict | None:
    p = manifest_path(part_dir)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def seal(part_dir: str, stage: str, partition, input_fp: str, config_fp: str,
         row_count: int, extra: dict | None = None) -> dict:
    """Write the manifest INSIDE an already-written partition dir."""
    m = {"stage": stage, "partition": partition, "input_fingerprint": input_fp,
         "config_fingerprint": config_fp, "row_count": int(row_count),
         "extra": extra or {}}
    tmp = manifest_path(part_dir) + f".tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump(m, f, indent=1)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, manifest_path(part_dir))
    return m


def gc_tmp_dirs(root: str) -> list[str]:
    """Remove uncommitted ``*.tmp-<nonce>`` dirs (and stray manifest tmp
    files) left by a killed run anywhere under ``root``.

    Recovery rule first: a ``<final>.tmp-old-<nonce>`` dir is the
    PREVIOUS version of a partition parked by ``atomic_dir`` during
    its two-rename commit.  If the final dir is missing (crash inside
    the commit window), the old version is RESTORED — the stage then
    re-runs under lineage as usual; if the final dir exists, the
    parked copy is garbage."""
    removed = []
    for dirpath, dirnames, filenames in os.walk(root, topdown=True):
        for d in list(dirnames):
            if ".tmp-old-" in d:
                full = os.path.join(dirpath, d)
                final = full[:full.index(".tmp-old-")]
                if not os.path.exists(final):
                    os.rename(full, final)
                else:
                    shutil.rmtree(full, ignore_errors=True)
                    removed.append(full)
                dirnames.remove(d)
        for d in list(dirnames):
            if ".tmp-" in d:
                full = os.path.join(dirpath, d)
                shutil.rmtree(full, ignore_errors=True)
                removed.append(full)
                dirnames.remove(d)
        for f in filenames:
            if ".tmp-" in f:
                full = os.path.join(dirpath, f)
                try:
                    os.remove(full)
                except OSError:
                    pass
                removed.append(full)
    return removed


class atomic_dir:
    """``with atomic_dir(final) as tmp: write into tmp`` — commits by
    rename; a crash mid-write leaves no half-complete partition.

    Commit is two renames, never a destructive window: the previous
    version is PARKED (``<final>.tmp-old-<nonce>``) before the new one
    renames in, then the parked copy is dropped.  A kill between the
    renames leaves the old version parked and recoverable — see
    ``gc_tmp_dirs`` — instead of destroying the only copy of stages
    that merge in place (the append path's term_df reads its prior
    table from the dir it replaces)."""

    def __init__(self, final_dir: str):
        self.final = final_dir
        nonce = uuid.uuid4().hex[:8]
        self.tmp = final_dir + f".tmp-{nonce}"
        self.old = final_dir + f".tmp-old-{nonce}"

    def __enter__(self) -> str:
        os.makedirs(self.tmp, exist_ok=True)
        return self.tmp

    def __exit__(self, exc_type, exc, tb):
        if exc_type is not None:
            shutil.rmtree(self.tmp, ignore_errors=True)
            return False
        had_old = os.path.exists(self.final)
        if had_old:
            os.rename(self.final, self.old)
        os.rename(self.tmp, self.final)
        if had_old:
            shutil.rmtree(self.old, ignore_errors=True)
        return False
