"""Per-partition lineage manifests — the resumability substrate.

The reference has no checkpointing (any MPI failure kills the job, SURVEY.md
section 4); the north_rule requires a killed index build to resume without
re-tokenizing completed partitions. Every unit of work (tokenize shard /
posting-segment partition) writes its output to a temp dir and atomically
renames it into place together with a ``MANIFEST.json`` recording lineage:
the input fingerprint (corpus files + sizes + config), row counts, stream
checksums and status. On restart, work units whose manifest matches the
current fingerprint are skipped.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import tempfile
import time
from typing import Any

MANIFEST_NAME = "MANIFEST.json"


def corpus_fingerprint(files: list[str], config_fingerprint: str) -> str:
    """Stable fingerprint of (input file list + sizes + mtimes + config).

    mtime_ns is included so a corpus file rewritten with different content
    but an identical size still invalidates resume state (size alone would
    silently reuse stale tokenize shards and index segments)."""
    h = hashlib.sha256()
    for f in sorted(files):
        st = os.stat(f)
        h.update(f"{os.path.basename(f)}:{st.st_size}:{st.st_mtime_ns}".encode())
        h.update(b"\x00")
    h.update(config_fingerprint.encode())
    return h.hexdigest()[:24]


def shard_fingerprint(file: str, config_fingerprint: str) -> str:
    """Per-input-file fingerprint: an appended corpus re-tokenizes only new
    shards (the whole-corpus fingerprint still gates segment/dictionary
    state, which any corpus change invalidates). Includes mtime_ns for the
    same same-size-rewrite reason as corpus_fingerprint."""
    st = os.stat(file)
    h = hashlib.sha256()
    h.update(f"{os.path.basename(file)}:{st.st_size}:{st.st_mtime_ns}".encode())
    h.update(config_fingerprint.encode())
    return h.hexdigest()[:24]


def safe_name(file: str) -> str:
    """Filesystem-safe stable key for a corpus file (manifest/pairs naming)."""
    base = os.path.basename(file)
    return "".join(c if c.isalnum() or c in "._-" else "_" for c in base)


def write_manifest(out_dir: str, payload: dict[str, Any]) -> None:
    payload = dict(payload)
    payload.setdefault("written_at", time.time())
    payload.setdefault("status", "complete")
    tmp = os.path.join(out_dir, MANIFEST_NAME + ".tmp")
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(out_dir, MANIFEST_NAME))


def read_manifest(dir_path: str) -> dict[str, Any] | None:
    p = os.path.join(dir_path, MANIFEST_NAME)
    if not os.path.exists(p):
        return None
    try:
        with open(p) as f:
            m = json.load(f)
    except (json.JSONDecodeError, OSError):
        return None
    return m if m.get("status") == "complete" else None


def write_manifest_file(path: str, payload: dict[str, Any]) -> None:
    """Standalone manifest file (for work units whose outputs are spread
    across several directories, e.g. per-partition pair files)."""
    payload = dict(payload)
    payload.setdefault("written_at", time.time())
    payload.setdefault("status", "complete")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    os.replace(tmp, path)


def read_manifest_file(path: str) -> dict[str, Any] | None:
    if not os.path.exists(path):
        return None
    try:
        with open(path) as f:
            m = json.load(f)
    except (json.JSONDecodeError, OSError):
        return None
    return m if m.get("status") == "complete" else None


def is_complete(dir_path: str, fingerprint: str) -> bool:
    m = read_manifest(dir_path)
    return m is not None and m.get("fingerprint") == fingerprint


class AtomicDir:
    """Write into a temp sibling dir, rename into place on success.

    A crashed task leaves only a ``.tmp-*`` dir (ignored + garbage-collected
    on the next run); the final dir either fully exists with its manifest or
    not at all.
    """

    def __init__(self, final_dir: str):
        self.final_dir = final_dir
        parent = os.path.dirname(final_dir) or "."
        os.makedirs(parent, exist_ok=True)
        self.tmp_dir = tempfile.mkdtemp(
            prefix=".tmp-" + os.path.basename(final_dir) + "-", dir=parent
        )

    def __enter__(self) -> str:
        return self.tmp_dir

    def __exit__(self, exc_type, exc, tb):
        if exc_type is None:
            if os.path.isdir(self.final_dir):
                shutil.rmtree(self.final_dir)
            os.replace(self.tmp_dir, self.final_dir)
        else:
            shutil.rmtree(self.tmp_dir, ignore_errors=True)
        return False


def gc_tmp_dirs(parent: str) -> int:
    """Remove leftover ``.tmp-*`` dirs from crashed runs; returns count."""
    n = 0
    if not os.path.isdir(parent):
        return 0
    for name in os.listdir(parent):
        if name.startswith(".tmp-"):
            shutil.rmtree(os.path.join(parent, name), ignore_errors=True)
            n += 1
    return n
