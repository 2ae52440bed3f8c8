"""write.lock — single-writer enforcement.

The reference's IndexWriter acquires a `write.lock` in the directory
before any mutation and holds it for the writer's lifetime
(index/IndexWriter.cpp open path; Lucene NativeFSLockFactory semantics):
a second writer on the same index fails fast with LockObtainFailed
instead of corrupting the commit chain. This repo's mutators
(build_index, delete_documents, commit_merge, rollback) previously only
*documented* the single-writer assumption (merge.py commit_merge
docstring); this module enforces it.

Mechanics — O_CREAT|O_EXCL on `<root>/write.lock` (atomic on POSIX local
filesystems), lock body records {pid, host, ts} so a dead holder can be
detected:

* same-host holder whose pid is gone -> stale, broken automatically
  (the NativeFSLockFactory crashed-JVM story);
* live same-host holder (or any other-host holder) -> fail fast with
  LockObtainFailedError, the first writer's commits untouched;
* re-entry by the SAME process is allowed and ref-counted, so composed
  mutators (update_documents = delete_documents + build_index,
  maybe_merge -> commit_merge) nest without deadlocking themselves.

Object-store caveat (same as _swap_write's): O_EXCL is a local-fs
primitive. On S3-like stores the equivalent is a conditional PUT
(If-None-Match) or the catalog's own optimistic commit (Iceberg/Hive
lock); the call sites are the integration points.
"""

from __future__ import annotations

import json
import os
import socket
import time
from contextlib import contextmanager
from pathlib import Path

LOCK_NAME = "write.lock"

# in-process re-entrancy: abs(root) -> hold depth
_held: dict[str, int] = {}


class LockObtainFailedError(RuntimeError):
    """Another live writer holds this index's write.lock."""


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True  # exists, owned by someone else
    return True


def _read_meta(path: Path) -> dict:
    try:
        return json.loads(path.read_text())
    except (OSError, ValueError):
        return {}


def _try_create(path: Path) -> bool:
    try:
        fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        return False
    with os.fdopen(fd, "w") as f:
        json.dump({"pid": os.getpid(), "host": socket.gethostname(),
                   "ts": time.time()}, f)
    return True


@contextmanager
def write_lock(root: str):
    """Hold the index's write.lock for the duration of a mutation.

    Raises LockObtainFailedError if another live process holds it.
    Breaks the lock automatically when its recorded same-host pid no
    longer exists (stale lock from a crashed writer).
    """
    key = os.path.abspath(root)
    if _held.get(key, 0) > 0:  # re-entrant hold by this process
        _held[key] += 1
        try:
            yield
        finally:
            _held[key] -= 1
        return

    Path(key).mkdir(parents=True, exist_ok=True)
    path = Path(key, LOCK_NAME)
    if not _try_create(path):
        meta = _read_meta(path)
        pid = int(meta.get("pid", -1))
        same_host = meta.get("host") == socket.gethostname()
        stale = same_host and (pid == os.getpid() or not _pid_alive(pid))
        if not stale:
            raise LockObtainFailedError(
                f"index {key} is locked by pid {pid} on "
                f"{meta.get('host', '?')} since {meta.get('ts', '?')} "
                f"({path}); a second concurrent writer would corrupt the "
                "commit chain — wait for it or remove the lock if the "
                "holder is known dead")
        # stale: holder crashed without releasing. Remove and retry once —
        # the retry's O_EXCL still arbitrates if two processes break the
        # same stale lock simultaneously.
        path.unlink(missing_ok=True)
        if not _try_create(path):
            raise LockObtainFailedError(
                f"lost the race re-acquiring stale lock {path}")
    _held[key] = 1
    try:
        yield
    finally:
        _held[key] -= 1
        if _held[key] <= 0:
            _held.pop(key, None)
            path.unlink(missing_ok=True)
