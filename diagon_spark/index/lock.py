"""write.lock — single-writer enforcement.

The reference's IndexWriter acquires a `write.lock` in the directory
before any mutation and holds it for the writer's lifetime
(index/IndexWriter.cpp open path; Lucene NativeFSLockFactory semantics):
a second writer on the same index fails fast with LockObtainFailed
instead of corrupting the commit chain. This repo's mutators
(build_index, delete_documents, commit_merge, rollback) all hold this
lock.

Mechanics — a kernel advisory lock (fcntl.flock LOCK_EX|LOCK_NB) on
`<root>/write.lock`, exactly NativeFSLockFactory's native-lock design:

* a crashed holder's lock is released by the kernel automatically — no
  stale-pid detection, no lock-breaking step, and therefore none of the
  read-check-unlink races a pid-file protocol has;
* a second writer — another process OR another thread of this process
  (flock conflicts between distinct open file descriptions, even within
  one process) — fails fast with LockObtainFailedError, matching the
  reference's obtain(timeout=0) behavior; the lock body records
  {pid, host, ts} purely for the error message;
* re-entry by the SAME THREAD is allowed and ref-counted, so composed
  mutators (update_documents = delete_documents + build_index,
  maybe_merge -> commit_merge) nest without deadlocking themselves;
* acquire verifies by inode that the file it locked is still the live
  `write.lock` (the unlink-vs-flock race: locking an already-unlinked
  inode protects nothing), retrying if not; release unlinks the path
  BEFORE closing the fd, so any racer that opened the doomed inode fails
  that check and retries onto the fresh file.

Object-store caveat (same as _swap_write's): flock is a local-fs
primitive. On S3-like stores the equivalent is a conditional PUT
(If-None-Match) or the catalog's own optimistic commit (Iceberg/Hive
lock); the call sites are the integration points.
"""

from __future__ import annotations

import fcntl
import json
import os
import socket
import threading
import time
from contextlib import contextmanager
from pathlib import Path

LOCK_NAME = "write.lock"

# same-THREAD re-entrancy (composed mutators): abs(root) -> (tid, depth).
# Guarded by _held_mu; any other thread falls through to flock and fails
# fast there — the reference's IndexWriter lock is per-writer, not
# per-process.
_held: dict[str, tuple[int, int]] = {}
_held_mu = threading.Lock()


class LockObtainFailedError(RuntimeError):
    """Another live writer holds this index's write.lock."""


def _read_meta(path: Path) -> dict:
    try:
        return json.loads(path.read_text())
    except (OSError, ValueError):
        return {}


def _acquire(path: Path) -> int:
    """flock the live lock file; return its open fd. Fails fast when any
    other writer (process or thread) holds the kernel lock."""
    while True:
        fd = os.open(path, os.O_CREAT | os.O_RDWR)
        try:
            fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
        except OSError:
            os.close(fd)
            meta = _read_meta(path)
            raise LockObtainFailedError(
                f"index {path.parent} is locked by pid "
                f"{meta.get('pid', '?')} on {meta.get('host', '?')} since "
                f"{meta.get('ts', '?')} ({path}); a second concurrent "
                "writer would corrupt the commit chain — wait for it (a "
                "crashed holder's lock releases automatically)") from None
        # verify we locked the LIVE file, not an inode a releasing writer
        # unlinked between our open and flock
        try:
            live_ino = os.stat(path).st_ino
        except FileNotFoundError:
            live_ino = -1
        if os.fstat(fd).st_ino == live_ino:
            os.ftruncate(fd, 0)
            os.write(fd, json.dumps({
                "pid": os.getpid(), "host": socket.gethostname(),
                "ts": time.time()}).encode())
            return fd
        os.close(fd)  # locked a dead inode — retry on the fresh file


@contextmanager
def write_lock(root: str):
    """Hold the index's write.lock for the duration of a mutation.

    Raises LockObtainFailedError if another live writer (process or
    sibling thread) holds it; a crashed writer's lock needs no breaking —
    the kernel released it. Same-thread nesting re-enters."""
    key = os.path.abspath(root)
    tid = threading.get_ident()
    with _held_mu:
        holder = _held.get(key)
        if holder is not None and holder[0] == tid:  # same-thread nesting
            _held[key] = (tid, holder[1] + 1)
            reenter = True
        else:
            reenter = False
    if reenter:
        try:
            yield
        finally:
            with _held_mu:
                t, d = _held[key]
                _held[key] = (t, d - 1)
        return

    Path(key).mkdir(parents=True, exist_ok=True)
    path = Path(key, LOCK_NAME)
    fd = _acquire(path)
    with _held_mu:
        _held[key] = (tid, 1)
    try:
        yield
    finally:
        with _held_mu:
            _held.pop(key, None)
        # unlink BEFORE close: we still hold the flock, so a racer that
        # already opened this inode fails its liveness check and retries
        path.unlink(missing_ok=True)
        os.close(fd)
