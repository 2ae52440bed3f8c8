"""Process-level runtime tuning applied inside executor workers.

Transparent-huge-page interaction (measured on this host, generalizes
to any Linux with `/sys/kernel/mm/transparent_hugepage/enabled =
madvise`): numpy advises MADV_HUGEPAGE on every allocation >= 4 MiB, so
each large temporary in the encode/scoring kernels asks the kernel for
2 MiB-contiguous pages; under memory fragmentation that triggers direct
compaction, whose zone-lock stalls SERIALIZE across concurrently
faulting worker processes. Measured effect at 5 concurrent 156k-doc
encode groups: mean task 203 s with THP madvise vs 30-32 s with it
disabled (6.5x) — this single switch was the round-4 "encode-group
superlinearity" (scripts/encode_profile.py probes). It also explains
the multi-x run-to-run drift on long sessions: compaction cost grows as
free memory fragments.

`PR_SET_THP_DISABLE` turns THP off for the calling process only (no
root, no sysfs writes, overrides numpy's madvise at the kernel level,
inherited by forks) — the per-process form of the THP-off guidance
ClickHouse and Elasticsearch ship for their servers. Hosts where THP
measurably helps can opt out with DIAGON_KEEP_THP=1.
"""

from __future__ import annotations

import ctypes
import os

_PR_SET_THP_DISABLE = 41
_done = False


def disable_thp_once() -> None:
    """Disable transparent huge pages for this process (idempotent,
    best-effort, no-op off Linux or with DIAGON_KEEP_THP=1). Called at
    the top of every heavy numpy kernel that runs inside executor
    python workers."""
    global _done
    if _done:
        return
    _done = True
    if os.environ.get("DIAGON_KEEP_THP"):
        return
    try:
        libc = ctypes.CDLL(None, use_errno=True)
        libc.prctl(_PR_SET_THP_DISABLE, 1, 0, 0, 0)
    except Exception:  # noqa: BLE001 - tuning must never break a task
        pass


def thp_disabled() -> int:
    """Current PR_GET_THP_DISABLE flag (observability; -1 on failure)."""
    try:
        libc = ctypes.CDLL(None, use_errno=True)
        return int(libc.prctl(_PR_SET_THP_DISABLE + 1, 0, 0, 0, 0))
    except Exception:  # noqa: BLE001
        return -1
