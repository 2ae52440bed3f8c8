"""Single-box substrate decomposition for the scaling-efficiency gate.

Runs the engine's ACTUAL segment-encode kernel under bare multiprocessing
(zero Spark) at two process counts, measuring per-task wall inflation —
the memory-bandwidth contention a single box imposes on ANY concurrent
execution of this kernel. Comparing these ceilings with the full Spark
build's measured efficiency shows how much (if anything) Spark's
orchestration costs beyond the substrate. On a real N→4N EXECUTOR
cluster each node brings its own memory bus, so the contention term
scales with N by construction.

Usage: python scripts/substrate_probe.py <procs_a> <procs_b> [n_groups] [docs_per_group]
Prints one JSON line.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
os.environ.setdefault("OMP_NUM_THREADS", "1")

import multiprocessing as mp

import numpy as np

DOCS_PER_GROUP = 2500  # default; arg 4 overrides (match the real layout:
#   19.5k docs/group for the 10M ladder, so the probed working set
#   stresses DRAM the way the production encode tasks do)


def _work(args):
    seg, pdf = args
    from diagon_spark.index.builder import _encode_segment_fn
    fn = _encode_segment_fn(16, True)
    t = time.time()
    fn((seg, "content"), pdf)
    return time.time() - t


def main() -> None:
    procs_a, procs_b = int(sys.argv[1]), int(sys.argv[2])
    n_groups = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    global DOCS_PER_GROUP
    if len(sys.argv) > 4:
        DOCS_PER_GROUP = int(sys.argv[4])
    from diagon_spark.corpus import generate_pandas
    groups = []
    for seg in range(n_groups):
        pdf = generate_pandas(seg * DOCS_PER_GROUP,
                              (seg + 1) * DOCS_PER_GROUP) \
            .rename(columns={"content": "__content"})
        pdf["doc_id"] = np.arange(len(pdf), dtype=np.int64)
        groups.append((seg, pdf[["doc_id", "__content"]]))

    out = {"n_groups": n_groups, "docs_per_group": DOCS_PER_GROUP}
    walls = {}
    for procs in (procs_a, procs_b):
        t0 = time.time()
        with mp.get_context("fork").Pool(procs) as p:
            times = p.map(_work, groups, chunksize=1)
        walls[procs] = time.time() - t0
        out[f"procs_{procs}"] = {
            "wall_sec": round(walls[procs], 2),
            "mean_task_sec": round(float(np.mean(times)), 3),
        }
    ratio = procs_b / procs_a
    out["kernel_efficiency"] = round(
        walls[procs_a] / (ratio * walls[procs_b]), 3)
    out["task_inflation"] = round(
        out[f"procs_{procs_b}"]["mean_task_sec"]
        / out[f"procs_{procs_a}"]["mean_task_sec"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
