"""Round-7 harness-contract tests (VERDICT r6 asks #1/#4, ADVICE r6 #1):

- bench._emit prints ONE compact stdout JSON line (the driver records a
  bounded tail; round 6's full-detail line outgrew it and the round's
  headline record was lost) and writes the bulky detail to a sidecar;
- bench._compact_scaling leads with the gate verdict and strips the
  per-cell bulk;
- _procutil.run_grouped SIGKILLs the whole process group on timeout —
  including grandchildren holding inherited stdout fds, the exact shape
  of a hung Spark JVM under a killed Python driver.
"""

from __future__ import annotations

import json
import os
import sys
import time

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from diagon_spark._procutil import GroupTimeout, run_grouped  # noqa: E402


def test_emit_compact_line_and_sidecar(tmp_path, capsys, monkeypatch):
    monkeypatch.setattr(bench, "ART_DIR", str(tmp_path))
    headline = {"metric": "m", "value": 1.0, "unit": "sec",
                "gate_met": True}
    detail = {"local_detail": {"q": {"rounds": [0.1] * 200}},
              "query_scaling": {"pairs_detail": [{"cells": []}] * 3}}
    bench._emit(headline, detail, detail_name="t.json")
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    parsed = json.loads(out[0])
    assert parsed["gate_met"] is True
    assert parsed["detail_artifact"] == "scripts/artifacts/t.json"
    assert len(out[0]) < 1500
    with open(tmp_path / "t.json") as f:
        assert json.load(f) == detail


def test_compact_scaling_gate_first_and_stripped():
    qs = {
        "gate_met": True, "pair_effs": [0.9], "pair_ceilings": [0.95],
        "pair_eff_vs_ceiling": [0.947], "efficiency_1to4": 0.9,
        "kernel_ceiling_1to4": 0.95, "efficiency_vs_ceiling": 0.947,
        "corpus_docs": 800000, "qps_best_1core": 0.1,
        "qps_best_4core": 0.4, "qps_median_pair_1core": 0.1,
        "qps_median_pair_4core": 0.4, "cell_order": ["1-4"],
        "ladder_build_sec": 10.0,
        "qps_rounds_1core": [[0.1, 0.1]], "qps_rounds_4core": [[0.4]],
        "pairs_detail": [{"cells": [{"pre": {}, "post": {}}]}],
    }
    compact = bench._compact_scaling(qs)
    assert "pairs_detail" not in compact
    assert "qps_rounds_1core" not in compact
    assert next(iter(compact)) == "gate_met"
    # compact form stays well inside the driver's tail window on its own
    assert len(json.dumps(compact)) < 600


def test_run_grouped_kills_grandchild():
    # child prints its grandchild's pid, then both sleep far past the
    # timeout; the grandchild inherits the output fds (the Spark-JVM
    # shape that deadlocked subprocess.run's pipe drain)
    code = ("import subprocess, sys, time\n"
            "p = subprocess.Popen(['sleep', '300'])\n"
            "print('GRANDCHILD', p.pid, flush=True)\n"
            "time.sleep(300)\n")
    t0 = time.time()
    with pytest.raises(GroupTimeout) as ei:
        run_grouped([sys.executable, "-c", code], timeout=2)
    # no pipe-EOF hang: returns promptly despite the sleeping grandchild
    assert time.time() - t0 < 30
    pid = int(ei.value.stdout.split()[1])
    for _ in range(50):  # SIGKILL delivery is async; bounded wait
        try:
            os.kill(pid, 0)
        except ProcessLookupError:
            break
        time.sleep(0.1)
    else:
        os.kill(pid, 9)
        pytest.fail("grandchild survived the group kill")


def test_run_grouped_normal_exit():
    rc, out, err = run_grouped(
        [sys.executable, "-c", "import sys; print('ok'); "
         "print('e', file=sys.stderr)"], timeout=30)
    assert rc == 0 and out.strip() == "ok" and err.strip() == "e"
