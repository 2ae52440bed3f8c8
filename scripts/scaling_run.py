"""Scaling-efficiency evidence (north_rule): run the SAME index-build job
on the SAME input at two parallelism levels (sandbox stand-in for N vs 4N
executors), report throughput at both + efficiency.

Usage:
  python scripts/scaling_run.py prepare <n_docs> <input_dir>   # once
  python scripts/scaling_run.py run <cpus> <input_dir> <out>   # per level
  python scripts/scaling_run.py report <json8> <json32>        # efficiency
  python scripts/scaling_run.py pairseq <n> <4n> <input_dir> <out_base> \
      [segments] [n_pairs]    # drift-proof alternating adjacent pairs

`run` prints one JSON line {"cpus":..,"n_docs":..,"build_sec":..,
"docs_per_sec":..,"query_p50_ms":{...}}. Each level must run in its own
process (Spark master fixed per JVM).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _spark(cpus: int):
    from pyspark.sql import SparkSession
    return (SparkSession.builder.master(f"local[{cpus}]")
            .appName(f"diagon-scaling-{cpus}")
            .config("spark.sql.shuffle.partitions", str(max(cpus * 2, 8)))
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.driver.memory", "48g")
            # fresh python worker per task: long-lived workers degrade
            # ~60% across sequential heavy encode tasks (allocator/heap
            # growth); spawn cost is negligible vs seconds-long tasks
            .config("spark.python.worker.reuse", "false")
            .config("spark.ui.enabled", "false")
            .getOrCreate())


def prepare(n_docs: int, input_dir: str) -> None:
    from diagon_spark.corpus import corpus_df
    spark = _spark(32)
    corpus_df(spark, n_docs, partitions=64).write.mode("overwrite") \
        .parquet(input_dir)
    print(f"wrote {n_docs} docs to {input_dir}")
    spark.stop()


def run(cpus: int, input_dir: str, out_dir: str,
        num_segments: int = 64) -> None:
    from pyspark.sql import functions as F
    from diagon_spark import build_index, Searcher
    from diagon_spark.search.query import Boolean, Phrase, Term

    spark = _spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(input_dir)
    n_docs = df.count()
    shutil.rmtree(out_dir, ignore_errors=True)

    # IDENTICAL work at every parallelism level: fixed segment count
    # (default 64 = 2x the largest level), only executor slots vary.
    # Round-4 measured encode-group cost SUPERLINEAR in group size
    # (15.6k-doc groups ≈ 2,200 docs/s/task vs 156k ≈ 590) which forced
    # num_segments to scale with corpus size. Round 5 root-caused it
    # (cache-capacity: random-access phases go DRAM-latency-bound under
    # concurrency once buffers outgrow the LLC share) and fixed the
    # kernel: zero-object flat tokenization + cache-sized internal
    # slices for tokenize/factorize/codec (tokenizer.
    # tokenize_factorize_sliced, codec.encode_segment_batch slice_groups)
    # — see scripts/encode_profile.py for the standalone and in-Spark
    # group-size probes. Segment count is now a layout choice, not a
    # survival knob.
    t0 = time.time()
    cat = build_index(spark, df, out_dir, num_segments=num_segments,
                      num_buckets=16, positions=True)
    build_sec = time.time() - t0

    searcher = Searcher(spark, cat)
    qset = {
        "single": Term("int"),
        "and_2": Boolean(must=[Term("int"), Term("return")]),
        "or_10": Boolean(should=[Term(t) for t in
                                 ["int", "return", "if", "for", "while",
                                  "const", "static", "void", "class", "def"]]),
        "phrase": Phrase(("static", "void")),
    }
    lat = {}
    for name, q in qset.items():
        searcher.search(q, k=100).collect()  # warm
        times = []
        for _ in range(5):
            t = time.time()
            searcher.search(q, k=100).collect()
            times.append(time.time() - t)
        lat[name] = round(sorted(times)[len(times) // 2] * 1000, 1)

    print(json.dumps({
        "cpus": cpus,
        "n_docs": n_docs,
        "build_sec": round(build_sec, 2),
        "docs_per_sec": round(n_docs / build_sec, 1),
        "query_p50_ms": lat,
    }))
    spark.stop()


def _count_docs(input_dir: str) -> int:
    """Row count from parquet footers (no Spark) — sizes the pairseq
    per-level timeout."""
    import pathlib

    import pyarrow.parquet as pq
    n = 0
    for f in pathlib.Path(input_dir).rglob("*.parquet"):
        try:
            n += pq.ParquetFile(str(f)).metadata.num_rows
        except Exception:  # noqa: BLE001 - non-parquet stragglers
            pass
    return max(n, 1)


def pairseq(cpus_a: int, cpus_b: int, input_dir: str, out_base: str,
            num_segments: int = 64, n_pairs: int = 2) -> None:
    """Drift-proof N→4N pair: run build levels in ALTERNATING order
    (a,b then b,a then a,b ...), each level in its own subprocess/JVM,
    and report every adjacent-pair efficiency plus the median — the
    discipline bench.py's query ladder uses, applied to the build gate.
    Round-5 measured two identical-config 10M builds 24% apart two
    hours apart; a single sequential pair inherits that drift as bias,
    alternating adjacent pairs cancel it in the median."""
    results: list[dict] = []  # chronological {cpus, docs_per_sec}

    def _one(cpus: int, tag: str) -> dict:
        out = f"{out_base}_{tag}"
        # generous corpus-scaled timeout (ADVICE r5 #3): one hung build
        # must fail the level, not stall the whole alternating harness.
        # Budget: worst measured low-core rate ~1.2k docs/s with 5x
        # headroom, floor 30 min (same spirit as bench.py --cell's 1800).
        n_docs = _count_docs(input_dir)
        budget = max(1800.0, n_docs / 1200.0 * 5.0)
        try:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "run",
                 str(cpus), input_dir, out, str(num_segments)],
                capture_output=True, text=True, timeout=budget)
        except subprocess.TimeoutExpired:
            shutil.rmtree(out, ignore_errors=True)
            raise RuntimeError(
                f"level {cpus} timed out after {budget:.0f}s")
        shutil.rmtree(out, ignore_errors=True)
        if p.returncode != 0:
            raise RuntimeError(f"level {cpus} failed: {p.stderr[-2000:]}")
        line = [ln for ln in p.stdout.splitlines()
                if ln.startswith("{")][-1]
        return json.loads(line)

    for i in range(n_pairs):
        order = (cpus_a, cpus_b) if i % 2 == 0 else (cpus_b, cpus_a)
        for c in order:
            r = _one(c, f"p{i}c{c}")
            results.append({"cpus": r["cpus"],
                            "docs_per_sec": r["docs_per_sec"]})
            # incremental per-level progress on stderr: a multi-hour
            # pairseq previously held ALL results in parent memory until
            # the final print — a kill or crash lost the whole session.
            # One flushed line per completed level makes a partial run
            # recoverable from the log (round-6 lesson: a 4.5 h 10M run
            # with zero visibility).
            print("PAIRSEQ-LEVEL " + json.dumps(
                {"ts": round(time.time(), 1), "pair": i, "cpus": c,
                 "build_sec": r["build_sec"],
                 "docs_per_sec": r["docs_per_sec"]}),
                file=sys.stderr, flush=True)
    ratio = cpus_b / cpus_a
    pair_effs = []
    for x, y in zip(results, results[1:]):  # every ADJACENT a/b pair
        lo, hi = ((x, y) if x["cpus"] == cpus_a else (y, x))
        if lo["cpus"] == cpus_a and hi["cpus"] == cpus_b:
            pair_effs.append(round(
                hi["docs_per_sec"] / (ratio * lo["docs_per_sec"]), 3))
    med = None
    if pair_effs:
        s = sorted(pair_effs)
        n = len(s)
        # true median; for even counts the MIDPOINT of the middle two —
        # the upper-median would silently report max() at n_pairs=2
        med = round(s[n // 2] if n % 2 else
                    (s[n // 2 - 1] + s[n // 2]) / 2, 3)
    print(json.dumps({
        "n": cpus_a, "4n": cpus_b, "levels": results,
        "pair_effs": pair_effs, "efficiency_median": med,
        "meets_0.8": bool(med is not None and med >= 0.8),
    }))


def report(path8: str, path32: str) -> None:
    a = json.loads(open(path8).read().strip().splitlines()[-1])
    b = json.loads(open(path32).read().strip().splitlines()[-1])
    ratio = b["cpus"] / a["cpus"]
    eff = b["docs_per_sec"] / (ratio * a["docs_per_sec"])
    print(json.dumps({
        "n": a["cpus"], "4n": b["cpus"],
        "throughput_n": a["docs_per_sec"],
        "throughput_4n": b["docs_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "meets_0.8": eff >= 0.8,
    }))


if __name__ == "__main__":
    cmd = sys.argv[1]
    if cmd == "prepare":
        prepare(int(sys.argv[2]), sys.argv[3])
    elif cmd == "run":
        run(int(sys.argv[2]), sys.argv[3], sys.argv[4],
            int(sys.argv[5]) if len(sys.argv) > 5 else 64)
    elif cmd == "pairseq":
        pairseq(int(sys.argv[2]), int(sys.argv[3]), sys.argv[4],
                sys.argv[5],
                int(sys.argv[6]) if len(sys.argv) > 6 else 64,
                int(sys.argv[7]) if len(sys.argv) > 7 else 2)
    elif cmd == "report":
        report(sys.argv[2], sys.argv[3])
    else:
        raise SystemExit(f"unknown command {cmd}")
