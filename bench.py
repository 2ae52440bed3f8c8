"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...},
 "sf": ..., plus throughput extras}.

Query classes mirror the reference benchmark set
(benchmarks/reuters_benchmark.cpp:197-317): single-term, AND-2,
OR-{5,10}, phrase — top-100 — plus index-build throughput and the
data-pipeline headliners (minhash-LSH dedup, brute-force knn).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
REPEAT = int(os.environ.get("BENCH_REPEAT", "3"))


def _session(reuse_workers: bool):
    from pyspark.sql import SparkSession
    return (SparkSession.builder.master(f"local[{CPUS}]")
            .appName("diagon-bench")
            .config("spark.sql.shuffle.partitions", CPUS)
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.driver.memory", "48g")
            # build config: fresh python worker per task (long-lived
            # workers degrade ~60% across sequential heavy encode tasks);
            # query/serving config: reused workers (per-query scoring
            # tasks are ms-scale, spawn cost would dominate — measured
            # 1.14s -> 0.65s p50 on or_10 from this flag alone)
            .config("spark.python.worker.reuse",
                    "true" if reuse_workers else "false")
            .config("spark.ui.enabled", "false")
            .getOrCreate())


def main() -> None:
    from pyspark.sql import functions as F

    from diagon_spark import build_index, Searcher
    from diagon_spark.pipelines import dedup, similarity
    from diagon_spark.search.query import Boolean, Phrase, Term

    spark = _session(reuse_workers=False)
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_docs = docs.count()
    out_dir = tempfile.mkdtemp(prefix="diagon_bench_idx_")
    timings: dict[str, float] = {}

    t0 = time.time()
    cat = build_index(spark, docs, out_dir, num_segments=int(CPUS),
                      num_buckets=16, id_col="doc_id", content_col="text",
                      positions=True)
    timings["index_build"] = time.time() - t0

    # switch to the serving-session config for the query suite
    spark.stop()
    spark = _session(reuse_workers=True)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    searcher = Searcher(spark, cat)
    qset = {
        "single_term": Term("data"),
        "and_2": Boolean(must=[Term("table"), Term("value")]),
        "or_5": Boolean(should=[Term(t) for t in
                                ["join", "window", "batch", "query", "line"]]),
        "or_10": Boolean(should=[Term(t) for t in
                                 ["join", "window", "batch", "query", "line",
                                  "spark", "order", "column", "hash", "scan"]]),
        "phrase": Phrase(("fast", "slow")),
    }
    for name, q in qset.items():
        # warm once, then time best-of-REPEAT (reference reports P50 warm)
        searcher.search(q, k=100).collect()
        best = float("inf")
        for _ in range(REPEAT):
            t = time.time()
            searcher.search(q, k=100).collect()
            best = min(best, time.time() - t)
        timings[name] = best

    # serving-path latencies: same index, same kernels, no Spark job
    # (the mmap-IndexSearcher analogue — search/local_reader.py)
    from diagon_spark.search.local_reader import LocalSearcher
    ls = LocalSearcher(cat)
    for name, q in qset.items():
        ls.search(q, k=100)  # warm
        best = float("inf")
        for _ in range(REPEAT):
            t = time.time()
            ls.search(q, k=100)
            best = min(best, time.time() - t)
        timings[f"local_{name}"] = best

    t = time.time()
    dedup.minhash_lsh_candidates(docs, k=3, num_hashes=16, band_size=2).count()
    timings["minhash_lsh"] = time.time() - t

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qvec = [float(x) for x in
            emb.filter(F.col("vec_id") == 0).collect()[0].embedding]
    t = time.time()
    similarity.cosine_topk(emb, qvec, k=10, exclude_id=0).collect()
    timings["knn_cosine"] = time.time() - t

    def _du(path: str) -> int:
        import pathlib
        return sum(f.stat().st_size for f in pathlib.Path(path).rglob("*")
                   if f.is_file())

    postings_bytes = _du(cat.postings_path)
    docs_bytes = _du(cat.docs_path)
    shutil.rmtree(out_dir, ignore_errors=True)
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    total = sum(timings.values())
    print(json.dumps({
        "metric": "index-build + BM25 query suite wall time",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 4) for k, v in timings.items()},
        "sf": sf,
        "n_docs": n_docs,
        "index_docs_per_sec": round(n_docs / timings["index_build"], 1),
        "index_bytes_per_doc": round(postings_bytes / max(n_docs, 1), 1),
        "docs_table_bytes_per_doc": round(docs_bytes / max(n_docs, 1), 1),
        "cpus": int(CPUS),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
