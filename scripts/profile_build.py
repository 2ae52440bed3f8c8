"""Phase-level build profiling at one parallelism level (scaling
diagnosis): docs-write, postings encode, term_dict/stats refresh.

Usage: python scripts/profile_build.py <cpus> <n_docs> [input_dir]
Prints one JSON line with per-phase seconds.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cpus = int(sys.argv[1])
    n_docs = int(sys.argv[2])
    input_dir = sys.argv[3] if len(sys.argv) > 3 else None
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .config("spark.sql.shuffle.partitions", str(max(cpus * 2, 8)))
             .config("spark.driver.memory", "48g")
             .config("spark.python.worker.reuse", "false")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from diagon_spark.corpus import corpus_df
    if input_dir:
        df = spark.read.parquet(input_dir)
    else:
        input_dir = tempfile.mkdtemp(prefix="prof_corpus_")
        corpus_df(spark, n_docs, partitions=64).write.mode("overwrite") \
            .parquet(input_dir)
        df = spark.read.parquet(input_dir)
    df.count()

    out = tempfile.mkdtemp(prefix="prof_idx_")
    phases: dict[str, float] = {}

    import diagon_spark.index.builder as B
    orig_refresh = B._refresh_term_dict_and_stats

    def timed_refresh(*a, **k):
        t = time.time()
        orig_refresh(*a, **k)
        phases["refresh"] = time.time() - t

    B._refresh_term_dict_and_stats = timed_refresh

    # split docs-write from postings by timing around the write call via
    # DataFrameWriter patching is invasive; instead reproduce build's two
    # dominant jobs separately with identical plans
    t0 = time.time()
    cat = B.build_index(spark, df, out, num_segments=64, num_buckets=16,
                        positions=True)
    phases["total"] = time.time() - t0

    # re-measure docs-write alone (same plan as inside build)
    docs = B.prepare_docs(df, ["repo", "path", "commit"], None,
                          ["content"], 64, None, 0)
    t0 = time.time()
    docs.select("segment_id", "doc_id", "repo", "path", "commit", "content",
                "content_sha256", "doc_len__content", "norm__content",
                "doc_len", "norm").write.mode("overwrite") \
        .parquet(out + "_docs2")
    phases["docs_write"] = time.time() - t0
    phases["postings_approx"] = (phases["total"] - phases["docs_write"]
                                 - phases["refresh"])
    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(out + "_docs2", ignore_errors=True)
    print(json.dumps({"cpus": cpus, "n_docs": n_docs,
                      **{k: round(v, 2) for k, v in phases.items()}}))
    spark.stop()


if __name__ == "__main__":
    main()
