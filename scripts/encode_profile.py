"""Profile the per-group encode kernel (_encode_segment_fn) standalone —
no Spark — at several docs-per-group sizes, to localize the measured
superlinearity (round-4 10M ladder: 156k-doc groups ran ~3.8x more s/doc
than 19.5k-doc ones). Usage:

    python scripts/encode_profile.py [sizes...] [--profile SIZE]

Prints s/doc per size; with --profile, cProfile's top cumulative lines
for that size.
"""

from __future__ import annotations

import cProfile
import pstats
import sys
import time

sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

from diagon_spark.corpus import generate_pandas  # noqa: E402
from diagon_spark.index.builder import _encode_segment_fn  # noqa: E402


def make_group(n_docs: int) -> pd.DataFrame:
    pdf = generate_pandas(0, n_docs)
    return pd.DataFrame({"doc_id": np.arange(n_docs, dtype=np.int64),
                         "__content": pdf["content"]})


def run(n_docs: int, positions: bool = True, repeats: int = 2) -> float:
    enc = _encode_segment_fn(num_buckets=16, has_positions=positions)
    pdf = make_group(n_docs)
    best = float("inf")
    for _ in range(repeats):
        t = time.time()
        out = enc((0, "text"), pdf)
        best = min(best, time.time() - t)
    print(f"  n={n_docs:>7}  wall={best:7.2f}s  "
          f"s/doc={best / n_docs * 1e6:8.1f} us  rows={len(out)}")
    return best


def spark_group_probe(n_docs: int = 1_250_000, cpus: int = 8,
                      segments_small_groups: int = 80,
                      segments_big_groups: int = 8) -> None:
    """The in-Spark form of the superlinearity measurement (round-4 10M
    ladder: 156k-doc encode groups ran ~3.8x more s/doc than 19.5k ones):
    build the SAME corpus at the SAME core count with two segment counts,
    so only docs-per-encode-group changes. Both levels keep every core
    busy (segments are a multiple of cpus), so wall-clock per doc isolates
    the per-group kernel cost."""
    import tempfile

    from pyspark.sql import SparkSession

    from diagon_spark import build_index
    from diagon_spark.corpus import corpus_df

    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .appName("encode-group-probe")
             .config("spark.sql.shuffle.partitions", str(cpus * 2))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "48g")
             .config("spark.python.worker.reuse", "false")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    inp = tempfile.mkdtemp(prefix="enc_probe_in_")
    corpus_df(spark, n_docs, partitions=64).write.mode("overwrite") \
        .parquet(inp)
    df = spark.read.parquet(inp)
    df.count()
    # ALTERNATING A/B pairs in one session: this box's memory-state
    # drift between runs (2-3x on memory-heavy kernels) swamps any
    # single small-vs-big comparison; interleaving gives two ratios
    # whose agreement (or spread) is part of the evidence.
    results: dict[int, list[float]] = {}
    order = [segments_small_groups, segments_big_groups] * 2
    for segs in order:
        out = tempfile.mkdtemp(prefix=f"enc_probe_{segs}_")
        t0 = time.time()
        build_index(spark, df, out, num_segments=segs, num_buckets=16,
                    positions=True)
        wall = time.time() - t0
        results.setdefault(segs, []).append(wall)
        import shutil
        shutil.rmtree(out, ignore_errors=True)
        print(f"  segments={segs:>4} (≈{n_docs // segs:>7} docs/group)  "
              f"build={wall:7.1f}s  docs/s={n_docs / wall:8.0f}",
              flush=True)
    import shutil
    shutil.rmtree(inp, ignore_errors=True)
    smalls = results[segments_small_groups]
    bigs = results[segments_big_groups]
    for i, (s, b) in enumerate(zip(smalls, bigs)):
        print(f"  pair {i}: s/doc ratio big vs small = {b / s:.2f}x")
    print(f"  best-pair ratio: {min(bigs) / min(smalls):.2f}x "
          f"(gate: <=1.5x)")
    spark.stop()


def main() -> None:
    if "--spark" in sys.argv:
        nums = [int(a) for a in sys.argv[1:] if not a.startswith("--")]
        spark_group_probe(*nums)
        return
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sizes = [int(a) for a in args] or [15_000, 50_000, 150_000]
    prof_size = None
    if "--profile" in sys.argv:
        prof_size = int(sys.argv[sys.argv.index("--profile") + 1])

    print("encode kernel scaling (positions=True):")
    walls = {n: run(n) for n in sizes}
    base = min(sizes)
    for n in sizes:
        ratio = (walls[n] / n) / (walls[base] / base)
        print(f"  s/doc ratio vs {base}: n={n} -> {ratio:.2f}x")

    if prof_size:
        enc = _encode_segment_fn(num_buckets=16, has_positions=True)
        pdf = make_group(prof_size)
        pr = cProfile.Profile()
        pr.enable()
        enc((0, "text"), pdf)
        pr.disable()
        stats = pstats.Stats(pr)
        stats.sort_stats("cumulative").print_stats(25)


if __name__ == "__main__":
    main()
