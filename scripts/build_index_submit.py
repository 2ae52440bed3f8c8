"""spark-submit entry point for the index build (north_rule contract).

Cluster usage:
  python -c "import diagon_spark, zipfile, os, sys; ..."  # or: zip -r diagon_spark.zip diagon_spark
  spark-submit --py-files diagon_spark.zip \
      scripts/build_index_submit.py \
      --input s3://bucket/corpus --output s3://bucket/index \
      --segments 4096 --buckets 512 [--resume] [--no-positions] \
      [--batches 16]

Local sandbox:
  python scripts/build_index_submit.py --input /tmp/corpus \
      --output /tmp/idx --segments 64 --master 'local[32]'
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--segments", type=int, default=256)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--batches", type=int, default=1)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--no-positions", action="store_true")
    ap.add_argument("--id-col", default=None)
    ap.add_argument("--key-cols", default="repo,path,commit")
    ap.add_argument("--content-col", default="content")
    ap.add_argument("--master", default=None,
                    help="only for local runs; omit under spark-submit")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    b = SparkSession.builder.appName("diagon-index-build")
    if args.master:
        b = b.master(args.master)
    spark = b.config("spark.sql.adaptive.enabled", "true").getOrCreate()

    from diagon_spark import build_index

    df = spark.read.parquet(args.input)
    t0 = time.time()
    cat = build_index(
        spark, df, args.output,
        num_segments=args.segments, num_buckets=args.buckets,
        key_cols=(None if args.id_col else args.key_cols.split(",")),
        id_col=args.id_col, content_col=args.content_col,
        positions=not args.no_positions,
        segment_batches=args.batches, resume=args.resume)
    wall = time.time() - t0
    n = spark.read.parquet(cat.docs_path).count()
    print(json.dumps({"indexed_docs": n, "wall_sec": round(wall, 2),
                      "docs_per_sec": round(n / wall, 1),
                      "output": args.output}))
    spark.stop()


if __name__ == "__main__":
    main()
