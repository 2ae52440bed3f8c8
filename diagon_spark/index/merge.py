"""Segment merge / compaction — the SegmentMerger + TieredMergePolicy
analogue (index/SegmentMerger.cpp:143-195, 555-585; TieredMergePolicy.h).

The reference merges segments with a min-heap k-way merge over sorted
per-segment TermsEnums, concatenating postings with a docBase remap. Our
doc ids are globally deterministic (builder.py), so no remap is needed;
the k-way merge *is* Spark's shuffle: group every term's chunk rows onto
one task (`groupBy(bucket)` — already the storage partitioning, so with
AQE this is a cheap co-located pass), decode, merge-sort by doc id in
numpy, re-encode into maximal chunks. Output is a single-segment index —
forceMerge(1) — which is the reference's preferred serving layout
(BASELINE.md: all query numbers are forceMerge(1)).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession, functions as F

from diagon_spark.index.builder import (CHUNK_DOCS, IndexCatalog,
                                        POSTINGS_SCHEMA)
from diagon_spark.index.codec import decode_all, encode_term_postings


def _merge_group_fn(has_positions: bool, num_segments: int,
                    tombstones: np.ndarray):
    def merge(key, pdf: pd.DataFrame) -> pd.DataFrame:
        bucket = int(key[0])
        # old segment -> merged segment (docBase-remap analogue; doc ids
        # themselves are global so only the grouping changes)
        pdf = pdf.assign(_new_seg=pdf["segment_id"] % num_segments)
        out_rows = []
        for (new_seg, term), grp in pdf.groupby(["_new_seg", "term"],
                                                sort=False):
            docs_l, tfs_l, norms_l, pos_l = [], [], [], []
            for rec in grp.to_dict("records"):
                if has_positions:
                    d, t, nn, pos = decode_all(rec, want_positions=True)
                    pos_l.extend(pos)
                else:
                    d, t, nn = decode_all(rec)
                docs_l.append(d)
                tfs_l.append(t)
                norms_l.append(nn)
            docs = np.concatenate(docs_l)
            tfs = np.concatenate(tfs_l)
            norms = np.concatenate(norms_l)
            order = np.argsort(docs, kind="stable")
            if len(tombstones):  # purge deleted docs for good (live-docs
                order = order[~np.isin(docs[order], tombstones)]
            docs, tfs, norms = docs[order], tfs[order], norms[order]
            if len(docs) == 0:
                continue
            positions = [pos_l[i] for i in order] if has_positions else None
            for ci, lo in enumerate(range(0, len(docs), CHUNK_DOCS)):
                hi = min(lo + CHUNK_DOCS, len(docs))
                enc = encode_term_postings(
                    docs[lo:hi], tfs[lo:hi], norms[lo:hi].astype(np.uint8),
                    positions[lo:hi] if has_positions else None)
                out_rows.append({
                    "term": term, "bucket": bucket, "segment_id": int(new_seg),
                    "chunk": ci, "df": int(enc["df"]),
                    "ttf": int(tfs[lo:hi].sum()),
                    "doc_blocks": enc["doc_blocks"],
                    "tf_blocks": enc["tf_blocks"],
                    "norm_bytes": enc["norm_bytes"],
                    "block_first": enc["block_first"].tolist(),
                    "block_last": enc["block_last"].tolist(),
                    "block_max_tf": enc["block_max_tf"].tolist(),
                    "block_max_norm": enc["block_max_norm"].tolist(),
                    "block_doc_off": enc["block_doc_off"].tolist(),
                    "block_tf_off": enc["block_tf_off"].tolist(),
                    "pos_blocks": enc["pos_blocks"] if has_positions else None,
                    "block_pos_off": (enc["block_pos_off"].tolist()
                                      if has_positions else None),
                })
        return pd.DataFrame(out_rows,
                            columns=[f.name for f in POSTINGS_SCHEMA.fields])

    return merge


def merge_segments(spark: SparkSession, cat: IndexCatalog, out_dir: str,
                   num_segments: int = 1) -> IndexCatalog:
    """Merge/compact to `num_segments` segments under out_dir, purging
    tombstoned docs (the TieredMergePolicy compaction step; num_segments=1
    is forceMerge(1)). term_dict/stats are recomputed post-purge so the
    merged index scores like a freshly-built one."""
    from diagon_spark._ship import ensure_shipped
    from diagon_spark.index.deletes import load_deleted_ids
    ensure_shipped(spark)

    tombstones = np.asarray(sorted(load_deleted_ids(spark, cat)),
                            dtype=np.int64)
    merged = IndexCatalog(root=out_dir, num_buckets=cat.num_buckets,
                          num_segments=num_segments,
                          has_positions=cat.has_positions,
                          key_cols=cat.key_cols)
    postings = spark.read.parquet(cat.postings_path)
    # explicit partition count — AQE byte-coalescing would serialize the
    # CPU-heavy merge groups (see builder.py note)
    (postings.repartition(cat.num_buckets, F.col("bucket"))
     .groupBy("bucket")
     .applyInPandas(_merge_group_fn(cat.has_positions, num_segments,
                                    tombstones),
                    schema=POSTINGS_SCHEMA)
     .write.mode("overwrite").partitionBy("bucket")
     .parquet(merged.postings_path))
    docs = spark.read.parquet(cat.docs_path) \
        .withColumn("segment_id",
                    F.pmod(F.col("segment_id"), F.lit(num_segments))
                    .cast("int"))
    if len(tombstones):
        docs = docs.filter(~F.col("doc_id").isin([int(t) for t in tombstones]))
    docs.write.mode("overwrite").parquet(merged.docs_path)
    mp = spark.read.parquet(merged.postings_path)
    (mp.groupBy("term", "bucket")
     .agg(F.sum("df").alias("df"), F.sum("ttf").alias("cttf"))
     .write.mode("overwrite").parquet(merged.term_dict_path))
    docs_idx = spark.read.parquet(merged.docs_path)
    stats = docs_idx.agg(F.count("*").alias("max_doc"),
                         F.count("*").alias("doc_count"),
                         F.sum("doc_len").alias("sum_total_term_freq"))
    sum_df = spark.read.parquet(merged.term_dict_path).agg(
        F.sum("df").alias("sum_doc_freq"))
    stats.crossJoin(sum_df).write.mode("overwrite").parquet(merged.stats_path)
    merged.commit({"merged_from": cat.root, "purged": int(len(tombstones))})
    return merged


def force_merge(spark: SparkSession, cat: IndexCatalog,
                out_dir: str) -> IndexCatalog:
    """Merge all segments into one (forceMerge(1)) under out_dir."""
    return merge_segments(spark, cat, out_dir, num_segments=1)
