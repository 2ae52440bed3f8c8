"""Segment merge / compaction — the SegmentMerger + TieredMergePolicy
analogue (index/SegmentMerger.cpp:143-195, 555-585; TieredMergePolicy.h).

The reference merges segments with a min-heap k-way merge over sorted
per-segment TermsEnums, concatenating postings with a docBase remap. Our
doc ids are globally deterministic (builder.py), so no remap is needed;
the k-way merge *is* Spark's shuffle: group every (field, term)'s chunk
rows onto one task, decode, merge-sort by doc id in numpy, re-encode into
maximal chunks. Output is a single-segment index — forceMerge(1) — which
is the reference's preferred serving layout (BASELINE.md: all query
numbers are forceMerge(1)).

Scale notes:
* merge parallelism is NOT capped at num_buckets: groups are salted by
  pmod(xxhash64(field, term), S) so the stage runs num_buckets × S tasks
  (all rows of one term share a salt — correctness unaffected);
* positions merge as FLAT numpy streams (decode_block_flat → vectorized
  per-doc reorder → delta re-encode in one varint pass) — no per-doc
  python lists;
* tombstoned docs are purged for good (live-docs compaction — Iceberg
  equality-delete compaction analogue) and term_dict/stats recomputed
  post-purge so the merged index scores like a freshly-built one.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession, functions as F

from diagon_spark.index.builder import (CHUNK_DOCS, IndexCatalog,
                                        POSTINGS_SCHEMA, _BLOOM_OPTS,
                                        _refresh_term_dict_and_stats)
from diagon_spark.index.codec import decode_all, decode_block_flat


def _exclusive_cumsum(a: np.ndarray) -> np.ndarray:
    out = np.empty(len(a), dtype=np.int64)
    if len(a):
        out[0] = 0
        np.cumsum(a[:-1], out=out[1:])
    return out


def _merge_term_rows(recs: list[dict], has_positions: bool,
                     tombstones: np.ndarray):
    """Merge one (field, term)'s chunk rows (multiple segments) into
    doc-sorted flat arrays (docs, tfs, norms, pos_deltas|None). Positions
    stay FLAT throughout: reorder by doc via one gather, re-delta in one
    vectorized pass."""
    docs_l, tfs_l, norms_l, pos_l = [], [], [], []
    for rec in recs:
        if has_positions:
            n = int(rec["df"])
            nblocks = (n + 127) // 128
            for bi in range(nblocks):
                d, t, nn, flat = decode_block_flat(rec, bi)
                docs_l.append(d); tfs_l.append(t); norms_l.append(nn)
                pos_l.append(flat)
        else:
            d, t, nn = decode_all(rec)
            docs_l.append(d); tfs_l.append(t); norms_l.append(nn)
    docs = np.concatenate(docs_l)
    tfs = np.concatenate(tfs_l).astype(np.int64)
    norms = np.concatenate(norms_l)
    flat_pos = np.concatenate(pos_l) if has_positions else None

    if len(tombstones):
        keep = ~np.isin(docs, tombstones)
        if not keep.all():
            if has_positions:
                flat_pos = flat_pos[np.repeat(keep, tfs)]
            docs, tfs, norms = docs[keep], tfs[keep], norms[keep]
    if len(docs) == 0:
        return docs, tfs, norms, None

    order = np.argsort(docs, kind="stable")
    if has_positions:
        starts = _exclusive_cumsum(tfs)
        new_tfs = tfs[order]
        new_starts = _exclusive_cumsum(new_tfs)
        total = int(new_tfs.sum())
        # gather: value i of the sorted stream comes from the old slice
        gather = (np.repeat(starts[order], new_tfs)
                  + np.arange(total, dtype=np.int64)
                  - np.repeat(new_starts, new_tfs))
        flat_sorted = flat_pos[gather]
        # re-delta: first position of each doc absolute, the rest gaps
        deltas = np.empty_like(flat_sorted)
        if total:
            deltas[0] = flat_sorted[0]
            deltas[1:] = flat_sorted[1:] - flat_sorted[:-1]
            deltas[new_starts] = flat_sorted[new_starts]
    else:
        deltas = None
    return docs[order], tfs[order], norms[order], deltas


def _merge_group_fn(has_positions: bool, num_segments: int):
    """Cogrouped merge fn: (postings rows of one (bucket, salt) group,
    tombstone rows replicated to that group). Tombstones arrive through
    the shuffle — never a driver collect, never a pickled closure array
    (the scale-safe pattern of searcher.py's delete cogroup)."""
    from diagon_spark.index.codec import encode_term_postings

    def merge(key, pdf: pd.DataFrame, tomb_pdf: pd.DataFrame | None
              ) -> pd.DataFrame:
        from diagon_spark._runtime import worker_init
        worker_init()
        if tomb_pdf is not None and len(tomb_pdf):
            tombstones = np.unique(tomb_pdf["doc_id"].to_numpy(np.int64))
        else:
            tombstones = np.zeros(0, dtype=np.int64)
        out_rows = []
        if len(pdf) == 0:
            return pd.DataFrame(
                out_rows, columns=[f.name for f in POSTINGS_SCHEMA.fields])
        pdf = pdf.assign(_new_seg=pdf["segment_id"] % num_segments)
        for (new_seg, fld, term), grp in pdf.groupby(
                ["_new_seg", "field", "term"], sort=False):
            bucket = int(grp["bucket"].iloc[0])
            docs, tfs, norms, deltas = _merge_term_rows(
                grp.to_dict("records"), has_positions, tombstones)
            if len(docs) == 0:
                continue
            tf_cum = np.concatenate(([0], np.cumsum(tfs)))
            for ci, lo in enumerate(range(0, len(docs), CHUNK_DOCS)):
                hi = min(lo + CHUNK_DOCS, len(docs))
                chunk_pos = (deltas[tf_cum[lo]:tf_cum[hi]]
                             if has_positions else None)
                enc = encode_term_postings(
                    docs[lo:hi], tfs[lo:hi], norms[lo:hi].astype(np.uint8),
                    pos_deltas=chunk_pos)
                out_rows.append({
                    "field": fld, "term": term, "bucket": bucket,
                    "segment_id": int(new_seg),
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
    is forceMerge(1)). Holds out_dir's write.lock — the merge target is a
    new index root being written and committed."""
    from diagon_spark.index.lock import write_lock
    with write_lock(out_dir):
        return _merge_segments_impl(spark, cat, out_dir, num_segments)


def _merge_segments_impl(spark: SparkSession, cat: IndexCatalog,
                         out_dir: str, num_segments: int = 1
                         ) -> IndexCatalog:
    from diagon_spark._ship import ensure_shipped
    from diagon_spark.index.deletes import deleted_docs_df
    ensure_shipped(spark)

    deleted = deleted_docs_df(spark, cat)  # distributed; None if no deletes
    merged = IndexCatalog(root=out_dir, num_buckets=cat.num_buckets,
                          num_segments=num_segments,
                          has_positions=cat.has_positions,
                          key_cols=cat.key_cols, fields=cat.fields)
    postings = spark.read.parquet(cat.postings_path)
    # salt the merge groups: parallelism = num_buckets × n_salts, not
    # capped at num_buckets; explicit partition count — AQE byte-coalescing
    # would serialize the CPU-heavy merge groups (see builder.py note)
    par = spark.sparkContext.defaultParallelism
    n_salts = max(1, (par * 2 + cat.num_buckets - 1) // cat.num_buckets)
    n_groups = cat.num_buckets * n_salts
    salted = postings.withColumn(
        "_salt", F.pmod(F.xxhash64("field", "term"), F.lit(n_salts))
        .cast("int"))
    left = (salted.repartition(n_groups, F.col("bucket"), F.col("_salt"))
            .groupBy("bucket", "_salt"))
    fn = _merge_group_fn(cat.has_positions, num_segments)
    if deleted is None:
        out = left.applyInPandas(
            lambda key, pdf: fn(key, pdf, None), schema=POSTINGS_SCHEMA)
    else:
        # a tombstone has no (field, term) key but affects EVERY term's
        # postings, so the tombstone table is replicated to each of the
        # O(cores) merge groups via a broadcast grid cross-join and
        # COGROUPED in — shuffle volume is tombstones × n_groups tiny
        # rows, fully distributed (vs. the old driver collect + pickled
        # closure array, a driver OOM at billions of tombstones)
        grid = spark.range(n_groups).select(
            (F.col("id") / n_salts).cast("int").alias("bucket"),
            F.pmod(F.col("id"), F.lit(n_salts)).cast("int").alias("_salt"))
        tomb_rep = deleted.select("doc_id").crossJoin(F.broadcast(grid))
        out = (left.cogroup(
                   tomb_rep.repartition(n_groups, F.col("bucket"),
                                        F.col("_salt"))
                   .groupBy("bucket", "_salt"))
               .applyInPandas(fn, schema=POSTINGS_SCHEMA))
    w = (out.repartition(cat.num_buckets, F.col("bucket"))
         .write.mode("overwrite"))
    for k_, v_ in _BLOOM_OPTS.items():
        w = w.option(k_, v_)
    w.partitionBy("bucket").parquet(merged.postings_path)

    docs = spark.read.parquet(cat.docs_path) \
        .withColumn("segment_id",
                    F.pmod(F.col("segment_id"), F.lit(num_segments))
                    .cast("int"))
    n_purged = 0
    if deleted is not None:
        # distributed anti-join purge (no createDataFrame(list) literal);
        # Catalyst/AQE picks broadcast vs shuffle by tombstone size
        docs = docs.join(deleted.select("doc_id"), "doc_id", "left_anti")
        n_purged = int(deleted.count())
    docs.write.mode("overwrite").parquet(merged.docs_path)
    docs_idx = spark.read.parquet(merged.docs_path)
    _refresh_term_dict_and_stats(spark, merged, merged.fields,
                                 docs_idx=docs_idx, new_docs_idx=docs_idx,
                                 append=False, segment_base=0)
    merged.commit({"merged_from": cat.root, "purged": n_purged})
    return merged


def force_merge(spark: SparkSession, cat: IndexCatalog,
                out_dir: str) -> IndexCatalog:
    """Merge all segments into one (forceMerge(1)) under out_dir."""
    return merge_segments(spark, cat, out_dir, num_segments=1)


_MERGE_TABLES = ("docs", "postings", "term_dict", "stats")
_MERGE_SENTINEL = "_merge_pending.json"


def repair_merge(root: str) -> str | None:
    """Recover from a commit_merge crash (single-writer assumption, like
    IndexWriter's write.lock). The sentinel written before any table swap
    records the pre-merge latest commit generation; the new commit is
    published only AFTER every swap, so:

    * latest generation == sentinel's  → the merge commit never published:
      ROLL BACK — restore every `<table>.premerge` dir over the partial
      swap and drop the staged tables.
    * latest generation >  sentinel's  → the commit published but cleanup
      died: ROLL FORWARD — delete `.premerge` leftovers, prune old
      commits.

    Returns "rolled_back" / "rolled_forward", or None if no crash marker.
    """
    import json as _json
    import shutil
    from pathlib import Path

    sentinel = Path(root, _MERGE_SENTINEL)
    if not sentinel.exists():
        return None
    pre_gen = int(_json.loads(sentinel.read_text())["pre_generation"])
    commits = IndexCatalog.list_commits(root)
    latest = IndexCatalog._gen_of(commits[-1]) if commits else -1
    if latest > pre_gen:  # roll forward: finish the cleanup
        for sub in _MERGE_TABLES:
            old = Path(root, sub + ".premerge")
            if old.exists():
                shutil.rmtree(old)
        dp = Path(root, "deleted")
        if dp.exists():
            shutil.rmtree(dp)
        for p in IndexCatalog.list_commits(root)[:-1]:
            p.unlink()
        outcome = "rolled_forward"
    else:  # roll back: un-swap whatever was swapped
        for sub in _MERGE_TABLES:
            old, dst = Path(root, sub + ".premerge"), Path(root, sub)
            if old.exists():
                if dst.exists():  # the swapped-in merged table
                    shutil.rmtree(dst)
                old.rename(dst)
        outcome = "rolled_back"
    staging = Path(root, "_merging")
    if staging.exists():
        shutil.rmtree(staging)
    sentinel.unlink()
    return outcome


def maybe_merge(spark: SparkSession, cat: IndexCatalog,
                max_segments: int = 32,
                target_segments: int | None = None) -> IndexCatalog:
    """Policy-gated compaction — the IndexWriter::maybeMerge analogue
    (tests/unit/index/MaybeMergeTest.cpp): a no-op while the index holds
    at most `max_segments` segments (SegmentsBoundedDuringBulkIndexing /
    NoMergeForSingleSegment); above the bound, runs a crash-safe
    commit_merge down to `target_segments` (default max_segments // 2,
    the tiered-policy idea of merging well below the trigger so appends
    don't re-trigger immediately). Call it after append epochs to keep
    per-query segment fan-out bounded."""
    if cat.num_segments <= max_segments:
        return cat
    return commit_merge(spark, cat,
                        num_segments=target_segments
                        or max(1, max_segments // 2))


def commit_merge(spark: SparkSession, cat: IndexCatalog,
                 num_segments: int = 1) -> IndexCatalog:
    """Single-writer wrapper around `_commit_merge_impl`: the in-place
    table swaps REQUIRE exclusivity, so the round-3 docstring's
    "single-writer assumption" is now enforced by `<root>/write.lock`
    (index/lock.py) instead of merely documented."""
    from diagon_spark.index.lock import write_lock
    with write_lock(cat.root):
        return _commit_merge_impl(spark, cat, num_segments)


def _commit_merge_impl(spark: SparkSession, cat: IndexCatalog,
                       num_segments: int = 1) -> IndexCatalog:
    """In-place compaction — the writer.commitMergeResults() analogue
    (index/IndexWriter.h merge lifecycle,
    tests/unit/index/MergeCommitPointTest.cpp): merge to `num_segments`
    segments, swap the index tables under the SAME root, and publish a
    new commit generation. Source segments are physically removed, so
    older commit points can no longer be opened; they are pruned like
    Lucene's default KeepOnlyLastCommitDeletionPolicy. Tombstoned docs
    are purged, so the deleted/ table is dropped too.

    Crash safety (segments_N discipline): the table swaps cannot be one
    atomic rename, so a sentinel recording the pre-merge generation is
    fsync-published first, pre-swap tables are KEPT as `.premerge` dirs
    until the new commit lands, and `repair_merge` deterministically
    rolls a crashed swap back (commit absent) or forward (commit
    present). commit_merge itself repairs any earlier crash on entry.
    Readers opened pre-merge must reopen (LocalSearcher.reopen_if_changed)
    — on an object store the Iceberg-snapshot analogue keeps old files
    live until old readers are released (flagged like IndexCatalog.commit).
    """
    import json as _json
    import shutil
    from pathlib import Path

    repair_merge(cat.root)  # heal any crashed previous attempt
    staging = Path(cat.root, "_merging")
    if staging.exists():
        shutil.rmtree(staging)
    merged = merge_segments(spark, cat, str(staging),
                            num_segments=num_segments)
    assert merged.num_segments == num_segments

    commits = IndexCatalog.list_commits(cat.root)
    pre_gen = IndexCatalog._gen_of(commits[-1]) if commits else -1
    sentinel = Path(cat.root, _MERGE_SENTINEL)
    tmp = Path(cat.root, "." + _MERGE_SENTINEL + ".tmp")
    tmp.write_text(_json.dumps({"pre_generation": pre_gen}))
    tmp.rename(sentinel)  # crash before this point: nothing swapped yet

    for sub in _MERGE_TABLES:
        src, dst = staging / sub, Path(cat.root, sub)
        dst.rename(Path(cat.root, sub + ".premerge"))
        src.rename(dst)
        # invalidate any session-cached file listing of the swapped path
        spark.catalog.refreshByPath(str(dst))

    # stream-epoch bookkeeping must SURVIVE commit pruning: gather every
    # epoch published by the commits about to be deleted so streaming
    # replay idempotency (incremental.committed_epochs) keeps holding
    import json as _json
    epochs: set[int] = set()
    for p in IndexCatalog.list_commits(cat.root):
        m = _json.loads(p.read_text())
        if "stream_epoch" in m:
            epochs.add(int(m["stream_epoch"]))
        epochs.update(int(e) for e in m.get("merged_epochs", []))

    out = IndexCatalog(root=cat.root, num_buckets=cat.num_buckets,
                       num_segments=num_segments,
                       has_positions=cat.has_positions,
                       key_cols=cat.key_cols, fields=cat.fields)
    out.commit({"merge_committed": True,
                "merged_from_segments": cat.num_segments,
                **({"merged_epochs": sorted(epochs)} if epochs else {})})

    # cleanup — a crash anywhere below rolls FORWARD via repair_merge
    for sub in _MERGE_TABLES:
        shutil.rmtree(Path(cat.root, sub + ".premerge"))
    dp = Path(cat.root, "deleted")
    if dp.exists():
        shutil.rmtree(dp)  # purged into the merged postings/docs
    shutil.rmtree(staging)  # staging _commits + empty shell
    for p in IndexCatalog.list_commits(cat.root)[:-1]:
        p.unlink()  # KeepOnlyLastCommitDeletionPolicy
    sentinel.unlink()
    return out
