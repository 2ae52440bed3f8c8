"""Incremental / near-real-time index maintenance via Structured Streaming.

The reference's NRT path is buffer → flush a new segment → atomically
reopen readers on the new commit point (index/DirectoryReader.cpp,
tests ReaderReopenTest.cpp; commit points index/IndexWriter.cpp:208-247).
The Spark restatement maps one micro-batch to one commit epoch:

    readStream (new corpus files) → foreachBatch:
        build_index(append=True, segment_base=epoch * segments_per_batch)
        → new segments + refreshed term_dict/stats + new commit_N.json

`trigger(availableNow=True)` drains the backlog batch-by-batch and stops —
the batch-job-with-streaming-bookkeeping idiom; a continuous trigger keeps
the index live. Searchers opened after a commit see it atomically
(IndexCatalog.load picks the highest commit generation — the reopen).

Exactly-once publish on top of foreachBatch's at-least-once delivery:
each epoch's batch_id is recorded in the commit metadata; a replayed
epoch that already committed is skipped, and a replay of an epoch that
failed mid-write first scrubs that epoch's segment rows from docs/
postings/lineage (segment ids are epoch-determined, so the partial rows
are identifiable) before re-appending. On Iceberg the scrub would be a
snapshot rollback instead of a filter-rewrite.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import SparkSession, functions as F

from diagon_spark.index.builder import IndexCatalog, build_index


def index_stream(spark: SparkSession, source_dir: str, out_dir: str,
                 checkpoint_dir: str, schema: str, *,
                 segments_per_batch: int = 8, num_buckets: int = 16,
                 key_cols: list[str] | None = None, id_col: str | None = None,
                 content_col: str = "content",
                 fields: list[str] | None = None, positions: bool = True,
                 available_now: bool = True,
                 compact_max_segments: int | None = None):
    """Incrementally index parquet files arriving under source_dir.

    Returns the StreamingQuery (already started). With available_now the
    caller should `query.awaitTermination()` then `IndexCatalog.load`.

    `compact_max_segments` bounds segment fan-out under continuous
    appends: after each epoch, merge.maybe_merge runs a crash-safe
    in-place compaction once the count exceeds the bound (the
    commit-time-merge pattern, MaybeMergeTest.cpp::CommitTimeMerge).
    Compaction preserves stream-epoch bookkeeping, so replays of
    already-merged epochs stay no-ops.
    """

    def process_batch(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        epoch = int(batch_id)
        if epoch in committed_epochs(out_dir):
            return  # at-least-once replay of a published epoch: no-op
        base = epoch * segments_per_batch
        exists = _exists(out_dir)
        if exists:
            _scrub_partial_epoch(batch_df.sparkSession, out_dir,
                                 base, base + segments_per_batch)
        build_index(
            batch_df.sparkSession, batch_df, out_dir,
            num_segments=segments_per_batch, num_buckets=num_buckets,
            key_cols=key_cols, id_col=id_col, content_col=content_col,
            fields=fields, positions=positions, append=exists,
            segment_base=base, commit_extra={"stream_epoch": epoch})
        if compact_max_segments is not None:
            from diagon_spark.index.merge import maybe_merge
            maybe_merge(batch_df.sparkSession,
                        IndexCatalog.load(out_dir),
                        max_segments=compact_max_segments)

    stream = (spark.readStream.schema(schema).parquet(source_dir))
    writer = (stream.writeStream
              .foreachBatch(process_batch)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def committed_epochs(out_dir: str) -> set[int]:
    """Stream epochs already published in some commit generation."""
    if not _exists(out_dir):
        return set()
    out = set()
    for p in IndexCatalog.list_commits(out_dir):
        meta = json.loads(p.read_text())
        if "stream_epoch" in meta:
            out.add(int(meta["stream_epoch"]))
        # compaction prunes old commits but carries their epochs forward
        out.update(int(e) for e in meta.get("merged_epochs", []))
    return out


def _scrub_partial_epoch(spark: SparkSession, out_dir: str,
                         seg_lo: int, seg_hi: int) -> None:
    """Remove rows of a partially-written (uncommitted) epoch so the retry
    is idempotent. Rare path: only runs when a previous attempt of this
    epoch died between its first append and its commit."""
    import shutil
    scrubbed = False
    for sub, part_by in (("docs", None), ("postings", "bucket"),
                         ("lineage", None)):
        p = Path(out_dir, sub)
        if not p.exists():
            continue
        df = spark.read.parquet(str(p))
        cond = ((F.col("segment_id") >= seg_lo)
                & (F.col("segment_id") < seg_hi))
        if df.filter(cond).limit(1).count() == 0:
            continue
        tmp = Path(str(p) + ".retry_tmp")
        if tmp.exists():
            shutil.rmtree(tmp)
        w = df.filter(~cond).write.mode("overwrite")
        if part_by:
            w = w.partitionBy(part_by)
        w.parquet(str(tmp))
        shutil.rmtree(p)
        tmp.rename(p)
        scrubbed = True
    if scrubbed:
        # the failed attempt may have merge-added the epoch into
        # term_dict/stats before dying — rebuild both from what remains
        # (full recompute is fine on this rare recovery path)
        from diagon_spark.index.builder import _refresh_term_dict_and_stats
        cat = IndexCatalog.load(out_dir)
        docs_idx = spark.read.parquet(cat.docs_path)
        _refresh_term_dict_and_stats(spark, cat, cat.fields,
                                     docs_idx=docs_idx,
                                     new_docs_idx=docs_idx,
                                     append=False, segment_base=0)


def _exists(out_dir: str) -> bool:
    return Path(out_dir, "_commits").exists()
