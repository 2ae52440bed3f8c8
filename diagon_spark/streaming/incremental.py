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
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from diagon_spark.index.builder import IndexCatalog, build_index


def index_stream(spark: SparkSession, source_dir: str, out_dir: str,
                 checkpoint_dir: str, schema: str, *,
                 segments_per_batch: int = 8, num_buckets: int = 16,
                 key_cols: list[str] | None = None, id_col: str | None = None,
                 content_col: str = "content", positions: bool = True,
                 available_now: bool = True):
    """Incrementally index parquet files arriving under source_dir.

    Returns the StreamingQuery (already started). With available_now the
    caller should `query.awaitTermination()` then `IndexCatalog.load`.
    """

    def process_batch(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        build_index(
            batch_df.sparkSession, batch_df, out_dir,
            num_segments=segments_per_batch, num_buckets=num_buckets,
            key_cols=key_cols, id_col=id_col, content_col=content_col,
            positions=positions, append=batch_id > 0 or _exists(out_dir),
            segment_base=int(batch_id) * segments_per_batch)

    stream = (spark.readStream.schema(schema).parquet(source_dir))
    writer = (stream.writeStream
              .foreachBatch(process_batch)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _exists(out_dir: str) -> bool:
    from pathlib import Path
    return Path(out_dir, "_commits").exists()
