"""Deletes / updates — the live-docs + updateDocument analogue.

Reference semantics (index/IndexWriter.h:224-233, codecs/LiveDocsFormat.h):
deleteDocuments(term/key) tombstones matching docs in a bitmap; readers
mask them out; updateDocument = delete + add; stats keep counting deleted
docs until a merge rewrites the segment (Lucene behavior, reproduced).

Here tombstones are a `deleted/` parquet table of doc_ids under the index
root, published with a new commit generation. Searcher loads it
automatically and masks hits (broadcast for small delete sets — the
sandbox path; an anti-join/compaction pass is the large-delete path,
applied by merge_segments which drops tombstoned postings for good).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from diagon_spark.index.builder import IndexCatalog, build_index


def resolve_delete_ids(spark: SparkSession, cat: IndexCatalog,
                       deletes_df: DataFrame,
                       join_cols: list[str] | None = None) -> list[int]:
    """Map delete keys (e.g. repo/path/commit rows) to doc_ids."""
    cols = join_cols or cat.key_cols
    if not cols:
        cols = ["doc_id"]
    docs = spark.read.parquet(cat.docs_path)
    hit = docs.join(F.broadcast(deletes_df.select(*cols).distinct()),
                    cols, "inner")
    return [int(r.doc_id) for r in hit.select("doc_id").collect()]


def delete_documents(spark: SparkSession, cat: IndexCatalog,
                     deletes_df: DataFrame,
                     join_cols: list[str] | None = None) -> int:
    """Tombstone matching docs; returns the number deleted. Atomic via a
    new commit generation (deleteDocuments analogue)."""
    ids = resolve_delete_ids(spark, cat, deletes_df, join_cols)
    if ids:
        (spark.createDataFrame([(int(i),) for i in ids], "doc_id long")
         .write.mode("append").parquet(f"{cat.root}/deleted"))
    cat.commit({"deleted_added": len(ids)})
    return len(ids)


def load_deleted_ids(spark: SparkSession, cat: IndexCatalog) -> list[int]:
    from pathlib import Path
    p = Path(cat.root, "deleted")
    if not p.exists():
        return []
    return [int(r.doc_id) for r in
            spark.read.parquet(str(p)).select("doc_id").distinct().collect()]


def update_documents(spark: SparkSession, cat: IndexCatalog,
                     new_docs: DataFrame, *,
                     content_col: str = "content") -> IndexCatalog:
    """updateDocument analogue: delete existing docs with the same keys,
    then index the new versions as a fresh segment epoch (delete + add,
    IndexWriter.h:233)."""
    delete_documents(spark, cat, new_docs.select(*cat.key_cols))
    return build_index(
        spark, new_docs, cat.root, num_segments=1,
        num_buckets=cat.num_buckets, key_cols=cat.key_cols,
        content_col=content_col, positions=cat.has_positions,
        append=True, segment_base=cat.num_segments)
