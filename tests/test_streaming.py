"""Incremental NRT indexing: micro-batch epochs append segments; a searcher
reopened on the new commit sees all docs (ReaderReopenTest analogue)."""

import time

import pytest

from diagon_spark import Searcher
from diagon_spark.corpus import generate_pandas
from diagon_spark.index.builder import IndexCatalog
from diagon_spark.search.query import MatchAll, Term
from diagon_spark.streaming.incremental import index_stream

SCHEMA = "repo string, path string, commit string, lang string, content string"


def test_incremental_index_stream(spark, tmp_path):
    src = tmp_path / "incoming"
    src.mkdir()
    out = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")

    # wave 1 arrives
    spark.createDataFrame(generate_pandas(0, 120)) \
        .coalesce(1).write.mode("append").parquet(str(src))
    q = index_stream(spark, str(src), out, ckpt, SCHEMA,
                     segments_per_batch=2, num_buckets=4, positions=False)
    q.awaitTermination(120)
    cat1 = IndexCatalog.load(out)
    s1 = Searcher(spark, cat1)
    n1 = s1.count(MatchAll())
    assert n1 == 120
    # NOTE: term_dict/stats are overwritten in place on each epoch, so an
    # old searcher's queries are valid only until the next commit (Iceberg
    # snapshots would give true reader isolation) — read before wave 2:
    n_int_1 = s1.count(Term("int"))

    # wave 2 arrives; drain again (availableNow restarts from checkpoint)
    spark.createDataFrame(generate_pandas(120, 200)) \
        .coalesce(1).write.mode("append").parquet(str(src))
    q2 = index_stream(spark, str(src), out, ckpt, SCHEMA,
                      segments_per_batch=2, num_buckets=4, positions=False)
    q2.awaitTermination(120)

    cat2 = IndexCatalog.load(out)  # reopen on the new commit point
    s2 = Searcher(spark, cat2)
    assert s2.count(MatchAll()) == 200
    # stats refreshed globally: df of a common term covers both waves
    assert s2.count(Term("int")) > n_int_1
    # old searcher's driver-side stats stay pinned to its commit point
    assert s1.max_doc == 120


def test_stream_with_commit_time_compaction(spark, tmp_path):
    """compact_max_segments bounds segment fan-out under continuous
    appends (MaybeMergeTest::CommitTimeMerge pattern) and preserves
    stream-epoch bookkeeping across the commit pruning a merge does —
    replays of merged epochs stay no-ops."""
    from diagon_spark.streaming.incremental import committed_epochs

    src = tmp_path / "incoming"
    src.mkdir()
    out = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")

    for lo, hi in ((0, 80), (80, 160)):
        spark.createDataFrame(generate_pandas(lo, hi)) \
            .coalesce(1).write.mode("append").parquet(str(src))
        q = index_stream(spark, str(src), out, ckpt, SCHEMA,
                         segments_per_batch=4, num_buckets=4,
                         positions=False, compact_max_segments=3)
        q.awaitTermination(120)

    cat = IndexCatalog.load(out)
    # every epoch appended 4 segments then compacted to <= 3
    assert cat.num_segments <= 3
    s = Searcher(spark, cat)
    assert s.count(MatchAll()) == 160
    # epoch bookkeeping survived the merge's commit pruning
    assert committed_epochs(out) >= {0, 1}
    # re-running the stream with the SAME source replays nothing
    q3 = index_stream(spark, str(src), out, ckpt, SCHEMA,
                      segments_per_batch=4, num_buckets=4,
                      positions=False, compact_max_segments=3)
    q3.awaitTermination(120)
    assert Searcher(spark, IndexCatalog.load(out)).count(MatchAll()) == 160
