"""Reader reopen semantics — DirectoryReader::openIfChanged parity
(tests/unit/index/ReaderReopenTest.cpp): no-changes returns None, a new
commit (append or delete) yields a fresh reader at the latest generation,
and the old reader keeps its point-in-time view.
"""

from diagon_spark import build_index
from diagon_spark.corpus import generate_pandas
from diagon_spark.index.builder import IndexCatalog
from diagon_spark.index.deletes import delete_documents
from diagon_spark.search.local_reader import LocalSearcher
from diagon_spark.search.query import MatchAll, Term


def test_no_changes_returns_none(spark, tmp_path):
    out = str(tmp_path / "idx")
    build_index(spark, spark.createDataFrame(generate_pandas(0, 40)), out,
                num_segments=2, num_buckets=4, positions=False)
    ls = LocalSearcher(IndexCatalog.load(out))
    assert ls.cat.generation == 0
    assert ls.reopen_if_changed() is None  # ReaderReopenTest: NoChanges


def test_append_visible_after_reopen_old_reader_isolated(spark, tmp_path):
    out = str(tmp_path / "idx")
    build_index(spark, spark.createDataFrame(generate_pandas(0, 60)), out,
                num_segments=2, num_buckets=4, positions=False)
    ls1 = LocalSearcher(IndexCatalog.load(out))
    base_hits = ls1.search(Term("int"), k=20)  # warms the stats cache
    base_count = ls1.count(MatchAll())
    assert base_count == 60

    build_index(spark, spark.createDataFrame(generate_pandas(60, 100)), out,
                num_segments=2, num_buckets=4, positions=False,
                append=True, segment_base=2)  # commit gen 1

    ls2 = ls1.reopen_if_changed()
    assert ls2 is not None and ls2.cat.generation == 1
    assert ls2.count(MatchAll()) == 100
    assert ls2.max_doc > ls1.max_doc
    # old reader: point-in-time view — appended segment files were never
    # in its pinned dataset listing, cached term stats unchanged
    assert ls1.count(MatchAll()) == base_count
    assert ls1.search(Term("int"), k=20) == base_hits
    # reopening the reopened reader: nothing newer
    assert ls2.reopen_if_changed() is None


def test_delete_commit_visible_after_reopen(spark, tmp_path):
    out = str(tmp_path / "idx")
    build_index(spark, spark.createDataFrame(generate_pandas(0, 50)), out,
                num_segments=2, num_buckets=4, positions=False)
    cat = IndexCatalog.load(out)
    ls1 = LocalSearcher(cat)
    victims = [d for d, _ in ls1.search(Term("int"), k=3)]
    assert victims
    vdf = spark.createDataFrame([(int(v),) for v in victims], "doc_id long")
    delete_documents(spark, cat, vdf, join_cols=["doc_id"])  # commit gen 1

    ls2 = ls1.reopen_if_changed()
    assert ls2 is not None
    assert ls2.count(MatchAll()) == 50 - len(set(victims))
    hits2 = {d for d, _ in ls2.search(Term("int"), k=20)}
    assert not (hits2 & set(victims))
