"""Stored-fields fetch: top-k hits joined back to stored content."""

from diagon_spark import build_index, Searcher
from diagon_spark.corpus import corpus_df
from diagon_spark.search.query import Term


def test_fetch_stored_fields(spark, tmp_path):
    df = corpus_df(spark, 100, partitions=2)
    cat = build_index(spark, df, str(tmp_path / "idx"), num_segments=2,
                      num_buckets=4, positions=False)
    s = Searcher(spark, cat)
    hits = s.search(Term("int"), k=5)
    fetched = s.fetch(hits).collect()
    assert len(fetched) == 5
    r0 = fetched[0]
    assert r0.content and "int" in r0.content.lower()
    assert r0.repo and r0.path and r0.score is not None
    # order preserved: best hit first
    assert [r.doc_id for r in fetched] == [r.doc_id for r in hits.collect()]


def test_fetch_bulk_no_collect(spark, tmp_path):
    df = corpus_df(spark, 100, partitions=2)
    cat = build_index(spark, df, str(tmp_path / "idx2"), num_segments=2,
                      num_buckets=4, positions=False)
    s = Searcher(spark, cat)
    hits = s.search(Term("int"), k=10)
    a = [(r.doc_id, r.score) for r in s.fetch(hits).collect()]
    b = [(r.doc_id, r.score) for r in s.fetch(hits, bulk=True).collect()]
    assert a == b
