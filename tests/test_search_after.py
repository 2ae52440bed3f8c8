"""searchAfter pagination: page 2 continues exactly where page 1 ended
(TopScoreDocCollector.h:22), across all query kinds."""

import pytest

from diagon_spark import build_index, Searcher
from diagon_spark.corpus import corpus_df, VOCAB
from diagon_spark.search.query import Boolean, Phrase, Term


@pytest.fixture(scope="module")
def searcher(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("pag"))
    df = corpus_df(spark, 300, partitions=3)
    cat = build_index(spark, df, out, num_segments=3, num_buckets=4,
                      positions=True)
    return Searcher(spark, cat)


QS = [
    Term("int"),
    Boolean(should=[Term(t) for t in VOCAB[:5]]),
    Boolean(must=[Term("int"), Term("return")]),
    Phrase(("static", "void")),
]


@pytest.mark.parametrize("qi", range(len(QS)))
def test_paging_equals_one_big_page(searcher, qi):
    q = QS[qi]
    full = [(r.doc_id, r.score) for r in searcher.search(q, k=60).collect()]
    page1 = [(r.doc_id, r.score) for r in searcher.search(q, k=20).collect()]
    assert page1 == full[:20]
    if len(full) <= 20:
        return
    after = (page1[-1][1], page1[-1][0])
    page2 = [(r.doc_id, r.score) for r in
             searcher.search(q, k=20, after=after).collect()]
    assert page2 == full[20:40]
    if len(full) > 40:
        after2 = (page2[-1][1], page2[-1][0])
        page3 = [(r.doc_id, r.score) for r in
                 searcher.search(q, k=20, after=after2).collect()]
        assert page3 == full[40:60]
