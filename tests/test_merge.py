"""forceMerge correctness (MergeTest/ForceMergeTest analogue): merged
single-segment index answers every query identically to the multi-segment
one."""

import pytest
from pyspark.sql import functions as F

from diagon_spark import build_index, Searcher
from diagon_spark.corpus import corpus_df, VOCAB
from diagon_spark.index.merge import force_merge
from diagon_spark.search.query import Boolean, Phrase, Term


@pytest.fixture(scope="module")
def pair(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("m")
    df = corpus_df(spark, 400, partitions=4)
    cat = build_index(spark, df, str(root / "multi"), num_segments=4,
                      num_buckets=8, positions=True)
    merged = force_merge(spark, cat, str(root / "merged"))
    return Searcher(spark, cat), Searcher(spark, merged)


QUERIES = [
    Term("int"),
    Boolean(must=[Term("int"), Term("return")]),
    Boolean(should=[Term(t) for t in VOCAB[:10]]),
    Phrase(("static", "void")),
]


@pytest.mark.parametrize("qi", range(len(QUERIES)))
def test_merged_rank_identical(pair, qi):
    s_multi, s_merged = pair
    a = [(r.doc_id, r.score) for r in s_multi.search(QUERIES[qi], k=100).collect()]
    b = [(r.doc_id, r.score) for r in s_merged.search(QUERIES[qi], k=100).collect()]
    assert a == b


def test_merged_is_single_segment(pair, spark):
    _, s_merged = pair
    p = spark.read.parquet(s_merged.cat.postings_path)
    assert [r.segment_id for r in p.select("segment_id").distinct().collect()] == [0]
    # every (term, chunk) unique — chunks re-packed maximally
    dup = (p.groupBy("term", "chunk").count()
           .filter(F.col("count") > 1).collect())
    assert dup == []


def test_merged_df_preserved(pair, spark):
    s_multi, s_merged = pair
    assert s_merged.count(Term("int")) == s_multi.count(Term("int"))
