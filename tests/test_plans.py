"""Physical-plan regression tests: the scale properties SURVEY.md §4 claims
must show up in the executed plan — bucket partition pruning, term
predicate pushdown, positions column pruning, and no AQE-collapsed
single-task scoring stage."""

import pytest
from pyspark.sql import functions as F

from diagon_spark import build_index, Searcher
from diagon_spark.corpus import corpus_df
from diagon_spark.search.query import Boolean, Term


@pytest.fixture(scope="module")
def searcher(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("planidx"))
    df = corpus_df(spark, 300, partitions=4)
    cat = build_index(spark, df, out, num_segments=4, num_buckets=8,
                      positions=True)
    return Searcher(spark, cat)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_term_scan_is_pruned(searcher):
    plan = _plan(searcher._postings(["int", "return"], need_positions=False))
    assert "PartitionFilters: [bucket" in plan, "bucket partition pruning lost"
    assert "PushedFilters: [In(term" in plan, "term predicate pushdown lost"
    # positions are the biggest column (reference .pos = 173 B/doc); term
    # queries must never read them — column pruning via projection
    df = searcher._postings(["int", "return"], need_positions=False)
    assert "pos_blocks" not in df.columns, \
        "column pruning lost: term query reads positions"


def test_phrase_scan_reads_positions(searcher):
    df = searcher._postings(["int"], need_positions=True)
    assert "pos_blocks" in df.columns


def test_scoring_stage_not_coalesced(searcher):
    """AQE must not byte-coalesce the CPU-heavy scoring stage to one task
    (regression for the 32x serialization bug)."""
    q = Boolean(should=[Term("int"), Term("return")])
    plan = _plan(searcher.search(q, k=10))
    assert "REPARTITION_BY_NUM" in plan or "RoundRobinPartitioning" in plan \
        or "hashpartitioning(segment_id" in plan, plan[:800]


def test_docs_range_pushdown(searcher):
    from diagon_spark.search.query import Range
    plan = _plan(searcher._range_docs(Range("doc_len", 10, 50)))
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(doc_len,10)" in plan
    assert "LessThanOrEqual(doc_len,50)" in plan
