"""Analyzer framework (AnalyzerFactory analogue) + Range query tests."""

import pandas as pd
import pytest

from diagon_spark.analysis import analyzers as A
from diagon_spark.search.query import Range, Term


def _run(an, texts):
    return an(pd.Series(texts)).tolist()


def test_whitespace():
    assert _run(A.analyzer_for("whitespace"), ["Foo Bar  baz"]) == \
        [["Foo", "Bar", "baz"]]


def test_keyword():
    assert _run(A.analyzer_for("keyword"), ["New York", ""]) == \
        [["New York"], []]


def test_simple():
    assert _run(A.analyzer_for("simple"), ["Ab3cd ef"]) == [["ab", "cd", "ef"]]


def test_standard():
    assert _run(A.analyzer_for("standard"), ["int x = 42;"]) == \
        [["int", "x", "42"]]


def test_english_stop_and_fold():
    got = _run(A.analyzer_for("english"), ["The café is naïve"])
    assert got == [["cafe", "naive"]]


def test_synonym_filter():
    an = A.chain(A.standard_analyzer, A.synonym_filter({"fast": ["quick"]}))
    assert _run(an, ["fast code"]) == [["fast", "quick", "code"]]


def test_unknown_analyzer():
    with pytest.raises(ValueError, match="unknown analyzer"):
        A.analyzer_for("nope")


def test_custom_analyzer_in_build(spark, tmp_path):
    """Index with the english analyzer: stopwords absent, accents folded."""
    from diagon_spark import build_index, Searcher
    pdf = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["the quick café", "a naïve test of the cafe", "plain words"],
    })
    df = spark.createDataFrame(pdf)
    cat = build_index(spark, df, str(tmp_path / "en"), num_segments=1,
                      num_buckets=4, id_col="doc_id", content_col="text",
                      positions=False, analyzer=A.analyzer_for("english"))
    s = Searcher(spark, cat)
    assert s.count(Term("the")) == 0          # stopword never indexed
    assert s.count(Term("cafe")) == 2         # folded matches both docs
    assert s.count(Term("café")) == 0


def test_range_query(spark, tmp_path):
    from diagon_spark import build_index, Searcher
    pdf = pd.DataFrame({
        "doc_id": range(20),
        "text": [f"w{'x ' * (i + 1)}" for i in range(20)],
    })
    df = spark.createDataFrame(pdf)
    cat = build_index(spark, df, str(tmp_path / "r"), num_segments=2,
                      num_buckets=4, id_col="doc_id", content_col="text",
                      positions=False)
    s = Searcher(spark, cat)
    # doc_len = i + 2 tokens (w + i+1 x's ... actually "w..." splits)
    n_all = s.count(Range("doc_len", lower=None, upper=None))
    assert n_all == 20
    mid = s.count(Range("doc_len", lower=5, upper=10))
    lo = s.count(Range("doc_len", upper=4))
    hi = s.count(Range("doc_len", lower=11))
    assert mid + lo + hi == 20
    hits = s.search(Range("doc_len", lower=5, upper=10), k=100).collect()
    assert len(hits) == mid
    assert all(r.score == 1.0 for r in hits)
