"""End-to-end rank-identity: Spark engine vs the pure-Python golden oracle
on the deterministic synthetic corpus — the analogue of the reference's
golden-output comparison vs Apache Lucene (design/TESTING_STRATEGY.md:373-407)
over the Reuters-shaped query set (benchmarks/reuters_benchmark.cpp:197-317).
"""

import numpy as np
import pytest

from diagon_spark import build_index, Searcher
from diagon_spark.corpus import corpus_df, generate_pandas, VOCAB
from diagon_spark.oracle import OracleIndex
from diagon_spark.search.query import Boolean, MatchAll, Phrase, Term

N_DOCS = 500
K = 100


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("index"))
    df = corpus_df(spark, N_DOCS, partitions=4)
    cat = build_index(spark, df, out, num_segments=4, num_buckets=8,
                      key_cols=["repo", "path", "commit"], positions=True)
    searcher = Searcher(spark, cat)
    # oracle over the same corpus, keyed by the engine's deterministic ids
    docs = spark.read.parquet(cat.docs_path) \
        .select("doc_id", "repo", "path", "commit").collect()
    pdf = generate_pandas(0, N_DOCS)
    by_key = {(r.repo, r.path, r.commit): r["content"] for _, r in pdf.iterrows()}
    id_to_content = {r.doc_id: by_key[(r.repo, r.path, r.commit)] for r in docs}
    assert len(id_to_content) == N_DOCS
    oracle = OracleIndex(id_to_content)
    return searcher, oracle


def _collect(df):
    return [(r.doc_id, r.score) for r in df.collect()]


def _assert_rank_identical(got, want, tag):
    assert [d for d, _ in got] == [d for d, _ in want], \
        f"{tag}: docID order mismatch\n got={got[:10]}\nwant={want[:10]}"
    for (d1, s1), (d2, s2) in zip(got, want):
        assert s1 == pytest.approx(s2, rel=1e-6), f"{tag}: score mismatch doc {d1}"


# reference query set shape: 3 single, and_2, or_{2,5,10,20,50}, phrases
SINGLE_TERMS = ["int", "var_30", "fn_100"]
OR_SETS = {f"or_{n}": VOCAB[:n] for n in (2, 5, 10, 20, 50)}


@pytest.mark.parametrize("term", SINGLE_TERMS)
def test_single_term_rank_identical(built, term):
    searcher, oracle = built
    got = _collect(searcher.search(Term(term), k=K))
    want = oracle.search_term(term, K)
    _assert_rank_identical(got, want, f"term:{term}")


@pytest.mark.parametrize("name", sorted(OR_SETS))
def test_or_rank_identical(built, name):
    searcher, oracle = built
    terms = OR_SETS[name]
    q = Boolean(should=[Term(t) for t in terms])
    got = _collect(searcher.search(q, k=K))
    want = oracle.search_or(terms, K)
    _assert_rank_identical(got, want, name)


def test_and_rank_identical(built):
    searcher, oracle = built
    terms = ["int", "return"]
    q = Boolean(must=[Term(t) for t in terms])
    got = _collect(searcher.search(q, k=K))
    want = oracle.search_and(terms, K)
    _assert_rank_identical(got, want, "and_2")


def test_must_not(built):
    searcher, oracle = built
    q = Boolean(must=[Term("int")], must_not=[Term("while")])
    got = _collect(searcher.search(q, k=K))
    want = oracle.search_not(["int"], ["while"], K)
    _assert_rank_identical(got, want, "not")


def test_filter_non_scoring(built):
    searcher, oracle = built
    # FILTER requires but does not score (BooleanQuery.h:24-28)
    got = _collect(searcher.search(
        Boolean(must=[Term("int")], filter=[Term("return")]), k=K))
    want_and = oracle.search_and(["int", "return"], len(oracle.doc_len))
    want_term = dict(oracle.search_term("int", len(oracle.doc_len)))
    want = sorted(((d, want_term[d]) for d, _ in want_and),
                  key=lambda x: (-x[1], x[0]))[:K]
    _assert_rank_identical(got, want, "filter")


@pytest.mark.parametrize("phrase", [("int", "return"), ("static", "void"),
                                    ("if", "return", "var_30")])
def test_phrase_rank_identical(built, phrase):
    searcher, oracle = built
    got = _collect(searcher.search(Phrase(phrase), k=K))
    want = oracle.search_phrase(list(phrase), K)
    _assert_rank_identical(got, want, f"phrase:{phrase}")


def test_min_should_match(built):
    searcher, oracle = built
    terms = VOCAB[:10]
    q = Boolean(should=[Term(t) for t in terms], min_should_match=3)
    got = _collect(searcher.search(q, k=K))
    want = oracle.search_or(terms, K, min_should_match=3)
    _assert_rank_identical(got, want, "msm3")


def test_count_fast_path(built):
    searcher, oracle = built
    for t in SINGLE_TERMS:
        assert searcher.count(Term(t)) == oracle.count_term(t)


def test_match_all(built):
    searcher, oracle = built
    got = _collect(searcher.search(MatchAll(), k=10))
    assert len(got) == 10
    assert searcher.count(MatchAll()) == N_DOCS


def test_sha256_invariant(built, spark):
    """Per-row invariant (north_rule): docs.content_sha256 equals
    sha256(content) of the source table."""
    searcher, _ = built
    import hashlib
    docs = spark.read.parquet(searcher.cat.docs_path) \
        .select("repo", "path", "commit", "content_sha256").collect()
    pdf = generate_pandas(0, N_DOCS)
    by_key = {(r.repo, r.path, r.commit):
              hashlib.sha256(r["content"].encode()).hexdigest()
              for _, r in pdf.iterrows()}
    for r in docs:
        assert r.content_sha256 == by_key[(r.repo, r.path, r.commit)]


def test_deterministic_doc_ids(built, spark, tmp_path):
    """Rebuild with different partitioning -> identical doc id assignment."""
    searcher, _ = built
    df2 = corpus_df(spark, N_DOCS, partitions=7)
    cat2 = build_index(spark, df2, str(tmp_path / "idx2"), num_segments=4,
                       num_buckets=8, positions=False)
    a = {(r.repo, r.path, r.commit): r.doc_id for r in
         spark.read.parquet(searcher.cat.docs_path)
         .select("repo", "path", "commit", "doc_id").collect()}
    b = {(r.repo, r.path, r.commit): r.doc_id for r in
         spark.read.parquet(cat2.docs_path)
         .select("repo", "path", "commit", "doc_id").collect()}
    assert a == b
