"""Edge cases mirrored from QueryEdgeCasesTest: empty documents,
single-token docs, unknown terms, k=0-ish boundaries."""

import pandas as pd
import pytest

from diagon_spark import build_index, Searcher
from diagon_spark.search.query import Boolean, MatchAll, Range, Term


@pytest.fixture(scope="module")
def searcher(spark, tmp_path_factory):
    pdf = pd.DataFrame({
        "doc_id": range(6),
        "text": ["", "   ", "single", "alpha beta gamma",
                 "alpha alpha alpha", "!!! ??? ..."],
    })
    cat = build_index(spark, spark.createDataFrame(pdf),
                      str(tmp_path_factory.mktemp("edge") / "idx"),
                      num_segments=2, num_buckets=2, id_col="doc_id",
                      content_col="text", positions=True)
    return Searcher(spark, cat)


def test_empty_docs_counted_not_matched(spark, searcher):
    # empty/punct-only docs exist (match_all) but match no term
    assert searcher.count(MatchAll()) == 6
    assert searcher.count(Term("alpha")) == 2
    docs = spark.read.parquet(searcher.cat.docs_path).collect()
    by_id = {r.doc_id: r for r in docs}
    assert by_id[0].doc_len == 0 and by_id[0].norm == 127  # empty -> 127
    assert by_id[5].doc_len == 0  # punctuation-only


def test_single_token_doc_norm(spark, searcher):
    docs = {r.doc_id: r for r in
            spark.read.parquet(searcher.cat.docs_path).collect()}
    assert docs[2].doc_len == 1 and docs[2].norm == 127  # len 1 -> 127


def test_repeated_term_tf(searcher):
    hits = searcher.search(Term("alpha"), k=10).collect()
    # doc 4 (tf=3, len 3) must outrank doc 3 (tf=1, len 3)
    assert hits[0].doc_id == 4
    assert hits[1].doc_id == 3


def test_unknown_term_boolean(searcher):
    assert searcher.search(Boolean(must=[Term("alpha"), Term("zzz")]),
                           k=5).count() == 0
    got = searcher.search(Boolean(should=[Term("alpha"), Term("zzz")]),
                          k=5).count()
    assert got == 2  # OR with a missing clause still matches the other


def test_k_one(searcher):
    hits = searcher.search(Term("alpha"), k=1).collect()
    assert len(hits) == 1 and hits[0].doc_id == 4


def test_range_open_bounds(searcher):
    assert searcher.count(Range("doc_len", lower=1)) == 3
    assert searcher.count(Range("doc_len", upper=0)) == 3


def test_should_with_must_not_no_must(searcher):
    """Boolean(should + must_not) without MUST clauses (regression: this
    crashed with an IndexError on the empty lead-term list)."""
    q = Boolean(should=[Term("alpha"), Term("beta")], must_not=[Term("gamma")])
    hits = searcher.search(q, k=10).collect()
    ids = [r.doc_id for r in hits]
    assert 4 in ids          # alpha-only doc kept
    assert 3 not in ids      # contains gamma -> banned
    # oracle cross-check
    from diagon_spark.oracle import OracleIndex
    oracle = OracleIndex({0: "", 1: "   ", 2: "single",
                          3: "alpha beta gamma", 4: "alpha alpha alpha",
                          5: "!!! ??? ..."})
    or_hits = dict(oracle.search_or(["alpha", "beta"], 10))
    banned = set(oracle.postings.get("gamma", {}))
    expect = sorted(((d, s) for d, s in or_hits.items() if d not in banned),
                    key=lambda kv: (-kv[1], kv[0]))
    assert ids == [d for d, _ in expect]


def test_mixed_bool_min_should_match(searcher):
    """MUST + SHOULD with minimumNumberShouldMatch over SHOULD clauses."""
    q = Boolean(must=[Term("alpha")], should=[Term("beta"), Term("gamma")],
                min_should_match=2)
    ids = [r.doc_id for r in searcher.search(q, k=10).collect()]
    assert ids == [3]  # only doc 3 has alpha AND both beta+gamma
    q1 = Boolean(must=[Term("alpha")], should=[Term("beta"), Term("gamma")],
                 min_should_match=0)
    ids1 = [r.doc_id for r in searcher.search(q1, k=10).collect()]
    assert set(ids1) == {3, 4}


def test_k_zero_returns_empty(searcher):
    """QueryEdgeCasesTest::TopK_ZeroRequested: k=0 is a valid request
    returning no hits (count-only callers use count())."""
    assert searcher.search(Term("alpha"), k=0).collect() == []


def test_very_long_term_round_trips(spark, tmp_path):
    """QueryEdgeCasesTest::LongTerm_VeryLongWord: a 500-char token must
    index and match exactly, not truncate."""
    long_tok = "x" * 500
    pdf = pd.DataFrame({"doc_id": [0, 1],
                        "text": [f"start {long_tok} end", "other words"]})
    cat = build_index(spark, spark.createDataFrame(pdf),
                      str(tmp_path / "idx"), num_segments=1, num_buckets=2,
                      id_col="doc_id", content_col="text", positions=False)
    s = Searcher(spark, cat)
    assert [int(r.doc_id) for r in s.search(Term(long_tok), k=5).collect()] \
        == [0]
    assert s.search(Term("x" * 499), k=5).collect() == []


def test_single_document_index(spark, tmp_path):
    """QueryEdgeCasesTest::SingleDocument_SearchWorks."""
    pdf = pd.DataFrame({"doc_id": [7], "text": ["lonely little document"]})
    cat = build_index(spark, spark.createDataFrame(pdf),
                      str(tmp_path / "idx"), num_segments=1, num_buckets=2,
                      id_col="doc_id", content_col="text", positions=True)
    s = Searcher(spark, cat)
    hits = s.search(Term("lonely"), k=10).collect()
    assert [int(r.doc_id) for r in hits] == [7]
    assert s.count(MatchAll()) == 1


def test_term_and_range_conjunction_multisegment(spark, tmp_path):
    """BoolConjunctionBugTest::TermANDPointRange_MultiSegment: the exact
    Big5 regression pattern — a MUST term + MUST numeric range over
    multiple segments must return the true intersection, not one
    clause's results. 100 docs, term 'even' on even ids, doc_len used as
    the numeric doc value."""
    pdf = pd.DataFrame({
        "doc_id": range(100),
        # doc_len = i%7 + 2 tokens; 'even' marks even ids
        "text": [("even " if i % 2 == 0 else "odd ") +
                 " ".join(f"w{j}" for j in range(i % 7 + 1))
                 for i in range(100)],
    })
    cat = build_index(spark, spark.createDataFrame(pdf),
                      str(tmp_path / "idx"), num_segments=4, num_buckets=4,
                      id_col="doc_id", content_col="text", positions=False)
    s = Searcher(spark, cat)
    # doc_len in [4, 6] <=> i%7 in {2,3,4}; expected = even ids with that
    expect = {i for i in range(100) if i % 2 == 0 and 2 <= i % 7 <= 4}
    q = Boolean(must=[Term("even")], filter=[Range("doc_len", 4, 6)])
    got = {int(r.doc_id) for r in s.search(q, k=200).collect()}
    assert got == expect
    assert s.count(q) == len(expect)
    # MUST-range variant scores identically to FILTER-range (constant
    # score 0 contribution is the reference's FILTER semantics; as MUST
    # the range adds its boost) — both must intersect correctly
    q2 = Boolean(must=[Term("even"), Range("doc_len", 4, 6)])
    got2 = {int(r.doc_id) for r in s.search(q2, k=200).collect()}
    assert got2 == expect


def test_filter_only_boolean_matches_all_filter_docs(searcher):
    """BooleanWeight: a boolean whose only positive clauses are FILTERs
    matches every doc passing the filters, score 0 (the filter scorer
    becomes the required scorer). The flat all-Term path must agree with
    the tree path — this was a flat-path regression: conjunction()
    required a MUST or SHOULD to establish candidates."""
    q = Boolean(filter=[Term("alpha")])
    hits = searcher.search(q, k=10).collect()
    assert [(int(r.doc_id), float(r.score)) for r in hits] == \
        [(3, 0.0), (4, 0.0)]
    assert searcher.count(q) == 2


def test_should_is_optional_when_filter_present(searcher):
    """With a FILTER present and msm=0, SHOULD clauses are score-only:
    docs passing the filter but matching no SHOULD still match at 0."""
    q = Boolean(should=[Term("beta")], filter=[Term("alpha")])
    hits = [(int(r.doc_id), float(r.score))
            for r in searcher.search(q, k=10).collect()]
    assert [d for d, _ in hits] == [3, 4]   # beta-scorer ranks 3 first
    assert hits[0][1] > 0.0 and hits[1][1] == 0.0
    assert searcher.count(q) == 2
    # msm=1 restores the requirement
    q1 = Boolean(should=[Term("beta")], filter=[Term("alpha")],
                 min_should_match=1)
    assert [int(r.doc_id) for r in searcher.search(q1, k=10).collect()] \
        == [3]


def test_filter_boolean_local_parity(searcher):
    from diagon_spark.search.local_reader import LocalSearcher
    ls = LocalSearcher(searcher.cat)
    for q in (Boolean(filter=[Term("alpha")]),
              Boolean(should=[Term("beta")], filter=[Term("alpha")]),
              Boolean(should=[Term("beta")], filter=[Term("alpha")],
                      min_should_match=1)):
        spark_hits = [(int(r.doc_id), float(r.score))
                      for r in searcher.search(q, k=10).collect()]
        assert ls.search(q, k=10) == spark_hits, q
        assert ls.count(q) == searcher.count(q), q


def test_duplicate_term_in_must_and_should_msm(spark, tmp_path):
    """A term appearing in BOTH must and should scores once per clause
    but counts toward minShouldMatch only for its SHOULD occurrence —
    the flat path double-counted it on the must pass, disagreeing with
    count()/the tree path on the same query."""
    pdf = pd.DataFrame({"doc_id": [1, 2, 3],
                        "text": ["alpha alpha", "alpha beta", "beta"]})
    cat = build_index(spark, spark.createDataFrame(pdf),
                      str(tmp_path / "idx"), num_segments=1, num_buckets=2,
                      id_col="doc_id", content_col="text", positions=False)
    s = Searcher(spark, cat)
    q = Boolean(must=[Term("alpha")], should=[Term("alpha"), Term("beta")],
                min_should_match=2)
    got = [int(r.doc_id) for r in s.search(q, k=10).collect()]
    assert got == [2]          # doc 1 matches only ONE should clause
    assert s.count(q) == 1     # flat search and tree count agree


def test_duplicate_term_different_boosts_routes_to_tree(spark, tmp_path):
    """Same term in two scoring clauses with different boosts: the flat
    path can carry only one boost per term, so the planner must route to
    the tree path, which scores each clause with its own boost (total =
    (b1 + b2) x base term score — boost is linear in the idf factor)."""
    pdf = pd.DataFrame({"doc_id": [1, 2], "text": ["alpha beta", "beta"]})
    cat = build_index(spark, spark.createDataFrame(pdf),
                      str(tmp_path / "idx"), num_segments=1, num_buckets=2,
                      id_col="doc_id", content_col="text", positions=False)
    s = Searcher(spark, cat)
    base = {int(r.doc_id): float(r.score)
            for r in s.search(Term("alpha"), k=10, f64=True).collect()}
    q = Boolean(must=[Term("alpha", boost=2.0)],
                should=[Term("alpha", boost=0.5)])
    got = {int(r.doc_id): float(r.score)
           for r in s.search(q, k=10, f64=True).collect()}
    assert set(got) == {1}
    assert abs(got[1] - 2.5 * base[1]) < 1e-9
