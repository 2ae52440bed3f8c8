"""Sloppy-phrase semantics (query.Phrase slop parameter — the builder
surface of search/PhraseQuery.h:68-75; the reference scorer itself only
implements slop=0, search/PhraseQuery.cpp:28-34, so slop>0 follows the
documented ordered-near-match semantics). Engine (greedy chaining,
wand.phrase_matches) vs the brute-force enumeration oracle
(oracle._sloppy_start_matches) — two independent algorithms."""

import numpy as np
import pytest

from diagon_spark import Searcher, build_index
from diagon_spark.oracle import OracleIndex, eval_query_oracle, topk_oracle
from diagon_spark.search.local_reader import LocalSearcher
from diagon_spark.search.query import Boolean, Phrase, Term

K = 50

# crafted gap structure: 'alpha ... beta' at varying distances, plus
# out-of-order, multi-occurrence, and 3-term variants
DOCS = [
    "alpha beta plain exact",                       # gap 0
    "alpha gap beta one filler",                    # gap 1
    "alpha gap gap beta two filler",                # gap 2
    "alpha gap gap gap beta three",                 # gap 3
    "beta alpha reversed order never matches",      # out of order
    "alpha beta alpha gap beta multi occurrence",   # freq 0: 2, freq 1: 3
    "one two three consecutive run",
    "one gap two three split early",                # slack 1
    "one two gap gap three split late",             # slack 2
    "one gap two gap three both gaps",              # slack 2
    "to be or not to be repeated terms",
    "alpha lonely no partner here",
    "beta lonely no partner either",
    "beta gap alpha gapped transposition",           # 13: shifted range 3
    "three one two rotated order here",              # 14: shifted range 3
    "two one three shuffled mix now",                # 15: shifted range 2
]
FILLER = [f"filler pad w{i % 7} text{i % 5} noise" for i in range(27)]


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sloppy"))
    rows = [(i, t) for i, t in enumerate(DOCS + FILLER)]
    df = spark.createDataFrame(rows, "doc_id long, content string")
    cat = build_index(spark, df, out, num_segments=2, num_buckets=4,
                      id_col="doc_id", positions=True)
    oracle = {"content": OracleIndex({i: t for i, t in rows})}
    return Searcher(spark, cat), LocalSearcher(cat), oracle


def _expected(q, oracle, k=K):
    return topk_oracle(eval_query_oracle(q, oracle, "content"), k)


def _check_both(s, ls, q, oracle, k=K):
    exp = _expected(q, oracle, k)
    got_spark = [(int(r.doc_id), float(r.score))
                 for r in s.search(q, k=k).collect()]
    got_local = [(int(d), float(x)) for d, x in ls.search(q, k=k)]
    assert [d for d, _ in got_spark] == [d for d, _ in exp], \
        (got_spark, exp)
    assert got_local == got_spark
    np.testing.assert_allclose([x for _, x in got_spark],
                               [x for _, x in exp], rtol=1e-6)
    return exp


def test_slop0_identical_to_default(built):
    s, ls, oracle = built
    exact = ls.search(Phrase(("alpha", "beta")), k=K)
    slop0 = ls.search(Phrase(("alpha", "beta"), slop=0), k=K)
    assert exact == slop0
    # bit-identical scores (same code path)
    assert [x for _, x in exact] == [x for _, x in slop0]


@pytest.mark.parametrize("slop", [0, 1, 2, 3])
def test_two_term_slop_vs_oracle(built, slop):
    s, ls, oracle = built
    exp = _check_both(s, ls, Phrase(("alpha", "beta"), slop=slop), oracle)
    # widening slop adds matches monotonically: docs 0..slop (gap<=slop)
    matched = {d for d, _ in exp}
    assert set(range(slop + 1)) | {5} >= {d for d in matched if d < 6}
    assert 4 not in matched  # out-of-order never matches


@pytest.mark.parametrize("slop", [0, 1, 2])
def test_three_term_slop_vs_oracle(built, slop):
    s, ls, oracle = built
    q = Phrase(("one", "two", "three"), slop=slop)
    exp = _check_both(s, ls, q, oracle)
    matched = {d for d, _ in exp}
    assert 6 in matched                      # consecutive always
    assert (7 in matched) == (slop >= 1)     # slack 1
    assert (8 in matched) == (slop >= 2)     # slack 2 (one side)
    assert (9 in matched) == (slop >= 2)     # slack 2 (split gaps)


def test_repeated_terms_sloppy(built):
    s, ls, oracle = built
    # "to be ... to be": repeated terms must use distinct increasing
    # positions; slop=2 bridges "or not"
    _check_both(s, ls, Phrase(("be", "to", "be"), slop=2), oracle)
    _check_both(s, ls, Phrase(("to", "be"), slop=0), oracle)


def test_sloppy_phrase_as_boolean_clause(built):
    s, ls, oracle = built
    q = Boolean(must=[Phrase(("alpha", "beta"), slop=2)],
                should=[Term("filler")])
    _check_both(s, ls, q, oracle)


def test_sloppy_freq_counts_starts(built):
    s, ls, oracle = built
    # doc 5 = "alpha beta alpha gap beta ...": slop=1 matches BOTH starts,
    # slop=0 matches both too (start0 exact; start2 'alpha gap beta' not
    # exact) -> slop0 freq 1? no: start 0 exact, start 2 has gap -> freq 1
    # at slop=0, freq 2 at slop>=1; higher freq -> higher score
    s0 = dict(ls.search(Phrase(("alpha", "beta"), slop=0), k=K))
    s1 = dict(ls.search(Phrase(("alpha", "beta"), slop=1), k=K))
    assert 5 in s0 and 5 in s1
    assert s1[5] > s0[5]


def test_count_parity(built):
    s, ls, oracle = built
    for slop in (0, 2):
        q = Phrase(("one", "two", "three"), slop=slop)
        exp = len(_expected(q, oracle))
        assert ls.count(q) == exp
        assert s.count(q) == exp


def test_negative_slop_rejected():
    with pytest.raises(ValueError):
        Phrase(("a", "b"), slop=-1)


# ------------------------------------------- unordered (ordered=False)


def test_unordered_slop0_equals_exact(built):
    s, ls, oracle = built
    exact = ls.search(Phrase(("alpha", "beta")), k=K)
    un0 = ls.search(Phrase(("alpha", "beta"), slop=0, ordered=False), k=K)
    assert exact == un0


@pytest.mark.parametrize("slop", [1, 2, 3])
def test_unordered_two_term_vs_oracle(built, slop):
    s, ls, oracle = built
    q = Phrase(("alpha", "beta"), slop=slop, ordered=False)
    exp = _check_both(s, ls, q, oracle)
    matched = {d for d, _ in exp}
    # Lucene transposition cost: "beta alpha" (doc 4) has shifted span 2,
    # "beta gap alpha" (doc 13) span 3
    assert (4 in matched) == (slop >= 2)
    assert (13 in matched) == (slop >= 3)
    # every ordered match is an unordered match at the same slop
    ordered_m = {d for d, _ in
                 _expected(Phrase(("alpha", "beta"), slop=slop), oracle)}
    assert ordered_m <= matched


@pytest.mark.parametrize("slop", [0, 1, 2, 3])
def test_unordered_three_term_vs_oracle(built, slop):
    s, ls, oracle = built
    q = Phrase(("one", "two", "three"), slop=slop, ordered=False)
    exp = _check_both(s, ls, q, oracle)
    matched = {d for d, _ in exp}
    assert 6 in matched                      # consecutive always
    assert (14 in matched) == (slop >= 3)    # "three one two" span 3
    assert (15 in matched) == (slop >= 2)    # "two one three" span 2


@pytest.mark.parametrize("slop", [2, 3, 5])
def test_unordered_repeated_terms(built, slop):
    s, ls, oracle = built
    # repeated terms must take DISTINCT positions (Lucene repeats rule):
    # doc 10 "to be or not to be" — Phrase("be","be") needs both 'be'
    # occurrences, shifted span (5-0)-(1-1)... = 3 -> matches slop>=3
    exp = _check_both(s, ls, Phrase(("be", "be"), slop=slop,
                                    ordered=False), oracle)
    assert (10 in {d for d, _ in exp}) == (slop >= 3)
    _check_both(s, ls, Phrase(("be", "to", "be"), slop=slop,
                              ordered=False), oracle)


def test_unordered_as_boolean_clause(built):
    s, ls, oracle = built
    q = Boolean(must=[Phrase(("alpha", "beta"), slop=2, ordered=False)],
                should=[Term("filler")])
    _check_both(s, ls, q, oracle)


def test_unordered_freq_counts_participating_starts(built):
    s, ls, oracle = built
    # doc 5 "alpha beta alpha gap beta": at slop=1 unordered, both alpha
    # positions participate (0 with beta@1; 2 with beta@1 shifted span 2?
    # no — 2 with beta@4: shifted 2,3 span 1) -> freq 2 > doc 0's freq 1,
    # and scores must exceed the slop=0 ones (freq 1)
    s0 = dict(ls.search(Phrase(("alpha", "beta"), slop=0), k=K))
    u1 = dict(ls.search(Phrase(("alpha", "beta"), slop=1,
                               ordered=False), k=K))
    assert u1[5] > s0[5]
