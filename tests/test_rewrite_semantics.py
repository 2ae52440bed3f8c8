"""rewrite() semantics — the reference's BooleanQuery::rewrite only
rewrites children and never flattens (search/BooleanQuery.cpp:557-575):
a nested SHOULD disjunction counts as ONE clause toward the parent's
min_should_match, and a Boolean whose only positive clause is FILTER
MatchAll matches ALL live docs at score 0 (BooleanWeight: the filter
scorer becomes the required scorer). Round-3 ADVICE items 1 and 2."""

import numpy as np
import pandas as pd
import pytest

from diagon_spark import Searcher, build_index
from diagon_spark.oracle import OracleIndex, eval_query_oracle, topk_oracle
from diagon_spark.search.query import (Boolean, MatchAll, MatchNone, Term,
                                       rewrite)

DOCS = [
    "alpha beta common",        # matches alpha AND nested(beta|gamma)
    "beta gamma common",        # matches ONLY the nested disjunction
    "alpha gamma common",       # matches alpha AND nested
    "delta common",             # matches neither
    "alpha common",             # matches only alpha
]


# ------------------------------------------------------------- pure units

def test_nested_disjunction_not_flattened():
    q = Boolean(should=[Term("a"), Boolean(should=[Term("b"), Term("c")])],
                min_should_match=2)
    r = rewrite(q)
    assert isinstance(r, Boolean)
    assert r.min_should_match == 2
    assert len(r.should) == 2  # nested disjunction stays ONE clause
    assert isinstance(r.should[1], Boolean)


def test_must_of_boolean_not_flattened():
    q = Boolean(must=[Term("a"), Boolean(must=[Term("b"), Term("c")])])
    r = rewrite(q)
    assert isinstance(r, Boolean)
    assert len(r.must) == 2  # f32 accumulation order: a + (b + c)


def test_filter_matchall_only_positive_clause():
    # Boolean(filter=[MatchAll]) == all docs at score 0, not MatchNone
    r = rewrite(Boolean(filter=[MatchAll()]))
    assert isinstance(r, MatchAll) and r.boost == 0.0
    # with must_not, the MatchAll filter must survive as the positive clause
    r = rewrite(Boolean(filter=[MatchAll()], must_not=[Term("x")]))
    assert isinstance(r, Boolean)
    assert any(isinstance(c, MatchAll) for c in r.filter)
    # with only SHOULD clauses it must survive too (optional scoring over
    # an all-docs candidate set)
    r = rewrite(Boolean(should=[Term("x")], filter=[MatchAll()]))
    assert isinstance(r, Boolean)
    assert any(isinstance(c, MatchAll) for c in r.filter)
    # next to a MUST clause it is redundant and drops (then unwraps)
    r = rewrite(Boolean(must=[Term("x")], filter=[MatchAll()]))
    assert r == Term("x")


def test_unsatisfiable_msm_rewrites_to_matchnone():
    assert isinstance(rewrite(Boolean(must=[Term("a")],
                                      should=[MatchNone()],
                                      min_should_match=1)), MatchNone)
    assert isinstance(rewrite(Boolean(should=[Term("a")],
                                      min_should_match=2)), MatchNone)


# ------------------------------------------------------ engine vs oracle

@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("rewridx"))
    pdf = pd.DataFrame({
        "repo": [f"r{i}" for i in range(len(DOCS))],
        "path": [f"p{i}" for i in range(len(DOCS))],
        "commit": [f"c{i}" for i in range(len(DOCS))],
        "lang": ["py"] * len(DOCS),
        "content": DOCS,
    })
    cat = build_index(spark, spark.createDataFrame(pdf), out,
                      num_segments=2, num_buckets=4)
    s = Searcher(spark, cat)
    rows = (spark.read.parquet(cat.docs_path)
            .select("doc_id", "content").collect())
    oidx = OracleIndex({int(r.doc_id): r.content for r in rows})
    by_content = {r.content: int(r.doc_id) for r in rows}
    return s, oidx, by_content


def _run(s, q, k=10):
    return [(int(r.doc_id), float(r.score))
            for r in s.search(q, k=k).collect()]


def test_parent_msm_counts_nested_disjunction_as_one_clause(idx):
    s, oidx, by_content = idx
    q = Boolean(should=[Term("alpha"),
                        Boolean(should=[Term("beta"), Term("gamma")])],
                min_should_match=2)
    got = _run(s, q)
    got_ids = {d for d, _ in got}
    # only docs matching alpha AND (beta or gamma)
    assert by_content[DOCS[0]] in got_ids
    assert by_content[DOCS[2]] in got_ids
    assert by_content[DOCS[1]] not in got_ids  # nested-only: ONE clause
    assert by_content[DOCS[4]] not in got_ids  # alpha-only
    exp = topk_oracle(eval_query_oracle(q, {"content": oidx}, "content"), 10)
    assert [d for d, _ in got] == [d for d, _ in exp]
    np.testing.assert_allclose([x for _, x in got], [x for _, x in exp],
                               rtol=1e-6)
    assert s.count(q) == len(exp)


def test_filter_matchall_matches_all_docs(idx):
    s, oidx, by_content = idx
    q = Boolean(filter=[MatchAll()])
    got = _run(s, q)
    assert len(got) == len(DOCS)
    assert all(sc == 0.0 for _, sc in got)
    assert s.count(q) == len(DOCS)


def test_filter_matchall_with_must_not(idx):
    s, oidx, by_content = idx
    q = Boolean(filter=[MatchAll()], must_not=[Term("delta")])
    got = _run(s, q)
    got_ids = {d for d, _ in got}
    assert by_content[DOCS[3]] not in got_ids
    assert len(got) == len(DOCS) - 1
    exp = eval_query_oracle(q, {"content": oidx}, "content")
    assert got_ids == set(exp)
    assert s.count(q) == len(exp)


def test_should_over_filter_matchall_candidates(idx):
    s, oidx, by_content = idx
    # every doc matches (filter MatchAll is the required clause); alpha
    # docs score > 0, the rest exactly 0
    q = Boolean(should=[Term("alpha")], filter=[MatchAll()])
    got = _run(s, q)
    assert len(got) == len(DOCS)
    exp = topk_oracle(eval_query_oracle(q, {"content": oidx}, "content"), 10)
    assert [d for d, _ in got] == [d for d, _ in exp]
    np.testing.assert_allclose([x for _, x in got], [x for _, x in exp],
                               rtol=1e-6)
    scores = dict(got)
    assert scores[by_content[DOCS[3]]] == 0.0
    assert scores[by_content[DOCS[0]]] > 0.0
