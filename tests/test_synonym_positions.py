"""Index-time synonym expansion with same-position semantics
(analysis/SynonymFilter.cpp: expansions are position-increment-0
tokens). Phrase queries must match ACROSS a synonym ("function run"
matches a doc saying "fn run") and must NOT match a token and its own
synonym as if adjacent ("fn function"). Scores checked against a
hand-computed BM25 oracle."""

import numpy as np
import pandas as pd
import pytest

from diagon_spark import Searcher, build_index
from diagon_spark.analysis.analyzers import synonym_analyzer
from diagon_spark.index.norms import encode_norm
from diagon_spark.search import bm25
from diagon_spark.search.local_reader import LocalSearcher
from diagon_spark.search.query import Phrase, Term

DOCS = ["fn run done",        # indexes fn@0 function@0 run@1 done@2 (len 4)
        "the function run",   # the@0 function@1 run@2 (len 3)
        "fn function"]        # fn@0 function@0 function@1 (len 3)
SYNS = {"fn": ["function"]}

# hand-computed collection stats over the EXPANDED token streams
MAX_DOC = 3
STTF = 4 + 3 + 3
DF = {"function": 3, "fn": 2, "run": 2, "the": 1, "done": 1}
LEN = {0: 4, 1: 3, 2: 3}


def _phrase_score(terms: list[str], doc: int, tf: int = 1) -> float:
    doc_count, sttf = bm25.collection_stats_with_fallbacks(MAX_DOC, STTF)
    min_df = max(min(DF[t] for t in terms), 1)
    sc = bm25.sim_scorer(min_df, doc_count, sttf)
    norm = int(encode_norm(np.array([LEN[doc]]))[0])
    return float(sc.score(np.array([tf]), np.array([norm]))[0])


@pytest.fixture(scope="module")
def syn(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("synidx"))
    pdf = pd.DataFrame({
        "repo": [f"r{i}" for i in range(len(DOCS))],
        "path": [f"p{i}" for i in range(len(DOCS))],
        "commit": [f"c{i}" for i in range(len(DOCS))],
        "lang": ["py"] * len(DOCS),
        "content": DOCS,
    })
    cat = build_index(spark, spark.createDataFrame(pdf), out,
                      num_segments=1, num_buckets=4,
                      analyzer=synonym_analyzer(SYNS))
    s = Searcher(spark, cat)
    rows = (spark.read.parquet(cat.docs_path)
            .select("doc_id", "content", "doc_len").collect())
    by_content = {r.content: int(r.doc_id) for r in rows}
    doc_lens = {r.content: int(r.doc_len) for r in rows}
    return s, cat, by_content, doc_lens


def test_doc_length_counts_expansions(syn):
    _, _, _, doc_lens = syn
    # FieldInvertState.length includes position-increment-0 tokens
    assert doc_lens[DOCS[0]] == 4
    assert doc_lens[DOCS[1]] == 3
    assert doc_lens[DOCS[2]] == 3


def test_term_df_includes_synonym_docs(syn):
    s, _, _, _ = syn
    assert s.count(Term("function")) == 3
    assert s.count(Term("fn")) == 2


def test_phrase_matches_across_synonym(syn):
    s, cat, by_content, _ = syn
    got = {int(r.doc_id): float(r.score)
           for r in s.search(Phrase(("function", "run")), k=10).collect()}
    want = {by_content[DOCS[0]]: _phrase_score(["function", "run"], 0),
            by_content[DOCS[1]]: _phrase_score(["function", "run"], 1)}
    assert set(got) == set(want)
    for d in want:
        np.testing.assert_allclose(got[d], want[d], rtol=1e-6)


def test_phrase_not_adjacent_to_own_synonym(syn):
    s, cat, by_content, _ = syn
    # fn@p and function@p share a position in d0 — NOT a phrase match;
    # d2 really does contain function at fn's position + 1
    got = {int(r.doc_id): float(r.score)
           for r in s.search(Phrase(("fn", "function")), k=10).collect()}
    assert set(got) == {by_content[DOCS[2]]}
    np.testing.assert_allclose(
        got[by_content[DOCS[2]]], _phrase_score(["fn", "function"], 2),
        rtol=1e-6)


def test_original_phrase_still_matches(syn):
    s, cat, by_content, _ = syn
    got = {int(r.doc_id) for r in
           s.search(Phrase(("fn", "run")), k=10).collect()}
    assert got == {by_content[DOCS[0]]}


def test_local_searcher_parity(syn):
    s, cat, _, _ = syn
    local = LocalSearcher(cat)
    for q in (Phrase(("function", "run")), Phrase(("fn", "function")),
              Term("function")):
        got_local = local.search(q, k=10)
        got_spark = [(int(r.doc_id), float(r.score))
                     for r in s.search(q, k=10).collect()]
        assert got_local == got_spark, q
