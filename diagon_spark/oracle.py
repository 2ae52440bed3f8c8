"""Pure-Python golden oracle — the role Lucene golden outputs play for the
reference (design/TESTING_STRATEGY.md:373-407).

Implements the exact query semantics of SURVEY.md §2.3-2.4 independently of
any Spark code: tokenize -> in-memory postings -> BM25 float32 scoring ->
top-k with the collector tie-break (score desc, docID asc —
TopScoreDocCollector.cpp:220-221). Intentionally simple and slow; used only
in pytest at tiny scale to verify the Spark engine is rank-identical.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np

from diagon_spark.analysis.tokenizer import tokenize
from diagon_spark.index.norms import encode_norm
from diagon_spark.search import bm25


class OracleIndex:
    def __init__(self, docs: dict[int, str]):
        """docs: doc_id -> content."""
        self.postings: dict[str, dict[int, list[int]]] = defaultdict(dict)
        self.doc_len: dict[int, int] = {}
        self.norm: dict[int, int] = {}
        for doc_id, content in docs.items():
            toks = tokenize(content)
            self.doc_len[doc_id] = len(toks)
            self.norm[doc_id] = int(encode_norm(np.array([len(toks)]))[0])
            for pos, t in enumerate(toks):
                self.postings[t].setdefault(doc_id, []).append(pos)
        self.max_doc = len(docs)
        self.sum_total_term_freq = sum(self.doc_len.values())

    # ---- stats with reference fallbacks (TermQuery.cpp:213-256)
    def _scorer(self, term: str) -> bm25.SimScorer:
        doc_count, sttf = bm25.collection_stats_with_fallbacks(
            self.max_doc, self.sum_total_term_freq)
        df = len(self.postings.get(term, {}))
        if df == 0:
            df = self.max_doc // 10
        return bm25.sim_scorer(df, doc_count, sttf)

    def _term_scores(self, term: str) -> dict[int, np.float32]:
        sc = self._scorer(term)
        out = {}
        for doc_id, poss in self.postings.get(term, {}).items():
            out[doc_id] = sc.score(np.array([len(poss)]), np.array([self.norm[doc_id]]))[0]
        return out

    # ---- query evaluation
    def search_term(self, term: str, k: int) -> list[tuple[int, float]]:
        return _topk(self._term_scores(term), k)

    def search_and(self, terms: list[str], k: int) -> list[tuple[int, float]]:
        per_term = [self._term_scores(t) for t in terms]
        if not per_term:
            return []
        common = set(per_term[0])
        for m in per_term[1:]:
            common &= set(m)
        # float32 accumulation in clause order
        scores = {}
        for d in common:
            acc = np.float32(0.0)
            for m in per_term:
                acc = np.float32(acc + m[d])
            scores[d] = acc
        return _topk(scores, k)

    def search_or(self, terms: list[str], k: int,
                  min_should_match: int = 0) -> list[tuple[int, float]]:
        per_term = [self._term_scores(t) for t in terms]
        acc: dict[int, np.float32] = {}
        nmatch: dict[int, int] = defaultdict(int)
        for m in per_term:
            for d, s in m.items():
                acc[d] = np.float32(acc.get(d, np.float32(0.0)) + s)
                nmatch[d] += 1
        if min_should_match > 1:
            acc = {d: s for d, s in acc.items() if nmatch[d] >= min_should_match}
        return _topk(acc, k)

    def search_not(self, must: list[str], must_not: list[str], k: int) -> list[tuple[int, float]]:
        hits = self.search_and(must, k=len(self.doc_len) + 1)
        banned: set[int] = set()
        for t in must_not:
            banned |= set(self.postings.get(t, {}))
        return [(d, s) for d, s in hits if d not in banned][:k]

    def search_phrase(self, terms: list[str], k: int) -> list[tuple[int, float]]:
        """Exact phrase (slop=0 — PhraseQuery.cpp:28-34): conjunction on doc,
        verify pos(term_i) == pos(term_0) + i; tf = number of start
        positions; idf uses the RAREST term's docFreq (min df over terms
        with df>0, default maxDoc, clamped >=1 — PhraseQuery.cpp:303-338).
        """
        if not terms:
            return []
        cand = set(self.postings.get(terms[0], {}))
        for t in terms[1:]:
            cand &= set(self.postings.get(t, {}))
        doc_count, sttf = bm25.collection_stats_with_fallbacks(
            self.max_doc, self.sum_total_term_freq)
        min_df = self.max_doc
        for t in terms:
            df = len(self.postings.get(t, {}))
            if df > 0:
                min_df = min(min_df, df)
        min_df = max(min_df, 1)
        scorer = bm25.sim_scorer(min_df, doc_count, sttf)
        scores = {}
        for d in cand:
            starts = set(self.postings[terms[0]][d])
            for i, t in enumerate(terms[1:], start=1):
                pset = {p - i for p in self.postings[t][d]}
                starts &= pset
            freq = len(starts)
            if freq > 0:
                scores[d] = scorer.score(np.array([freq]), np.array([self.norm[d]]))[0]
        return _topk(scores, k)

    def count_term(self, term: str) -> int:
        return len(self.postings.get(term, {}))


def _topk(scores: dict[int, np.float32], k: int) -> list[tuple[int, float]]:
    """Collector order: score desc, docID asc (TopScoreDocCollector.cpp:220-221)."""
    items = sorted(scores.items(), key=lambda kv: (-float(kv[1]), kv[0]))
    return [(d, float(s)) for d, s in items[:k]]
