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
    def __init__(self, docs: dict[int, str], tokenizer=None):
        """docs: doc_id -> content. `tokenizer` overrides the standard
        tokenizer (e.g. a CJK dictionary segmenter chain) so the oracle
        models custom-analyzer indexes too."""
        self.postings: dict[str, dict[int, list[int]]] = defaultdict(dict)
        self.doc_len: dict[int, int] = {}
        self.norm: dict[int, int] = {}
        tok_fn = tokenizer or tokenize
        for doc_id, content in docs.items():
            toks = tok_fn(content)
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


# --------------------------------------------------------- query trees

def _sloppy_start_matches(start: int, pos_lists: list[list[int]],
                          slop: int) -> bool:
    """Brute-force existence check for ONE start position: is there an
    increasing in-order assignment p_1 < ... < p_{n-1} (all > start) with
    (p_last - start) - (n-1) <= slop? Enumerates every combination inside
    the bounded window — deliberately a DIFFERENT algorithm from the
    engine's greedy chaining (wand.phrase_matches) so the test oracle is
    independent."""
    import itertools
    n = len(pos_lists) + 1
    limit = start + (n - 1) + slop
    windows = [[p for p in pl if start < p <= limit] for pl in pos_lists]
    if any(not w for w in windows):
        return False
    for combo in itertools.product(*windows):
        seq = (start, *combo)
        if all(b > a for a, b in zip(seq, seq[1:])):
            return True
    return False


def _unordered_p0_matches(p0: int, pos_lists: list[list[int]],
                          terms: list[str], slop: int) -> bool:
    """Brute-force existence check for ONE offset-0 position under the
    UNORDERED semantics (query.Phrase ordered=False): enumerate every
    combination of positions within the slop window around p0's shifted
    value and accept iff max(p_i - i) - min(p_i - i) <= slop with
    distinct positions among offsets of the same term. Deliberately a
    different algorithm from the engine's anchor-window cover
    (wand.phrase_matches) / interval greedy (_unordered_repeat_freqs)."""
    import itertools
    windows = []
    for i, pl in enumerate(pos_lists, start=1):
        # any valid assignment containing p0 has |(p - i) - p0| <= slop
        w = [p for p in pl if p0 - slop + i <= p <= p0 + slop + i]
        if not w:
            return False
        windows.append(w)
    for combo in itertools.product(*windows):
        seq = (p0, *combo)
        shifted = [p - i for i, p in enumerate(seq)]
        if max(shifted) - min(shifted) > slop:
            continue
        by_term: dict = {}
        ok = True
        for t, p in zip(terms, seq):
            if p in by_term.setdefault(t, set()):
                ok = False  # repeated term reusing a position
                break
            by_term[t].add(p)
        if ok:
            return True
    return False


def phrase_scores(idx: OracleIndex, terms: list[str],
                  slop: int = 0,
                  ordered: bool = True) -> dict[int, np.float32]:
    """All docs matching the phrase -> f32 score (rarest-term idf).
    slop=0 exact (PhraseQuery.cpp:28-34); slop>0 ordered near-match per
    query.Phrase (freq = number of matching start positions), or
    unordered window-match when ordered=False (freq = number of offset-0
    positions participating in >=1 valid assignment)."""
    if not terms:
        return {}
    cand = set(idx.postings.get(terms[0], {}))
    for t in terms[1:]:
        cand &= set(idx.postings.get(t, {}))
    doc_count, sttf = bm25.collection_stats_with_fallbacks(
        idx.max_doc, idx.sum_total_term_freq)
    min_df = idx.max_doc
    for t in terms:
        df = len(idx.postings.get(t, {}))
        if df > 0:
            min_df = min(min_df, df)
    min_df = max(min_df, 1)
    scorer = bm25.sim_scorer(min_df, doc_count, sttf)
    out: dict[int, np.float32] = {}
    for d in cand:
        if slop == 0:
            starts = set(idx.postings[terms[0]][d])
            for i, t in enumerate(terms[1:], start=1):
                starts &= {p - i for p in idx.postings[t][d]}
            freq = len(starts)
        elif ordered:
            rest = [sorted(idx.postings[t][d]) for t in terms[1:]]
            freq = sum(1 for a in idx.postings[terms[0]][d]
                       if _sloppy_start_matches(a, rest, slop))
        else:
            rest = [sorted(idx.postings[t][d]) for t in terms[1:]]
            freq = sum(1 for a in set(idx.postings[terms[0]][d])
                       if _unordered_p0_matches(a, rest, list(terms), slop))
        if freq:
            out[d] = scorer.score(np.array([freq]),
                                  np.array([idx.norm[d]]))[0]
    return out


def eval_query_oracle(query, field_indexes: dict[str, "OracleIndex"],
                      default_field: str,
                      doc_values: dict[str, dict[int, float]] | None = None,
                      all_docs: set[int] | None = None
                      ) -> dict[int, np.float32]:
    """Evaluate an arbitrary Query tree -> {doc_id: f32 score}; the golden
    oracle for nested booleans / multi-field / range-clause queries.
    Evaluates the UN-rewritten tree directly (f32 accumulation in clause
    order — MUST then SHOULD, minShouldMatch over SHOULD clauses,
    constant-score Range/MatchAll clauses), so the engine's rewrite()
    simplifications are independently observable: any rewrite that
    changes match sets, msm counting, or f32 accumulation order shows up
    as a mismatch here."""
    from diagon_spark.search.query import (Boolean, MatchAll, MatchNone,
                                           Phrase, Range, Term)
    q = query
    dv = doc_values or {}
    if all_docs is None:
        any_idx = next(iter(field_indexes.values()))
        all_docs = set(any_idx.doc_len)

    def ev(node) -> dict[int, np.float32]:
        if isinstance(node, MatchNone):
            return {}
        if isinstance(node, Term):
            idx = field_indexes[node.field or default_field]
            doc_count, sttf = bm25.collection_stats_with_fallbacks(
                idx.max_doc, idx.sum_total_term_freq)
            df = len(idx.postings.get(node.term, {}))
            if df == 0:
                df = idx.max_doc // 10
            sc = bm25.sim_scorer(df, doc_count, sttf, boost=node.boost)
            return {d: sc.score(np.array([len(p)]),
                                np.array([idx.norm[d]]))[0]
                    for d, p in idx.postings.get(node.term, {}).items()}
        if isinstance(node, Phrase):
            idx = field_indexes[node.field or default_field]
            base = phrase_scores(idx, list(node.phrase_terms),
                                 slop=getattr(node, "slop", 0),
                                 ordered=getattr(node, "ordered", True))
            if node.boost != 1.0:
                return {d: np.float32(s * np.float32(node.boost))
                        for d, s in base.items()}
            return base
        if isinstance(node, Range):
            vals = dv[node.field]
            out = {}
            for d, v in vals.items():
                if ((node.lower is None or v >= node.lower)
                        and (node.upper is None or v <= node.upper)):
                    out[d] = np.float32(node.boost)
            return out
        if isinstance(node, MatchAll):
            return {d: np.float32(node.boost) for d in all_docs}
        assert isinstance(node, Boolean)
        must = [ev(c) for c in node.must]
        should = [ev(c) for c in node.should]
        must_not = [ev(c) for c in node.must_not]
        filt = [ev(c) for c in node.filter]
        if must or filt:
            cand = None
            for m in (*must, *filt):
                cand = set(m) if cand is None else (cand & set(m))
        else:
            cand = set()
            for m in should:
                cand |= set(m)
        for m in must_not:
            cand -= set(m)
        out = {}
        for d in cand:
            acc = np.float32(0.0)
            nsh = 0
            for m in must:
                acc = np.float32(acc + m[d])
            for m in should:
                if d in m:
                    acc = np.float32(acc + m[d])
                    nsh += 1
            # BooleanWeight guard semantics: msm >= 1 requires nsh SHOULD
            # matches even when the clause list can't supply them
            if node.min_should_match >= 1 and nsh < node.min_should_match:
                continue
            out[d] = acc
        return out

    return ev(q)


def topk_oracle(scores: dict[int, np.float32], k: int):
    return _topk(scores, k)
