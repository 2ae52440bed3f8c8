"""Query planning shared by the Spark Searcher and the LocalSearcher.

The Weight-creation analogue (search/TermQuery.cpp:184-259,
search/BooleanQuery.cpp:376-480): resolve fields, batch-fetch term stats,
compute per-leaf scoring constants, and pick an execution strategy:

* flat fast paths (`or` / `bool` / `phrase`) when every clause is a Term
  of one level — these keep the Block-Max WAND / lead-iterator pruning;
* a serialized query TREE (`tree`) for arbitrary nesting
  (boolean-of-phrase, boolean-of-boolean, range/match-all clauses) —
  evaluated by wand.eval_tree per segment. Range/MatchAll clauses become
  *aux doc sets* the host materializes from the docs table and cogroups
  into the scoring UDF.

Hosts provide: `self.max_doc`, `self.default_field`,
`self.field_stats[field] -> sum_total_term_freq`, and
`self.term_stats(pairs) -> {(field, term): (df, cttf)}` (batched lookup).
"""

from __future__ import annotations

import math

import numpy as np

from diagon_spark.search import bm25, wand
from diagon_spark.search.query import (Boolean, MatchAll, MatchNone, Phrase,
                                       Query, Range, Term, rewrite)


class PlannerMixin:
    # ------------------------------------------------- scoring constants

    def _resolve_field(self, field: str | None) -> str:
        return field if field is not None else self.default_field

    def _field_consts(self, field: str):
        sttf_raw = int(self.field_stats.get(field, 0))
        doc_count, sttf = bm25.collection_stats_with_fallbacks(
            self.max_doc, sttf_raw)
        avg64 = (float(sttf) / float(doc_count)
                 if doc_count > 0 and sttf > 0 else 50.0)
        return doc_count, sttf, avg64

    def _params_for(self, key: tuple[str, str], boost: float
                    ) -> wand.TermScorerParams:
        fld, _ = key
        df, _cttf = self.term_stats([key])[key]
        if df == 0:
            df = self.max_doc // 10  # TermQuery.cpp:250-256 fallback
        doc_count, sttf, avg64 = self._field_consts(fld)
        idf32 = float(bm25.idf(df, doc_count)) * boost
        idf64 = math.log(1.0 + (doc_count - df + 0.5) / (df + 0.5)) * boost
        return wand.TermScorerParams(
            np.float32(idf32), float(bm25.avg_field_length(sttf, doc_count)),
            idf64=idf64, avg64=avg64)

    def _phrase_params_for(self, keys: list[tuple[str, str]], boost: float
                           ) -> wand.TermScorerParams:
        """Rarest-term idf (PhraseQuery.cpp:303-338), per-field stats."""
        fld = keys[0][0]
        stats = self.term_stats(keys)
        doc_count, sttf, avg64 = self._field_consts(fld)
        min_df = self.max_doc
        for k in keys:
            df, _ = stats[k]
            if df > 0:
                min_df = min(min_df, df)
        min_df = max(min_df, 1)
        idf32 = float(bm25.idf(min_df, doc_count)) * boost
        idf64 = math.log(1.0 + (doc_count - min_df + 0.5)
                         / (min_df + 0.5)) * boost
        return wand.TermScorerParams(
            np.float32(idf32), float(bm25.avg_field_length(sttf, doc_count)),
            idf64=idf64, avg64=avg64)

    # --------------------------------------------------------- planning

    def _collect_pairs(self, q: Query) -> list[tuple[str, str]]:
        """Every (field, term) leaf of the tree — ONE batched stats
        lookup warms the cache before per-leaf params are built."""
        out: list[tuple[str, str]] = []
        if isinstance(q, Term):
            out.append((self._resolve_field(q.field), q.term))
        elif isinstance(q, Phrase):
            fld = self._resolve_field(q.field)
            out.extend((fld, t) for t in q.phrase_terms)
        elif isinstance(q, Boolean):
            for c in (*q.must, *q.should, *q.must_not, *q.filter):
                out.extend(self._collect_pairs(c))
        return out

    @staticmethod
    def _is_flat_bool(q: Boolean) -> bool:
        return all(isinstance(c, Term) for c in
                   (*q.must, *q.should, *q.must_not, *q.filter))

    def plan(self, query: Query, force_tree: bool = False) -> dict:
        """Query -> executable spec (strategy selection, the reference's
        scorer-choice logic — BooleanQuery.cpp:376-480, SURVEY.md §4).

        Returns {"kind", "all_terms", "need_positions", "params", ...};
        tree specs add {"root", "aux_specs"}. `force_tree` skips the flat
        fast paths (used by the count-only path, which must enumerate all
        matches anyway)."""
        q = rewrite(query)
        pairs = self._collect_pairs(q)
        if pairs:
            self.term_stats(pairs)  # batched driver lookup, fills cache

        if isinstance(q, MatchNone):
            return {"kind": "none", "all_terms": [], "need_positions": False}

        n_segs = max(1, getattr(self.cat, "num_segments", 1))
        hint = max(1, -(-self.max_doc // n_segs))  # ceil(maxDoc/segments)
        if not force_tree:
            flat = self._plan_flat(q)
            if flat is not None:
                flat["n_docs_hint"] = hint
                return flat

        state = {"pid": 0, "params": {}, "aux": []}
        root = self._build_tree(q, state)
        spec = {"kind": "tree", "root": root, "params": state["params"],
                "aux_specs": state["aux"],
                "all_terms": sorted(set(pairs)),
                "need_positions": _tree_has_phrase(root)}
        return spec

    def _plan_flat(self, q: Query) -> dict | None:
        if isinstance(q, Term):
            key = (self._resolve_field(q.field), q.term)
            return {"kind": "or", "should": [key], "msm": 0,
                    "params": {key: self._params_for(key, q.boost)},
                    "all_terms": [key], "need_positions": False}
        if isinstance(q, Phrase):
            fld = self._resolve_field(q.field)
            keys = [(fld, t) for t in q.phrase_terms]
            return {"kind": "phrase", "terms": keys, "slop": q.slop,
                    "ordered": q.ordered, "params": {},
                    "phrase_params": self._phrase_params_for(keys, q.boost),
                    "all_terms": sorted(set(keys)), "need_positions": True}
        if isinstance(q, Boolean) and self._is_flat_bool(q):
            def keys_of(cs):
                return [(self._resolve_field(c.field), c.term) for c in cs]
            must, should = keys_of(q.must), keys_of(q.should)
            must_not, filt = keys_of(q.must_not), keys_of(q.filter)
            boosts = {}
            for c in (*q.must, *q.should):
                key = (self._resolve_field(c.field), c.term)
                if key in boosts and boosts[key] != c.boost:
                    # same term in two scoring clauses with DIFFERENT
                    # boosts: the flat path keys params by term and can
                    # carry only one boost — route to the tree path,
                    # which scores each clause with its own boost
                    return None
                boosts[key] = c.boost
            all_keys = sorted({*must, *should, *must_not, *filt})
            params = {k: self._params_for(k, boosts.get(k, 1.0))
                      for k in all_keys}
            if q.is_pure_disjunction:
                return {"kind": "or", "should": should,
                        "msm": q.min_should_match, "params": params,
                        "all_terms": all_keys, "need_positions": False}
            return {"kind": "bool", "must": must, "should": should,
                    "must_not": must_not, "filter": filt,
                    "msm": q.min_should_match, "params": params,
                    "all_terms": all_keys, "need_positions": False}
        return None

    def _build_tree(self, q: Query, state: dict) -> dict:
        if isinstance(q, MatchNone):
            return {"op": "none"}
        if isinstance(q, Term):
            key = (self._resolve_field(q.field), q.term)
            pid = state["pid"]; state["pid"] += 1
            state["params"][pid] = self._params_for(key, q.boost)
            return {"op": "term", "key": key, "pid": pid}
        if isinstance(q, Phrase):
            fld = self._resolve_field(q.field)
            keys = [(fld, t) for t in q.phrase_terms]
            pid = state["pid"]; state["pid"] += 1
            state["params"][pid] = self._phrase_params_for(keys, q.boost)
            return {"op": "phrase", "keys": keys, "pid": pid,
                    "slop": q.slop, "ordered": q.ordered}
        if isinstance(q, (Range, MatchAll)):
            aux_id = len(state["aux"])
            state["aux"].append(q)
            return {"op": "aux", "aux": aux_id, "boost": float(q.boost)}
        if isinstance(q, Boolean):
            return {"op": "bool",
                    "must": [self._build_tree(c, state) for c in q.must],
                    "should": [self._build_tree(c, state) for c in q.should],
                    "must_not": [self._build_tree(c, state)
                                 for c in q.must_not],
                    "filter": [self._build_tree(c, state) for c in q.filter],
                    "msm": q.min_should_match}
        raise NotImplementedError(type(q))


def _tree_has_phrase(node: dict) -> bool:
    if node["op"] == "phrase":
        return True
    if node["op"] == "bool":
        return any(_tree_has_phrase(c) for occ in
                   ("must", "should", "must_not", "filter")
                   for c in node[occ])
    return False


def run_segment_spec(spec: dict, postings: dict, aux_sets: dict, k: int,
                     f64: bool, after, banned,
                     stats_out: dict | None = None):
    """Dispatch one segment's scoring by spec kind — shared by the Spark
    scoring UDF and the LocalSearcher (one code path, two substrates)."""
    if spec["kind"] == "or":
        return wand.wand_disjunction(
            postings, spec["params"], spec["should"], k,
            msm=spec.get("msm", 0), f64=f64, after=after, banned=banned,
            stats_out=stats_out, n_docs_hint=spec.get("n_docs_hint"))
    if spec["kind"] == "phrase":
        return wand.phrase(postings, spec["phrase_params"], spec["terms"],
                           k, f64=f64, after=after, banned=banned,
                           stats_out=stats_out, slop=spec.get("slop", 0),
                           ordered=spec.get("ordered", True))
    if spec["kind"] == "bool":
        return wand.conjunction(
            postings, spec["params"], spec["must"], spec["should"],
            spec["must_not"], spec["filter"], k, f64=f64, after=after,
            msm=spec.get("msm", 0), banned=banned, stats_out=stats_out)
    if spec["kind"] == "tree":
        return wand.eval_tree_topk(spec["root"], postings, spec["params"],
                                   aux_sets, k, f64, after=after,
                                   banned=banned, stats_out=stats_out)
    raise ValueError(f"unknown spec kind {spec['kind']!r}")
