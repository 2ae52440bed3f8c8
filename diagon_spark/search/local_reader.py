"""LocalSearcher — the low-latency serving path (mmap IndexSearcher
analogue, search/IndexSearcher.cpp).

The index tables are plain parquet; a query needs only the rows of its
terms (bucket partition pruning + term filter). For serving-style point
queries, going through a Spark job costs ~0.5 s of scheduling; this
reader uses pyarrow.dataset directly (zero JVM round trips) and runs the
SAME numpy scoring kernels (wand.py) the Spark executors run — one code
path, two execution substrates:

* Spark path (Searcher): distributed scans/analytics, the build engine,
  arbitrarily large indexes;
* local path (LocalSearcher): millisecond BM25 top-k over the same
  committed tables, suitable for a serving tier that mounts the index
  (exactly how the reference is embedded as a library via its C API).

Correctness contract: identical results to Searcher (tested).
"""

from __future__ import annotations

import numpy as np
import pyarrow.compute as pc
import pyarrow.dataset as ds
import pyarrow.parquet as pq

from diagon_spark.index.builder import IndexCatalog, term_bucket
from diagon_spark.search import bm25, wand
from diagon_spark.search.query import (Boolean, MatchAll, Phrase, Query,
                                       Range, Term)

_BASE_COLS = ["term", "segment_id", "chunk", "df", "doc_blocks", "tf_blocks",
              "norm_bytes", "block_first", "block_last", "block_max_tf",
              "block_max_norm", "block_doc_off", "block_tf_off"]
_POS_COLS = _BASE_COLS + ["pos_blocks", "block_pos_off"]


class LocalSearcher:
    def __init__(self, catalog: IndexCatalog,
                 deleted_doc_ids: list[int] | None = None):
        self.cat = catalog
        srow = pq.read_table(catalog.stats_path).to_pylist()[0]
        self.max_doc = int(srow["max_doc"])
        self.sum_total_term_freq = int(srow["sum_total_term_freq"] or 0)
        self._postings_ds = ds.dataset(catalog.postings_path,
                                       partitioning="hive")
        self._term_dict_ds = ds.dataset(catalog.term_dict_path)
        self._term_stats_cache: dict[str, tuple[int, int]] = {}
        tomb: set[int] = set(deleted_doc_ids or [])
        from pathlib import Path
        dp = Path(catalog.root, "deleted")
        if dp.exists():
            tomb |= {int(x) for x in
                     ds.dataset(str(dp)).to_table(columns=["doc_id"])
                     .column("doc_id").to_pylist()}
        self.deleted = np.asarray(sorted(tomb), dtype=np.int64)

    # ------------------------------------------------------------ stats

    def term_stats(self, terms: list[str]) -> dict[str, tuple[int, int]]:
        missing = [t for t in terms if t not in self._term_stats_cache]
        if missing:
            buckets = sorted({term_bucket(t, self.cat.num_buckets)
                              for t in missing})
            tbl = self._term_dict_ds.to_table(
                columns=["term", "df", "cttf"],
                filter=(pc.field("bucket").isin(buckets)
                        & pc.field("term").isin(missing)))
            found = {t: (int(d), int(c)) for t, d, c in
                     zip(tbl.column("term").to_pylist(),
                         tbl.column("df").to_pylist(),
                         tbl.column("cttf").to_pylist())}
            for t in missing:
                self._term_stats_cache[t] = found.get(t, (0, 0))
        return {t: self._term_stats_cache[t] for t in terms}

    def _scorer_params(self, terms, boosts=None):
        import math
        stats = self.term_stats(terms)
        doc_count, sttf = bm25.collection_stats_with_fallbacks(
            self.max_doc, self.sum_total_term_freq)
        avg64 = (float(sttf) / float(doc_count)
                 if doc_count > 0 and sttf > 0 else 50.0)
        out = {}
        for t in terms:
            df, _ = stats[t]
            if df == 0:
                df = self.max_doc // 10
            boost = (boosts or {}).get(t, 1.0)
            out[t] = wand.TermScorerParams(
                np.float32(float(bm25.idf(df, doc_count)) * boost),
                float(bm25.avg_field_length(sttf, doc_count)),
                idf64=math.log(1.0 + (doc_count - df + 0.5) / (df + 0.5)) * boost,
                avg64=avg64)
        return out

    def _phrase_params(self, terms, boost=1.0):
        import math
        stats = self.term_stats(terms)
        doc_count, sttf = bm25.collection_stats_with_fallbacks(
            self.max_doc, self.sum_total_term_freq)
        min_df = self.max_doc
        for t in terms:
            df, _ = stats[t]
            if df > 0:
                min_df = min(min_df, df)
        min_df = max(min_df, 1)
        return wand.TermScorerParams(
            np.float32(float(bm25.idf(min_df, doc_count)) * boost),
            float(bm25.avg_field_length(sttf, doc_count)),
            idf64=math.log(1.0 + (doc_count - min_df + 0.5) / (min_df + 0.5)) * boost,
            avg64=(float(sttf) / float(doc_count)
                   if doc_count > 0 and sttf > 0 else 50.0))

    # ----------------------------------------------------------- search

    def _postings_rows(self, terms: list[str], need_positions: bool):
        buckets = sorted({term_bucket(t, self.cat.num_buckets)
                          for t in terms})
        cols = _POS_COLS if need_positions else _BASE_COLS
        tbl = self._postings_ds.to_table(
            columns=cols,
            filter=(pc.field("bucket").isin(buckets)
                    & pc.field("term").isin(sorted(set(terms)))))
        return tbl.to_pylist()

    def search(self, query: Query, k: int = 100, f64: bool = False,
               after: tuple[float, int] | None = None
               ) -> list[tuple[int, float]]:
        """Top-k [(doc_id, score)] best-first; identical to Searcher."""
        if isinstance(query, (MatchAll, Range)):
            raise NotImplementedError(
                "MatchAll/Range serve from the docs table — use Searcher")
        spec, params, phrase_params = self._plan(query)
        rows = self._postings_rows(spec["all_terms"],
                                   spec["kind"] == "phrase")
        by_seg: dict[int, dict[str, list[dict]]] = {}
        for r in rows:
            by_seg.setdefault(r["segment_id"], {}) \
                .setdefault(r["term"], []).append(r)
        banned = self.deleted

        def score_segment(seg_rows):
            postings = {t: wand._SegmentPostings(rs)
                        for t, rs in seg_rows.items()}
            if spec["kind"] == "or":
                d, s = wand.wand_disjunction(
                    postings, params, spec["should"], k + len(banned),
                    msm=spec.get("msm", 0), f64=f64, after=after)
            elif spec["kind"] == "phrase":
                d, s = wand.phrase(postings, phrase_params, spec["terms"],
                                   k + len(banned), f64=f64, after=after)
            else:
                d, s = wand.conjunction(
                    postings, params, spec["must"], spec["should"],
                    spec["must_not"], spec["filter"], k + len(banned),
                    f64=f64, after=after, msm=spec.get("msm", 0))
            if len(banned) and len(d):
                keep = ~np.isin(d, banned)
                d, s = d[keep], s[keep]
            return d, s

        # sequential over segments: measured that a thread pool GIL-thrashes
        # here (scoring is many small numpy calls, not GIL-releasing bulk
        # kernels) — 8 threads ran 8x SLOWER than one. Concurrency for a
        # serving tier comes from running many queries in parallel
        # processes, like the reference's one-thread-per-search model.
        results = [score_segment(s) for s in by_seg.values()]
        all_docs = [d for d, _ in results]
        all_scores = [s for _, s in results]
        if not all_docs:
            return []
        docs = np.concatenate(all_docs)
        scores = np.concatenate(all_scores)
        d, s = wand._topk(docs, scores, k)
        return [(int(a), float(b)) for a, b in zip(d, s)]

    def count(self, query: Query) -> int:
        if isinstance(query, Term) and len(self.deleted) == 0:
            return self.term_stats([query.term])[query.term][0]
        if isinstance(query, MatchAll):
            return self.max_doc - len(self.deleted)
        return len(self.search(query, k=self.max_doc + 1))

    # same plan logic as the Spark searcher
    def _plan(self, query: Query):
        phrase_params = None
        if isinstance(query, Term):
            spec = {"kind": "or", "should": [query.term], "msm": 0}
            params = self._scorer_params([query.term],
                                         {query.term: query.boost})
        elif isinstance(query, Phrase):
            terms = list(query.phrase_terms)
            spec = {"kind": "phrase", "terms": terms}
            params = self._scorer_params(terms)
            phrase_params = self._phrase_params(terms, query.boost)
        elif isinstance(query, Boolean):
            def flat(qs):
                return [q.term for q in qs]
            must, should = flat(query.must), flat(query.should)
            must_not, filt = flat(query.must_not), flat(query.filter)
            if query.is_pure_disjunction:
                spec = {"kind": "or", "should": should,
                        "msm": query.min_should_match}
            else:
                spec = {"kind": "bool", "must": must, "should": should,
                        "must_not": must_not, "filter": filt,
                        "msm": query.min_should_match}
            boosts = {q.term: q.boost for q in (*query.must, *query.should)}
            params = self._scorer_params([*must, *should, *must_not, *filt],
                                         boosts)
        else:
            raise NotImplementedError(type(query))
        if spec["kind"] == "phrase":
            spec["all_terms"] = sorted(set(spec["terms"]))
        elif spec["kind"] == "or":
            spec["all_terms"] = sorted(set(spec["should"]))
        else:
            spec["all_terms"] = sorted({*spec["must"], *spec["should"],
                                        *spec["must_not"], *spec["filter"]})
        return spec, params, phrase_params
