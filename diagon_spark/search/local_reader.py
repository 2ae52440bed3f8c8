"""LocalSearcher — the low-latency serving path (mmap IndexSearcher
analogue, search/IndexSearcher.cpp).

The index tables are plain parquet; a query needs only the rows of its
(field, term) pairs (bucket partition pruning + term filter). For
serving-style point queries, going through a Spark job costs ~0.5 s of
scheduling; this reader uses pyarrow.dataset directly (zero JVM round
trips) and runs the SAME planning (planner.py) and numpy scoring kernels
(wand.py) the Spark executors run — one code path, two execution
substrates:

* Spark path (Searcher): distributed scans/analytics, the build engine,
  arbitrarily large indexes;
* local path (LocalSearcher): millisecond BM25 top-k over the same
  committed tables, suitable for a serving tier that mounts the index
  (exactly how the reference is embedded as a library via its C API).

Nested boolean/phrase trees are served too, INCLUDING Range/MatchAll
clauses: aux doc sets materialize from a pyarrow doc-values scan of the
docs table (same pattern as `_postings_rows` — parquet row-group stats
prune the range scan), split per segment exactly like the Spark path's
cogroup. count() runs the same count-only tree evaluation the Spark
path uses (no top-k materialization). Deletes are kept as an in-memory
id set here (serving-tier indexes carry top-k-scale delete sets between
compactions).

Correctness contract: identical results to Searcher (tested, incl. the
fuzz parity suite with aux clauses).
"""

from __future__ import annotations

import numpy as np
import pyarrow.compute as pc
import pyarrow.dataset as ds
import pyarrow.parquet as pq

from diagon_spark.index.builder import IndexCatalog, term_bucket
from diagon_spark.search import wand
from diagon_spark.search.planner import PlannerMixin, run_segment_spec
from diagon_spark.search.query import (Boolean, MatchAll, MatchNone, Phrase,
                                       Query, Range, Term, rewrite)

_BASE_COLS = ["field", "term", "segment_id", "chunk", "df", "doc_blocks",
              "tf_blocks", "norm_bytes", "block_first", "block_last",
              "block_max_tf", "block_max_norm", "block_doc_off",
              "block_tf_off"]
_POS_COLS = _BASE_COLS + ["pos_blocks", "block_pos_off"]


class LocalSearcher(PlannerMixin):
    def __init__(self, catalog: IndexCatalog,
                 deleted_doc_ids: list[int] | None = None):
        self.cat = catalog
        # snapshot the opened-at commit generation: the caller may keep
        # using `catalog` as a writer handle (commit() advances its
        # generation), but THIS reader's view is pinned at open time
        self._opened_gen = catalog.generation
        self.default_field = catalog.default_field
        srows = pq.read_table(catalog.stats_path).to_pylist()
        self.field_stats = {r["field"]: int(r["sum_total_term_freq"] or 0)
                            for r in srows}
        self.max_doc = max((int(r["max_doc"]) for r in srows), default=0)
        self._postings_ds = ds.dataset(catalog.postings_path,
                                       partitioning="hive")
        self._term_dict_ds = ds.dataset(catalog.term_dict_path,
                                        partitioning="hive")
        self._docs_ds = ds.dataset(catalog.docs_path)
        self._term_stats_cache: dict[tuple[str, str], tuple[int, int]] = {}
        tomb: set[int] = set(deleted_doc_ids or [])
        from pathlib import Path
        dp = Path(catalog.root, "deleted")
        if dp.exists():
            tomb |= {int(x) for x in
                     ds.dataset(str(dp)).to_table(columns=["doc_id"])
                     .column("doc_id").to_pylist()}
        self.deleted = np.asarray(sorted(tomb), dtype=np.int64)

    # ------------------------------------------------------------ stats

    def term_stats(self, pairs: list[tuple[str, str]]
                   ) -> dict[tuple[str, str], tuple[int, int]]:
        missing = [p for p in pairs if p not in self._term_stats_cache]
        if missing:
            buckets = sorted({term_bucket(t, self.cat.num_buckets, f)
                              for f, t in missing})
            flt = (pc.field("bucket").isin(buckets)
                   & pc.field("field").isin(sorted({f for f, _ in missing}))
                   & pc.field("term").isin(sorted({t for _, t in missing})))
            tbl = self._term_dict_ds.to_table(
                columns=["field", "term", "df", "cttf"], filter=flt)
            found = {(f, t): (int(d), int(c)) for f, t, d, c in
                     zip(tbl.column("field").to_pylist(),
                         tbl.column("term").to_pylist(),
                         tbl.column("df").to_pylist(),
                         tbl.column("cttf").to_pylist())}
            for p in missing:
                self._term_stats_cache[p] = found.get(p, (0, 0))
        return {p: self._term_stats_cache[p] for p in pairs}

    # ----------------------------------------------------------- search

    def _postings_rows(self, pairs: list[tuple[str, str]],
                       need_positions: bool):
        if not pairs:
            return []
        buckets = sorted({term_bucket(t, self.cat.num_buckets, f)
                          for f, t in pairs})
        cols = _POS_COLS if need_positions else _BASE_COLS
        tbl = self._postings_ds.to_table(
            columns=cols,
            filter=(pc.field("bucket").isin(buckets)
                    & pc.field("field").isin(sorted({f for f, _ in pairs}))
                    & pc.field("term").isin(sorted({t for _, t in pairs}))))
        return tbl.to_pylist()

    # ---------------------------------------------- aux doc-value scans

    def _docs_scan(self, q: Query, columns: list[str]):
        """pyarrow scan of the docs table for a Range/MatchAll clause —
        parquet row-group stats prune the range predicate (the same
        BKD-style skipping the Spark path gets from Catalyst)."""
        if isinstance(q, MatchAll):
            flt = None
        else:
            flt = None
            if q.lower is not None:
                flt = pc.field(q.field) >= q.lower
            if q.upper is not None:
                c = pc.field(q.field) <= q.upper
                flt = c if flt is None else (flt & c)
        return self._docs_ds.to_table(columns=columns, filter=flt)

    def _matching_doc_ids(self, q: Query) -> np.ndarray:
        """doc_ids matching a top-level Range/MatchAll (deletes masked,
        sorted asc)."""
        tbl = self._docs_scan(q, columns=["doc_id"])
        ids = np.sort(tbl.column("doc_id").to_numpy().astype(np.int64))
        if len(self.deleted):
            ids = ids[~np.isin(ids, self.deleted)]
        return ids

    def _aux_by_segment(self, aux_specs) -> dict[int, dict[int, np.ndarray]]:
        """Materialize each Range/MatchAll clause's doc set, split per
        segment — the pyarrow analogue of the Spark path's cogrouped aux
        DataFrames."""
        out: dict[int, dict[int, np.ndarray]] = {}
        for i, q in enumerate(aux_specs):
            tbl = self._docs_scan(q, columns=["doc_id", "segment_id"])
            segs = tbl.column("segment_id").to_numpy().astype(np.int64)
            dids = tbl.column("doc_id").to_numpy().astype(np.int64)
            for s in np.unique(segs):
                out.setdefault(int(s), {})[i] = np.unique(dids[segs == s])
        return out

    # ----------------------------------------------------------- search

    def _segment_groups(self, spec: dict):
        """Yield (postings, aux_sets) per segment for a planned spec —
        the one place postings rows are fetched and grouped (shared by
        search / search_with_total / count)."""
        rows = self._postings_rows(spec["all_terms"],
                                   spec["need_positions"])
        by_seg: dict[int, dict[tuple[str, str], list[dict]]] = {}
        for r in rows:
            by_seg.setdefault(r["segment_id"], {}) \
                .setdefault((r["field"], r["term"]), []).append(r)
        aux_by_seg = (self._aux_by_segment(spec["aux_specs"])
                      if spec.get("aux_specs") else {})
        for seg in sorted(set(by_seg) | set(aux_by_seg)):
            postings = {key: wand._SegmentPostings(rs)
                        for key, rs in by_seg.get(seg, {}).items()}
            yield postings, aux_by_seg.get(seg, {})

    def _run_segments(self, spec: dict, k: int, f64: bool, after,
                      stats_list: list | None = None):
        """Per-segment execution of a planned spec (postings + aux sets).

        Sequential over segments: measured that a thread pool GIL-thrashes
        here (scoring is many small numpy calls, not GIL-releasing bulk
        kernels) — 8 threads ran 8x SLOWER than one. Concurrency for a
        serving tier comes from running many queries in parallel
        processes, like the reference's one-thread-per-search model."""
        results = []
        for postings, aux in self._segment_groups(spec):
            st: dict | None = {} if stats_list is not None else None
            results.append(run_segment_spec(spec, postings, aux, k, f64,
                                            after, self.deleted,
                                            stats_out=st))
            if stats_list is not None:
                stats_list.append(st)
        return results

    def search(self, query: Query, k: int = 100, f64: bool = False,
               after: tuple[float, int] | None = None
               ) -> list[tuple[int, float]]:
        """Top-k [(doc_id, score)] best-first; identical to Searcher."""
        q = rewrite(query)
        if isinstance(q, MatchNone):
            return []
        if isinstance(q, (MatchAll, Range)):
            ids = self._matching_doc_ids(q)[:k]
            return [(int(d), float(q.boost)) for d in ids]
        spec = self.plan(q)
        results = self._run_segments(spec, k, f64, after)
        all_docs = [d for d, _ in results]
        if not all_docs:
            return []
        docs = np.concatenate(all_docs)
        scores = np.concatenate([s for _, s in results])
        d, s = wand._topk(docs, scores, k)
        return [(int(a), float(b)) for a, b in zip(d, s)]

    def search_with_total(self, query: Query, k: int = 100,
                          f64: bool = False
                          ) -> tuple[list[tuple[int, float]], int, str]:
        """Top-k + TotalHits(+relation) on the serving path — same
        semantics as Searcher.search_with_total."""
        q = rewrite(query)
        if isinstance(q, MatchNone):
            return [], 0, "eq"
        if isinstance(q, (MatchAll, Range)):
            ids = self._matching_doc_ids(q)
            return ([(int(d), float(q.boost)) for d in ids[:k]],
                    int(len(ids)), "eq")
        spec = self.plan(q)
        stats: list[dict] = []
        parts = self._run_segments(spec, k, f64, None, stats_list=stats)
        total = sum(int(st.get("total", 0)) for st in stats)
        exact = all(bool(st.get("exact", True)) for st in stats)
        if not parts:
            return [], 0, "eq"
        docs = np.concatenate([d for d, _ in parts])
        scores = np.concatenate([s for _, s in parts])
        d, s = wand._topk(docs, scores, k)
        return ([(int(a), float(b)) for a, b in zip(d, s)], total,
                "eq" if exact else "gte")

    def matching_doc_ids(self, query: Query) -> np.ndarray:
        """ALL doc_ids matching any query (no scoring, deletes masked,
        sorted asc) — the COMPLETE_NO_SCORES DocIdCollector analogue on
        the serving tier (c_api/diagon_c_api.cpp:1497-1520)."""
        q = rewrite(query)
        if isinstance(q, MatchNone):
            return np.zeros(0, np.int64)
        if isinstance(q, (MatchAll, Range)):
            return self._matching_doc_ids(q)
        spec = self.plan(q, force_tree=True)
        parts = []
        for postings, aux in self._segment_groups(spec):
            docs, _ = wand.eval_tree(spec["root"], postings,
                                     spec["params"], aux, False)
            keep = wand._mask_banned(docs, self.deleted)
            parts.append(docs[keep] if keep is not None else docs)
        if not parts:
            return np.zeros(0, np.int64)
        return np.sort(np.concatenate(parts))

    def histogram(self, field: str, min_value: float, interval: float,
                  num_buckets: int) -> list[tuple[int, int]]:
        """diagon_compute_histogram on the serving tier: fixed-interval
        histogram over a numeric doc-values column of ALL docs (like the
        reference's BKD visitor, tombstoned docs count until a merge
        purges them). Returns non-empty (bucket, count) ascending."""
        vals = (self._docs_ds.to_table(columns=[field])
                .column(field).to_numpy().astype(np.float64))
        b = np.floor((vals - min_value) / interval).astype(np.int64)
        b = b[(b >= 0) & (b < num_buckets)]
        uniq, counts = np.unique(b, return_counts=True)
        return [(int(u), int(c)) for u, c in zip(uniq, counts)]

    def date_histogram(self, query: Query, field: str, interval: float,
                       min_value: float, max_value: float
                       ) -> list[tuple[float, int]]:
        """diagon_search_with_date_histogram on the serving tier: bucket
        the doc values of docs MATCHING `query` (match set, no scoring);
        non-empty (bucket_key, count) ascending by key."""
        ids = self.matching_doc_ids(query)
        if len(ids) == 0:
            return []
        tbl = self._docs_ds.to_table(columns=["doc_id", field])
        dids = tbl.column("doc_id").to_numpy().astype(np.int64)
        vals = tbl.column(field).to_numpy().astype(np.float64)
        m = np.isin(dids, ids) & (vals >= min_value) & (vals < max_value)
        keys = (np.floor((vals[m] - min_value) / interval) * interval
                + min_value)
        uniq, counts = np.unique(keys, return_counts=True)
        return [(float(u), int(c)) for u, c in zip(uniq, counts)]

    def fetch(self, doc_ids: list[int],
              columns: list[str] | None = None) -> list[dict]:
        """Stored-fields point lookup — diagon_reader_get_document
        analogue: rows of the docs table for the given ids, in the given
        id order (pyarrow scan with a pushed id filter)."""
        import pyarrow.compute as pc
        ids = [int(d) for d in doc_ids]
        tbl = self._docs_ds.to_table(
            columns=columns,
            filter=pc.field("doc_id").isin(ids))
        by_id = {int(r["doc_id"]): r for r in tbl.to_pylist()}
        return [by_id[d] for d in ids if d in by_id]

    def terms(self, field: str | None = None, prefix: str | None = None):
        """Sorted term enumeration — the TermsEnum analogue
        (diagon_reader_get_terms / diagon_terms_enum_next/get_term/
        doc_freq, c_api/diagon_c_api.h): yields (term, df, cttf)
        ascending by term for one field, optionally restricted to a
        prefix (seekCeil-style). Reads the term_dict dataset directly —
        a prefix restriction prunes via the pushed-down filter."""
        import pyarrow.compute as pc
        fld = field or self.default_field
        flt = pc.field("field") == fld
        if prefix:
            # prefix range [prefix, prefix+￿) — same trick a
            # seekCeil over a sorted .tim would use
            flt = flt & (pc.field("term") >= prefix) \
                & (pc.field("term") < prefix + "￿")
        tbl = (self._term_dict_ds.to_table(
                   columns=["term", "df", "cttf"], filter=flt)
               .sort_by("term"))
        for rec in tbl.to_pylist():
            yield rec["term"], int(rec["df"]), int(rec["cttf"])

    def reopen_if_changed(self) -> "LocalSearcher | None":
        """DirectoryReader::openIfChanged analogue
        (index/DirectoryReader.h, tests/unit/index/ReaderReopenTest.cpp):
        returns None when no commit newer than this reader's generation
        exists, else a NEW LocalSearcher opened at the latest commit
        (which sees appended segments and fresh tombstones). This reader
        keeps serving its point-in-time view: the pyarrow datasets pinned
        their file listings at construction, so appended segment files
        never leak in. Local-fs caveat (flagged like IndexCatalog.commit):
        a concurrent term_dict/stats _swap_write physically replaces files
        under the old reader — stats were loaded eagerly and term lookups
        are cached, but a cold term lookup after a swap needs the reader
        reopened; on an object store the Iceberg-snapshot analogue keeps
        old files live until the old reader is released."""
        from diagon_spark.index.builder import IndexCatalog
        commits = IndexCatalog.list_commits(self.cat.root)
        if not commits:
            return None
        latest = IndexCatalog._gen_of(commits[-1])
        if self._opened_gen is not None and latest <= self._opened_gen:
            return None
        return LocalSearcher(IndexCatalog.load(self.cat.root))

    def count(self, query: Query) -> int:
        """Count-only path — the TotalHitCountCollector analogue: the
        same force_tree count evaluation the Spark path runs (no top-k
        materialization, no scoring sort), summed over segments."""
        q = rewrite(query)
        if isinstance(q, MatchNone):
            return 0
        if isinstance(q, Term) and len(self.deleted) == 0:
            key = (self._resolve_field(q.field), q.term)
            return self.term_stats([key])[key][0]
        if isinstance(q, MatchAll):
            return self.max_doc - len(self.deleted)
        if isinstance(q, Range):
            return int(len(self._matching_doc_ids(q)))
        spec = self.plan(q, force_tree=True)
        total = 0
        for postings, aux in self._segment_groups(spec):
            docs, _ = wand.eval_tree(spec["root"], postings, spec["params"],
                                     aux, False)
            keep = wand._mask_banned(docs, self.deleted)
            total += int(keep.sum()) if keep is not None else int(len(docs))
        return total
