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

Nested boolean/phrase trees are served too; Range/MatchAll CLAUSES are
not (they scan the docs table — use Searcher). Deletes are kept as an
in-memory id set here (serving-tier indexes carry top-k-scale delete
sets between compactions).

Correctness contract: identical results to Searcher (tested).
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
        self.default_field = catalog.default_field
        srows = pq.read_table(catalog.stats_path).to_pylist()
        self.field_stats = {r["field"]: int(r["sum_total_term_freq"] or 0)
                            for r in srows}
        self.max_doc = max((int(r["max_doc"]) for r in srows), default=0)
        self._postings_ds = ds.dataset(catalog.postings_path,
                                       partitioning="hive")
        self._term_dict_ds = ds.dataset(catalog.term_dict_path,
                                        partitioning="hive")
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

    def search(self, query: Query, k: int = 100, f64: bool = False,
               after: tuple[float, int] | None = None
               ) -> list[tuple[int, float]]:
        """Top-k [(doc_id, score)] best-first; identical to Searcher."""
        q = rewrite(query)
        if isinstance(q, MatchNone):
            return []
        if isinstance(q, (MatchAll, Range)):
            raise NotImplementedError(
                "MatchAll/Range serve from the docs table — use Searcher")
        spec = self.plan(q)
        if spec.get("aux_specs"):
            raise NotImplementedError(
                "Range/MatchAll clauses inside a boolean scan the docs "
                "table — use Searcher")
        rows = self._postings_rows(spec["all_terms"],
                                   spec["need_positions"])
        by_seg: dict[int, dict[tuple[str, str], list[dict]]] = {}
        for r in rows:
            by_seg.setdefault(r["segment_id"], {}) \
                .setdefault((r["field"], r["term"]), []).append(r)
        banned = self.deleted

        # sequential over segments: measured that a thread pool GIL-thrashes
        # here (scoring is many small numpy calls, not GIL-releasing bulk
        # kernels) — 8 threads ran 8x SLOWER than one. Concurrency for a
        # serving tier comes from running many queries in parallel
        # processes, like the reference's one-thread-per-search model.
        results = []
        for seg_rows in by_seg.values():
            postings = {key: wand._SegmentPostings(rs)
                        for key, rs in seg_rows.items()}
            results.append(run_segment_spec(spec, postings, {}, k, f64,
                                            after, banned))
        all_docs = [d for d, _ in results]
        all_scores = [s for _, s in results]
        if not all_docs:
            return []
        docs = np.concatenate(all_docs)
        scores = np.concatenate(all_scores)
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
            raise NotImplementedError(
                "MatchAll/Range serve from the docs table — use Searcher")
        spec = self.plan(q)
        if spec.get("aux_specs"):
            raise NotImplementedError(
                "Range/MatchAll clauses scan the docs table — use Searcher")
        rows = self._postings_rows(spec["all_terms"],
                                   spec["need_positions"])
        by_seg: dict[int, dict[tuple[str, str], list[dict]]] = {}
        for r in rows:
            by_seg.setdefault(r["segment_id"], {}) \
                .setdefault((r["field"], r["term"]), []).append(r)
        total, exact = 0, True
        parts = []
        for seg_rows in by_seg.values():
            postings = {key: wand._SegmentPostings(rs)
                        for key, rs in seg_rows.items()}
            st: dict = {}
            parts.append(run_segment_spec(spec, postings, {}, k, f64,
                                          None, self.deleted,
                                          stats_out=st))
            total += int(st.get("total", 0))
            exact &= bool(st.get("exact", True))
        if not parts:
            return [], 0, "eq"
        docs = np.concatenate([d for d, _ in parts])
        scores = np.concatenate([s for _, s in parts])
        d, s = wand._topk(docs, scores, k)
        return ([(int(a), float(b)) for a, b in zip(d, s)], total,
                "eq" if exact else "gte")

    def count(self, query: Query) -> int:
        q = rewrite(query)
        if isinstance(q, MatchNone):
            return 0
        if isinstance(q, Term) and len(self.deleted) == 0:
            key = (self._resolve_field(q.field), q.term)
            return self.term_stats([key])[key][0]
        if isinstance(q, MatchAll):
            return self.max_doc - len(self.deleted)
        return len(self.search(q, k=self.max_doc + 1))
