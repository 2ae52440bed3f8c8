"""Searcher — the IndexSearcher analogue (search/IndexSearcher.cpp:50-135).

Execution restates the reference's per-segment search as a 3-stage Spark
plan (SURVEY.md §3.1):

  stage 1 (driver): look up query (field, term) pairs in term_dict/stats —
      the FST term-seek analogue; compute each leaf's SimScorer constants
      once per query like Weight creation (TermQuery.cpp:184-259);
  stage 2 (executors): scan ONLY the pruned postings rows (partition
      pruning on bucket + parquet predicate/bloom pushdown on term;
      positions column read only for phrase queries — column pruning) and
      run the vectorized block-max scorer per segment group (wand.py),
      emitting each segment's local top-k;
  stage 3: one tiny shuffle — global orderBy(score desc, doc_id asc)
      limit k, the TopScoreDocCollector tie-break.

Nested query trees (boolean-of-phrase/boolean/range — BooleanQuery.cpp
rewrite/composition semantics) run through the same stages; Range /
MatchAll clauses become aux doc-set DataFrames COGROUPED with the
postings scan per segment, so constant-score clauses never collect to
the driver.

Deletes are scale-safe: the tombstone table (doc_id, segment_id) is
cogrouped into the scoring UDF as another aux set and masked before
top-k selection — never a driver-collected id list, never an `isin`
literal in the plan, and k is NOT inflated (the live-docs bitmap of
codecs/LiveDocsFormat.h:18-47 applied at scorer level).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from diagon_spark.index.builder import IndexCatalog, term_bucket
from diagon_spark.search import wand
from diagon_spark.search.planner import PlannerMixin, run_segment_spec
from diagon_spark.search.query import (Boolean, MatchAll, MatchNone, Phrase,
                                       Query, Range, Term, rewrite)

_HIT_SCHEMA = "doc_id long, score double"
_TOTAL_SCHEMA = ("doc_id long, score double, segment_id int, "
                 "seg_total long, seg_exact boolean, "
                 "seg_blocks long, seg_blocks_dec long")
_COUNT_SCHEMA = "segment_id int, n long"
_IDS_SCHEMA = "doc_id long"

_BASE_COLS = ["field", "term", "segment_id", "chunk", "df", "doc_blocks",
              "tf_blocks", "norm_bytes", "block_first", "block_last",
              "block_max_tf", "block_max_norm", "block_doc_off",
              "block_tf_off"]
_POS_COLS = _BASE_COLS + ["pos_blocks", "block_pos_off"]

_AUX_SCHEMA = "segment_id int, doc_id long, set_id int"

# upper bound on the doc-span one scoring task covers (segments batched
# per task until their combined maxDoc reaches this): bounds a task's
# decoded-postings working set to cache scale, and makes the scoring
# decomposition core-count-independent on large corpora
_DOCS_PER_SCORE_TASK = 100_000


class _FilterCache:
    """LRU of materialized filter doc sets — the FilterCache /
    CachingWrapperQuery analogue (SURVEY §2.3 filter-cache row): a Range /
    MatchAll clause reused across queries hits a persisted
    (MEMORY_AND_DISK) (segment_id, doc_id) DataFrame instead of
    re-scanning the docs table. Eviction unpersists."""

    def __init__(self, capacity: int = 32):
        from collections import OrderedDict
        self.capacity = capacity
        self._map: "OrderedDict[tuple, object]" = OrderedDict()

    def get(self, key: tuple, build):
        if key in self._map:
            self._map.move_to_end(key)
            return self._map[key]
        from pyspark import StorageLevel
        df = build().persist(StorageLevel.MEMORY_AND_DISK)
        self._map[key] = df
        if len(self._map) > self.capacity:
            _, old = self._map.popitem(last=False)
            old.unpersist()
        return df


class Searcher(PlannerMixin):
    def __init__(self, spark: SparkSession, catalog: IndexCatalog,
                 deleted_doc_ids: list[int] | None = None):
        from diagon_spark._ship import ensure_shipped
        ensure_shipped(spark)
        self.spark = spark
        self.cat = catalog
        self.default_field = catalog.default_field
        # per-field collection stats (FieldInfo analogue)
        srows = spark.read.parquet(catalog.stats_path).collect()
        self.field_stats: dict[str, int] = {
            r.field: int(r.sum_total_term_freq or 0) for r in srows}
        self.max_doc = max((int(r.max_doc) for r in srows), default=0)
        self._term_stats_cache: dict[tuple[str, str], tuple[int, int]] = {}
        # resolve sources once (file listing / schema inference is per-query
        # overhead otherwise); reads stay lazy and pruned
        self._postings_src = spark.read.parquet(catalog.postings_path)
        self._term_dict_src = spark.read.parquet(catalog.term_dict_path)
        self._docs_src = spark.read.parquet(catalog.docs_path)

        # live-docs: durable tombstones + explicit ids, kept DISTRIBUTED
        from diagon_spark.index.deletes import deleted_docs_df
        ddf = deleted_docs_df(spark, catalog)
        if deleted_doc_ids:
            extra = (spark.createDataFrame([(int(i),) for i in deleted_doc_ids],
                                           "doc_id long")
                     .join(self._docs_src.select("doc_id", "segment_id"),
                           "doc_id", "inner")
                     .select(F.col("doc_id").cast("long"),
                             F.col("segment_id").cast("int")))
            ddf = extra if ddf is None else ddf.unionByName(extra).distinct()
        self._deleted_df = ddf
        self.n_deleted = int(ddf.count()) if ddf is not None else 0
        self.filter_cache = _FilterCache()

    @property
    def deleted(self) -> np.ndarray:
        """Collected tombstone ids — test/debug convenience ONLY; the
        query path masks via the cogrouped delete table."""
        if self._deleted_df is None:
            return np.zeros(0, dtype=np.int64)
        return np.asarray(sorted(int(r.doc_id) for r in
                                 self._deleted_df.select("doc_id").collect()),
                          dtype=np.int64)

    # ------------------------------------------------ stats (stage 1)

    def term_stats(self, pairs: list[tuple[str, str]]
                   ) -> dict[tuple[str, str], tuple[int, int]]:
        """(field, term) -> (df, cttf) from term_dict, partition-pruned."""
        missing = [p for p in pairs if p not in self._term_stats_cache]
        if missing:
            buckets = sorted({term_bucket(t, self.cat.num_buckets, f)
                              for f, t in missing})
            cond = None
            by_field: dict[str, set[str]] = {}
            for f, t in missing:
                by_field.setdefault(f, set()).add(t)
            for f, ts in by_field.items():
                c = (F.col("field") == f) & F.col("term").isin(sorted(ts))
                cond = c if cond is None else (cond | c)
            rows = (self._term_dict_src
                    .filter(F.col("bucket").isin(buckets))
                    .filter(cond)
                    .select("field", "term", "df", "cttf").collect())
            found = {(r.field, r.term): (int(r.df), int(r.cttf))
                     for r in rows}
            for p in missing:
                self._term_stats_cache[p] = found.get(p, (0, 0))
        return {p: self._term_stats_cache[p] for p in pairs}

    # --------------------------------------------- postings scan (stage 2)

    def _postings(self, pairs: list[tuple[str, str]],
                  need_positions: bool) -> DataFrame:
        cols = _POS_COLS if need_positions else _BASE_COLS
        if not pairs:
            return (self._postings_src.select("bucket", *cols)
                    .filter(F.lit(False)))
        buckets = sorted({term_bucket(t, self.cat.num_buckets, f)
                          for f, t in pairs})
        cond = None
        by_field: dict[str, set[str]] = {}
        for f, t in pairs:
            by_field.setdefault(f, set()).add(t)
        for f, ts in by_field.items():
            c = (F.col("field") == f) & F.col("term").isin(sorted(ts))
            cond = c if cond is None else (cond | c)
        return (self._postings_src
                .filter(F.col("bucket").isin(buckets))   # partition pruning
                .filter(cond)                            # pushed (term bloom)
                .select("bucket", *cols))

    # ----------------------------------------------------- aux doc sets

    def _aux_df(self, spec: dict) -> DataFrame | None:
        """Union of tombstones (set -1) and the spec's Range/MatchAll aux
        sets (set i) as (segment_id, doc_id, set_id) — cogrouped with the
        postings scan, one tiny extra shuffle input per segment."""
        parts: list[DataFrame] = []
        if self._deleted_df is not None:
            parts.append(self._deleted_df.select(
                F.col("segment_id"), F.col("doc_id"),
                F.lit(-1).cast("int").alias("set_id")))
        for i, q in enumerate(spec.get("aux_specs", [])):
            if isinstance(q, Range):
                key = ("range", q.field, q.lower, q.upper)
                src = self.filter_cache.get(
                    key, lambda q=q: self._range_docs(q, mask_deletes=False)
                    .select("segment_id", "doc_id"))
            else:  # MatchAll
                src = self.filter_cache.get(
                    ("matchall",),
                    lambda: self._docs_src.select("segment_id", "doc_id"))
            parts.append(src.select(
                F.col("segment_id").cast("int"),
                F.col("doc_id").cast("long"),
                F.lit(i).cast("int").alias("set_id")))
        if not parts:
            return None
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    # ------------------------------------------------------------ search

    def search(self, query: Query, k: int = 100, f64: bool = False,
               after: tuple[float, int] | None = None) -> DataFrame:
        """Top-k hits as a DataFrame (doc_id, score), best-first.

        f64=True scores in float64 (ANSI-SQL-reproducible, for the DuckDB
        oracle harness); default float32 matches the reference bit-wise.
        after=(score, doc_id) returns the next page strictly after that
        hit in collector order — searchAfter pagination
        (TopScoreDocCollector.h:22).
        """
        q = rewrite(query)
        if isinstance(q, MatchNone):
            return self.spark.createDataFrame([], _HIT_SCHEMA)
        if isinstance(q, MatchAll):
            score = F.lit(float(q.boost)).cast("double")
            return (self._mask_deleted(self._docs_src)
                    .select(F.col("doc_id"), score.alias("score"))
                    .orderBy(F.asc("doc_id")).limit(k))
        if isinstance(q, Range):
            # constant-score range over docs-table doc values; Catalyst +
            # parquet row-group stats provide the BKD-style pruning
            return (self._range_docs(q)
                    .select(F.col("doc_id"),
                            F.lit(float(q.boost)).cast("double")
                            .alias("score"))
                    .orderBy(F.asc("doc_id")).limit(k))

        spec = self.plan(q)
        hits = self._run_spec(spec, _HIT_SCHEMA, k=k, f64=f64, after=after)
        return hits.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    def search_with_total(self, query: Query, k: int = 100,
                          f64: bool = False
                          ) -> tuple[list[tuple[int, float]], int, str]:
        """Top-k + total hit count with relation — the TopDocs.totalHits
        analogue (TopScoreDocCollector.cpp:143-151, 237-246). Relation is
        "eq" when every segment enumerated its matches exactly, "gte"
        when Block-Max pruning stopped a segment early (the count is then
        a lower bound, like totalHitsThreshold collectors)."""
        q = rewrite(query)
        if isinstance(q, (MatchNone, MatchAll, Range)):
            n = self.count(q)
            hits = [(int(r.doc_id), float(r.score))
                    for r in self.search(q, k=k, f64=f64).collect()]
            return hits, n, "eq"
        spec = self.plan(q)
        rows = self._run_spec(spec, _TOTAL_SCHEMA, k=k, f64=f64,
                              after=None).collect()
        total, exact = 0, True
        seen: set[int] = set()
        scored = []
        for r in rows:
            if int(r.doc_id) >= 0:  # doc_id -1 = counters-only marker
                scored.append((float(r.score), int(r.doc_id)))
            if int(r.segment_id) not in seen:
                seen.add(int(r.segment_id))
                total += int(r.seg_total)
                exact &= bool(r.seg_exact)
        scored.sort(key=lambda x: (-x[0], x[1]))
        hits = [(d, s) for s, d in scored[:k]]
        return hits, total, ("eq" if exact else "gte")

    def _run_spec(self, spec: dict, schema: str, *, k: int, f64: bool,
                  after, count_only: bool = False,
                  ids_only: bool = False) -> DataFrame:
        if spec["kind"] == "none":
            return self.spark.createDataFrame([], schema)
        postings_df = self._postings(spec["all_terms"],
                                     spec["need_positions"])
        aux_df = self._aux_df(spec)
        seg_fn = _make_segment_fn(spec, k, f64, after, schema, count_only,
                                  ids_only)
        # Scoring tasks are DECOUPLED from segment count (VERDICT r4 ask
        # #3): group on seg_grp = segment_id % n_grp, so a 512-segment
        # index at 8 cores runs ~100 scoring tasks of ~5 segments each
        # (one Arrow/UDF invocation per task, per-segment scoring looped
        # inside) instead of 512 per-segment UDF invocations. Two bounds:
        # at least 2x the session parallelism (scheduling), and at least
        # one group per _DOCS_PER_SCORE_TASK docs — a task's postings
        # working set must stay cache-sized regardless of core count.
        # The docs bound also keeps the DECOMPOSITION core-independent
        # once the corpus is large (same tasks at 1 and 4 cores), which
        # the scaling ladder requires for a fair efficiency number: the
        # parallelism-only formula gave a 1-core session 2 tasks of 16
        # segments (400k docs each) whose per-doc cost inflated ~50%
        # (the encode kernel's working-set superlinearity, same cause),
        # depressing the 1-core baseline into a bogus >1.0 efficiency.
        # Explicit repartition on the group key: the stage is CPU-bound
        # but tiny by bytes, so AQE's size-based coalescing would
        # otherwise collapse it to one task.
        size_grps = -(-max(self.max_doc, 1) // _DOCS_PER_SCORE_TASK)
        n_grp = max(1, min(self.cat.num_segments,
                           max(self.spark.sparkContext
                               .defaultParallelism * 2, size_grps)))
        grp = F.pmod(F.col("segment_id"), F.lit(n_grp)).cast("int")
        left = postings_df.withColumn("seg_grp", grp) \
            .repartition(n_grp, F.col("seg_grp"))
        if aux_df is None:
            return left.groupBy("seg_grp").applyInPandas(
                _drop_key(seg_fn), schema=schema)
        right = aux_df.withColumn("seg_grp", grp) \
            .repartition(n_grp, F.col("seg_grp"))
        return (left.groupby("seg_grp")
                .cogroup(right.groupby("seg_grp"))
                .applyInPandas(seg_fn, schema=schema))

    def _mask_deleted(self, docs: DataFrame) -> DataFrame:
        """Live-docs mask via a (broadcastable) anti-join — no collected
        id list, no `isin` literal in the plan."""
        if self._deleted_df is None:
            return docs
        return docs.join(F.broadcast(self._deleted_df.select("doc_id")),
                         "doc_id", "left_anti")

    def _range_docs(self, query: Range, mask_deletes: bool = True
                    ) -> DataFrame:
        docs = self._docs_src
        col = F.col(query.field)
        if query.lower is not None:
            docs = docs.filter(col >= query.lower)
        if query.upper is not None:
            docs = docs.filter(col <= query.upper)
        return self._mask_deleted(docs) if mask_deletes else docs

    def fetch(self, hits: DataFrame, bulk: bool = False) -> DataFrame:
        """Stored-fields fetch (StoredFieldsReader analogue): attach the
        docs-table columns to top-k hits. Point path (default): the k doc
        ids are collected and pushed into the docs scan as an IN filter
        (parquet row-group stats skip everything else — the .fdx
        point-lookup analogue), then a broadcast join re-attaches scores.
        bulk=True skips the driver collect entirely (a plain broadcast
        join) — use when `hits` is large (exports, rerankers)."""
        if bulk:
            return (self._docs_src.join(F.broadcast(hits), "doc_id",
                                        "inner")
                    .orderBy(F.desc("score"), F.asc("doc_id")))
        ids = [int(r.doc_id) for r in hits.select("doc_id").collect()]
        stored = self._docs_src.filter(F.col("doc_id").isin(ids))
        return (stored.join(F.broadcast(hits), "doc_id", "inner")
                .orderBy(F.desc("score"), F.asc("doc_id")))

    def profile(self, query: Query, k: int = 100, f64: bool = False) -> dict:
        """Query-side observability — the SearchProfiler / query-metrics
        analogue (util/SearchProfiler.cpp, observability/Metrics.h):
        returns plan shape + scan pruning facts + per-phase wall times +
        per-segment match totals for one executed search."""
        import time as _t
        from diagon_spark.index.builder import term_bucket
        t0 = _t.time()
        q = rewrite(query)
        if isinstance(q, (MatchNone, MatchAll, Range)):
            hits = self.search(q, k=k, f64=f64).collect()
            return {"kind": type(q).__name__.lower(),
                    "plan_ms": round((_t.time() - t0) * 1000, 2),
                    "hits_returned": len(hits)}
        spec = self.plan(q)
        plan_ms = (_t.time() - t0) * 1000
        t1 = _t.time()
        rows = self._run_spec(spec, _TOTAL_SCHEMA, k=k, f64=f64,
                              after=None).collect()
        exec_ms = (_t.time() - t1) * 1000
        seg_totals: dict[int, int] = {}
        seg_blocks: dict[int, tuple[int, int]] = {}
        exact = True
        for r in rows:
            seg_totals.setdefault(int(r.segment_id), int(r.seg_total))
            seg_blocks.setdefault(int(r.segment_id),
                                  (int(r.seg_blocks),
                                   int(r.seg_blocks_dec)))
            exact &= bool(r.seg_exact)
        blocks_total = sum(b for b, _ in seg_blocks.values())
        blocks_decoded = sum(d for _, d in seg_blocks.values())
        return {
            "kind": spec["kind"],
            "leaves": [list(p) for p in spec["all_terms"]],
            "buckets_scanned": sorted(
                {term_bucket(t, self.cat.num_buckets, f)
                 for f, t in spec["all_terms"]}),
            "num_buckets": self.cat.num_buckets,
            "positions_read": bool(spec["need_positions"]),
            "segments_matched": sum(1 for v in seg_totals.values() if v > 0),
            "per_segment_matches": seg_totals,
            "total_hits": sum(seg_totals.values()),
            "total_relation": "eq" if exact else "gte",
            # Block-Max pruning observability: posting blocks the query's
            # terms HAVE vs blocks actually DECODED (skipped = difference)
            "blocks_total": blocks_total,
            "blocks_decoded": blocks_decoded,
            "blocks_skipped": blocks_total - blocks_decoded,
            "hits_returned": min(k, sum(1 for r in rows
                                        if int(r.doc_id) >= 0)),
            "plan_ms": round(plan_ms, 2),
            "exec_ms": round(exec_ms, 2),
        }

    def matching_docs(self, query: Query) -> DataFrame:
        """ALL matching doc_ids as a DataFrame (no scoring, no top-k) —
        the COMPLETE_NO_SCORES DocIdCollector analogue
        (c_api/diagon_c_api.cpp:1497-1520). Feeds doc-values analytics
        (date_histogram) and export-style consumers; stays distributed
        end-to-end."""
        q = rewrite(query)
        if isinstance(q, MatchNone):
            return self.spark.createDataFrame([], _IDS_SCHEMA)
        if isinstance(q, MatchAll):
            return self._mask_deleted(self._docs_src).select(
                F.col("doc_id").cast("long"))
        if isinstance(q, Range):
            return self._range_docs(q).select(F.col("doc_id").cast("long"))
        spec = self.plan(q, force_tree=True)
        return self._run_spec(spec, _IDS_SCHEMA, k=0, f64=False,
                              after=None, ids_only=True)

    def histogram(self, field: str, min_value: float, interval: float,
                  num_buckets: int) -> DataFrame:
        """Fixed-interval histogram over a numeric doc-values column of
        ALL docs — diagon_compute_histogram parity
        (c_api/diagon_c_api.cpp:1257-1350): bucket = int((v-min)/interval),
        kept iff 0 <= bucket < num_buckets. Like the reference's BKD
        visitor (which walks point values with no live-docs check),
        tombstoned docs are counted until a merge purges them. Empty
        buckets are omitted (the C API's dense zero-filled array is a
        calling-convention detail). One parquet scan, parquet row-group
        stats prune out-of-range files, map-side combine on the bucket
        key."""
        v = F.col(field).cast("double")
        b = F.floor((v - F.lit(float(min_value))) / F.lit(float(interval)))
        return (self._docs_src
                .filter((b >= 0) & (b < num_buckets))
                .groupBy(b.cast("int").alias("bucket"))
                .agg(F.count("*").cast("long").alias("count"))
                .orderBy("bucket"))

    def date_histogram(self, query: Query, field: str, interval: float,
                       min_value: float, max_value: float) -> DataFrame:
        """Query-filtered fixed-interval histogram over a numeric
        doc-values column — diagon_search_with_date_histogram parity
        (c_api/diagon_c_api.cpp:1471-1600): docs matching `query` (match
        set only, no scoring) whose value lies in [min, max) bucket at
        key = floor((v-min)/interval)*interval + min; only non-empty
        buckets, ascending by key. The match set is produced distributed
        (matching_docs) and joined to the doc-values scan — Catalyst
        picks broadcast vs shuffle by match-set size."""
        vals = self._docs_src.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col(field).cast("double").alias("__v"))
        vv = F.col("__v")
        key = (F.floor((vv - F.lit(float(min_value)))
                       / F.lit(float(interval)))
               * F.lit(float(interval)) + F.lit(float(min_value)))
        return (self.matching_docs(query).join(vals, "doc_id")
                .filter((vv >= min_value) & (vv < max_value))
                .groupBy(key.cast("double").alias("bucket_key"))
                .agg(F.count("*").cast("long").alias("count"))
                .orderBy("bucket_key"))

    def count(self, query: Query) -> int:
        """Hit count; O(1) from term_dict for a single live-index term
        (TermQuery.cpp:312-341 Weight::count analogue); arithmetic for
        MatchAll; columnar skip/bulk/scan for Range (ColumnarStore.h:9-13,
        parquet stats skip non-overlapping row groups). Everything else
        runs a COUNT-ONLY distributed path: per-segment match counting
        with no scoring-order sort and no top-k materialization
        (TotalHitCountCollector analogue)."""
        q = rewrite(query)
        if isinstance(q, MatchNone):
            return 0
        if isinstance(q, MatchAll):
            return self.max_doc - self.n_deleted
        if isinstance(q, Term) and self.n_deleted == 0:
            key = (self._resolve_field(q.field), q.term)
            return self.term_stats([key])[key][0]
        if isinstance(q, Range):
            return self._range_docs(q).count()
        spec = self.plan(q, force_tree=True)
        counts = self._run_spec(spec, _COUNT_SCHEMA, k=0, f64=False,
                                after=None, count_only=True)
        row = counts.agg(F.sum("n").alias("n")).collect()[0]
        return int(row.n or 0)


def _drop_key(cogroup_fn):
    """Adapt the cogrouped (left, right) fn to plain grouped input."""
    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return cogroup_fn(pdf, None)
    return fn


def _group_postings(pdf: pd.DataFrame) -> dict:
    rows_by_key: dict[tuple[str, str], list[dict]] = {}
    if pdf is not None and len(pdf):
        for rec in pdf.to_dict("records"):
            rows_by_key.setdefault((rec["field"], rec["term"]),
                                   []).append(rec)
    return {key: wand._SegmentPostings(rs)
            for key, rs in rows_by_key.items()}


def _make_segment_fn(spec: dict, k: int, f64: bool, after, schema: str,
                     count_only: bool, ids_only: bool = False):
    """Build the scoring function (pickled to executors). A group may
    carry SEVERAL segments (seg_grp batching — task count is decoupled
    from segment count); per-segment scoring runs in a loop inside one
    UDF invocation and results concatenate. Cogrouped form:
    (postings_pdf, aux_pdf) where aux rows are (segment_id, doc_id,
    set_id); set -1 = tombstones, set i = the spec's i-th Range/MatchAll
    clause doc set."""
    with_total = "seg_total" in schema

    def one_segment(seg: int, l_pdf: pd.DataFrame,
                    r_pdf: pd.DataFrame | None) -> pd.DataFrame:
        aux_sets: dict[int, np.ndarray] = {}
        if r_pdf is not None and len(r_pdf):
            for sid, grp in r_pdf.groupby("set_id"):
                aux_sets[int(sid)] = np.unique(
                    grp["doc_id"].to_numpy(np.int64))
        banned = aux_sets.pop(-1, None)
        postings = _group_postings(l_pdf)

        if count_only or ids_only:
            docs, _ = wand.eval_tree(spec["root"], postings, spec["params"],
                                     aux_sets, False)
            keep = wand._mask_banned(docs, banned)
            if ids_only:
                if keep is not None:
                    docs = docs[keep]
                return pd.DataFrame({"doc_id": docs.astype(np.int64)})
            n = int(keep.sum()) if keep is not None else int(len(docs))
            return pd.DataFrame({"segment_id": [seg], "n": [n]})

        stats_out: dict = {}
        docs, scores = run_segment_spec(spec, postings, aux_sets, k, f64,
                                        after, banned, stats_out=stats_out)
        if with_total and len(docs) == 0:
            # zero hits must still report this segment's totals/block
            # counters: one marker row (doc_id -1 — real ids are >= 0),
            # consumers treat it as counters-only, never as a hit
            docs = np.full(1, -1, dtype=np.int64)
            scores = np.zeros(1, np.float64)
        out = {"doc_id": docs.astype(np.int64),
               "score": scores.astype(np.float64)}
        if with_total:
            out["segment_id"] = np.full(len(docs), seg, dtype=np.int32)
            out["seg_total"] = np.full(len(docs),
                                       stats_out.get("total", 0),
                                       dtype=np.int64)
            out["seg_exact"] = np.full(len(docs),
                                       bool(stats_out.get("exact", True)))
            out["seg_blocks"] = np.full(len(docs),
                                        stats_out.get("blocks_total", 0),
                                        dtype=np.int64)
            out["seg_blocks_dec"] = np.full(
                len(docs), stats_out.get("blocks_decoded", 0),
                dtype=np.int64)
        return pd.DataFrame(out)

    def seg_fn(l_pdf: pd.DataFrame, r_pdf: pd.DataFrame | None
               ) -> pd.DataFrame:
        from diagon_spark._runtime import worker_init
        worker_init()
        segs = set(l_pdf["segment_id"].unique().tolist())
        if r_pdf is not None and len(r_pdf):
            segs |= set(r_pdf["segment_id"].unique().tolist())
        outs = [one_segment(
                    int(seg),
                    l_pdf[l_pdf["segment_id"] == seg],
                    (r_pdf[r_pdf["segment_id"] == seg]
                     if r_pdf is not None and len(r_pdf) else None))
                for seg in sorted(segs)]
        if len(outs) == 1:
            return outs[0]
        return pd.concat(outs, ignore_index=True)

    return seg_fn
