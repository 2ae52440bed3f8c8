"""Searcher — the IndexSearcher analogue (search/IndexSearcher.cpp:50-135).

Execution restates the reference's per-segment search as a 3-stage Spark
plan (SURVEY.md §3.1):

  stage 1 (driver): look up query terms in term_dict/stats — the FST
      term-seek analogue; compute each term's SimScorer constants once
      per query like Weight creation (TermQuery.cpp:184-259);
  stage 2 (executors): scan ONLY the pruned postings rows (partition
      pruning on bucket + parquet predicate pushdown on term; positions
      column read only for phrase queries — column pruning) and run the
      vectorized block-max scorer per segment group (wand.py), emitting
      each segment's local top-k;
  stage 3: one tiny shuffle — global orderBy(score desc, doc_id asc)
      limit k, the TopScoreDocCollector tie-break.

Deletes: a (small) deleted-doc set is broadcast into the scoring UDF and
masked out before top-k selection — the live-docs bitmap analogue
(codecs/LiveDocsFormat.h:18-47). At larger delete volumes this becomes an
anti-join at build/compaction time (Iceberg equality deletes).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from diagon_spark.index.builder import IndexCatalog, term_bucket
from diagon_spark.search import bm25, wand
from diagon_spark.search.query import (Boolean, MatchAll, Phrase, Query,
                                       Range, Term)

_HIT_SCHEMA = "doc_id long, score double"

_BASE_COLS = ["term", "segment_id", "chunk", "df", "doc_blocks", "tf_blocks",
              "norm_bytes", "block_first", "block_last", "block_max_tf",
              "block_max_norm", "block_doc_off", "block_tf_off"]
_POS_COLS = _BASE_COLS + ["pos_blocks", "block_pos_off"]


class Searcher:
    def __init__(self, spark: SparkSession, catalog: IndexCatalog,
                 deleted_doc_ids: list[int] | None = None):
        from diagon_spark._ship import ensure_shipped
        ensure_shipped(spark)
        self.spark = spark
        self.cat = catalog
        srow = spark.read.parquet(catalog.stats_path).collect()[0]
        self.max_doc = int(srow.max_doc)
        self.sum_total_term_freq = int(srow.sum_total_term_freq or 0)
        # live-docs mask: explicit ids + the index's durable tombstone table
        from diagon_spark.index.deletes import load_deleted_ids
        tombstones = load_deleted_ids(spark, catalog)
        self.deleted = np.asarray(
            sorted(set(deleted_doc_ids or []) | set(tombstones)),
            dtype=np.int64)
        self._term_stats_cache: dict[str, tuple[int, int]] = {}
        # resolve sources once (file listing / schema inference is per-query
        # overhead otherwise); reads stay lazy and pruned
        self._postings_src = spark.read.parquet(catalog.postings_path)
        self._term_dict_src = spark.read.parquet(catalog.term_dict_path)
        self._docs_src = spark.read.parquet(catalog.docs_path)

    # ------------------------------------------------ stats (stage 1)

    def term_stats(self, terms: list[str]) -> dict[str, tuple[int, int]]:
        """term -> (df, cttf) from term_dict, with partition-pruned lookup."""
        missing = [t for t in terms if t not in self._term_stats_cache]
        if missing:
            buckets = sorted({term_bucket(t, self.cat.num_buckets) for t in missing})
            rows = (self._term_dict_src
                    .filter(F.col("bucket").isin(buckets))
                    .filter(F.col("term").isin(missing))
                    .select("term", "df", "cttf").collect())
            found = {r.term: (int(r.df), int(r.cttf)) for r in rows}
            for t in missing:
                self._term_stats_cache[t] = found.get(t, (0, 0))
        return {t: self._term_stats_cache[t] for t in terms}

    def _scorer_params(self, terms: list[str],
                       boosts: dict[str, float] | None = None
                       ) -> dict[str, wand.TermScorerParams]:
        """Weight-creation analogue with the reference's stat fallbacks."""
        stats = self.term_stats(terms)
        doc_count, sttf = bm25.collection_stats_with_fallbacks(
            self.max_doc, self.sum_total_term_freq)
        out = {}
        import math
        avg64 = (float(sttf) / float(doc_count)
                 if doc_count > 0 and sttf > 0 else 50.0)
        for t in terms:
            df, _ = stats[t]
            if df == 0:
                df = self.max_doc // 10  # TermQuery.cpp:250-256 fallback
            boost = (boosts or {}).get(t, 1.0)
            idf32 = float(bm25.idf(df, doc_count)) * boost
            idf64 = math.log(1.0 + (doc_count - df + 0.5) / (df + 0.5)) * boost
            avg = float(bm25.avg_field_length(sttf, doc_count))
            out[t] = wand.TermScorerParams(np.float32(idf32), avg,
                                           idf64=idf64, avg64=avg64)
        return out

    def _phrase_params(self, terms: list[str], boost: float = 1.0
                       ) -> wand.TermScorerParams:
        """Rarest-term idf (PhraseQuery.cpp:303-338)."""
        stats = self.term_stats(terms)
        doc_count, sttf = bm25.collection_stats_with_fallbacks(
            self.max_doc, self.sum_total_term_freq)
        min_df = self.max_doc
        for t in terms:
            df, _ = stats[t]
            if df > 0:
                min_df = min(min_df, df)
        min_df = max(min_df, 1)
        import math
        idf = float(bm25.idf(min_df, doc_count)) * boost
        idf64 = math.log(1.0 + (doc_count - min_df + 0.5) / (min_df + 0.5)) * boost
        avg64 = (float(sttf) / float(doc_count)
                 if doc_count > 0 and sttf > 0 else 50.0)
        return wand.TermScorerParams(
            np.float32(idf), float(bm25.avg_field_length(sttf, doc_count)),
            idf64=idf64, avg64=avg64)

    # --------------------------------------------- postings scan (stage 2)

    def _postings(self, terms: list[str], need_positions: bool) -> DataFrame:
        buckets = sorted({term_bucket(t, self.cat.num_buckets) for t in terms})
        cols = _POS_COLS if need_positions else _BASE_COLS
        return (self._postings_src
                .filter(F.col("bucket").isin(buckets))   # partition pruning
                .filter(F.col("term").isin(list(set(terms))))  # pushed filter
                .select("bucket", *cols))

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
        if isinstance(query, MatchAll):
            score = F.lit(float(query.boost)).cast("double")
            docs = self._docs_src
            if len(self.deleted):  # live-docs mask (same as _range_docs)
                docs = docs.filter(~F.col("doc_id")
                                   .isin([int(d) for d in self.deleted]))
            return (docs.select(F.col("doc_id"), score.alias("score"))
                    .orderBy(F.asc("doc_id")).limit(k))
        if isinstance(query, Range):
            # constant-score range over docs-table doc values; Catalyst +
            # parquet row-group stats provide the BKD-style pruning
            return (self._range_docs(query)
                    .select(F.col("doc_id"),
                            F.lit(float(query.boost)).cast("double")
                            .alias("score"))
                    .orderBy(F.asc("doc_id")).limit(k))

        spec, params, phrase_params = self._plan(query)
        banned = self.deleted
        seg_fn = _make_segment_fn(spec, params, phrase_params, k, f64, banned,
                                  after)
        need_pos = spec["kind"] == "phrase"
        # explicit repartition: the scoring stage is CPU-bound per segment
        # but tiny by bytes, so AQE's size-based coalescing would collapse
        # it to one task; a user-specified partition count (still hashed on
        # segment_id, so groups stay intact) keeps it parallel
        n_part = max(1, min(self.cat.num_segments,
                            self.spark.sparkContext.defaultParallelism * 2))
        hits = (self._postings(spec["all_terms"], need_pos)
                .repartition(n_part, F.col("segment_id"))
                .groupBy("segment_id")
                .applyInPandas(seg_fn, schema=_HIT_SCHEMA))
        return hits.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    def _range_docs(self, query: Range) -> DataFrame:
        docs = self._docs_src
        col = F.col(query.field)
        if query.lower is not None:
            docs = docs.filter(col >= query.lower)
        if query.upper is not None:
            docs = docs.filter(col <= query.upper)
        if len(self.deleted):
            docs = docs.filter(~F.col("doc_id")
                               .isin([int(d) for d in self.deleted]))
        return docs

    def fetch(self, hits: DataFrame) -> DataFrame:
        """Stored-fields fetch (StoredFieldsReader analogue): attach the
        docs-table columns to top-k hits. The k doc ids are collected and
        pushed into the docs scan as an IN filter (parquet row-group
        stats skip everything else — the .fdx point-lookup analogue),
        then a broadcast join re-attaches scores."""
        ids = [int(r.doc_id) for r in hits.select("doc_id").collect()]
        stored = self._docs_src.filter(F.col("doc_id").isin(ids))
        return (stored.join(F.broadcast(hits), "doc_id", "inner")
                .orderBy(F.desc("score"), F.asc("doc_id")))

    def count(self, query: Query) -> int:
        """Hit count; O(1) from term_dict for a single term
        (TermQuery.cpp:312-341 Weight::count analogue). Range counts are
        the columnar skip/bulk/scan path (ColumnarStore.h:9-13): Catalyst
        + parquet stats skip non-overlapping row groups."""
        if isinstance(query, MatchAll):
            return self.max_doc - len(self.deleted)
        if isinstance(query, Term) and len(self.deleted) == 0:
            return self.term_stats([query.term])[query.term][0]
        if isinstance(query, Range):
            return self._range_docs(query).count()
        return self.search(query, k=self.max_doc + 1).count()

    # ------------------------------------------------------------- plan

    def _plan(self, query: Query):
        """Query -> executable spec: strategy selection, the reference's
        scorer-choice logic (BooleanQuery.cpp:376-480, SURVEY.md §4)."""
        phrase_params = None
        if isinstance(query, Term):
            spec = {"kind": "or", "should": [query.term], "msm": 0}
            params = self._scorer_params([query.term], {query.term: query.boost})
        elif isinstance(query, Phrase):
            terms = list(query.phrase_terms)
            spec = {"kind": "phrase", "terms": terms}
            params = self._scorer_params(terms)
            phrase_params = self._phrase_params(terms, query.boost)
        elif isinstance(query, Boolean):
            def flat(qs):
                ts = []
                for q in qs:
                    if not isinstance(q, Term):
                        raise NotImplementedError(
                            "v1 boolean clauses must be Term queries")
                    ts.append(q.term)
                return ts
            must, should = flat(query.must), flat(query.should)
            must_not, filt = flat(query.must_not), flat(query.filter)
            if query.is_pure_disjunction:
                spec = {"kind": "or", "should": should,
                        "msm": query.min_should_match}
            else:
                spec = {"kind": "bool", "must": must, "should": should,
                        "must_not": must_not, "filter": filt,
                        "msm": query.min_should_match}
            boosts = {q.term: q.boost for q in
                      (*query.must, *query.should) if isinstance(q, Term)}
            params = self._scorer_params(
                [*must, *should, *must_not, *filt], boosts)
        else:
            raise NotImplementedError(type(query))
        spec["all_terms"] = sorted({t for t in _spec_terms(spec)})
        return spec, params, phrase_params


def _spec_terms(spec: dict) -> list[str]:
    if spec["kind"] == "phrase":
        return spec["terms"]
    if spec["kind"] == "or":
        return spec["should"]
    return [*spec["must"], *spec["should"], *spec["must_not"], *spec["filter"]]


def _make_segment_fn(spec: dict, params: dict, phrase_params, k: int,
                     f64: bool, banned: np.ndarray, after=None):
    """Build the per-segment applyInPandas function (pickled to executors)."""

    def seg_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        rows_by_term: dict[str, list[dict]] = {}
        for rec in pdf.to_dict("records"):
            rows_by_term.setdefault(rec["term"], []).append(rec)
        postings = {t: wand._SegmentPostings(rs) for t, rs in rows_by_term.items()}
        if spec["kind"] == "or":
            docs, scores = wand.wand_disjunction(
                postings, params, spec["should"], k + len(banned),
                msm=spec.get("msm", 0), f64=f64, after=after)
        elif spec["kind"] == "phrase":
            docs, scores = wand.phrase(postings, phrase_params, spec["terms"],
                                       k + len(banned), f64=f64, after=after)
        else:
            docs, scores = wand.conjunction(
                postings, params, spec["must"], spec["should"],
                spec["must_not"], spec["filter"], k + len(banned), f64=f64,
                after=after, msm=spec.get("msm", 0))
        if len(banned) and len(docs):
            keep = ~np.isin(docs, banned)
            docs, scores = docs[keep][:k], scores[keep][:k]
        return pd.DataFrame({"doc_id": docs.astype(np.int64),
                             "score": scores.astype(np.float64)})

    return seg_fn
