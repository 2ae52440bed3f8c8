"""Benchmark decontamination and deterministic sampling — the two
corpus-hygiene operators every large-scale training-data pipeline runs
before (decontaminate) and after (sample) dedup/quality filtering.

Scale design (100 TB):
* decontaminate — the contamination side is an eval/benchmark set
  (thousands of docs, millions of n-grams): its distinct shingle set
  BROADCASTS, so the corpus is scanned once with a map-side hash join;
  the only shuffle is the per-doc hit aggregation (map-side combinable,
  keys are uniform doc_ids). Never a corpus×corpus join.
* sampling — pure JVM expressions (md5 → 32-bit int → modulo threshold):
  no RNG state, no shuffle, stable under repartitioning/retries, and the
  SAME rows are kept on every engine that can compute md5 — which is
  what makes the DuckDB oracle (and cross-run reproducibility audits)
  exact. Mirrors the reference's content-hash determinism discipline
  (index/builder.py doc-ID assignment).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from diagon_spark.pipelines.dedup import _h32, shingles

_MOD = 1_000_000


def contamination_ngrams(bench_df: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text", n: int = 3) -> DataFrame:
    """Distinct token n-grams of the eval/benchmark set (broadcast side)."""
    return (shingles(bench_df, id_col, text_col, k=n)
            .select("shingle").distinct())


def decontaminate(df: DataFrame, bench_df: DataFrame,
                  id_col: str = "doc_id", text_col: str = "text",
                  n: int = 3, min_hits: int = 1) -> DataFrame:
    """Per-doc count of distinct n-grams shared with the eval set, plus a
    contaminated flag (n_hits >= min_hits). Docs sharing nothing get
    n_hits = 0 — every input doc appears exactly once in the output."""
    corpus_sh = shingles(df, id_col, text_col, k=n)
    bench_sh = contamination_ngrams(bench_df, id_col, text_col, n)
    hits = (corpus_sh.join(F.broadcast(bench_sh), "shingle")
            .groupBy("doc_id")
            .agg(F.count("*").cast("long").alias("n_hits")))
    return (df.select(F.col(id_col).cast("long").alias("doc_id"))
            .join(hits, "doc_id", "left")
            .select("doc_id",
                    F.coalesce(F.col("n_hits"), F.lit(0).cast("long"))
                    .alias("n_hits"))
            .withColumn("contaminated",
                        (F.col("n_hits") >= min_hits).cast("int")))


def _sample_key(key_col: str, salt: str):
    """Deterministic per-row draw in [0, 1e6): md5-derived 32-bit int mod
    1e6 (dedup.h32 idiom — DuckDB-reproducible)."""
    return F.pmod(_h32(F.concat(F.lit(f"{salt}:"),
                                F.col(key_col).cast("string"))),
                   F.lit(_MOD))


def sample_hash(df: DataFrame, fraction: float, key_col: str = "doc_id",
                salt: str = "s0") -> DataFrame:
    """Keep a deterministic `fraction` of rows by content-hash threshold."""
    return df.filter(_sample_key(key_col, salt) < int(fraction * _MOD))


def sample_stratified(df: DataFrame, fractions: dict[str, float],
                      stratum_col: str = "lang", key_col: str = "doc_id",
                      salt: str = "s0", default: float = 0.0) -> DataFrame:
    """Per-stratum deterministic sampling (corpus re-balancing: e.g. keep
    30% of English, 100% of low-resource languages). Strata absent from
    `fractions` keep `default`. One scan, zero shuffles — the filter is a
    chained CASE the optimizer folds into the parquet scan."""
    thresh = F.lit(int(default * _MOD))
    for stratum, frac in sorted(fractions.items()):
        thresh = F.when(F.col(stratum_col) == stratum,
                        F.lit(int(frac * _MOD))).otherwise(thresh)
    return df.filter(_sample_key(key_col, salt) < thresh)
