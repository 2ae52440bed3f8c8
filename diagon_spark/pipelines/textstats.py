"""Text-analysis operators for large-scale training-data pipelines.

All JVM-side (built-in pyspark.sql.functions — whole-stage codegen, no
Python in the hot path) and each reproducible by an ANSI-SQL oracle.
Tokenization matches the engine's ASCII fast path:
lower(text) → runs of `[a-z0-9][a-z0-9']*`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

TOKEN_RE = "[a-z0-9][a-z0-9']*"

# small fixed stopword list (quality/lang-id heuristics)
STOPWORDS = ["the", "a", "of", "to", "and", "in", "is", "it", "for", "on",
             "with", "as", "this", "that", "by", "be", "or", "an", "are"]


def with_tokens(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn(
        "tokens",
        F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0))


def token_counts(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Per-doc token count + distinct-token count (BPE-ish regex counting)."""
    t = with_tokens(df, text_col)
    return t.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.size("tokens").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("tokens")).cast("long").alias("n_distinct"),
    )


def quality_scores(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Heuristic quality metrics: length, alnum ratio, stopword ratio,
    mean token length — the usual pretraining-data quality features."""
    t = with_tokens(df, text_col)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_tok = F.size("tokens")
    n_stop = F.size(F.array_intersect(F.array_distinct("tokens"), stop_arr))
    alnum_chars = F.length(F.regexp_replace(F.lower(F.col(text_col)),
                                            "[^a-z0-9]", ""))
    return t.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.length(text_col).cast("long").alias("n_chars_raw"),
        n_tok.cast("long").alias("n_tokens"),
        F.round(alnum_chars.cast("double") /
                F.greatest(F.length(text_col), F.lit(1)), 6).alias("alnum_ratio"),
        F.round(n_stop.cast("double") /
                F.greatest(F.size(F.array_distinct("tokens")), F.lit(1)), 6)
        .alias("stopword_ratio"),
        F.round((F.aggregate("tokens", F.lit(0).cast("long"),
                             lambda acc, x: acc + F.length(x)).cast("double"))
                / F.greatest(n_tok, F.lit(1)), 6).alias("mean_token_len"),
    )


def language_id(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """n-gram/stopword-heuristic language ID: docs whose distinct-token
    overlap with an English stopword list exceeds a threshold -> 'en',
    else 'unknown'. (Real model swapped in where fasttext/cld3 exists.)"""
    t = with_tokens(df, text_col)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    ratio = (F.size(F.array_intersect(F.array_distinct("tokens"), stop_arr))
             .cast("double")
             / F.greatest(F.size(F.array_distinct("tokens")), F.lit(1)))
    return t.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.when(ratio >= 0.05, F.lit("en")).otherwise(F.lit("unknown"))
        .alias("lang_pred"),
        F.round(ratio, 6).alias("stopword_ratio"),
    )


def fingerprints(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Document fingerprint = md5 over the normalized token stream (the
    content-defined analogue of a rolling hash at doc granularity)."""
    t = with_tokens(df, text_col)
    return t.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.md5(F.concat_ws(" ", "tokens")).alias("fingerprint"),
    )
