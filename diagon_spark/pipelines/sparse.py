"""Sparse-vector retrieval — the SINDI/QBlock analogue
(sparse/SindiIndex.h:71-163, sparse/SindiScorer.h:45-111): value-storing
posting lists where score(q, d) = Σ_t q_w(t) · d_w(t), answered by
scatter-add over the query terms' postings.

Spark-first restatement: the value postings are a plain DataFrame
(term, doc_id, weight) bucketed by term — the scatter-add IS
`groupBy(doc_id).sum(q_w * weight)`, whole-stage-codegen'd by Catalyst,
no UDF at all. Weights here are deterministic tf·idf (double) standing in
for learned-sparse weights (SPLADE-style models emit exactly this shape);
swap the weight column for model outputs and nothing else changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from diagon_spark.pipelines.textstats import with_tokens


def build_value_postings(df: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """(term, doc_id, weight) value postings with tf·idf weights.

    weight = tf * ln(1 + (N - df + 0.5)/(df + 0.5)) in double — the same
    idf form the BM25 engine uses, so the two paths share semantics.
    """
    t = with_tokens(df, text_col).select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.explode("tokens").alias("term"))
    tf = t.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    n_docs = df.count()
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    return (tf.join(dfreq, "term")
            .select("term", "doc_id",
                    (F.col("tf") *
                     F.log(F.lit(1.0) + (F.lit(float(n_docs)) - F.col("df")
                                         + F.lit(0.5)) / (F.col("df") + F.lit(0.5))))
                    .alias("weight")))


def sparse_topk(postings: DataFrame, query: dict[str, float],
                k: int = 10) -> DataFrame:
    """Top-k docs by sparse dot product with the query vector.

    The scan touches only the query terms' postings (predicate pushdown);
    the scatter-add is a hash aggregation — map-side partial combine, one
    shuffle of (doc, partial-sum) pairs.
    """
    qdf = F.create_map(*[F.lit(x) for kv in query.items() for x in kv])
    hits = (postings.filter(F.col("term").isin(list(query)))
            .withColumn("q_w", qdf[F.col("term")])
            .groupBy("doc_id")
            .agg(F.sum(F.col("q_w") * F.col("weight")).alias("dot")))
    return (hits.select("doc_id", F.round("dot", 6).alias("score"))
            .orderBy(F.desc("dot"), F.asc("doc_id")).limit(k))
