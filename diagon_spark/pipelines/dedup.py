"""Deduplication operators for web/pretraining-scale corpora.

Exact (hash groupBy), n-gram Jaccard (shingle self-join), MinHash+LSH
(band-bucket join), SimHash (hamming buckets). All shuffle-conscious:

* exact dedup groups on a 128-bit content hash — one shuffle, no skew
  (hash keys are uniform);
* Jaccard/minhash self-joins are joins on *shingle/bucket* keys, never a
  doc×doc cross join; hot shingles (boilerplate lines) are capped with a
  max-df filter before the join, the standard web-dedup skew guard;
* all hashes derive from md5 so an ANSI-SQL oracle can reproduce them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from diagon_spark.pipelines.textstats import with_tokens

# md5-derived 32-bit hash, reproducible in DuckDB:
#   CAST(concat('0x', substr(md5(s),1,8)) AS BIGINT)


def _h32(col):
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def exact_duplicates(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Exact-duplicate clusters: md5(content) groups with >1 member."""
    return (df.groupBy(F.md5(F.col(text_col)).alias("content_md5"))
            .agg(F.count("*").cast("long").alias("n_dups"),
                 F.min(F.col(id_col).cast("long")).alias("keep_doc_id"))
            .filter(F.col("n_dups") > 1))


def shingles(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
             k: int = 3) -> DataFrame:
    """Distinct token k-gram shingles per doc: (doc_id, shingle)."""
    t = with_tokens(df, text_col).select(
        F.col(id_col).cast("long").alias("doc_id"), "tokens")
    n = F.size("tokens")
    idxs = F.sequence(F.lit(0), F.greatest(n - k, F.lit(-1)))
    sh = t.select(
        "doc_id",
        F.explode(F.transform(idxs, lambda i:
                              F.concat_ws(" ", F.slice("tokens", i + 1, k))))
        .alias("shingle"))
    return sh.distinct()


def jaccard_pairs(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", k: int = 3,
                  threshold: float = 0.8, max_shingle_df: int = 10_000
                  ) -> DataFrame:
    """Near-duplicate pairs with k-gram Jaccard >= threshold.

    Self-join on shingle (docs sharing no shingle never meet — this is
    the LSH-free exact variant); `max_shingle_df` drops boilerplate
    shingles that would create quadratic skew at web scale.
    """
    sh = shingles(df, id_col, text_col, k)
    hot = (sh.groupBy("shingle").count()
           .filter(F.col("count") > max_shingle_df).select("shingle"))
    sh = sh.join(F.broadcast(hot), "shingle", "left_anti")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    pairs = (sh.alias("a").join(sh.alias("b"), "shingle")
             .filter(F.col("a.doc_id") < F.col("b.doc_id"))
             .groupBy(F.col("a.doc_id").alias("doc_a"),
                      F.col("b.doc_id").alias("doc_b"))
             .agg(F.count("*").cast("long").alias("n_common")))
    out = (pairs
           .join(sizes.withColumnRenamed("doc_id", "doc_a")
                 .withColumnRenamed("n_shingles", "n_a"), "doc_a")
           .join(sizes.withColumnRenamed("doc_id", "doc_b")
                 .withColumnRenamed("n_shingles", "n_b"), "doc_b")
           .withColumn("jaccard", F.round(
               F.col("n_common").cast("double") /
               (F.col("n_a") + F.col("n_b") - F.col("n_common")), 6))
           .filter(F.col("jaccard") >= threshold)
           .select("doc_a", "doc_b", "n_common", "jaccard"))
    return out


def minhash_signatures(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", k: int = 3,
                       num_hashes: int = 16) -> DataFrame:
    """MinHash signatures: h_i(doc) = min over shingles of
    md5_32(i || ':' || shingle). Deterministic, SQL-reproducible."""
    sh = shingles(df, id_col, text_col, k)
    mins = [F.min(_h32(F.concat(F.lit(f"{i}:"), F.col("shingle"))))
            .alias(f"mh_{i}") for i in range(num_hashes)]
    return sh.groupBy("doc_id").agg(*mins)


def minhash_lsh_candidates(df: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text", k: int = 3,
                           num_hashes: int = 16, band_size: int = 2
                           ) -> DataFrame:
    """LSH banding: docs sharing any (band_id, band_hash) bucket are
    candidate near-dups. Join is on bucket keys — linear, not quadratic."""
    sig = minhash_signatures(df, id_col, text_col, k, num_hashes)
    bands = []
    for b in range(num_hashes // band_size):
        cols = [F.col(f"mh_{b * band_size + j}") for j in range(band_size)]
        bands.append(sig.select(
            "doc_id", F.lit(b).alias("band"),
            F.md5(F.concat_ws("_", *[c.cast("string") for c in cols]))
            .alias("band_hash")))
    buckets = bands[0]
    for b in bands[1:]:
        buckets = buckets.unionByName(b)
    pairs = (buckets.alias("a").join(buckets.alias("b"), ["band", "band_hash"])
             .filter(F.col("a.doc_id") < F.col("b.doc_id"))
             .select(F.col("a.doc_id").alias("doc_a"),
                     F.col("b.doc_id").alias("doc_b"))
             .distinct())
    return pairs


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
            bits: int = 32) -> DataFrame:
    """SimHash over tokens: sign-sum of per-token hash bits, weighted by tf.

    Bit j of simhash = 1 iff Σ_tokens tf * (±1 for hash bit j) > 0.
    Expressed as JVM-side bit ops (no UDF).
    """
    t = with_tokens(df, text_col).select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.explode("tokens").alias("token"))
    tf = t.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    h = tf.withColumn("h", _h32(F.col("token")))
    per_bit = [
        F.sum(F.when(F.shiftright(F.col("h"), j).bitwiseAND(1) == 1,
                     F.col("tf")).otherwise(-F.col("tf"))).alias(f"s_{j}")
        for j in range(bits)]
    agg = h.groupBy("doc_id").agg(*per_bit)
    sim = agg.select(
        "doc_id",
        sum((F.when(F.col(f"s_{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
             for j in range(bits)), F.lit(0)).cast("long").alias("simhash"))
    return sim
