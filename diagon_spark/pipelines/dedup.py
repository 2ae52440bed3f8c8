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
             k: int = 3, distinct: bool = True) -> DataFrame:
    """Token k-gram shingles per doc: (doc_id, shingle).

    distinct=True (set semantics — required by Jaccard) costs a shuffle;
    MinHash passes distinct=False because MIN over a multiset equals MIN
    over its set — one whole shuffle of the shingle stream saved."""
    t = with_tokens(df, text_col).select(
        F.col(id_col).cast("long").alias("doc_id"), "tokens")
    n = F.size("tokens")
    idxs = F.sequence(F.lit(0), F.greatest(n - k, F.lit(-1)))
    sh = t.select(
        "doc_id",
        F.explode(F.transform(idxs, lambda i:
                              F.concat_ws(" ", F.slice("tokens", i + 1, k))))
        .alias("shingle"))
    return sh.distinct() if distinct else sh


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
    """MinHash signatures, deterministic and SQL-reproducible.

    One md5 digest carries FOUR independent 32-bit hashes (hex windows
    1-8, 9-16, 17-24, 25-32), so num_hashes permutations cost only
    ceil(num_hashes/4) md5 calls per shingle:
    h_i = int(md5((i//4) || ':' || shingle)[8*(i%4) : 8*(i%4)+8], 16)."""
    sh = shingles(df, id_col, text_col, k)
    n_digests = (num_hashes + 3) // 4
    proj = sh.select(
        "doc_id",
        *[F.md5(F.concat(F.lit(f"{g}:"), F.col("shingle"))).alias(f"g{g}")
          for g in range(n_digests)])
    mins = [
        F.min(F.conv(F.substring(F.col(f"g{i // 4}"), 1 + 8 * (i % 4), 8),
                     16, 10).cast("long")).alias(f"mh_{i}")
        for i in range(num_hashes)]
    return proj.groupBy("doc_id").agg(*mins)


def minhash_lsh_candidates(df: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text", k: int = 3,
                           num_hashes: int = 16, band_size: int = 2
                           ) -> DataFrame:
    """LSH banding: docs sharing any (band_id, band_hash) bucket are
    candidate near-dups. Join is on bucket keys — linear, not quadratic.

    Band projection is ONE posexplode over an array of band-hash columns
    (not an n-way union of selects, which re-derives the signature
    aggregation once per band unless ReuseExchange happens to fire —
    measured 3x slower)."""
    sig = minhash_signatures(df, id_col, text_col, k, num_hashes)
    band_cols = [
        F.md5(F.concat_ws("_", *[F.col(f"mh_{b * band_size + j}")
                                 .cast("string")
                                 for j in range(band_size)]))
        for b in range(num_hashes // band_size)]
    buckets = sig.select(
        "doc_id", F.posexplode(F.array(*band_cols))
        .alias("band", "band_hash"))
    # materialize the bucket table once: the self-join would otherwise run
    # the whole shingle→md5→min pipeline twice (broadcast planning defeats
    # ReuseExchange). On a cluster this is the "write the signature table,
    # bucket by band_hash" step; in-session, MEMORY_AND_DISK persist.
    from pyspark import StorageLevel
    buckets = buckets.persist(StorageLevel.MEMORY_AND_DISK)
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
