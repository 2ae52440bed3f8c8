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

from diagon_spark.parallel import ensure_min_parallelism
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
    over its set — one whole shuffle of the shingle stream saved.

    The narrow (doc_id, text) input is hash-repartitioned by doc_id
    BEFORE tokenize/explode when under-parallel (see parallel.py): the
    tokenize → k-gram → md5 work then runs at full parallelism, and the
    downstream distinct / per-doc signature aggregation reuses this
    exchange (their key sets contain doc_id) instead of adding one —
    same shuffle count, the exchange just sits below the cheap rows
    instead of above the exploded ones."""
    t = ensure_min_parallelism(
        df.select(F.col(id_col).cast("long").alias("doc_id"),
                  F.col(text_col)), "doc_id")
    t = with_tokens(t, text_col).select("doc_id", "tokens")
    n = F.size("tokens")
    # docs with < k tokens have NO shingles (empty start index array).
    # The old greatest(n-k, -1) form made sequence(0, -1) STEP DOWN to
    # the two-element [0, -1], whose i = -1 branch hit the illegal
    # slice(tokens, 0, k) — any short/empty doc crashed the whole query
    # (latent: the fixture corpora have no such docs).
    idxs = F.when(n >= k, F.sequence(F.lit(0), n - k)) \
        .otherwise(F.array().cast("array<int>"))
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
    h_i = int(md5((i//4) || ':' || shingle)[8*(i%4) : 8*(i%4)+8], 16).

    Implemented as ONE Arrow-batched kernel (mapInPandas) instead of the
    explode → md5-expression → groupBy plan: the expression pipeline
    materialized the 10M-row shingle stream through interpreted
    higher-order functions (transform/slice HOFs are CodegenFallback)
    and ran 4 md5 + 16 min-updates per shingle OCCURRENCE — measured
    8.4 s at 50k docs / 32 cores, vs ~1 s for this kernel (guide §4.2:
    hand whole batches to native code when the JVM expression path is
    not codegen-friendly). The kernel is value-identical: tokens =
    TOKEN_RE over lower(text) (the same regex the JVM/ oracle path
    uses), shingles deduped per doc (MIN over a multiset equals MIN
    over its set), h_i read as big-endian u32 windows of the digest
    bytes — exactly int(hex_window, 16). Docs with < k tokens emit no
    signature row, as in the explode form (they have no shingles). The
    per-doc aggregation happens inside the kernel, so the trailing
    groupBy reduces doc-count-sized rows (one per doc per batch) — it
    exists to merge rows of a DOC_ID REPEATED across input rows/batches
    (min over the union of their shingles, the old groupBy semantics
    and the oracle's). mapInPandas emits fresh attribute ids, so the
    planner cannot prove the kernel preserved HashPartitioning(doc_id)
    and the groupBy plans its own exchange — but a partial aggregate
    runs below it, so that exchange moves ~one 17-long row per
    (doc_id, partition), the same tiny width the old expression plan
    shuffled; the heavy text/shingle stream still crosses no shuffle.
    """
    from diagon_spark._ship import ensure_shipped
    from diagon_spark.pipelines.textstats import TOKEN_RE
    ensure_shipped(df.sparkSession)  # kernel imports diagon_spark on
    # executors — self-ship like every public entry point
    n_digests = (num_hashes + 3) // 4
    schema = ("doc_id long, "
              + ", ".join(f"mh_{i} long" for i in range(num_hashes)))
    tok_pattern = TOKEN_RE

    def kernel(batches):
        import re
        from hashlib import md5
        import numpy as np
        import pandas as pd
        from diagon_spark.analysis.tokenizer import (_IS_ASCII,
                                                     _ascii_tokens_bytes)
        tok_re = re.compile(tok_pattern)
        prefixes = tuple(f"{g}:".encode() for g in range(n_digests))
        is_ascii = _IS_ASCII.match
        _md5 = md5
        for pdf in batches:
            ids: list[int] = []
            mins: list = []
            for did, text in zip(pdf["doc_id"].tolist(),
                                 pdf["__text"].tolist()):
                text = text or ""
                if is_ascii(text):
                    # byte-translate fast path: token-for-token equal to
                    # TOKEN_RE over lower(text) for ASCII input
                    # (analysis/tokenizer.py), ~4x faster than findall
                    toks = _ascii_tokens_bytes(text)
                else:
                    toks = [t.encode() for t in
                            tok_re.findall(text.lower())]
                if len(toks) < k:
                    continue
                sh = {b" ".join(toks[i:i + k])
                      for i in range(len(toks) - k + 1)}
                buf = b"".join(
                    b"".join(_md5(p + s).digest() for p in prefixes)
                    for s in sh)
                arr = np.frombuffer(buf, dtype=">u4") \
                    .reshape(-1, n_digests * 4)[:, :num_hashes]
                ids.append(did)
                mins.append(arr.min(axis=0))
            m = (np.asarray(mins, dtype=np.int64) if ids
                 else np.zeros((0, num_hashes), np.int64))
            yield pd.DataFrame({
                "doc_id": np.asarray(ids, dtype=np.int64),
                **{f"mh_{i}": m[:, i] for i in range(num_hashes)}})

    src = ensure_min_parallelism(
        df.select(F.col(id_col).cast("long").alias("doc_id"),
                  F.col(text_col).alias("__text")), "doc_id")
    # merge repeated doc_ids (split across rows or Arrow batches): MIN
    # per hash over the union of their shingles — identical to the old
    # groupBy-over-shingles semantics and the SQL oracle's GROUP BY
    return (src.mapInPandas(kernel, schema=schema)
            .groupBy("doc_id")
            .agg(*[F.min(f"mh_{i}").alias(f"mh_{i}")
                   for i in range(num_hashes)]))


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
    Expressed as JVM-side bit ops (no UDF). The narrow input is hash-
    repartitioned by doc_id when under-parallel (parallel.py): both
    downstream groupBys ((doc_id, token) and (doc_id)) reuse that one
    exchange — two shuffles of the exploded token stream removed.
    """
    t = ensure_min_parallelism(
        df.select(F.col(id_col).cast("long").alias("doc_id"),
                  F.col(text_col)), "doc_id")
    t = with_tokens(t, text_col).select(
        "doc_id", F.explode("tokens").alias("token"))
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
