"""Decontamination + deterministic sampling unit tests (hand-checked
oracles; the driver-level DuckDB parity is tests/test_entry_oracle.py)."""

from pyspark.sql import functions as F

from diagon_spark.pipelines import decontam


def test_decontaminate_counts_and_zero_fill(spark):
    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "pack my box with five dozen liquor jugs"),
         (3, "quick brown fox stew recipe with a twist"),
         (4, "completely unrelated text about spark plans")],
        "doc_id long, text string")
    bench = spark.createDataFrame(
        [(100, "a quick brown fox jumps here")], "doc_id long, text string")
    out = {r.doc_id: (r.n_hits, r.contaminated)
           for r in decontam.decontaminate(corpus, bench, n=3).collect()}
    # bench 3-grams: {a quick brown, quick brown fox, brown fox jumps,
    #                 fox jumps here}
    assert out[1] == (2, 1)   # quick brown fox, brown fox jumps
    assert out[3] == (1, 1)   # quick brown fox
    assert out[2] == (0, 0)
    assert out[4] == (0, 0)
    assert len(out) == 4      # every input doc exactly once


def test_decontaminate_min_hits_threshold(spark):
    corpus = spark.createDataFrame(
        [(1, "one two three four five"), (2, "one two three nine ten")],
        "doc_id long, text string")
    bench = spark.createDataFrame(
        [(9, "one two three four")], "doc_id long, text string")
    out = {r.doc_id: r.contaminated
           for r in decontam.decontaminate(corpus, bench, n=3,
                                           min_hits=2).collect()}
    assert out[1] == 1  # shares 2 trigrams
    assert out[2] == 0  # shares only 1


def test_sample_hash_deterministic_and_proportional(spark):
    df = spark.range(20_000).select(F.col("id").alias("doc_id"))
    a = {r.doc_id for r in decontam.sample_hash(df, 0.25).collect()}
    b = {r.doc_id for r in decontam.sample_hash(df, 0.25).collect()}
    assert a == b  # content-hash draw: identical across runs
    assert abs(len(a) / 20_000 - 0.25) < 0.02
    # a different salt draws a (mostly) different subset
    c = {r.doc_id for r in decontam.sample_hash(df, 0.25, salt="s1").collect()}
    assert c != a
    # supersampling: fraction=1 keeps everything, 0 keeps nothing
    assert decontam.sample_hash(df, 1.0).count() == 20_000
    assert decontam.sample_hash(df, 0.0).count() == 0


def test_sample_stratified_respects_fractions(spark):
    df = spark.range(30_000).select(
        F.col("id").alias("doc_id"),
        F.element_at(F.array(F.lit("en"), F.lit("de"), F.lit("zh")),
                     (F.col("id") % 3 + 1).cast("int")).alias("lang"))
    kept = (decontam.sample_stratified(
                df, {"en": 0.5, "zh": 1.0}, default=0.0)
            .groupBy("lang").count().collect())
    by_lang = {r.lang: r["count"] for r in kept}
    assert by_lang.get("de", 0) == 0          # default 0 drops the stratum
    assert by_lang["zh"] == 10_000            # fraction 1.0 keeps all
    assert abs(by_lang["en"] / 10_000 - 0.5) < 0.03


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_sampling_plan_has_no_shuffle(spark):
    """sample_stratified is one scan + filter: any Exchange in the plan
    would mean the 100-TB form shuffles the whole corpus for nothing."""
    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), F.lit("en").alias("lang"))
    plan = _plan(decontam.sample_stratified(df, {"en": 0.5}))
    assert "Exchange" not in plan, plan[:800]


def test_decontaminate_bench_side_is_broadcast(spark):
    """The eval-set shingles must reach the corpus join as a broadcast —
    a shuffled (sort-merge) join here would shuffle the full corpus
    shingle stream against a benchmark-sized table."""
    corpus = spark.createDataFrame(
        [(i, f"w{i} w{i+1} w{i+2} w{i+3}") for i in range(50)],
        "doc_id long, text string")
    bench = corpus.limit(3)
    plan = _plan(decontam.decontaminate(corpus, bench, n=3))
    assert "BroadcastHashJoin" in plan, plan[:1200]
