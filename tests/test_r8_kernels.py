"""Round-8 kernel edge cases: the Arrow restatements of minhash and
cosine must preserve the old expression pipelines' semantics on inputs
the fixtures don't contain — short/empty docs, repeated doc_ids,
null/ragged embeddings."""

import os
import sys

import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def test_shingles_short_docs_no_crash_no_rows(spark):
    from diagon_spark.pipelines.dedup import shingles
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["", "one", "one two", "one two three four"]}))
    rows = shingles(df, k=3).collect()
    # only doc 4 has >= 3 tokens -> 2 shingles; short docs emit nothing
    assert sorted((r.doc_id, r.shingle) for r in rows) == [
        (4, "one two three"), (4, "two three four")]


def test_minhash_short_docs_skipped(spark):
    from diagon_spark.pipelines.dedup import minhash_signatures
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2], "text": ["too short", "alpha beta gamma delta"]}))
    rows = minhash_signatures(df, k=3, num_hashes=8).collect()
    assert [r.doc_id for r in rows] == [2]


def test_minhash_repeated_doc_id_merges(spark):
    from diagon_spark.pipelines.dedup import minhash_signatures
    split = spark.createDataFrame(pd.DataFrame({
        "doc_id": [7, 7],
        "text": ["alpha beta gamma delta", "epsilon zeta eta theta"]}))
    merged = spark.createDataFrame(pd.DataFrame({
        "doc_id": [7, 7],
        "text": ["alpha beta gamma delta epsilon zeta eta theta",
                 "alpha beta gamma delta"]}))
    s1 = {r.doc_id: tuple(r)[1:] for r in
          minhash_signatures(split, k=3, num_hashes=8).collect()}
    assert len(s1) == 1  # one row per doc_id, min over the union
    # elementwise: each mh_i of the split form is the min of the two
    # rows' independent signatures
    one = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1], "text": ["alpha beta gamma delta"]}))
    two = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1], "text": ["epsilon zeta eta theta"]}))
    a = tuple(minhash_signatures(one, k=3, num_hashes=8)
              .collect()[0])[1:]
    b = tuple(minhash_signatures(two, k=3, num_hashes=8)
              .collect()[0])[1:]
    assert s1[7] == tuple(min(x, y) for x, y in zip(a, b))
    del merged  # merged-text variant has extra cross-boundary shingles


def test_cosine_null_and_ragged_rows_are_null(spark):
    from diagon_spark.pipelines.similarity import cosine_topk
    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, None), (3, [3.0, 4.0]), (4, [1.0])],
        "vec_id long, embedding array<float>")
    rows = cosine_topk(df, [1.0, 1.0], k=10).collect()
    got = {r.vec_id: r.cosine for r in rows}
    assert got[2] is None and got[4] is None
    assert got[1] is not None and got[3] is not None
    # nulls sort last under desc
    assert [r.vec_id for r in rows[:2]] == sorted(
        [1, 3], key=lambda v: (-got[v], v))
