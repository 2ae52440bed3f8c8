"""BM25 formula + norm encode correctness vs hand-computed reference values
(BM25CorrectnessTest analogue). All constants from search/BM25Similarity.h."""

import math

import numpy as np

from diagon_spark.index.norms import decode_norm_to_length, encode_norm
from diagon_spark.search import bm25


def test_norm_encode_reference_values():
    # Lucene104NormsWriter.cpp:30-49: trunc(127/sqrt(len)), empty -> 127
    assert encode_norm(np.array([0]))[0] == 127
    assert encode_norm(np.array([1]))[0] == 127
    assert encode_norm(np.array([4]))[0] == 63      # 127/2 = 63.5 -> trunc
    assert encode_norm(np.array([100]))[0] == 12    # 12.7 -> 12
    assert encode_norm(np.array([16129]))[0] == 1   # 127/127 = 1
    assert encode_norm(np.array([20000]))[0] == 0   # < 1 -> 0


def test_norm_decode_special_cases():
    # BM25Similarity.h:140-149: 0 and 127 decode to length 1.0
    assert decode_norm_to_length(np.array([0]))[0] == 1.0
    assert decode_norm_to_length(np.array([127]))[0] == 1.0
    got = decode_norm_to_length(np.array([12]))[0]
    want = np.float32(127.0 / np.float32(12.0)) ** 2
    assert got == np.float32(want)


def test_idf_float32():
    # idf = ln(1 + (N - df + 0.5)/(df + 0.5)) in float32
    got = bm25.idf(10, 1000)
    want = np.float32(math.log(np.float32(1.0) + (np.float32(1000) - np.float32(10)
                      + np.float32(0.5)) / (np.float32(10) + np.float32(0.5))))
    assert got == want
    assert got.dtype == np.float32


def test_score_no_k1_plus_1_numerator():
    # score = idf * tf / (tf + k) — NOT idf * tf*(k1+1)/(tf+k)
    sc = bm25.sim_scorer(doc_freq=5, doc_count=100, sum_total_term_freq=5000)
    tf, norm = 3.0, 20  # len = (127/20)^2
    got = sc.score(np.array([tf]), np.array([norm]))[0]
    length = np.float32(127.0 / np.float32(20.0)) ** 2
    inv_avg = np.float32(1.0) / np.float32(np.float32(5000) / np.float32(100))
    k = np.float32(1.2) * (np.float32(1.0) - np.float32(0.75)
                           + np.float32(0.75) * length * inv_avg)
    want = sc.idf_boost * np.float32(tf) / (np.float32(tf) + k)
    assert got == np.float32(want)


def test_avg_len_fallback():
    assert bm25.avg_field_length(0, 100) == np.float32(50.0)
    assert bm25.avg_field_length(100, 0) == np.float32(50.0)


def test_collection_fallbacks():
    # TermQuery.cpp:213-223
    assert bm25.collection_stats_with_fallbacks(100, 0) == (100, 1000)
    assert bm25.collection_stats_with_fallbacks(100, 777) == (100, 777)


def test_max_score_dominates():
    # block upper bound >= every in-block score
    sc = bm25.sim_scorer(20, 1000, 60000)
    rng = np.random.RandomState(0)
    tfs = rng.randint(1, 30, 200)
    norms = rng.randint(1, 128, 200)
    scores = sc.score(tfs, norms)
    ub = sc.max_score(np.array([tfs.max()]), np.array([norms.max()]))[0]
    assert (scores <= ub + 1e-6).all()
