"""BM25 scoring — float32 arithmetic matching the reference bit-for-bit.

Reference: search/BM25Similarity.h. Constants and evaluation order are
copied exactly so top-k scores are rank-identical:

* idf = log(1.0f + (docCount - docFreq + 0.5f) / (docFreq + 0.5f))
  computed in float32 (BM25Similarity.h:87-89).
* SimScorer precomputes inv_avgLen = 1.0f / avgFieldLength and evaluates
  k = k1*(1 - b + b*fieldLength*inv_avgLen);  score = idf*freq/(freq+k)
  — Lucene 8+ style, NO (k1+1) numerator (BM25Similarity.h:156).
* fieldLength decoded from the norm byte (see index/norms.py).
* avgFieldLength = sumTotalTermFreq / docCount (float32 division of the
  int64 stats), fallback 50.0 when stats are missing
  (BM25Similarity.h:196-202).
* Collection docCount := maxDoc (TermQuery.cpp:220-223); missing-stats
  fallbacks sumTotalTermFreq := maxDoc*10, and for an absent term
  docFreq := maxDoc/10 (TermQuery.cpp:213-214, 250-256).
* k1 = 1.2, b = 0.75 (BM25Similarity.h:69-71).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from diagon_spark.index.norms import decode_norm_to_length

K1 = np.float32(1.2)
B = np.float32(0.75)
DEFAULT_AVG_LEN = np.float32(50.0)


def idf(doc_freq: int, doc_count: int) -> np.float32:
    """float32 idf — BM25Similarity.h:87-89."""
    df = np.float32(doc_freq)
    dc = np.float32(doc_count)
    return np.float32(np.log(np.float32(1.0) + (dc - df + np.float32(0.5)) / (df + np.float32(0.5))))


def avg_field_length(sum_total_term_freq: int, doc_count: int) -> np.float32:
    """float32 average field length with the 50.0 fallback."""
    if doc_count > 0 and sum_total_term_freq > 0:
        return np.float32(np.float32(sum_total_term_freq) / np.float32(doc_count))
    return DEFAULT_AVG_LEN


def collection_stats_with_fallbacks(max_doc: int, sum_total_term_freq: int) -> tuple[int, int]:
    """(docCount, sumTotalTermFreq) after TermQuery.cpp:213-223 fallbacks."""
    sttf = sum_total_term_freq if sum_total_term_freq > 0 else max_doc * 10
    return max_doc, sttf


@dataclass(frozen=True)
class SimScorer:
    """Per-term scorer (idf already multiplied by boost)."""

    idf_boost: np.float32
    avg_len: np.float32

    def score(self, freqs: np.ndarray, norms: np.ndarray) -> np.ndarray:
        """Vectorized float32 score for arrays of (tf, norm byte)."""
        freq = np.asarray(freqs).astype(np.float32)
        field_len = decode_norm_to_length(norms)
        inv_avg = np.float32(1.0) / self.avg_len
        k = K1 * (np.float32(1.0) - B + B * field_len * inv_avg)
        return (self.idf_boost * freq / (freq + k)).astype(np.float32)

    def max_score(self, max_tf: np.ndarray, max_norm: np.ndarray) -> np.ndarray:
        """Block upper bound for Block-Max WAND.

        BM25 (without (k1+1)) is monotonically increasing in tf and in the
        decoded norm-length's *inverse* — the max norm byte corresponds to
        the shortest doc in the block, hence the smallest k, hence the
        largest score (Lucene104PostingsReader.h:176-224 impact logic).
        """
        return self.score(np.asarray(max_tf), np.asarray(max_norm))


def sim_scorer(doc_freq: int, doc_count: int, sum_total_term_freq: int,
               boost: float = 1.0) -> SimScorer:
    """Build a SimScorer from raw stats (applies avg-len fallback only;
    callers apply the TermQuery-level stat fallbacks)."""
    return SimScorer(
        idf_boost=np.float32(idf(doc_freq, doc_count) * np.float32(boost)),
        avg_len=avg_field_length(sum_total_term_freq, doc_count),
    )
