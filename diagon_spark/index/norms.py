"""Norm (document-length) encoding — exact reference semantics.

Reference: codecs/lucene104/Lucene104NormsWriter.cpp:30-49 (encode),
search/BM25Similarity.h:140-149 + SimScorer inline decode (decode).

Encode:  length <= 0           -> 127
         else                  -> int8(trunc(127.0 / sqrt(double(length))))
                                   clamped to [-128, 127]
         (C++ `static_cast<int8_t>` truncates toward zero; lengths above
          127^2 = 16129 encode to 0.)

Decode:  norm in {0, 127}      -> field length 1.0f
         else                  -> (127.0f / float(norm))^2 in float32
"""

from __future__ import annotations

import numpy as np


def encode_norm(lengths: np.ndarray) -> np.ndarray:
    """Vectorized norm encode: int lengths -> uint8 norm bytes (0..127)."""
    lengths = np.asarray(lengths, dtype=np.int64)
    enc = np.where(lengths <= 0, 127.0, 127.0 / np.sqrt(np.maximum(lengths, 1).astype(np.float64)))
    enc = np.clip(enc, -128.0, 127.0)
    return np.trunc(enc).astype(np.int64).astype(np.uint8)


def decode_norm_to_length(norms: np.ndarray) -> np.ndarray:
    """Vectorized norm decode: uint8 norm -> float32 field length."""
    norms = np.asarray(norms)
    nf = norms.astype(np.float32)
    special = (norms == 0) | (norms == 127)
    with np.errstate(divide="ignore"):
        inv = np.float32(127.0) / np.where(special, np.float32(1.0), nf)
    length = (inv * inv).astype(np.float32)
    return np.where(special, np.float32(1.0), length).astype(np.float32)
