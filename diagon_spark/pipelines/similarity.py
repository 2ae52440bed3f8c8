"""Similarity search over an embedding column (array<float>).

Brute-force cosine top-k as the exact baseline (JVM-side fold — no
Python), and a random-hyperplane LSH-bucketed variant as the scale path
(probe only the query's bucket ring instead of all N vectors). At
100 TB the LSH variant turns a full scan + global sort into a bucket
lookup; the bucket table would be written bucketed-by(signature).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import LongType


def _dot(a_col, b_arr: list[float]):
    """Sequential left-fold dot product in DOUBLE (order-stable, so an
    ANSI-SQL oracle reproduces it bit-for-bit)."""
    b = F.array(*[F.lit(float(x)).cast("double") for x in b_arr])
    prods = F.zip_with(a_col, b, lambda x, y: x.cast("double") * y)
    return F.aggregate(prods, F.lit(0.0).cast("double"), lambda acc, x: acc + x)


def _norm(a_col):
    sq = F.transform(a_col, lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0).cast("double"),
                              lambda acc, x: acc + x))


def cosine_topk(emb: DataFrame, query_vec: list[float], k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding",
                exclude_id: int | None = None) -> DataFrame:
    """Exact brute-force cosine top-k (the correctness baseline)."""
    qnorm = float(np.sqrt(np.sum(np.asarray(query_vec, dtype=np.float64) ** 2)))
    out = emb.select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.round(_dot(F.col(vec_col), query_vec)
                / (_norm(F.col(vec_col)) * F.lit(qnorm)), 6).alias("cosine"))
    if exclude_id is not None:
        out = out.filter(F.col("vec_id") != exclude_id)
    return out.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k)


QUANT = 1 << 20  # embedding quantization for integer-exact signatures


def hyperplanes(dim: int, n_planes: int = 16, seed: int = 42) -> np.ndarray:
    """Deterministic gaussian hyperplanes for sign-LSH (float variant)."""
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim)).astype(np.float64)


def md5_planes(dim: int, n_planes: int) -> np.ndarray:
    """INTEGER hyperplane coefficients derived from md5 — deterministic
    and ANSI-SQL-reproducible: c[j][d] = md5_32('p{j}:{d}') - 2^31
    (uniform in ±2^31). With embeddings quantized to int64
    (floor(x·2^20 + 0.5)), the sign of the dot product is computed in
    EXACT integer arithmetic, so an oracle summing in any order gets the
    identical signature — no float-accumulation-order hazard."""
    import hashlib
    c = np.empty((n_planes, dim), dtype=np.int64)
    for j in range(n_planes):
        for d in range(dim):
            h = int(hashlib.md5(f"p{j}:{d}".encode()).hexdigest()[:8], 16)
            c[j, d] = h - (1 << 31)
    return c


def quantize(vecs: np.ndarray) -> np.ndarray:
    """floor(x·2^20 + 0.5) in float64 — bit-identical to SQL
    CAST(FLOOR(CAST(x AS DOUBLE) * 1048576 + 0.5) AS BIGINT)."""
    return np.floor(vecs.astype(np.float64) * QUANT + 0.5).astype(np.int64)


def lsh_signature_udf(planes: np.ndarray):
    """Arrow-batched sign-LSH signature over INTEGER planes:
    bit j = (quantize(v) · plane_j) >= 0. Max |term| = 2^20 · 2^31 · dim,
    safely inside int64 for dim <= 2^12."""

    @F.pandas_udf(LongType())
    def sig(vecs: pd.Series) -> pd.Series:
        mat = quantize(np.stack(vecs.to_numpy()))  # (batch, dim) int64
        bits = (mat @ planes.T) >= 0  # (batch, n_planes)
        weights = (1 << np.arange(planes.shape[0], dtype=np.int64))
        return pd.Series(bits.astype(np.int64) @ weights)

    return sig


def ann_lsh_topk(emb: DataFrame, query_vec: list[float], k: int = 10,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 n_planes: int = 12, max_hamming: int = 2,
                 exclude_id: int | None = None) -> DataFrame:
    """Approximate NN: probe only vectors whose LSH signature is within
    `max_hamming` bits of the query's — the IVF/LSH scale path.

    On a cluster the signature column is precomputed and the table
    bucketed by it; here it's computed inline. Signatures use integer
    md5-derived planes (md5_planes) so a SQL oracle reproduces the probe
    set exactly.
    """
    dim = len(query_vec)
    planes = md5_planes(dim, n_planes)
    sig_udf = lsh_signature_udf(planes)
    q = quantize(np.asarray(query_vec))
    q_sig = int(((q @ planes.T) >= 0).astype(np.int64)
                @ (1 << np.arange(n_planes, dtype=np.int64)))

    with_sig = emb.withColumn("lsh_sig", sig_udf(F.col(vec_col)))
    # popcount(sig XOR q_sig) <= max_hamming
    x = F.col("lsh_sig").bitwiseXOR(F.lit(q_sig))
    ham = sum((F.shiftright(x, j).bitwiseAND(1) for j in range(n_planes)),
              F.lit(0))
    probe = with_sig.filter(ham <= max_hamming)
    return cosine_topk(probe, query_vec, k, id_col, vec_col, exclude_id)
