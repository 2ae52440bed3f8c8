"""Deterministic synthetic code corpus (FIXTURES.md §1).

Matches BASELINE.json input_hint exactly:
(repo:string, path:string, commit:string, lang:string, content:string).

Generation is counter-based (splitmix64 of (row, position)) so any row can
be produced independently on any executor — no driver-side data, no RNG
state, fully reproducible at any scale. Content is drawn from a Zipf
vocabulary of ~2000 code tokens; heavy hitters ("int", "return") land in
most docs, exercising the salting/chunking path. ~1% of rows carry a
non-ASCII identifier to exercise the Unicode tokenizer fallback.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

SEED = 42
_LANGS = ["c", "cpp", "py", "java", "go", "rs"]
_EXT = {"c": "c", "cpp": "cc", "py": "py", "java": "java", "go": "go", "rs": "rs"}

_KEYWORDS = ["int", "return", "if", "for", "while", "const", "static", "void",
             "class", "def", "import", "fn", "let", "pub"]
_VOCAB_SIZE = 2000
_ZIPF_S = 1.1

_SEPS = [" ", " ", " ", " ", "\n", "; ", " { ", " } ", "(", ") "]


def _vocab() -> list[str]:
    v = list(_KEYWORDS)
    k = 0
    while len(v) < _VOCAB_SIZE:
        if k % 3 == 0:
            v.append(f"var_{k}")
        elif k % 3 == 1:
            v.append(f"fn_{k}")
        else:
            v.append(str(1000 + k))
        k += 1
    return v


VOCAB = _vocab()

# Zipf CDF over vocabulary ranks (rank 0 = most frequent)
_weights = 1.0 / np.power(np.arange(1, _VOCAB_SIZE + 1, dtype=np.float64), _ZIPF_S)
_CDF = np.cumsum(_weights / _weights.sum())


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    z = x
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    return z ^ (z >> np.uint64(31))


def _uniform(counter: np.ndarray) -> np.ndarray:
    """Deterministic U[0,1) from uint64 counters."""
    return (_splitmix64(counter) >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def generate_pandas(start: int, end: int) -> pd.DataFrame:
    """Generate rows [start, end) as a pandas DataFrame (vectorized)."""
    idx = np.arange(start, end, dtype=np.int64)
    u = idx.astype(np.uint64)
    n_tokens = 20 + (_splitmix64(u * np.uint64(2654435761) + np.uint64(SEED)) % np.uint64(381)).astype(np.int64)

    contents = []
    with np.errstate(all="ignore"):
        for i, n in zip(idx, n_tokens):
            counters = (np.uint64(i) << np.uint64(20)) + np.arange(n, dtype=np.uint64) + np.uint64(SEED)
            ranks = np.searchsorted(_CDF, _uniform(counters), side="right")
            toks = [VOCAB[r] for r in ranks]
            seps = [_SEPS[int(s)] for s in
                    _splitmix64(counters + np.uint64(7777)) % np.uint64(len(_SEPS))]
            parts = []
            for t, s in zip(toks, seps):
                parts.append(t)
                parts.append(s)
            if i % 97 == 0:
                parts.append(f"café_{i % 50}")
            contents.append("".join(parts))

    lang = [_LANGS[i % len(_LANGS)] for i in idx]
    return pd.DataFrame({
        "repo": [f"org{i % 7}/repo{i % 23}" for i in idx],
        "path": [f"src/dir{i % 11}/file_{i}.{_EXT[_LANGS[i % len(_LANGS)]]}" for i in idx],
        "commit": [hashlib.sha1(f"commit-{i}".encode()).hexdigest() for i in idx],
        "lang": lang,
        "content": contents,
    })


def corpus_df(spark, n_rows: int, partitions: int | None = None,
              start: int = 0):
    """Distributed deterministic corpus as a Spark DataFrame; `start`
    offsets the id space so appended batches get fresh documents."""
    # ship BEFORE defining the UDF: pyspark snapshots the registered
    # py-files into the python command at UDF creation time, so a later
    # addPyFile can't fix an already-defined mapInPandas
    from diagon_spark._ship import ensure_shipped
    ensure_shipped(spark)
    parts = partitions or max(1, min(64, n_rows // 2000 or 1))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from diagon_spark._runtime import worker_init
        worker_init()
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            if len(ids):
                # ids within a mapInPandas batch are contiguous per range partition
                yield generate_pandas(int(ids.min()), int(ids.max()) + 1)

    base = spark.range(start, start + n_rows, numPartitions=parts)
    schema = "repo string, path string, commit string, lang string, content string"
    return base.mapInPandas(gen, schema=schema)
