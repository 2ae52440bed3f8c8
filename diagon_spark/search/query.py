"""Query tree — the engine's logical IR.

Mirrors the reference's composable Query objects (search/Query.h:35,
search/BooleanClause.h:20-40 Occur = MUST / SHOULD / MUST_NOT / FILTER,
search/PhraseQuery.h, search/NumericRangeQuery.h, MatchAllDocsQuery.h).
There is no SQL parser in the reference; queries are built
programmatically, and so are ours.
"""

from __future__ import annotations

from dataclasses import dataclass, field


class Query:
    def terms(self) -> list[str]:
        return []


@dataclass(frozen=True)
class Term(Query):
    term: str
    boost: float = 1.0

    def terms(self) -> list[str]:
        return [self.term]


@dataclass(frozen=True)
class MatchAll(Query):
    boost: float = 1.0


@dataclass(frozen=True)
class Range(Query):
    """Inclusive numeric range over a doc-values column of the docs table,
    open bounds allowed (search/NumericRangeQuery.h:38-59 incl.
    newLowerBound/newUpperBound forms). Constant-score filter query; the
    BKD/skip-index pruning is parquet row-group stats + partition pruning
    (SURVEY.md §2.3)."""

    field: str
    lower: float | int | None = None
    upper: float | int | None = None
    boost: float = 1.0


@dataclass(frozen=True)
class Phrase(Query):
    """Exact phrase, slop=0 (PhraseQuery.cpp:28-34)."""

    phrase_terms: tuple[str, ...]
    boost: float = 1.0

    def terms(self) -> list[str]:
        return list(self.phrase_terms)


@dataclass(frozen=True)
class Boolean(Query):
    """MUST scored+required; SHOULD scored+optional; MUST_NOT excluded;
    FILTER required non-scoring (search/BooleanQuery.h:24-28)."""

    must: tuple[Query, ...] = field(default=())
    should: tuple[Query, ...] = field(default=())
    must_not: tuple[Query, ...] = field(default=())
    filter: tuple[Query, ...] = field(default=())
    min_should_match: int = 0

    def __init__(self, must=(), should=(), must_not=(), filter=(),
                 min_should_match: int = 0):
        object.__setattr__(self, "must", tuple(must))
        object.__setattr__(self, "should", tuple(should))
        object.__setattr__(self, "must_not", tuple(must_not))
        object.__setattr__(self, "filter", tuple(filter))
        object.__setattr__(self, "min_should_match", min_should_match)

    def terms(self) -> list[str]:
        out: list[str] = []
        for q in (*self.must, *self.should, *self.must_not, *self.filter):
            out.extend(q.terms())
        return out

    @property
    def is_pure_disjunction(self) -> bool:
        """WAND eligibility — BooleanQuery.cpp:534 isPureDisjunction."""
        return (not self.must and not self.must_not and not self.filter
                and all(isinstance(q, Term) for q in self.should))
