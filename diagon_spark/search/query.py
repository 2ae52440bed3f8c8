"""Query tree — the engine's logical IR.

Mirrors the reference's composable Query objects (search/Query.h:35,
search/BooleanClause.h:20-40 Occur = MUST / SHOULD / MUST_NOT / FILTER,
search/PhraseQuery.h, search/NumericRangeQuery.h, MatchAllDocsQuery.h).
There is no SQL parser in the reference; queries are built
programmatically, and so are ours.

Queries compose arbitrarily: Boolean clauses may be Terms, Phrases,
Ranges, MatchAll, or nested Booleans (search/BooleanQuery.cpp:557
rewrite loop; exercised by tests/integration/Lucene104QueryTest.cpp).
`rewrite()` applies the reference's simplification pass before planning.

Term/Phrase carry an optional `field` (document/Field.h:24): None means
the index's default field (its first indexed field).
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
    field: str | None = None  # None -> index default field

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
    """Phrase query. The reference's PhraseQuery builder exposes a slop
    parameter (search/PhraseQuery.h:68-75) while its scorer implements
    exact matching, slop=0 (search/PhraseQuery.cpp:28-34); this builder
    accepts the same surface AND implements non-zero slop:

    * slop=0 — exact consecutive positions (scorer-identical to the
      reference and bit-identical to this repo's pre-slop behavior);
    * slop=s>0, ordered=True (default) — ordered near-match: positions
      p_0 < p_1 < ... < p_{n-1} for the terms IN ORDER with total slack
      (p_{n-1} - p_0) - (n-1) <= s. Matching is greedy
      minimal-next-position per start, which decides existence exactly
      (taking the smallest next position never hurts the final span);
      tf = number of matching start positions, scored with the same
      rarest-term-idf BM25 as exact phrases.
    * slop=s>0, ordered=False — unordered (Lucene-transposition-style)
      near-match: an assignment of one position p_i per query offset i
      matches iff max_i(p_i - i) - min_i(p_i - i) <= s over the SHIFTED
      positions p_i - i — exactly the window condition Lucene's
      SloppyPhraseMatcher enforces, so "b a" matches Phrase("a","b")
      at slop >= 2 (shifted spans -1 and +1). Offsets of the SAME
      repeated term must take distinct positions (Lucene's repeats
      rule); distinct terms may share a position (same-position
      synonyms). tf = number of distinct positions of term_0 that
      participate in at least one matching assignment — the same
      countable-start definition as the ordered mode (Lucene's
      weighted sloppyFreq Σ 1/(1+matchLength) is a scoring model this
      engine's integer-tf BM25 deliberately does not adopt; the match
      SET is Lucene's).
    """

    phrase_terms: tuple[str, ...]
    boost: float = 1.0
    field: str | None = None
    slop: int = 0
    ordered: bool = True

    def __post_init__(self):
        if self.slop < 0:
            raise ValueError(f"slop must be >= 0, got {self.slop}")

    def terms(self) -> list[str]:
        return list(self.phrase_terms)


@dataclass(frozen=True)
class Boolean(Query):
    """MUST scored+required; SHOULD scored+optional; MUST_NOT excluded;
    FILTER required non-scoring (search/BooleanQuery.h:24-28). Clauses are
    arbitrary Query trees."""

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


@dataclass(frozen=True)
class MatchNone(Query):
    """Matches nothing — rewrite() result for contradictions
    (MUST_NOT MatchAll), the MatchNoDocsQuery analogue."""


def rewrite(query: Query) -> Query:
    """Query simplification before planning — the BooleanQuery::rewrite
    analogue (search/BooleanQuery.cpp:557-575). The reference's rewrite
    ONLY rewrites children and never flattens nested booleans: a nested
    SHOULD disjunction counts as ONE clause toward the parent's
    min_should_match, and float32 scores accumulate over the ORIGINAL
    tree shape (clause-order contract, search/BooleanQuery.cpp:119-124).
    Only semantics- AND score-preserving simplifications happen here:

    * MUST_NOT MatchAll rewrites the whole Boolean to MatchNone;
    * a MUST/FILTER MatchNone clause rewrites the Boolean to MatchNone;
    * MatchNone dropped from SHOULD / MUST_NOT (it never matches; the
      per-doc minShouldMatch count is unaffected because a MatchNone
      clause can never contribute a match);
    * min_should_match > |SHOULD| rewrites to MatchNone (the
      BooleanWeight guard: the requirement is unsatisfiable);
    * FILTER MatchAll dropped ONLY when another required (MUST/FILTER)
      clause keeps the candidate set. With only SHOULD clauses — or no
      other positive clause at all — it must stay: a filter MatchAll
      makes every live doc match at score 0 (+ optional SHOULD scores),
      the BooleanWeight filter-becomes-required-scorer behavior;
    * empty Booleans (no positive clause) rewrite to MatchNone;
    * single-clause unwrap where score-identical (one MUST, or one
      SHOULD with msm<=1, or a lone FILTER MatchAll -> MatchAll(0.0)).
    """
    if not isinstance(query, Boolean):
        return query
    must = [rewrite(q) for q in query.must]
    should = [rewrite(q) for q in query.should]
    must_not = [rewrite(q) for q in query.must_not]
    filt = [rewrite(q) for q in query.filter]
    msm = query.min_should_match

    if any(isinstance(q, MatchAll) for q in must_not):
        return MatchNone()
    must_not = [q for q in must_not if not isinstance(q, MatchNone)]

    # a MUST/FILTER MatchNone clause can never match
    if any(isinstance(q, MatchNone) for q in (*must, *filt)):
        return MatchNone()
    should = [q for q in should if not isinstance(q, MatchNone)]

    # unsatisfiable minShouldMatch (BooleanWeight: optional.size() <
    # minShouldMatch -> MatchNoDocsQuery)
    if msm >= 1 and len(should) < msm:
        return MatchNone()

    # FILTER MatchAll is redundant only next to another required clause
    non_ma_filt = [q for q in filt if not isinstance(q, MatchAll)]
    if len(non_ma_filt) != len(filt):
        if must or non_ma_filt:
            filt = non_ma_filt
        else:
            filt = [*non_ma_filt, MatchAll()]  # keep ONE: required all-docs

    if not must and not should and not filt:
        return MatchNone()

    # single-clause unwrap (score-identical: a one-clause f32 sum is the
    # clause's own score)
    if len(must) == 1 and not should and not must_not and not filt:
        return must[0]
    if (len(should) == 1 and not must and not must_not and not filt
            and msm <= 1):
        return should[0]
    if (len(filt) == 1 and isinstance(filt[0], MatchAll)
            and not must and not should and not must_not):
        return MatchAll(boost=0.0)  # constant-score-all at score 0

    return Boolean(must=must, should=should, must_not=must_not,
                   filter=filt, min_should_match=msm)
