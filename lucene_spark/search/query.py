"""Query AST + parser.

Mirrors the reference Query tree (core:search/Query.java:45,
BooleanQuery.java:125-147, PhraseQuery.java:71-143) reduced to the shapes
of the reference query set (FIXTURES.md §2): term, AND (all MUST),
OR (all SHOULD), exact phrase. The string parser covers the classic
QueryParser subset ``a b`` (OR), ``+a +b`` / ``a AND b`` (MUST),
``"a b"`` (phrase) (queryparser/.../classic/QueryParser.java:82).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dc_field


@dataclass(frozen=True)
class TermQuery:
    term: str
    field: str = "text"
    boost: float = 1.0

    @property
    def terms(self):
        return [self.term]


@dataclass(frozen=True)
class AndQuery:
    terms_: tuple
    field: str = "text"
    boost: float = 1.0

    @property
    def terms(self):
        return list(self.terms_)


@dataclass(frozen=True)
class OrQuery:
    terms_: tuple
    field: str = "text"
    boost: float = 1.0

    @property
    def terms(self):
        return list(self.terms_)


@dataclass(frozen=True)
class PhraseQuery:
    terms_: tuple
    field: str = "text"
    slop: int = 0
    boost: float = 1.0

    @property
    def terms(self):
        return list(self.terms_)


@dataclass(frozen=True)
class SynonymQuery:
    """All terms scored as one pseudo-term: per-doc tf = Σ member tfs,
    blended stats df = max(member df), ttf = Σ member ttf
    (core:search/SynonymQuery.java:52,387,588)."""
    terms_: tuple
    field: str = "text"
    boost: float = 1.0

    @property
    def terms(self):
        return list(self.terms_)


@dataclass(frozen=True)
class DisMaxQuery:
    """Score = max(clause scores) + tie_breaker · Σ(other clause scores)
    (core:search/DisjunctionMaxQuery.java:51-63). Clauses here are terms."""
    terms_: tuple
    field: str = "text"
    tie_breaker: float = 0.0
    boost: float = 1.0

    @property
    def terms(self):
        return list(self.terms_)


@dataclass(frozen=True)
class BooleanQuery:
    """MUST / SHOULD / FILTER / MUST_NOT with minimumNumberShouldMatch
    (core:search/BooleanQuery.java:125-147, BooleanClause.java:25-60).
    Clauses are single terms (nested boolean = v2)."""
    must: tuple = ()
    should: tuple = ()
    must_not: tuple = ()
    filter_: tuple = ()
    field: str = "text"
    min_should_match: int = 0
    boost: float = 1.0

    @property
    def terms(self):
        return list(self.must) + list(self.should) + list(self.must_not) + list(self.filter_)


@dataclass(frozen=True)
class MultiTermQuery:
    """Term-dictionary expansion queries: prefix / wildcard / regexp /
    fuzzy / range / set (core:search/MultiTermQuery.java:86,103,
    PrefixQuery, WildcardQuery, RegexpQuery, FuzzyQuery, TermRangeQuery,
    TermInSetQuery). ``rewrite``:

      'scoring_boolean'  -> expand to an OR over matched terms, BM25
                            scored (SCORING_BOOLEAN_QUERY_REWRITE)
      'constant_score'   -> matching docs score boost (CONSTANT_SCORE
                            rewrite family)

    kind ∈ {prefix, wildcard, regexp, fuzzy, range, set}; pattern is the
    prefix/wildcard/regex/fuzzy base, or (lower, upper) for range, or a
    tuple of terms for set. max_expansions mirrors Lucene's clause cap.
    """
    kind: str
    pattern: object
    field: str = "text"
    rewrite: str = "scoring_boolean"
    max_expansions: int = 1024
    max_edits: int = 1
    boost: float = 1.0

    @property
    def terms(self):
        return []  # resolved at search time against the term dictionary


def from_dict(q: dict):
    """Build a query from the FIXTURES.md §2 JSON shape."""
    t = q["type"]
    field = q.get("field", "text")
    terms = tuple(q.get("terms", ()))
    if t == "term":
        return TermQuery(terms[0], field)
    if t == "and":
        return AndQuery(terms, field)
    if t == "or":
        return OrQuery(terms, field)
    if t == "phrase":
        return PhraseQuery(terms, field, slop=q.get("slop", 0))
    if t == "synonym":
        return SynonymQuery(terms, field)
    if t == "dismax":
        return DisMaxQuery(terms, field, tie_breaker=q.get("tie_breaker", 0.0))
    if t == "boolean":
        return BooleanQuery(
            must=tuple(q.get("must", ())), should=tuple(q.get("should", ())),
            must_not=tuple(q.get("must_not", ())),
            filter_=tuple(q.get("filter", ())), field=field,
            min_should_match=q.get("min_should_match", 0))
    raise ValueError(f"unknown query type: {t}")


_PHRASE_RE = re.compile(r'"([^"]*)"')


def parse_query(s: str, field: str = "text"):
    """Tiny classic-QueryParser subset: phrases in quotes; AND / '+' for
    conjunction; bare terms are OR'd (default OR operator)."""
    s = s.strip()
    m = _PHRASE_RE.fullmatch(s)
    if m:
        return PhraseQuery(tuple(m.group(1).lower().split()), field)
    toks = s.split()
    if "AND" in toks:
        terms = tuple(t.lower() for t in toks if t != "AND")
        return AndQuery(terms, field)
    if all(t.startswith("+") for t in toks) and len(toks) > 1:
        return AndQuery(tuple(t[1:].lower() for t in toks), field)
    toks = [t.lstrip("+").lower() for t in toks]
    if len(toks) == 1:
        return TermQuery(toks[0], field)
    return OrQuery(tuple(toks), field)
