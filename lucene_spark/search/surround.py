"""Surround query language: the span-proximity DSL parsed onto the
intervals algebra.

Reference: queryparser/src/java/org/apache/lucene/queryparser/surround/
parser/QueryParser.jj — operators W (ordered) and N (unordered) with an
optional 2-99 distance prefix ("3W(a, b)" = within three positions,
i.e. up to two interior terms), boolean AND / OR / NOT, prefix and
infix notation for every non-unary operator, `*`/`?` truncation
(SrndPrefixQuery / SrndTruncQuery, both with minimum-3-character
guards), quoting, `field:` prefixes, and `^boost`.

Mapping (the reference rewrites to span queries via
SpanNearClauseFactory; spans' modern replacement is the intervals
module, which is what this engine implements):

- ``dW(a, b, ...)``  -> ``MaxGaps(Ordered(...), d-1)``   (slop = d-1,
  DistanceQuery.java getSpanNearQuery)
- ``dN(a, b, ...)``  -> ``MaxGaps(Unordered(...), d-1)``
- ``OR`` inside a distance operator -> intervals ``Or`` (SpanOr)
- ``abc*``           -> ``Prefix`` leaf (term-dictionary rewrite)
- ``ab?c*``          -> term-dictionary wildcard expansion to ``Or``
- boolean AND / OR / NOT over match streams -> join / union / anti-join
  on doc_id (the reference's non-positional boolean level)

Deviations (documented): `^boost` parses but does not affect the match
stream (this surface returns matching docs, not span scores); infix
distance chains associate left pairwise (``a W b W c`` ==
``W(W(a,b), c)``); multi-field ``(f1 f2):q`` is not offered — one
`field:` prefix per query.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

__all__ = ["parse_surround", "surround_search", "SurroundParseError"]

MINIMUM_PREFIX_LENGTH = 3    # QueryParser.jj MINIMUM_PREFIX_LENGTH
MINIMUM_CHARS_IN_TRUNC = 3   # QueryParser.jj MINIMUM_CHARS_IN_TRUNC


class SurroundParseError(ValueError):
    pass


@dataclass(frozen=True)
class STerm:
    text: str


@dataclass(frozen=True)
class SPrefix:
    prefix: str


@dataclass(frozen=True)
class STrunc:
    pattern: str  # with * / ? wildcards


@dataclass(frozen=True)
class SOr:
    ops: tuple


@dataclass(frozen=True)
class SAnd:
    ops: tuple


@dataclass(frozen=True)
class SNot:
    include: object
    exclude: object


@dataclass(frozen=True)
class SDist:
    dist: int
    ordered: bool
    ops: tuple


@dataclass(frozen=True)
class SField:
    field: str
    query: object


_TOK_RE = re.compile(r"""
    (?P<ws>\s+)
  | (?P<lp>\() | (?P<rp>\)) | (?P<comma>,) | (?P<colon>:)
  | (?P<boost>\^[0-9]+(\.[0-9]+)?)
  | (?P<quoted>"[^"]*")
  | (?P<word>[^\s(),:^"]+)
""", re.VERBOSE)


def _tokenize(src: str) -> list:
    out, pos = [], 0
    while pos < len(src):
        m = _TOK_RE.match(src, pos)
        if m is None:
            raise SurroundParseError(
                f"unexpected character {src[pos]!r} at {pos}")
        pos = m.end()
        if m.lastgroup != "ws":
            out.append((m.lastgroup, m.group()))
    out.append(("eof", ""))
    return out


# distance prefix 2..99: [2-9] alone misses 10-19 ("10W" must parse
# as distance 10, not lex as a term)
_DIST_RE = re.compile(r"^([2-9]|[1-9][0-9])?([WwNn])$")


def _dist_op(word: str):
    """-> (distance, ordered) for W/N operator words, else None."""
    m = _DIST_RE.match(word)
    if not m:
        return None
    d = int(m.group(1)) if m.group(1) else 1
    return d, m.group(2) in "Ww"


class _P:
    def __init__(self, toks: list) -> None:
        self.toks = toks
        self.i = 0

    def peek(self):
        return self.toks[self.i]

    def take(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def parse(self):
        # optional single `field:` prefix (FieldsQuery)
        field = None
        if (self.peek()[0] == "word"
                and self.toks[self.i + 1][0] == "colon"):
            field = self.take()[1]
            self.take()
        q = self.or_query()
        if self.peek()[0] != "eof":
            raise SurroundParseError(
                f"unexpected trailing input {self.peek()[1]!r}")
        return SField(field, q) if field else q

    def _is_kw(self, kw: str) -> bool:
        k, v = self.peek()
        return k == "word" and v.upper() == kw

    def or_query(self):
        parts = [self.and_query()]
        while self._is_kw("OR"):
            self.take()
            parts.append(self.and_query())
        return parts[0] if len(parts) == 1 else SOr(tuple(parts))

    def and_query(self):
        parts = [self.not_query()]
        while self._is_kw("AND"):
            self.take()
            parts.append(self.not_query())
        return parts[0] if len(parts) == 1 else SAnd(tuple(parts))

    def not_query(self):
        q = self.n_query()
        while self._is_kw("NOT"):
            self.take()
            q = SNot(q, self.n_query())
        return q

    def _infix_dist(self, sub, want_ordered: bool):
        q = sub()
        while True:
            k, v = self.peek()
            op = _dist_op(v) if k == "word" else None
            if op is None or op[1] != want_ordered:
                return q
            # operator word only when not a term position: an infix
            # W/N must be followed by an operand
            self.take()
            q = SDist(op[0], want_ordered, (q, sub()))

    def n_query(self):
        return self._infix_dist(self.w_query, want_ordered=False)

    def w_query(self):
        return self._infix_dist(self.primary, want_ordered=True)

    def primary(self):
        k, v = self.take()
        if k == "lp":
            q = self.or_query()
            if self.take()[0] != "rp":
                raise SurroundParseError("expected ')'")
            return self._boost(q)
        if k == "quoted":
            # a QUOTED token is a LITERAL SrndTermQuery (the reference
            # grammar): * and ? inside quotes are plain characters
            return self._boost(STerm(v[1:-1]))
        if k != "word":
            raise SurroundParseError(f"unexpected token {v!r}")
        up = v.upper()
        op = _dist_op(v)
        if self.peek()[0] == "lp" and (up in ("OR", "AND") or op):
            self.take()
            args = [self.or_query()]
            while self.peek()[0] == "comma":
                self.take()
                args.append(self.or_query())
            if self.take()[0] != "rp":
                raise SurroundParseError("expected ')'")
            if len(args) < 2:
                raise SurroundParseError(
                    f"operator {v} needs at least two operands")
            if up == "OR":
                return self._boost(SOr(tuple(args)))
            if up == "AND":
                return self._boost(SAnd(tuple(args)))
            return self._boost(SDist(op[0], op[1], tuple(args)))
        if up in ("OR", "AND", "NOT"):
            # reserved operator words can't stand as operands (NOT is
            # infix-only: `a NOT b`); quote to search them literally
            raise SurroundParseError(
                f"operator {v!r} in operand position (NOT is infix: "
                f"'a NOT b'; quote \"{v.lower()}\" to search the word)")
        return self._boost(self._term(v))

    def _boost(self, q):
        if self.peek()[0] == "boost":  # parsed, ignored (documented)
            self.take()
        return q

    @staticmethod
    def _term(v: str):
        if v.endswith("*") and "?" not in v and "*" not in v[:-1]:
            pre = v[:-1]
            if len(pre) < MINIMUM_PREFIX_LENGTH:
                raise SurroundParseError(
                    f"prefix query requires {MINIMUM_PREFIX_LENGTH}+ "
                    f"characters: {v!r}")
            return SPrefix(pre)
        if "*" in v or "?" in v:
            if len(re.sub(r"[*?]", "", v)) < MINIMUM_CHARS_IN_TRUNC:
                raise SurroundParseError(
                    f"too unrestrictive truncation: {v!r}")
            return STrunc(v)
        return STerm(v)


def parse_surround(src: str):
    """Parse a surround query string -> AST (SrndQuery analog)."""
    if not src or not src.strip():
        raise SurroundParseError("empty query")
    return _P(_tokenize(src)).parse()


# ---------------------------------------------------------------------------
# evaluation
# ---------------------------------------------------------------------------

def _positional(q) -> bool:
    if isinstance(q, (STerm, SPrefix, STrunc, SDist)):
        return True
    if isinstance(q, SOr):
        return all(_positional(c) for c in q.ops)
    return False


def _to_intervals(q, expand, max_expansions: int = 1024):
    from .intervals import MaxGaps, Or, Ordered, Prefix, Term, Unordered
    if isinstance(q, STerm):
        return Term(q.text)
    if isinstance(q, SPrefix):
        # forward the caller's cap — the intervals default (128) would
        # silently under-expand relative to truncation queries
        return Prefix(q.prefix, max_expansions=max_expansions)
    if isinstance(q, STrunc):
        terms = expand(q.pattern)
        if not terms:
            return None  # matches nothing
        return Or(tuple(Term(t) for t in terms))
    if isinstance(q, SOr):
        subs = [_to_intervals(c, expand, max_expansions)
                for c in q.ops]
        subs = [s for s in subs if s is not None]
        if not subs:
            return None
        return subs[0] if len(subs) == 1 else Or(tuple(subs))
    if isinstance(q, SDist):
        subs = []
        for c in q.ops:
            if not _positional(c):
                raise SurroundParseError(
                    "AND / NOT not allowed inside a distance operator "
                    "(DistanceSubQuery.distanceSubQueryNotAllowed)")
            s = _to_intervals(c, expand, max_expansions)
            if s is None:
                return None
            subs.append(s)
        inner = Ordered(tuple(subs)) if q.ordered else Unordered(tuple(subs))
        # distance d -> slop d-1 even at d=1: W(a, b) means ADJACENT
        # (SpanNearQuery slop 0), so the MaxGaps wrapper always applies
        return MaxGaps(inner, q.dist - 1)
    raise AssertionError(type(q).__name__)


def surround_search(searcher, query: str, field: str = "text",
                    max_expansions: int = 1024):
    """Parse + evaluate a surround query -> DataFrame(doc_id) of
    matching docs. Positional subtrees run through the intervals
    engine (one pushed-down postings scan each); the boolean level
    combines match streams with join / union / anti-join
    (max_expansions caps truncation rewrites — BasicQueryFactory
    maxBasicQueries)."""
    from pyspark.sql import functions as F

    from .query import MultiTermQuery
    ast = parse_surround(query)
    if isinstance(ast, SField):
        field, ast = ast.field, ast.query

    def expand(pattern: str) -> list:
        return searcher.expand_terms(MultiTermQuery(
            "wildcard", pattern, field, max_expansions=max_expansions))

    def empty():
        return searcher.spark.createDataFrame([], "doc_id bigint")

    def run(q):
        if _positional(q):
            src = _to_intervals(q, expand, max_expansions)
            if src is None:
                return empty()
            return searcher.interval_search(src, field=field) \
                .select("doc_id")
        if isinstance(q, SAnd):
            out = run(q.ops[0])
            for c in q.ops[1:]:
                out = out.join(run(c), "doc_id", "inner")
            return out
        if isinstance(q, SOr):
            out = run(q.ops[0])
            for c in q.ops[1:]:
                out = out.unionByName(run(c))
            return out.distinct()
        if isinstance(q, SNot):
            return run(q.include).join(run(q.exclude), "doc_id",
                                       "left_anti")
        raise AssertionError(type(q).__name__)

    return run(ast).select(F.col("doc_id").cast("long")).distinct()
