"""SimpleQueryParser — fault-tolerant human query syntax.

Semantics follow the reference parser
(queryparser/src/java/org/apache/lucene/queryparser/simple/
SimpleQueryParser.java:36-73; test model queryparser/src/test/.../
simple/TestSimpleQueryParser.java):

  ``+``        AND                     ``token1+token2``
  ``|``        OR                      ``token1|token2``
  ``-``        negates one token       ``-token0`` (double negation
                                       cancels, :214-218)
  ``"..."``    phrase                  ``"t1 t2"``; ``"t1 t2"~5`` near
  ``term*``    prefix query            (trailing ``*`` only, :395-400)
  ``term~N``   fuzzy query             (``~`` alone means ~2, :517-521)
  ``( )``      precedence grouping
  ``\\``       escapes ``+ | " ( ) \\`` inside terms and phrases

Error tolerance is part of the contract: unbalanced parentheses and
quotes degrade to literal/ignored characters instead of raising
(:279-286, :341-346); operators with no preceding token are dropped
(:192-206); syntax "errors" never throw.

The default operator is OR; precedence is right-to-left per operator
RUN — an operator CHANGE wraps the accumulated tree in a new parent
(buildQueryTree, :468-483), so ``a | b + c`` evaluates ``(a | b) + c``.

Negation wraps as ``bool(MUST_NOT=branch, SHOULD=MatchAll)``
(:452-459) — a standalone ``-term`` therefore matches every doc
WITHOUT the term, unlike the classic parser.

Multi-field ``weights`` mirror the Map<String,Float> ctor (:148-150):
each term/phrase/prefix/fuzzy expands to a SHOULD-boolean of per-field
boosted branches, simplified when only one field is given (:619-627).

Tokens run through the standard tokenizer before query construction
(the QueryBuilder analysis step); per-field analyzer chains (stemming)
apply later inside the searcher, like every other query type here.
"""

from __future__ import annotations

from .query import (BooleanQuery, MatchAllQuery, MultiTermQuery,
                    PhraseQuery, TermQuery, rewrite)

_MUST, _SHOULD = "must", "should"

# flags (SimpleQueryParser.java:101-139); default -1 = all enabled
AND_OPERATOR = 1 << 0
NOT_OPERATOR = 1 << 1
OR_OPERATOR = 1 << 2
PREFIX_OPERATOR = 1 << 3
PHRASE_OPERATOR = 1 << 4
PRECEDENCE_OPERATORS = 1 << 5
ESCAPE_OPERATOR = 1 << 6
WHITESPACE_OPERATOR = 1 << 7
FUZZY_OPERATOR = 1 << 8
NEAR_OPERATOR = 1 << 9

_WS = " \t\n\r"


class _State:
    __slots__ = ("data", "index", "length", "top", "current_op",
                 "previous_op", "not_")

    def __init__(self, data: str, start: int, length: int):
        self.data = data
        self.index = start
        self.length = length
        self.top = None
        self.current_op = None
        self.previous_op = None
        self.not_ = 0


class SimpleQueryParser:
    """parse(text) -> Query AST (or None for an empty/match-nothing
    input — MatchNoDocsQuery's analog; the searcher returns no rows
    for a None-compiling query)."""

    def __init__(self, field: str = "text", weights: dict | None = None,
                 flags: int = -1, default_operator: str = _SHOULD):
        if default_operator not in (_MUST, _SHOULD):
            raise ValueError("invalid operator: only SHOULD or MUST "
                             "are allowed")
        self.weights = dict(weights) if weights else {field: 1.0}
        self.flags = flags
        self.default_operator = default_operator

    # -- public ----------------------------------------------------------

    def parse(self, text: str):
        if text.strip() == "*":
            return MatchAllQuery(next(iter(self.weights)))
        state = _State(text, 0, len(text))
        self._parse_sub(state)
        return state.top

    # -- state machine (parseSubQuery, :177-236) ---------------------------

    def _on(self, flag: int) -> bool:
        return (self.flags & flag) != 0

    def _parse_sub(self, state: _State):
        while state.index < state.length:
            ch = state.data[state.index]
            if ch == "(" and self._on(PRECEDENCE_OPERATORS):
                self._consume_subquery(state)
            elif ch == ")" and self._on(PRECEDENCE_OPERATORS):
                state.index += 1  # extraneous, ignored
            elif ch == '"' and self._on(PHRASE_OPERATOR):
                self._consume_phrase(state)
            elif ch == "+" and self._on(AND_OPERATOR):
                if state.current_op is None and state.top is not None:
                    state.current_op = _MUST
                state.index += 1
            elif ch == "|" and self._on(OR_OPERATOR):
                if state.current_op is None and state.top is not None:
                    state.current_op = _SHOULD
                state.index += 1
            elif ch == "-" and self._on(NOT_OPERATOR):
                state.not_ += 1
                state.index += 1
                continue  # keep not_ across the loop bottom
            elif ch in _WS and self._on(WHITESPACE_OPERATOR):
                state.index += 1
            else:
                self._consume_token(state)
            state.not_ = 0

    def _consume_subquery(self, state: _State):
        start = state.index = state.index + 1
        precedence = 1
        escaped = False
        while state.index < state.length:
            if not escaped:
                c = state.data[state.index]
                if c == "\\" and self._on(ESCAPE_OPERATOR):
                    escaped = True
                    state.index += 1
                    continue
                if c == "(":
                    precedence += 1
                elif c == ")":
                    precedence -= 1
                    if precedence == 0:
                        break
            escaped = False
            state.index += 1
        if state.index == state.length:
            # no closing paren: the opening one was extraneous
            state.index = start
        elif state.index == start:
            state.current_op = None  # "()"
            state.index += 1
        else:
            sub = _State(state.data, start, state.index)
            self._parse_sub(sub)
            self._build_tree(state, sub.top)
            state.index += 1

    def _consume_phrase(self, state: _State):
        start = state.index = state.index + 1
        buf = []
        escaped = False
        has_slop = False
        while state.index < state.length:
            if not escaped:
                c = state.data[state.index]
                if c == "\\" and self._on(ESCAPE_OPERATOR):
                    escaped = True
                    state.index += 1
                    continue
                if c == '"':
                    if (state.length > state.index + 1
                            and state.data[state.index + 1] == "~"
                            and self._on(NEAR_OPERATOR)):
                        state.index += 1
                        if state.length > state.index + 1:
                            has_slop = True
                        break
                    break
            escaped = False
            buf.append(state.data[state.index])
            state.index += 1
        if state.index == state.length:
            state.index = start  # unterminated quote: extraneous
        elif state.index == start:
            state.current_op = None  # empty phrase
            state.index += 1
        else:
            phrase = "".join(buf)
            slop = self._parse_fuzziness(state) if has_slop else 0
            self._build_tree(state, self._new_phrase(phrase, slop))
            state.index += 1

    def _consume_token(self, state: _State):
        buf = []
        escaped = False
        prefix = False
        fuzzy = False
        while state.index < state.length:
            if not escaped:
                c = state.data[state.index]
                if c == "\\" and self._on(ESCAPE_OPERATOR):
                    escaped = True
                    prefix = False
                    state.index += 1
                    continue
                if self._token_finished(state):
                    break
                if buf and c == "~" and self._on(FUZZY_OPERATOR):
                    fuzzy = True
                    break
                prefix = (bool(buf) and c == "*"
                          and self._on(PREFIX_OPERATOR))
            escaped = False
            buf.append(state.data[state.index])
            state.index += 1
        if buf:
            if fuzzy:
                token = "".join(buf)
                fz = min(self._parse_fuzziness(state), 2)
                branch = (self._new_default(token) if fz == 0
                          else self._new_fuzzy(token, fz))
            elif prefix:
                branch = self._new_prefix("".join(buf[:-1]))
            else:
                branch = self._new_default("".join(buf))
            self._build_tree(state, branch)

    def _token_finished(self, state: _State) -> bool:
        c = state.data[state.index]
        return ((c == '"' and self._on(PHRASE_OPERATOR))
                or (c == "|" and self._on(OR_OPERATOR))
                or (c == "+" and self._on(AND_OPERATOR))
                or (c in "()" and self._on(PRECEDENCE_OPERATORS))
                or (c in _WS and self._on(WHITESPACE_OPERATOR)))

    def _parse_fuzziness(self, state: _State) -> int:
        """:495-534 — digits after '~'; bare '~' = 2; garbage/neg = 0."""
        digits = []
        if state.data[state.index] == "~":
            while state.index < state.length:
                state.index += 1
                if state.index < state.length:
                    if self._token_finished(state):
                        break
                    digits.append(state.data[state.index])
            s = "".join(digits)
            if not s:
                return 2
            try:
                return max(int(s), 0)
            except ValueError:
                return 0
        return 0

    # -- tree building (buildQueryTree, :446-490) --------------------------

    def _build_tree(self, state: _State, branch):
        if branch is None:
            return
        if state.not_ % 2 == 1:
            branch = BooleanQuery(
                must_not=(branch,),
                should=(MatchAllQuery(next(iter(self.weights))),))
        if state.top is None:
            state.top = branch
        else:
            if state.current_op is None:
                state.current_op = self.default_operator
            if state.previous_op != state.current_op:
                # operator change: the accumulated tree becomes one
                # clause of a fresh parent (right-to-left precedence)
                state.top = self._bool_with(
                    BooleanQuery(field=next(iter(self.weights))),
                    state.top, state.current_op)
            state.top = self._bool_with(state.top, branch,
                                        state.current_op)
            state.previous_op = state.current_op
        state.current_op = None

    @staticmethod
    def _bool_with(bq: BooleanQuery, clause, occur: str) -> BooleanQuery:
        import dataclasses
        if occur == _MUST:
            return dataclasses.replace(bq, must=bq.must + (clause,))
        return dataclasses.replace(bq, should=bq.should + (clause,))

    # -- branch factories (:546-617) ---------------------------------------

    def _per_field(self, make):
        clauses = []
        for f, w in self.weights.items():
            q = make(f)
            if q is None:
                continue
            if w != 1.0:
                import dataclasses
                q = dataclasses.replace(q, boost=w * q.boost)
            clauses.append(q)
        if not clauses:
            return None
        if len(clauses) == 1:
            return clauses[0]
        return BooleanQuery(should=tuple(clauses))

    def _tokenize(self, text: str) -> list:
        from ..kernels.tokenizer import tokenize_one
        return tokenize_one(text)

    def _new_default(self, text: str):
        toks = self._tokenize(text)

        def make(f):
            if not toks:
                return None
            if len(toks) == 1:
                return TermQuery(toks[0], f)
            # createBooleanQuery with the default operator
            occ = (dict(must=tuple(TermQuery(t, f) for t in toks))
                   if self.default_operator == _MUST
                   else dict(should=tuple(TermQuery(t, f) for t in toks)))
            return BooleanQuery(field=f, **occ)
        return self._per_field(make)

    def _new_phrase(self, text: str, slop: int):
        toks = self._tokenize(text)

        def make(f):
            if not toks:
                return None
            if len(toks) == 1:
                return TermQuery(toks[0], f)
            return PhraseQuery(tuple(toks), f, slop=slop)
        return self._per_field(make)

    def _new_prefix(self, text: str):
        # analyzer.normalize: lowercase, no tokenization (:604-607)
        norm = text.lower()
        return self._per_field(
            lambda f: MultiTermQuery("prefix", norm, f))

    def _new_fuzzy(self, text: str, fuzziness: int):
        norm = text.lower()
        return self._per_field(
            lambda f: MultiTermQuery("fuzzy", norm, f,
                                     max_edits=fuzziness))


def parse_simple(text: str, field: str = "text",
                 weights: dict | None = None, flags: int = -1,
                 default_operator: str = "should"):
    """One-shot helper: parse + single-clause elision. Returns None for
    inputs that match nothing (empty string, only operators)."""
    q = SimpleQueryParser(field, weights, flags, default_operator) \
        .parse(text)
    return rewrite(q) if q is not None else None
