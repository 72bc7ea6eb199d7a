"""Query AST + parser.

Mirrors the reference Query tree (core:search/Query.java:45,
BooleanQuery.java:125-147, PhraseQuery.java:71-143): term, AND, OR,
phrase (exact + true sloppy), synonym, dismax, multi-term expansion,
constant-score, and BooleanQuery whose clauses are bare terms OR
arbitrary sub-queries (nested booleans). ``rewrite`` applies the
reference's single-clause elision. ``parse_query`` covers the classic
QueryParser subset (field:term, +/-, AND/OR/NOT, boosts, sloppy
phrases, wildcard/fuzzy, grouping —
queryparser/.../classic/QueryParser.java:82).
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
class MultiPhraseQuery:
    """Phrase with a SET of alternative terms per position
    (core:search/MultiPhraseQuery.java:47-90 — "a generalized version
    of PhraseQuery, with the possibility of adding more than one term
    at the same position", e.g. synonyms inside a phrase). Matching
    unions each slot's postings positions (UnionPostingsEnum,
    MultiPhraseQuery.java:480-560); scoring passes EVERY term's
    statistics to the similarity — weight idf = Σ idf over all terms
    in all slots (MultiPhraseWeight ctor, termStatistics loop) — and
    scores the phrase freq like PhraseQuery. slop follows the same
    exact/sloppy split as PhraseQuery.

    ``slots_`` is a tuple of positions; each position is a tuple of
    one or more terms.
    """
    slots_: tuple
    field: str = "text"
    slop: int = 0
    boost: float = 1.0

    @property
    def slots(self):
        return [tuple(s) if isinstance(s, (tuple, list)) else (s,)
                for s in self.slots_]

    @property
    def terms(self):
        return [t for s in self.slots for t in s]


@dataclass(frozen=True)
class ComplexPhraseQuery:
    """A phrase whose slots may be MultiTermQuerys — the query produced
    by ComplexPhraseQueryParser (queryparser/src/java/org/apache/lucene/
    queryparser/complexPhrase/ComplexPhraseQueryParser.java:60-90
    ComplexPhraseQuery): '"slow f*"' or '"smyth~ john"'. Like the
    reference, the MTQ slots resolve against the term dictionary at
    REWRITE time (the searcher's MTQ-expansion pass calls
    phrase_wildcard), after which it is an ordinary MultiPhraseQuery —
    union positions per slot, idf summed over expanded terms.

    ``slots_``: tuple of str (plain term) or MultiTermQuery entries.
    """
    slots_: tuple
    field: str = "text"
    slop: int = 0
    boost: float = 1.0

    @property
    def terms(self):
        return [s for s in self.slots_ if isinstance(s, str)]


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

    Clauses are bare terms (strings, scored as TermQuery in ``field``)
    or arbitrary sub-queries (phrase, multi-term, boolean-of-boolean…)
    — the full ``BooleanQuery.Builder.add(Query, Occur)`` surface.
    All-string boolean keeps the flat fast path; any Query clause
    routes through the recursive tree evaluator."""
    must: tuple = ()
    should: tuple = ()
    must_not: tuple = ()
    filter_: tuple = ()
    field: str = "text"
    min_should_match: int = 0
    boost: float = 1.0

    @property
    def nested(self) -> bool:
        return any(not isinstance(c, str) for c in
                   self.must + self.should + self.must_not + self.filter_)

    @property
    def terms(self):
        if self.nested:
            out = []
            for c in (self.must + self.should + self.must_not + self.filter_):
                out.extend([c] if isinstance(c, str) else c.terms)
            return out
        return list(self.must) + list(self.should) + list(self.must_not) + list(self.filter_)


@dataclass(frozen=True)
class MatchAllQuery:
    """Every live doc matches with score ``boost``
    (core:search/MatchAllDocsQuery.java). Evaluated from the norms
    table alone — no postings scan."""
    field: str = "text"
    boost: float = 1.0

    @property
    def terms(self):
        return []


@dataclass(frozen=True)
class FieldExistsQuery:
    """Docs that have a value for the field, constant score
    (core:search/FieldExistsQuery.java). Runs as a pushed-down
    IS NOT NULL predicate on the docstore's native column."""
    field: str
    boost: float = 1.0

    @property
    def terms(self):
        return []


@dataclass(frozen=True)
class CombinedFieldQuery:
    """BM25F-style cross-field scoring (core:search/
    CombinedFieldQuery.java): scores documents as if ``fields`` were one
    synthetic combined field — per-doc freq is the float32 sum of
    weight * tf over every (term, field) posting
    (CombinedFieldQuery.java:430-437), the combined norm is the
    SmallFloat re-encode of round(sum of weight * decoded field length)
    over fields WITH norms (MultiNormsLeafSimScorer.java:166-173;
    omitted-norms keyword fields contribute nothing), and the pseudo
    stats blend across fields: df = max, ttf/sumTotalTermFreq =
    weighted sums with Java long truncation, docCount = max
    (CombinedFieldQuery.java:274-316). Weights must be >= 1 (the bound
    and norm arguments rely on it, Builder.addField:114). Terms are
    index terms (the BytesRef API surface) — NOT analyzed."""
    terms: tuple
    fields: tuple  # ((field, weight), ...)
    boost: float = 1.0

    def __post_init__(self):
        if any(w < 1.0 for _, w in self.fields):
            raise ValueError("field weight must be >= 1")


@dataclass(frozen=True)
class StatsTermQuery:
    """A TermQuery whose term STATISTICS are overridden — the
    reference's artificial-TermStates mechanism
    (sandbox/.../FuzzyLikeThisQuery.java newTermQuery:261-277 registers
    a TermStates with df = ttf = 1 so every fuzzy variant scores with
    identical neutral stats and the ranking comes from the boost).
    ``df``/``ttf`` feed the similarity in place of the dictionary's
    values; the postings themselves are the real ones."""
    term: str
    field: str = "text"
    df: int = 1
    ttf: int = 1
    boost: float = 1.0

    @property
    def terms(self):
        return (self.term,)


@dataclass(frozen=True)
class PreAnalyzed:
    """Marks a query whose leaf terms are already INDEX terms (e.g.
    built from the term dictionary, like more_like_this output) — the
    searcher's query-analysis pass unwraps it without re-analyzing.
    Lucene parity: queries constructed from TermsEnum/term-vector terms
    are never re-analyzed (MoreLikeThis.java builds TermQuerys from
    stored terms directly). Porter stems are not idempotent
    ("convers" -> "conver"), so re-analysis would corrupt them."""
    query: object


@dataclass(frozen=True)
class ConstantScoreQuery:
    """Wraps any query: matching docs score ``boost``, sub-scores
    discarded (core:search/ConstantScoreQuery.java)."""
    query: object
    field: str = "text"
    boost: float = 1.0

    @property
    def terms(self):
        return self.query.terms


@dataclass(frozen=True)
class CommonTermsQuery:
    """Stats-driven stopword-free common-terms query
    (queries/src/java/org/apache/lucene/queries/CommonTermsQuery.java:56):
    at search time each term is classified by its ACTUAL document
    frequency — df > ceil(max_term_frequency * maxDoc) (fractional
    threshold) or df > max_term_frequency (absolute form >= 1) makes it
    high-frequency (buildQuery, :145-155). Low-frequency terms form a
    required sub-boolean, high-frequency terms an optional one; if ALL
    terms are high-frequency the query degrades to a conjunction so the
    common terms still can't produce a slow scan (:174-182). A single
    term rewrites to a plain TermQuery (:109-112); terms absent from
    the index classify as low-frequency (termStates == null, :152).
    Occur values mirror the ctor contract (:80-90): MUST_NOT is
    rejected for either group. Fractional *_msm follow
    minNrShouldMatch (:138-143): >= 1 or == 0 truncate to int, else
    Math.round(f * numOptional)."""
    terms_: tuple
    field: str = "text"
    max_term_frequency: float = 0.01
    low_freq_occur: str = "should"
    high_freq_occur: str = "should"
    low_freq_msm: float = 0.0
    high_freq_msm: float = 0.0
    low_freq_boost: float = 1.0
    high_freq_boost: float = 1.0
    boost: float = 1.0

    def __post_init__(self):
        for occ in (self.low_freq_occur, self.high_freq_occur):
            if occ not in ("must", "should"):
                raise ValueError(
                    f"occur should be MUST or SHOULD but was {occ!r}")

    @property
    def terms(self):
        return list(self.terms_)


@dataclass(frozen=True)
class BlendedTermQuery:
    """Blends index statistics across terms — typically the same text
    in several fields (core:search/BlendedTermQuery.java:33-47). At
    rewrite every (field, term) gets ARTIFICIAL stats df = max over all
    terms' doc freqs, ttf = sum of total term freqs
    (:271-301 rewrite + adjustFrequencies), then each becomes a
    boosted TermQuery combined by the rewrite method:
    'dismax' = DisjunctionMaxQuery with tie_breaker (the
    DISJUNCTION_MAX_REWRITE default, tie 0.01, :190) or 'boolean' =
    all-SHOULD BooleanQuery (BOOLEAN_REWRITE, :138-148).

    ``pairs_`` is ((field, term, boost), ...) — the Builder.add(Term,
    float) surface (:74-86)."""
    pairs_: tuple
    rewrite: str = "dismax"
    tie_breaker: float = 0.01
    field: str = "text"
    boost: float = 1.0

    def __post_init__(self):
        if self.rewrite not in ("dismax", "boolean"):
            raise ValueError(f"unknown rewrite method {self.rewrite!r}")

    @property
    def pairs(self):
        return [(f, t, float(b)) for f, t, b in self.pairs_]

    @property
    def terms(self):
        return [t for _f, t, _b in self.pairs_]


def rewrite(q):
    """Driver-side query rewrite (core:search/BooleanQuery.java:215-330
    + Query.rewrite contract): single-clause elision (a boolean with one
    MUST or one SHOULD clause and nothing else collapses to the clause,
    boost folded in) and recursive clause rewriting. MultiTermQuery
    expansion happens later, at stats-binding time, because it needs the
    term dictionary."""
    if isinstance(q, BooleanQuery):
        must = tuple(rewrite(c) if not isinstance(c, str) else c
                     for c in q.must)
        should = tuple(rewrite(c) if not isinstance(c, str) else c
                       for c in q.should)
        must_not = tuple(rewrite(c) if not isinstance(c, str) else c
                         for c in q.must_not)
        filter_ = tuple(rewrite(c) if not isinstance(c, str) else c
                        for c in q.filter_)
        # single-clause elision (BooleanQuery.java:255-275)
        only = None
        if len(must) == 1 and not (should or must_not or filter_):
            only = must[0]
        elif (len(should) == 1 and not (must or must_not or filter_)
              and q.min_should_match <= 1):
            only = should[0]
        if only is not None:
            sub = TermQuery(only, q.field) if isinstance(only, str) else only
            if q.boost != 1.0:
                sub = _with_boost(sub, q.boost * getattr(sub, "boost", 1.0))
            return sub
        return BooleanQuery(must, should, must_not, filter_, q.field,
                            q.min_should_match, q.boost)
    if isinstance(q, ConstantScoreQuery):
        return ConstantScoreQuery(rewrite(q.query), q.field, q.boost)
    if isinstance(q, MultiPhraseQuery):
        # MultiPhraseQuery.rewrite (MultiPhraseQuery.java:116-131):
        # a single position rewrites to a SHOULD-boolean of its terms;
        # additionally, all-single-term positions are semantically a
        # PhraseQuery (same matcher, same stats) — collapse so the flat
        # phrase fast path runs
        slots = q.slots
        if len(slots) == 1:
            if len(slots[0]) == 1:
                return TermQuery(slots[0][0], q.field, q.boost)
            return OrQuery(tuple(slots[0]), q.field, q.boost)
        if all(len(s) == 1 for s in slots):
            return PhraseQuery(tuple(s[0] for s in slots), q.field,
                               q.slop, q.boost)
        return q
    return q


def _with_boost(q, boost: float):
    from dataclasses import replace
    return replace(q, boost=boost)


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

    transpositions (fuzzy only): adjacent-swap counts as ONE edit — the
    FuzzyQuery default (FuzzyQuery.java:79-84 defaultTranspositions =
    true; the Levenshtein automaton's transposition primitive = OSA /
    restricted Damerau-Levenshtein). False = plain Levenshtein.
    """
    kind: str
    pattern: object
    field: str = "text"
    rewrite: str = "scoring_boolean"
    max_expansions: int = 1024
    max_edits: int = 1
    boost: float = 1.0
    transpositions: bool = True

    @property
    def terms(self):
        return []  # resolved at search time against the term dictionary


@dataclass(frozen=True)
class TermAutomatonQuery:
    """A graph query over term positions (sandbox/src/java/org/apache/
    lucene/sandbox/search/TermAutomatonQuery.java): an automaton whose
    transitions are terms (or ANY = any token), accepting documents
    that contain a position path through it. ``paths`` is the
    ENUMERATED LANGUAGE of the acyclic automaton after
    determinization-equivalent dedup — a tuple of paths, each a tuple
    of terms with None marking the ANY transition. Build through
    :class:`TermAutomaton` or
    :func:`term_automaton_from_token_stream`; scoring = freq of
    accepted (start, path) occurrences under the summed-idf multi-term
    stats (TermAutomatonWeight gathers every term's TermStatistics).

    Subset note (documented deviation): cyclic automatons (buildable
    in the reference via manual addTransition loops, unused by its
    own TokenStreamToTermAutomatonQuery) are rejected at finish() —
    token-stream automatons are DAGs by construction."""
    paths: tuple
    field: str = "text"
    boost: float = 1.0


class TermAutomaton:
    """Builder mirroring the reference's createState / setAccept /
    addTransition / addAnyTransition / finish surface
    (TermAutomatonQuery.java:87-140). finish() validates acyclicity,
    enumerates the accepted term/ANY sequences from state 0, dedupes
    them (the determinized automaton accepts each SEQUENCE once even
    when several NFA paths spell it), and caps the language size like
    determinizeWorkLimit caps determinization effort."""

    ANY = None

    def __init__(self, field: str = "text"):
        self.field = field
        self._n = 1  # state 0 always exists (the start state)
        self._accept: set[int] = set()
        self._arcs: list[tuple[int, int, object]] = []

    def create_state(self) -> int:
        self._n += 1
        return self._n - 1

    def set_accept(self, state: int, accept: bool = True):
        if accept:
            self._accept.add(state)
        else:
            self._accept.discard(state)

    def add_transition(self, src: int, dst: int, term: str):
        self._arcs.append((src, dst, term))

    def add_any_transition(self, src: int, dst: int):
        self._arcs.append((src, dst, None))

    def finish(self, max_paths: int = 1024,
               boost: float = 1.0) -> TermAutomatonQuery:
        by_src: dict[int, list] = {}
        for s, d, t in self._arcs:
            by_src.setdefault(s, []).append((d, t))
        # acyclicity: DFS with an on-stack set
        on_stack: set[int] = set()
        done: set[int] = set()

        def check(s):
            if s in done:
                return
            if s in on_stack:
                raise ValueError("cyclic term automaton (unsupported; "
                                 "token-stream automatons are acyclic)")
            on_stack.add(s)
            for d, _t in by_src.get(s, ()):
                check(d)
            on_stack.discard(s)
            done.add(s)

        check(0)
        seqs: list[tuple] = []
        seen: set[tuple] = set()
        # work limit on WALK STEPS, not just distinct sequences: many
        # NFA paths can spell the SAME sequence (parallel duplicate
        # arcs), so a dedup-count guard alone lets finish() run 2^states
        # steps without ever tripping — the reference bounds the
        # analogous explosion with determinizeWorkLimit and throws
        work = [0]
        work_limit = max(10_000, 64 * max_paths)

        def walk(s, prefix):
            work[0] += 1
            if work[0] > work_limit:
                raise ValueError(
                    f"term automaton too complex: > {work_limit} path "
                    "steps (determinizeWorkLimit analog)")
            if len(seqs) > max_paths:
                raise ValueError(f"term automaton language exceeds "
                                 f"{max_paths} paths")
            if s in self._accept and prefix and prefix not in seen:
                seen.add(prefix)
                seqs.append(prefix)
            for d, t in by_src.get(s, ()):
                walk(d, prefix + (t,))

        walk(0, ())
        if not seqs:
            raise ValueError("term automaton accepts no non-empty path")
        # the reference rejects automatons that lead or trail with ANY
        # at finish() (TermAutomatonQuery.finish -> IllegalStateException;
        # TestTermAutomatonQuery testInvalidLeadWithAny/-TrailWithAny):
        # the scorer never seeds a run on an ANY arc and never checks
        # accept states during the ANY advance, so such paths could
        # never match anyway
        for p in seqs:
            if p[0] is None or p[-1] is None:
                raise ValueError("term automaton path may not start or "
                                 "end with an ANY transition")
        return TermAutomatonQuery(tuple(seqs), self.field, boost)


def term_automaton_from_token_stream(tokens, field: str = "text",
                                     boost: float = 1.0,
                                     max_paths: int = 1024
                                     ) -> TermAutomatonQuery:
    """TokenStreamToTermAutomatonQuery (sandbox/.../
    TokenStreamToTermAutomatonQuery.java): tokens are (term, position)
    or (term, position, position_length) triples — the token-graph
    shape SynonymGraphFilter emits, where a multi-position token (e.g.
    a contracted multi-word synonym) spans position_length slots.
    Position HOLES (no token covering a position) become ANY
    transitions, exactly like the reference maps posInc > 1 gaps."""
    auto = TermAutomaton(field)
    toks = [(t[0], int(t[1]), int(t[2]) if len(t) > 2 else 1)
            for t in tokens]
    if not toks:
        raise ValueError("empty token stream")
    max_end = max(p + pl for _, p, pl in toks)
    states = {0: 0}
    for i in range(1, max_end + 1):
        states[i] = auto.create_state()
    covered = set()
    for term, p, pl in toks:
        auto.add_transition(states[p], states[p + pl], term)
        covered.add(p)
    for p in range(max_end):
        if p not in covered:
            auto.add_any_transition(states[p], states[p + 1])
    auto.set_accept(states[max_end])
    return auto.finish(max_paths, boost)


def multi_range_predicate(column: str, ranges) -> str:
    """MultiRangeQuery (sandbox/src/java/org/apache/lucene/sandbox/
    search/MultiRangeQuery.java:169-239 + DocValuesMultiRangeQuery):
    the union of [lower, upper] ranges over one numeric/doc-values
    column as a single disjunctive predicate, with overlapping ranges
    merged exactly like the reference's rewrite (sort by (lower,
    upper); merge while next.lower <= current.upper — overlap, not
    adjacency: mergeOverlappingRanges, line 219 `> 0` comparison).

    ``ranges`` is a list of (lower, upper) inclusive bounds; None
    leaves that side open (the reference's open-ended sentinel bytes).
    Returns a SQL predicate string for the doc_filter surface — it
    reaches the parquet scan as PushedFilters, the BKD-tree analog
    (our IndexOrDocValuesQuery mapping), so one scan serves every
    range with min/max row-group pruning."""
    if not ranges:
        raise ValueError("MultiRangeQuery requires at least one range")

    def _lit(v):
        if isinstance(v, str):
            return "'" + v.replace("'", "''") + "'"
        return repr(v)

    # open bounds sort as -inf / +inf (the reference's sentinel bytes)
    def _key(r):
        lo, hi = r
        return ((0,) if lo is None else (1, lo),
                (1,) if hi is None else (0, hi))

    norm = sorted(ranges, key=_key)
    merged = [list(norm[0])]
    for lo, hi in norm[1:]:
        cur = merged[-1]
        overlaps = (cur[1] is None or lo is None or lo <= cur[1])
        if not overlaps:
            merged.append([lo, hi])
        elif cur[1] is not None and (hi is None or hi > cur[1]):
            cur[1] = hi
    parts = []
    for lo, hi in merged:
        if lo is None and hi is None:
            return f"{column} IS NOT NULL"
        if lo is None:
            parts.append(f"{column} <= {_lit(hi)}")
        elif hi is None:
            parts.append(f"{column} >= {_lit(lo)}")
        else:
            parts.append(f"{column} BETWEEN {_lit(lo)} AND {_lit(hi)}")
    return "(" + " OR ".join(parts) + ")"


def from_dict(q: dict):
    """Build a query from the FIXTURES.md §2 JSON shape. Boolean and
    dismax clause lists accept nested dicts (sub-queries)."""
    t = q["type"]
    field = q.get("field", "text")
    terms = tuple(q.get("terms", ()))

    def cl(c):
        return from_dict(c) if isinstance(c, dict) else c

    if t == "term":
        return TermQuery(terms[0], field, boost=q.get("boost", 1.0))
    if t == "and":
        return AndQuery(terms, field)
    if t == "or":
        return OrQuery(terms, field)
    if t == "phrase":
        return PhraseQuery(terms, field, slop=q.get("slop", 0))
    if t == "synonym":
        return SynonymQuery(terms, field)
    if t == "dismax":
        return DisMaxQuery(tuple(cl(c) for c in q.get("terms", ())), field,
                           tie_breaker=q.get("tie_breaker", 0.0))
    if t == "boolean":
        return BooleanQuery(
            must=tuple(cl(c) for c in q.get("must", ())),
            should=tuple(cl(c) for c in q.get("should", ())),
            must_not=tuple(cl(c) for c in q.get("must_not", ())),
            filter_=tuple(cl(c) for c in q.get("filter", ())), field=field,
            min_should_match=q.get("min_should_match", 0))
    if t == "constant_score":
        return ConstantScoreQuery(from_dict(q["query"]), field,
                                  boost=q.get("boost", 1.0))
    if t == "match_all":
        return MatchAllQuery(field, boost=q.get("boost", 1.0))
    if t == "field_exists":
        return FieldExistsQuery(q["field"], boost=q.get("boost", 1.0))
    if t == "common_terms":
        return CommonTermsQuery(
            terms, field,
            max_term_frequency=q.get("max_term_frequency", 0.01),
            low_freq_occur=q.get("low_freq_occur", "should"),
            high_freq_occur=q.get("high_freq_occur", "should"),
            low_freq_msm=q.get("low_freq_msm", 0.0),
            high_freq_msm=q.get("high_freq_msm", 0.0))
    if t == "blended_term":
        return BlendedTermQuery(
            tuple((p[0], p[1], p[2] if len(p) > 2 else 1.0)
                  for p in q["pairs"]),
            rewrite=q.get("rewrite", "dismax"),
            tie_breaker=q.get("tie_breaker", 0.01))
    if t == "multi_term":
        pat = q["pattern"]
        if q["kind"] in ("range", "set") and isinstance(pat, list):
            pat = tuple(pat)
        return MultiTermQuery(q["kind"], pat, field,
                              rewrite=q.get("rewrite", "scoring_boolean"),
                              max_edits=q.get("max_edits", 1))
    raise ValueError(f"unknown query type: {t}")


# ---------------------------------------------------------------------------
# classic QueryParser subset (queryparser/classic/QueryParser.java:82):
#   field:term      explicit field
#   +term / -term   MUST / MUST_NOT prefixes
#   AND / OR / NOT  infix operators (AND promotes both sides to MUST)
#   "a b"           phrase;  "a b"~2  sloppy phrase
#   term^2.5        boost
#   wild* / wi?ld   wildcard MultiTermQuery
#   term~1          fuzzy MultiTermQuery (edit distance)
#   /re.*gexp/      regexp MultiTermQuery (Lucene RegExp syntax)
#   ( ... )         grouping (nested boolean)
# Default operator is OR (bare clauses are SHOULD), like the reference.
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r'\s*('
    r'\(|\)'                           # grouping
    r'|(?:\[[^\]]*\]|\{[^}]*\})(?:\^\d+(?:\.\d+)?)?'  # ranges (+^boost)
    r'|"[^"]*"(?:~\d+)?(?:\^\d+(?:\.\d+)?)?'  # phrase (+~slop) (+^boost)
    r'|(?:[^\s():/]+:)?/[^/]*/(?:\^\d+(?:\.\d+)?)?'  # [f:]/regexp/ (+^boost)
    r'|AND\b|OR\b|NOT\b'               # operators
    r'|\+|-'                           # occur prefixes
    r'|[^\s()+"\[{]+'                  # term-ish (field:term, boost, fuzzy)
    r')')

_RANGE_RE = re.compile(r'^([\[{])\s*(\S+)\s+TO\s+(\S+)\s*([\]}])$',
                       re.IGNORECASE)


def _tokenize_query(s: str) -> list:
    out, i = [], 0
    while i < len(s):
        m = _TOKEN_RE.match(s, i)
        if not m:
            break
        out.append(m.group(1))
        i = m.end()
    return out


_BOOST_RE = re.compile(r"^(.*?)\^(\d+(?:\.\d+)?)$")
_FUZZY_RE = re.compile(r"^(.*?)~(\d*)$")


def _parse_atom(tok: str, field: str, complex_phrases: bool = False):
    """One term-ish token -> (query-or-term, boost). Bare analyzed terms
    come back as plain strings (flat clause fast path)."""
    boost = 1.0
    m = _BOOST_RE.match(tok)
    if m:
        tok, boost = m.group(1), float(m.group(2))
    if ":" in tok and not tok.startswith(("[", "{")):
        f, tok = tok.split(":", 1)
        field = f
    m = _RANGE_RE.match(tok)
    if m:
        # [a TO b] inclusive / {a TO b} exclusive bounds; '*' = open.
        # Our range semantics are lower-inclusive, upper-exclusive, so
        # an inclusive upper bound appends the lowest suffix.
        lo = None if m.group(2) == "*" else m.group(2).lower()
        hi = None if m.group(3) == "*" else m.group(3).lower()
        if m.group(1) == "{" and lo is not None:
            lo = lo + "\x00"
        if m.group(4) == "]" and hi is not None:
            hi = hi + "\x00"
        return MultiTermQuery("range", (lo, hi), field, boost=boost), boost
    if tok.startswith("/") and tok.endswith("/") and len(tok) >= 2:
        # /regexp/ — Lucene RegExp syntax (QueryParser.java Regexp
        # production). Lowercased like the wildcard/fuzzy atoms: the
        # term dictionary is lowercase, so uppercase literals could
        # never match
        return MultiTermQuery("regexp", tok[1:-1].lower(), field,
                              boost=boost), boost
    if tok.startswith('"'):
        body = tok[1:]
        slop = 0
        m = _FUZZY_RE.match(body)
        if m and not body.endswith('"'):
            body, slop = m.group(1), int(m.group(2) or 0)
        body = body.rstrip('"')
        terms = tuple(body.lower().split())
        if not terms:
            raise ValueError(f"empty phrase in query: {tok!r}")
        if complex_phrases:
            # ComplexPhraseQueryParser.java: each phrase word parses
            # through the full term grammar — prefix/wildcard/fuzzy
            # slots resolve against the term dictionary at rewrite time
            slots, any_mtq = [], False
            for w in terms:
                fm = _FUZZY_RE.match(w)
                if fm and fm.group(1):  # "smyth~" / "smyth~1"
                    edits = int(fm.group(2)) if fm.group(2) else 2
                    slots.append(MultiTermQuery(
                        "fuzzy", fm.group(1), field,
                        max_edits=min(edits, 2)))
                    any_mtq = True
                elif "*" in w or "?" in w:
                    if w.endswith("*") and "*" not in w[:-1] \
                            and "?" not in w:
                        slots.append(MultiTermQuery("prefix", w[:-1],
                                                    field))
                    else:
                        slots.append(MultiTermQuery("wildcard", w,
                                                    field))
                    any_mtq = True
                else:
                    slots.append(w)
            if any_mtq:
                return ComplexPhraseQuery(tuple(slots), field,
                                          slop=slop,
                                          boost=boost), boost
        if len(terms) == 1:
            return (TermQuery(terms[0], field, boost=boost)
                    if (field != "text" or boost != 1.0) else terms[0],
                    boost)
        return PhraseQuery(terms, field, slop=slop, boost=boost), boost
    m = _FUZZY_RE.match(tok)
    if m and m.group(2) != "":
        return MultiTermQuery("fuzzy", m.group(1).lower(), field,
                              max_edits=min(int(m.group(2)), 2),
                              boost=boost), boost
    if "*" in tok or "?" in tok:
        return MultiTermQuery("wildcard", tok.lower(), field,
                              boost=boost), boost
    t = tok.lower()
    if not t:
        # a bare '^2' (or a stray boost after a phrase/range the
        # tokenizer didn't attach) would otherwise become a phantom
        # empty-term clause that silently never matches
        raise ValueError(f"empty term in query (stray boost?): {tok!r}")
    if field != "text" or boost != 1.0:
        return TermQuery(t, field, boost=boost), boost
    return t, boost


def _parse_clauses(toks: list, pos: int, field: str,
                   complex_phrases: bool = False):
    """Parse until ')' or end -> (clauses [(occur, clause)], next pos).
    occur in {'must', 'should', 'must_not'}."""
    clauses = []
    pending = None   # occur forced by a prefix/operator for next clause
    promote = False  # AND seen: promote previous default clause to MUST
    while pos < len(toks):
        t = toks[pos]
        if t == ")":
            return clauses, pos + 1
        if t == "AND":
            if clauses and clauses[-1][0] == "should":
                clauses[-1] = ("must", clauses[-1][1])
            pending = "must"
            pos += 1
            continue
        if t == "OR":
            pending = "should"
            pos += 1
            continue
        if t == "NOT":
            pending = "must_not"
            pos += 1
            continue
        if t == "+":
            pending = "must"
            pos += 1
            continue
        if t == "-":
            pending = "must_not"
            pos += 1
            continue
        # `field:` immediately before a phrase/group/range binds the
        # field to that sub-clause (field:"a b", field:(a b), f:[a TO b])
        clause_field = field
        if (t.endswith(":") and len(t) > 1 and pos + 1 < len(toks)
                and (toks[pos + 1].startswith(('"', "[", "{"))
                     or toks[pos + 1] == "(")):
            clause_field = t[:-1]
            pos += 1
            t = toks[pos]
        if t == "(":
            sub, pos = _parse_clauses(toks, pos + 1, clause_field,
                                      complex_phrases)
            boost = 1.0
            if pos < len(toks) and toks[pos].startswith("^"):
                boost = float(toks[pos][1:])
                pos += 1
            q = _build_boolean(sub, clause_field, boost)
            clauses.append((pending or "should", q))
            pending = None
            continue
        atom, _ = _parse_atom(t, clause_field, complex_phrases)
        clauses.append((pending or "should", atom))
        pending = None
        pos += 1
    return clauses, pos


def _build_boolean(clauses: list, field: str, boost: float = 1.0):
    must = tuple(c for o, c in clauses if o == "must")
    should = tuple(c for o, c in clauses if o == "should")
    must_not = tuple(c for o, c in clauses if o == "must_not")
    # compact flat all-term shapes to the dedicated query types (same
    # scoring, simpler plans)
    if should and not must and not must_not and len(should) > 1 \
            and all(isinstance(c, str) for c in should):
        return OrQuery(should, field, boost=boost)
    if must and not should and not must_not and len(must) > 1 \
            and all(isinstance(c, str) for c in must):
        return AndQuery(must, field, boost=boost)
    q = BooleanQuery(must=must, should=should, must_not=must_not,
                     field=field, boost=boost)
    return rewrite(q)


def parse_query(s: str, field: str = "text",
                complex_phrases: bool = False):
    """Parse a classic-QueryParser-subset string into the Query AST.
    Single-clause results are elided to the bare query (rewrite).
    ``complex_phrases=True`` enables the ComplexPhraseQueryParser
    grammar: prefix/wildcard/fuzzy atoms INSIDE quoted phrases
    (queryparser/complexPhrase/ComplexPhraseQueryParser.java) —
    the classic parser treats them as literal phrase words."""
    toks = _tokenize_query(s.strip())
    clauses, _ = _parse_clauses(toks, 0, field, complex_phrases)
    if not clauses:
        raise ValueError(f"empty query: {s!r}")
    # all-SHOULD flat terms keep the compact OrQuery shape; a single
    # bare term keeps TermQuery (back-compat fast paths)
    if all(o == "should" and isinstance(c, str) for o, c in clauses):
        terms = tuple(c for _, c in clauses)
        return (TermQuery(terms[0], field) if len(terms) == 1
                else OrQuery(terms, field))
    if all(o == "must" and isinstance(c, str) for o, c in clauses):
        terms = tuple(c for _, c in clauses)
        return (TermQuery(terms[0], field) if len(terms) == 1
                else AndQuery(terms, field))
    return _build_boolean(clauses, field)


def parse_complex_phrase_query(s: str, field: str = "text"):
    """ComplexPhraseQueryParser.parse
    (queryparser/complexPhrase/ComplexPhraseQueryParser.java): the
    classic grammar with prefix/wildcard/fuzzy atoms allowed inside
    quoted phrases. Subset deviation (documented): embedded range
    queries inside phrases and the inOrder=false toggle are not
    supported."""
    return parse_query(s, field, complex_phrases=True)
