"""Dictionary-driven synonyms: SynonymMap parsing + query-time graph
expansion.

Reference surfaces:
- SolrSynonymParser rule syntax
  (analysis/common/src/java/org/apache/lucene/analysis/synonym/
  SolrSynonymParser.java): ``a, b, c`` (equivalence class; with
  expand=true every member maps to every member, expand=false every
  member maps to the first) and ``a, b => c, d`` (explicit mapping —
  inputs are REPLACED by outputs).
- SynonymGraphFilter matching (SynonymGraphFilter.java:133-187): the
  FST matcher consumes the LONGEST input match at each position and
  does not re-match inside a consumed span; multi-word inputs and
  outputs are supported (graph tokens).
- QueryBuilder graph analysis (core:util/QueryBuilder.java
  analyzeGraphBoolean/analyzeGraphPhrase): a span whose alternatives
  are all single tokens becomes a SynonymQuery (BLENDED statistics);
  a span with any multi-token path becomes a disjunction of per-path
  queries (TermQuery / PhraseQuery), each scored with its OWN stats.

This engine applies synonyms at QUERY time — the configuration the
reference documentation recommends (SynonymGraphFilter javadoc: apply
at search time; index-time use requires FlattenGraphFilter, which
corrupts multi-word positions — the "sausage" caveat). Index-time
flattened injection is intentionally not offered; the per-field
analyzer plug point stays single-path.
"""

from __future__ import annotations

from .tokenizer import analyze_one

__all__ = ["SynonymMap", "synonym_query", "synonym_phrase_query"]


class SynonymMap:
    """Parsed synonym rules: tuple-of-tokens inputs -> set of
    tuple-of-tokens output paths. Rule terms run through the same
    analyzer chain the index uses (SolrSynonymParser analyzes rule
    text with the schema analyzer)."""

    def __init__(self, rules: list, analyzer: str = "standard",
                 expand: bool = True):
        self.analyzer = analyzer
        self.expand = expand
        self.map: dict = {}
        for rule in rules:
            self._add_rule(rule)
        self.max_len = max((len(k) for k in self.map), default=0)

    def _phrase(self, text: str) -> tuple:
        return tuple(analyze_one(text, self.analyzer))

    def _add_rule(self, rule: str):
        if "=>" in rule:
            lhs, rhs = rule.split("=>", 1)
            inputs = [self._phrase(p) for p in lhs.split(",")]
            outputs = [self._phrase(p) for p in rhs.split(",")]
            for i in inputs:
                if i:
                    self.map.setdefault(i, set()).update(
                        o for o in outputs if o)
        else:
            members = [self._phrase(p) for p in rule.split(",")]
            members = [m for m in members if m]
            if not members:
                return
            if self.expand:
                for m in members:
                    self.map.setdefault(m, set()).update(members)
            else:
                first = members[0]
                for m in members:
                    self.map.setdefault(m, set()).add(first)

    def match(self, tokens: list) -> list:
        """Scan an analyzed token list with longest-match-first,
        non-overlapping consumption (the FST matcher's contract).
        Returns spans [(start, length, [path tuples])]; unmatched
        tokens come back as 1-token spans whose only path is
        themselves."""
        spans = []
        i, n = 0, len(tokens)
        while i < n:
            hit = None
            for ln in range(min(self.max_len, n - i), 0, -1):
                key = tuple(tokens[i:i + ln])
                outs = self.map.get(key)
                if outs:
                    hit = (ln, outs)
                    break
            if hit is None:
                spans.append((i, 1, [(tokens[i],)]))
                i += 1
            else:
                ln, outs = hit
                key = tuple(tokens[i:i + ln])
                # '=>' rules REPLACE the input; equivalence rules list
                # the input among the outputs already
                paths = sorted(set(outs))
                spans.append((i, ln, paths))
                i += ln
        return spans


def synonym_query(text: str, syn_map: SynonymMap, field: str = "text",
                  operator: str = "or", analyzer: str | None = None):
    """Analyze query text, expand against the synonym map, and build
    the QueryBuilder-shaped graph query:

    - all-single-token span, >1 term  -> SynonymQuery (blended stats)
    - span with a multi-token path    -> boolean SHOULD of per-path
      TermQuery/PhraseQuery (each path scored with its own stats)
    - spans combine under ``operator``: 'or' -> should, 'and' -> must

    Returns a PreAnalyzed query: tokens already went through the
    analyzer chain here, so the searcher must not re-analyze (stems
    are not idempotent)."""
    from ..search.query import (BooleanQuery, PhraseQuery, PreAnalyzed,
                                SynonymQuery, TermQuery)
    an = analyzer if analyzer is not None else syn_map.analyzer
    toks = analyze_one(text, an)
    spans = syn_map.match(toks)
    clauses = []
    for _i, _ln, paths in spans:
        if all(len(p) == 1 for p in paths):
            terms = sorted({p[0] for p in paths})
            if len(terms) == 1:
                clauses.append(TermQuery(terms[0], field))
            else:
                clauses.append(SynonymQuery(tuple(terms), field))
        else:
            subs = []
            for p in paths:
                if len(p) == 1:
                    subs.append(TermQuery(p[0], field))
                else:
                    subs.append(PhraseQuery(tuple(p), field))
            clauses.append(subs[0] if len(subs) == 1
                           else BooleanQuery(should=tuple(subs),
                                             field=field))
    if not clauses:
        # QueryBuilder.createBooleanQuery returns null when analysis
        # yields no tokens (core:util/QueryBuilder.java) — the caller
        # gets no query, hence NO hits (a MatchAll here would invert
        # the semantics and return the whole corpus)
        return None
    if len(clauses) == 1:
        return PreAnalyzed(clauses[0])
    if operator == "and":
        return PreAnalyzed(BooleanQuery(must=tuple(clauses), field=field))
    return PreAnalyzed(BooleanQuery(should=tuple(clauses), field=field))


MAX_PHRASE_PATHS = 64  # the graph-path guard (QueryBuilder's
# TooComplexToDeterminizeException role for phrase expansion)


def synonym_phrase_query(text: str, syn_map: SynonymMap,
                         field: str = "text", slop: int = 0,
                         analyzer: str | None = None):
    """PHRASE-context synonym expansion — the
    QueryBuilder.analyzeGraphPhrase shape
    (core:util/QueryBuilder.java:560-620 via createPhraseQuery with a
    graph token stream):

    - every span expands to single tokens -> ONE MultiPhraseQuery
      whose slot i is span i's alternative set (QueryBuilder's
      analyzeMultiPhrase path — the reference emits exactly a
      MultiPhraseQuery when positions carry stacked single tokens);
    - any span with a multi-token path -> disjunction of the graph's
      complete phrase paths, each scored with its own stats (capped at
      MAX_PHRASE_PATHS). The reference builds SpanNearQuery chains
      here; a SHOULD-of-PhraseQuery over the enumerated paths is the
      documented equivalent for our engine (same match set for exact
      phrases; per-path stats instead of blended span stats).

    Returns PreAnalyzed (tokens already went through the chain)."""
    from ..search.query import (BooleanQuery, MultiPhraseQuery,
                                PhraseQuery, PreAnalyzed, TermQuery)
    an = analyzer if analyzer is not None else syn_map.analyzer
    toks = analyze_one(text, an)
    spans = syn_map.match(toks)
    if not spans:
        # null-query contract, same as synonym_query: no tokens -> no
        # query -> no hits (QueryBuilder.createPhraseQuery returns null)
        return None
    if all(all(len(p) == 1 for p in paths) for _i, _ln, paths in spans):
        slots = tuple(tuple(sorted({p[0] for p in paths}))
                      for _i, _ln, paths in spans)
        if len(slots) == 1 and len(slots[0]) == 1:
            return PreAnalyzed(TermQuery(slots[0][0], field))
        return PreAnalyzed(MultiPhraseQuery(slots, field, slop))
    # enumerate complete token paths through the graph (cartesian of
    # span alternatives), capped
    paths_acc = [()]
    for _i, _ln, paths in spans:
        nxt = []
        for prefix in paths_acc:
            for p in paths:
                nxt.append(prefix + tuple(p))
                if len(nxt) > MAX_PHRASE_PATHS:
                    raise ValueError(
                        f"synonym phrase expands to more than "
                        f"{MAX_PHRASE_PATHS} paths")
        paths_acc = nxt
    subs = [TermQuery(p[0], field) if len(p) == 1
            else PhraseQuery(p, field, slop) for p in paths_acc]
    if len(subs) == 1:
        return PreAnalyzed(subs[0])
    return PreAnalyzed(BooleanQuery(should=tuple(subs), field=field))
