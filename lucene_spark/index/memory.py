"""MemoryIndex: a single-document, multi-field in-memory index.

Reference: the memory module — memory/src/java/org/apache/lucene/index/
memory/MemoryIndex.java (2,484 LoC): an ephemeral index over ONE
document, built field-by-field with per-field analyzers, searched with
ordinary queries; ``search(Query)`` returns the BM25 score of the
single document or 0.0 when it does not match (MemoryIndex.java
``search``: "the score ... or 0.0 if the query does not match"). The
reference uses it for percolation (the monitor's CandidateMatcher
verifies candidates against a MemoryIndex of the incoming document)
and one-off relevance probes.

This implementation keeps the same contract on the driver: per-field
analyzed token streams with single-doc collection stats (docCount=1,
df=1 for present terms, avgdl = the field's own length — exactly what
a one-document segment yields), scored through the same float32 BM25
kernels the distributed engine uses, so ``MemoryIndex.search(q)``
equals ``IndexSearcher.search(q)`` on a real one-document index
bit-for-bit (asserted in tests/test_memory_index.py).

Single-field query trees (including nested booleans) delegate to
``BruteForceOracle.eval_query`` — the engine's reference evaluator.
Cross-field BooleanQuery / DisMax / ConstantScore trees are combined
here with the same float discipline (clauses in float32, accumulation
in double, one final cast).

Multi-valued fields: repeated ``add_field`` calls append token streams
directly (Analyzer.getPositionIncrementGap defaults to 0, so a phrase
may match across the value boundary — reference behavior for the
default analyzer; custom gaps are not offered, documented deviation).
"""

from __future__ import annotations

import numpy as np

__all__ = ["MemoryIndex"]


class MemoryIndex:
    def __init__(self) -> None:
        self._tokens: dict = {}     # field -> list[str]
        self._analyzers: dict = {}  # field -> chain name
        self._oracles: dict = {}    # field -> BruteForceOracle

    # -- build ----------------------------------------------------------
    def add_field(self, field: str, text: str,
                  analyzer: str = "standard") -> "MemoryIndex":
        """Analyze ``text`` with the named chain and append it to
        ``field`` (MemoryIndex.addField). Returns self for chaining."""
        from ..kernels.tokenizer import analyze_one
        prev = self._analyzers.get(field)
        if prev is not None and prev != analyzer:
            raise ValueError(
                f"field {field!r} was added with analyzer {prev!r}")
        self._analyzers[field] = analyzer
        self._tokens.setdefault(field, []).extend(
            analyze_one(text or "", analyzer))
        self._oracles.pop(field, None)
        return self

    @classmethod
    def from_document(cls, doc: dict, analyzers: dict | None = None
                      ) -> "MemoryIndex":
        """MemoryIndex.fromDocument: one call per (field, text) item;
        ``analyzers`` maps field -> chain name (default 'standard')."""
        mi = cls()
        analyzers = analyzers or {}
        for field, text in doc.items():
            mi.add_field(field, text, analyzers.get(field, "standard"))
        return mi

    # -- search ---------------------------------------------------------
    def _oracle(self, field: str):
        ora = self._oracles.get(field)
        if ora is None:
            from ..search.oracle import BruteForceOracle
            ora = BruteForceOracle.__new__(BruteForceOracle)
            toks = self._tokens.get(field, [])
            # single-doc stats, already-analyzed token stream
            from collections import Counter

            from ..kernels.smallfloat import int_to_byte4
            ora.doc_ids = np.zeros(1, dtype=np.int64)
            ora.tokens = [list(toks)]
            ora.tfs = [Counter(toks)]
            ora.lengths = np.array([len(toks)], dtype=np.int64)
            ora.norms = np.asarray(int_to_byte4(ora.lengths),
                                   dtype=np.uint8)
            ora.doc_count = 1
            ora.sum_ttf = int(len(toks))
            ora.df = Counter({t: 1 for t in ora.tfs[0]})
            self._oracles[field] = ora
        return ora

    def fields(self) -> list:
        return sorted(self._tokens)

    def _fields_of(self, q) -> set:
        from ..search.query import BooleanQuery, ConstantScoreQuery, \
            DisMaxQuery
        if isinstance(q, BooleanQuery):
            out = set()
            for c in q.must + q.should + q.must_not + q.filter_:
                out |= {q.field} if isinstance(c, str) else self._fields_of(c)
            return out
        if isinstance(q, DisMaxQuery):
            out = set()
            for c in q.terms_:
                out |= {q.field} if isinstance(c, str) else self._fields_of(c)
            return out
        if isinstance(q, ConstantScoreQuery):
            return self._fields_of(q.query)
        return {getattr(q, "field", "text") or "text"}

    def search(self, query) -> float:
        """Score of the one document, or 0.0 on no match
        (MemoryIndex.java search)."""
        s = self._eval(query)
        return 0.0 if s is None else float(s)

    def matches(self, query) -> bool:
        return self._eval(query) is not None

    _NO_MATCH = "\x00<no-match>"  # expands-to-nothing MTQ sentinel

    def _rewrite_mtq(self, q):
        """Replace MultiTermQuery nodes with their expansion against
        THIS document's token set — the engine's _expand_mtq_tree
        shape (OrQuery / ConstantScoreQuery(Or)), with the single doc
        as the term dictionary (exactly what the reference MemoryIndex
        rewrites against). An MTQ matching none of the doc's terms
        becomes a never-present sentinel term (matches nothing)."""
        import dataclasses
        from ..ops.percolate import _mtq_match
        from ..search.query import (BooleanQuery, ConstantScoreQuery,
                                    DisMaxQuery, MultiTermQuery,
                                    OrQuery, TermQuery)
        if isinstance(q, MultiTermQuery):
            terms = sorted(set(self._tokens.get(q.field, [])))
            matched = tuple(t for t in terms if _mtq_match(q, [t]))
            if not matched:
                return TermQuery(self._NO_MATCH, q.field)
            if q.rewrite == "scoring_boolean":
                return OrQuery(matched, q.field, boost=q.boost)
            return ConstantScoreQuery(OrQuery(matched, q.field),
                                      q.field, q.boost)
        if isinstance(q, BooleanQuery):
            fx = lambda cs: tuple(c if isinstance(c, str)
                                  else self._rewrite_mtq(c) for c in cs)
            return dataclasses.replace(
                q, must=fx(q.must), should=fx(q.should),
                must_not=fx(q.must_not), filter_=fx(q.filter_))
        if isinstance(q, DisMaxQuery):
            return dataclasses.replace(
                q, terms_=tuple(c if isinstance(c, str)
                                else self._rewrite_mtq(c)
                                for c in q.terms_))
        if isinstance(q, ConstantScoreQuery):
            return dataclasses.replace(
                q, query=self._rewrite_mtq(q.query))
        return q

    def _has_special(self, q) -> bool:
        """Nodes the single-field brute oracle does not evaluate
        (MatchAll / FieldExists) — routed through the recursive
        combiner instead."""
        from ..search.query import (BooleanQuery, ConstantScoreQuery,
                                    DisMaxQuery, FieldExistsQuery,
                                    MatchAllQuery)
        if isinstance(q, (MatchAllQuery, FieldExistsQuery)):
            return True
        if isinstance(q, BooleanQuery):
            return any(not isinstance(c, str) and self._has_special(c)
                       for c in q.must + q.should + q.must_not
                       + q.filter_)
        if isinstance(q, DisMaxQuery):
            return any(not isinstance(c, str) and self._has_special(c)
                       for c in q.terms_)
        if isinstance(q, ConstantScoreQuery):
            return self._has_special(q.query)
        return False

    def _eval(self, q, _rewritten: bool = False):
        """-> np.float32 score, or None when the doc does not match.
        ``_rewritten``: the tree already went through _rewrite_mtq —
        recursive combiner calls set it so subtrees are not re-walked
        (the rewrite is idempotent but O(subtree) per call)."""
        from ..search.query import (BooleanQuery, ConstantScoreQuery,
                                    DisMaxQuery, FieldExistsQuery,
                                    MatchAllQuery, MultiTermQuery,
                                    TermQuery)
        if isinstance(q, MatchAllQuery):
            return np.float32(q.boost)
        if isinstance(q, FieldExistsQuery):
            return (np.float32(q.boost)
                    if self._tokens.get(q.field) else None)
        if not _rewritten:
            q = self._rewrite_mtq(q)
        fields = self._fields_of(q)
        if len(fields) <= 1 and self._has_special(q):
            # MatchAll/FieldExists inside a tree: the combiner below
            # handles them; the brute oracle would raise
            fields = fields | {None}
        if len(fields) <= 1:
            field = next(iter(fields)) if fields else "text"
            ora = self._oracle(field)
            try:
                ids, scores = ora.eval_query(q)
            except (KeyError, ValueError):
                # terms unseen by this field (df=0 KeyError paths)
                return None
            if ids.size == 0:
                return None
            return np.float32(scores[0])
        # cross-field combiners: same discipline as the engine's
        # eval_tree (clauses float32, sum in double, one cast)
        if isinstance(q, ConstantScoreQuery):
            inner = self._eval(q.query, _rewritten=True)
            return None if inner is None else np.float32(q.boost)
        if isinstance(q, DisMaxQuery):
            parts = [self._eval(c if not isinstance(c, str)
                                else TermQuery(c, q.field),
                                _rewritten=True)
                     for c in q.terms_]
            parts = [p for p in parts if p is not None]
            if not parts:
                return None
            mx = max(np.float64(p) for p in parts)
            if q.tie_breaker:
                tot = sum(np.float64(p) for p in parts)
                mx = mx + np.float64(q.tie_breaker) * (tot - mx)
            return np.float32(np.float32(q.boost) * np.float32(mx)) \
                if q.boost != 1.0 else np.float32(mx)
        if isinstance(q, BooleanQuery):
            def as_q(c):
                return TermQuery(c, q.field) if isinstance(c, str) else c
            tot = np.float64(0.0)
            must_scores = []
            for c in q.must:
                s = self._eval(as_q(c), _rewritten=True)
                if s is None:
                    return None
                must_scores.append(s)
            for c in q.filter_:
                if self._eval(as_q(c), _rewritten=True) is None:
                    return None
            for c in q.must_not:
                if self._eval(as_q(c), _rewritten=True) is not None:
                    return None
            for s in must_scores:
                tot += np.float64(s)
            n_should = 0
            for c in q.should:
                s = self._eval(as_q(c), _rewritten=True)
                if s is not None:
                    n_should += 1
                    tot += np.float64(s)
            need = max(q.min_should_match, 0 if q.must else 1)
            if q.should and n_should < need:
                return None
            if q.min_should_match > len(q.should):
                return None
            if q.boost != 1.0:
                # same boost discipline as the engine's tree nodes
                return np.float32(np.float32(q.boost)
                                  * np.float32(tot))
            return np.float32(tot)
        raise ValueError(
            f"cross-field combination not supported for {type(q).__name__}")
