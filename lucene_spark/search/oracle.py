"""Brute-force scoring oracle — our CheckHits (tests/search/CheckHits.java:181).

An independent, trivially-auditable implementation: per-doc Python
Counter tokenization (deliberately NOT the vectorized engine path),
full-corpus scoring, no compression, no pruning, no Spark. Every engine
execution (exhaustive and pruned) must produce rank-identical (doc_id,
float32 score) against this.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd

from ..kernels.bm25 import BM25Scorer, sum_idf
from ..kernels.smallfloat import int_to_byte4
from ..kernels.tokenizer import tokenize_one


def _o_intersect_sum(parts):
    docs, s0 = parts[0]
    acc = s0.astype(np.float64)
    for d2, s2 in parts[1:]:
        if docs.size == 0:
            break
        docs, i1, i2 = np.intersect1d(docs, d2, assume_unique=True,
                                      return_indices=True)
        acc = acc[i1] + s2[i2].astype(np.float64)
    return docs, acc.astype(np.float32)


def _o_union_sum(parts):
    live = [p for p in parts if p[0].size]
    if not live:
        return np.zeros(0, np.int64), np.zeros(0, np.float32)
    alld = np.concatenate([p[0] for p in live])
    alls = np.concatenate([p[1] for p in live])
    udocs, inv = np.unique(alld, return_inverse=True)
    sums = np.zeros(udocs.size, dtype=np.float64)
    np.add.at(sums, inv, alls.astype(np.float64))
    return udocs, sums.astype(np.float32)


class BruteForceOracle:
    def __init__(self, docs: pd.DataFrame, id_col: str = "doc_id",
                 text_col: str = "text", analyzer: str = "standard"):
        from ..kernels.tokenizer import analyze_one
        self.doc_ids = docs[id_col].to_numpy(dtype=np.int64)
        self.tokens = [analyze_one(t, analyzer)
                       for t in docs[text_col].fillna("")]
        self.tfs = [Counter(t) for t in self.tokens]
        self.lengths = np.array([len(t) for t in self.tokens], dtype=np.int64)
        self.norms = np.asarray(int_to_byte4(self.lengths), dtype=np.uint8)
        self.doc_count = len(self.tokens)
        self.sum_ttf = int(self.lengths.sum())
        self.df = Counter()
        for c in self.tfs:
            self.df.update(c.keys())

    def _scorer(self, term) -> BM25Scorer:
        return BM25Scorer(self.df[term], self.doc_count, self.sum_ttf)

    def _term_scores(self, term) -> np.ndarray:
        sc = self._scorer(term)
        tf = np.array([c.get(term, 0) for c in self.tfs], dtype=np.int64)
        s = sc.score(tf, self.norms)
        s[tf == 0] = 0.0
        return s, tf

    def topk(self, qdict: dict, k: int | None = None) -> list:
        """qdict: FIXTURES.md §2 shape. Returns [(doc_id, float32 score)]."""
        k = k or qdict.get("k", 10)
        terms = qdict.get("terms", [])
        t = qdict["type"]
        if t == "term":
            s, tf = self._term_scores(terms[0])
            mask = tf > 0
        elif t == "and":
            per = [self._term_scores(x) for x in terms]
            mask = np.all([tf > 0 for _, tf in per], axis=0)
            tot = np.zeros(self.doc_count, dtype=np.float64)
            for sx, _ in per:
                tot += sx.astype(np.float64)
            s = tot.astype(np.float32)
        elif t == "or":
            per = [self._term_scores(x) for x in terms]
            mask = np.any([tf > 0 for _, tf in per], axis=0)
            tot = np.zeros(self.doc_count, dtype=np.float64)
            for sx, _ in per:
                tot += sx.astype(np.float64)
            s = tot.astype(np.float32)
        elif t == "phrase":
            slop = qdict.get("slop", 0)
            if slop:
                freqs = np.array([self._sloppy_freq_true(toks, terms, slop)
                                  for toks in self.tokens], dtype=np.float64)
            else:
                freqs = np.array([self._phrase_freq(toks, terms)
                                  for toks in self.tokens], dtype=np.int64)
            mask = freqs > 0
            idfs = [self._scorer(x).idf for x in terms]
            sc = BM25Scorer(1, self.doc_count, self.sum_ttf)
            sc.weight = np.float32(sum_idf(idfs))
            s = sc.score(freqs, self.norms)
        elif t == "synonym":
            tfs = np.zeros(self.doc_count, dtype=np.int64)
            for x in terms:
                tfs += np.array([c.get(x, 0) for c in self.tfs], dtype=np.int64)
            mask = tfs > 0
            sc = BM25Scorer(max(self.df[x] for x in terms),
                            self.doc_count, self.sum_ttf)
            s = sc.score(tfs, self.norms)
        elif t == "dismax":
            tie = np.float64(qdict.get("tie_breaker", 0.0))
            per = [self._term_scores(x) for x in terms]
            mask = np.any([tf > 0 for _, tf in per], axis=0)
            smat = np.stack([sx for sx, _ in per])
            mx = smat.max(axis=0)
            if tie:
                tot = smat.astype(np.float64).sum(axis=0)
                s = (mx.astype(np.float64)
                     + tie * (tot - mx.astype(np.float64))).astype(np.float32)
            else:
                s = mx
        elif t == "boolean":
            must = qdict.get("must", [])
            should = qdict.get("should", [])
            must_not = qdict.get("must_not", [])
            filt = qdict.get("filter", [])
            msm = qdict.get("min_should_match", 0)
            tot = np.zeros(self.doc_count, dtype=np.float64)
            mask = np.ones(self.doc_count, dtype=bool)
            for x in must:
                sx, tf = self._term_scores(x)
                mask &= tf > 0
                tot += sx.astype(np.float64)
            for x in filt:
                mask &= np.array([c.get(x, 0) for c in self.tfs]) > 0
            for x in must_not:
                mask &= np.array([c.get(x, 0) for c in self.tfs]) == 0
            n_sh = np.zeros(self.doc_count, dtype=np.int64)
            for x in should:
                sx, tf = self._term_scores(x)
                tot += sx.astype(np.float64)
                n_sh += tf > 0
            if should:
                mask &= n_sh >= max(msm, 0 if must else 1)
            s = tot.astype(np.float32)
        else:
            raise ValueError(t)
        idx = np.flatnonzero(mask)
        order = np.lexsort((self.doc_ids[idx], -s[idx]))[:k]
        sel = idx[order]
        return [(int(self.doc_ids[i]), np.float32(s[i])) for i in sel]

    # ---- recursive nested-query oracle --------------------------------
    def eval_query(self, q, boost_mult: float = 1.0):
        """Evaluate a Query AST (including nested BooleanQuery clauses)
        -> (doc_ids, float32 scores) over all matching docs. Mirrors
        the scorer-composition float discipline of the engine's
        eval_tree: every node emits float32, every combiner accumulates
        in double and casts once; boosts multiply into leaf weights."""
        from .query import (AndQuery, BooleanQuery, ConstantScoreQuery,
                            DisMaxQuery, OrQuery, PhraseQuery,
                            SynonymQuery, TermQuery)
        ids = self.doc_ids

        def as_q(c, field):
            return TermQuery(c, field) if isinstance(c, str) else c

        if isinstance(q, TermQuery):
            sc = BM25Scorer(self.df[q.term], self.doc_count, self.sum_ttf,
                            boost=boost_mult * q.boost)
            tf = np.array([c.get(q.term, 0) for c in self.tfs], dtype=np.int64)
            s = sc.score(tf, self.norms)
            m = tf > 0
            return ids[m], s[m]
        if isinstance(q, AndQuery):
            parts = [self.eval_query(TermQuery(t, q.field),
                                     boost_mult * q.boost) for t in q.terms]
            return _o_intersect_sum(parts)
        if isinstance(q, OrQuery):
            parts = [self.eval_query(TermQuery(t, q.field),
                                     boost_mult * q.boost) for t in q.terms
                     if self.df[t] > 0]
            return _o_union_sum(parts)
        if isinstance(q, PhraseQuery):
            slop = q.slop
            if slop:
                freqs = np.array([self._sloppy_freq_true(t, list(q.terms), slop)
                                  for t in self.tokens], dtype=np.float64)
            else:
                freqs = np.array([self._phrase_freq(t, list(q.terms))
                                  for t in self.tokens], dtype=np.int64)
            idfs = [BM25Scorer(self.df[t], self.doc_count, self.sum_ttf).idf
                    for t in q.terms]
            sc = BM25Scorer(1, self.doc_count, self.sum_ttf)
            sc.weight = np.float32(np.float32(boost_mult * q.boost)
                                   * sum_idf(idfs))
            s = sc.score(freqs, self.norms)
            m = freqs > 0
            return ids[m], s[m]
        from .query import MultiPhraseQuery
        if isinstance(q, MultiPhraseQuery):
            slots = [s[0] if len(s) == 1 else tuple(s) for s in q.slots]
            if q.slop:
                freqs = np.array(
                    [self._sloppy_freq_true(t, slots, q.slop)
                     for t in self.tokens], dtype=np.float64)
            else:
                freqs = np.array([self._phrase_freq(t, slots)
                                  for t in self.tokens], dtype=np.int64)
            idfs = [BM25Scorer(self.df[t], self.doc_count, self.sum_ttf).idf
                    for t in q.terms if self.df[t] > 0]
            sc = BM25Scorer(1, self.doc_count, self.sum_ttf)
            sc.weight = np.float32(np.float32(boost_mult * q.boost)
                                   * sum_idf(idfs))
            s = sc.score(freqs, self.norms)
            m = freqs > 0
            return ids[m], s[m]
        if isinstance(q, SynonymQuery):
            tfs = np.zeros(self.doc_count, dtype=np.int64)
            for x in q.terms:
                tfs += np.array([c.get(x, 0) for c in self.tfs], dtype=np.int64)
            sc = BM25Scorer(max(self.df[x] for x in q.terms),
                            self.doc_count, self.sum_ttf,
                            boost=boost_mult * q.boost)
            s = sc.score(tfs, self.norms)
            m = tfs > 0
            return ids[m], s[m]
        if isinstance(q, DisMaxQuery):
            parts = [self.eval_query(as_q(c, q.field), boost_mult * q.boost)
                     for c in q.terms_]
            parts = [p for p in parts if p[0].size]
            if not parts:
                return ids[:0], np.zeros(0, np.float32)
            udocs = np.unique(np.concatenate([p[0] for p in parts]))
            smat = np.zeros((len(parts), udocs.size), dtype=np.float32)
            for i, (d, s) in enumerate(parts):
                smat[i, np.searchsorted(udocs, d)] = s
            mx = smat.max(axis=0)
            tie = np.float64(q.tie_breaker)
            if tie:
                tot = smat.astype(np.float64).sum(axis=0)
                return udocs, (mx.astype(np.float64)
                               + tie * (tot - mx.astype(np.float64))
                               ).astype(np.float32)
            return udocs, mx
        if isinstance(q, ConstantScoreQuery):
            d, _ = self.eval_query(q.query, 1.0)
            return d, np.full(d.size, np.float32(boost_mult * q.boost),
                              dtype=np.float32)
        if isinstance(q, BooleanQuery):
            bm = boost_mult * q.boost
            mparts = [self.eval_query(as_q(c, q.field), bm) for c in q.must]
            sparts = [self.eval_query(as_q(c, q.field), bm) for c in q.should]
            if q.must:
                if any(p[0].size == 0 for p in mparts):
                    return ids[:0], np.zeros(0, np.float32)
                docs, ms = _o_intersect_sum(mparts)
                tot = ms.astype(np.float64)
            else:
                docs, _ = _o_union_sum(sparts)
                tot = np.zeros(docs.size, dtype=np.float64)
            for c in q.filter_:
                fd, _ = self.eval_query(as_q(c, q.field), 1.0)
                keep = np.isin(docs, fd, assume_unique=True)
                docs, tot = docs[keep], tot[keep]
            for c in q.must_not:
                nd, _ = self.eval_query(as_q(c, q.field), 1.0)
                keep = ~np.isin(docs, nd, assume_unique=True)
                docs, tot = docs[keep], tot[keep]
            n_sh = np.zeros(docs.size, dtype=np.int64)
            for sd, ss in sparts:
                if sd.size == 0:
                    continue
                idx = np.searchsorted(sd, docs)
                idx_c = np.minimum(idx, sd.size - 1)
                hit = (sd.size > 0) & (sd[idx_c] == docs) if sd.size else \
                    np.zeros(docs.size, bool)
                tot[hit] += ss[idx_c[hit]].astype(np.float64)
                n_sh += hit
            if not (q.must and q.min_should_match == 0):
                keep = n_sh >= max(q.min_should_match, 0 if q.must else 1)
                docs, tot = docs[keep], tot[keep]
            return docs, tot.astype(np.float32)
        raise TypeError(type(q))

    def topk_query(self, q, k: int) -> list:
        docs, scores = self.eval_query(q)
        order = np.lexsort((docs, -scores))[:k]
        return [(int(docs[i]), np.float32(scores[i])) for i in order]

    @staticmethod
    def _phrase_freq(tokens: list, phrase: list) -> int:
        """Exact-phrase occurrence count; a position may be a str or —
        for MultiPhraseQuery slots — a tuple of alternatives."""
        n = len(phrase)
        return sum(1 for i in range(len(tokens) - n + 1)
                   if all(tokens[i + j] == p if isinstance(p, str)
                          else tokens[i + j] in p
                          for j, p in enumerate(phrase)))

    @staticmethod
    def _sloppy_freq_true(tokens: list, phrase: list, slop: int) -> float:
        """TRUE sloppy-phrase freq (SloppyPhraseMatcher semantics):
        min-pointer sweep over offset-adjusted position lists; every
        window with stretch <= slop contributes 1/(1+stretch); terms
        may match in any order. Independent per-doc implementation of
        the engine's sloppy_freqs kernel.

        Shares the kernel's documented repeated-term deviation: two
        phrase positions of a repeated term may match the same token
        (no SloppyPhraseMatcher repeat-collision bookkeeping), so this
        oracle cannot catch that divergence — see
        kernels.sloppy_freqs."""
        pls = [[i - off for i, t in enumerate(tokens)
                if (t == term if isinstance(term, str) else t in term)]
               for off, term in enumerate(phrase)]
        if any(not p for p in pls):
            return 0.0
        m = len(phrase)
        ptr = [0] * m
        freq = 0.0
        while True:
            vals = [pls[i][ptr[i]] for i in range(m)]
            mn, mx = min(vals), max(vals)
            if mx - mn <= slop:
                freq += 1.0 / (1 + mx - mn)
            i_min = vals.index(mn)
            ptr[i_min] += 1
            if ptr[i_min] >= len(pls[i_min]):
                break
        return freq

    @staticmethod
    def _phrase_freq_sloppy(tokens: list, phrase: list, slop: int) -> int:
        """Ordered-sloppy: greedy minimal chain per start position,
        counted when stretch <= slop (mirrors kernels.phrase_freqs)."""
        import bisect
        pls = [[i for i, t in enumerate(tokens) if t == term]
               for term in phrase]
        if any(not p for p in pls):
            return 0
        count = 0
        for p0 in pls[0]:
            cur, ok = p0, True
            for pl in pls[1:]:
                j = bisect.bisect_right(pl, cur)
                if j >= len(pl):
                    ok = False
                    break
                cur = pl[j]
            if ok and cur - p0 - (len(phrase) - 1) <= slop:
                count += 1
        return count
