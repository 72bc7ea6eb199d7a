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


class BruteForceOracle:
    def __init__(self, docs: pd.DataFrame, id_col: str = "doc_id",
                 text_col: str = "text"):
        self.doc_ids = docs[id_col].to_numpy(dtype=np.int64)
        self.tokens = [tokenize_one(t) for t in docs[text_col].fillna("")]
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
                freqs = np.array([self._phrase_freq_sloppy(toks, terms, slop)
                                  for toks in self.tokens], dtype=np.int64)
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

    @staticmethod
    def _phrase_freq(tokens: list, phrase: list) -> int:
        n = len(phrase)
        return sum(1 for i in range(len(tokens) - n + 1)
                   if tokens[i:i + n] == phrase)

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
