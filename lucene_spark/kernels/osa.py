"""Optimal String Alignment (restricted Damerau-Levenshtein) distance.

Lucene's FuzzyQuery defaults to ``transpositions=true``
(core:search/FuzzyQuery.java:79-84): adjacent-character swaps count as
ONE edit, via LevenshteinAutomata built with transpositions
(core:util/automaton/LevenshteinAutomata.java — the Schulz & Mihov
automaton with the transposition primitive). The automaton's
transposition is the OSA primitive: a swapped pair may not be edited
again, which is exactly the restricted Damerau-Levenshtein recurrence

    d[i][j] = min(d[i-1][j] + 1,            # delete
                  d[i][j-1] + 1,            # insert
                  d[i-1][j-1] + cost,       # substitute
                  d[i-2][j-2] + 1  if a[i-1] == b[j-2]
                                  and a[i-2] == b[j-1])  # transpose

So ``"baat"`` matches ``"abat"`` at maxEdits=1 (plain Levenshtein
needs 2).

Two surfaces:
- ``osa_distance(a, b)`` — scalar, for driver-side checks and the
  percolator's per-candidate MTQ verification;
- ``osa_leq(terms, pattern, k)`` — BATCH-vectorized over an Arrow
  batch of dictionary terms (the executor-side fuzzy expansion scan):
  terms are padded into one uint32 code-point matrix via a single
  utf-32 reinterpret, and the DP runs as O(len(pattern) * max_len)
  numpy column operations over the whole batch — no per-term Python.
  The |len(t) - len(p)| <= k length band (each edit, including a
  transposition, changes length by at most 1) stays a pushed-down
  parquet predicate upstream; this kernel only sees banded survivors.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["osa_distance", "osa_distances", "osa_leq"]


def osa_distance(a: str, b: str) -> int:
    """Scalar OSA distance (restricted Damerau-Levenshtein)."""
    if a == b:
        return 0
    m, n = len(a), len(b)
    if m == 0 or n == 0:
        return m or n
    prev2: list | None = None
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        ai = a[i - 1]
        for j in range(1, n + 1):
            cost = 0 if ai == b[j - 1] else 1
            v = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
            if (i > 1 and j > 1 and ai == b[j - 2]
                    and a[i - 2] == b[j - 1]):
                v = min(v, prev2[j - 2] + 1)
            cur[j] = v
        prev2, prev = prev, cur
    return prev[n]


def _codepoint_matrix(terms: list, max_len: int) -> np.ndarray:
    """Pad every term to max_len with NUL and reinterpret the joined
    utf-32 bytes as one (n_terms, max_len) uint32 matrix — a single C
    pass, no per-character Python."""
    joined = "".join(t[:max_len].ljust(max_len, "\0") for t in terms)
    return np.frombuffer(joined.encode("utf-32-le"),
                         dtype=np.uint32).reshape(len(terms), max_len)


def osa_leq(terms, pattern: str, k: int,
            transpositions: bool = True) -> np.ndarray:
    """Boolean mask: OSA(term, pattern) <= k, vectorized over the batch.
    transpositions=False degrades to plain Levenshtein (FuzzyQuery's
    transpositions=false constructor arg)."""
    terms = ["" if t is None else str(t) for t in terms]
    n = len(terms)
    if n == 0:
        return np.zeros(0, dtype=bool)
    m = len(pattern)
    lens = np.fromiter((len(t) for t in terms), dtype=np.int64, count=n)
    band = np.abs(lens - m) <= k
    if m == 0:
        return band  # distance == len(term)
    dist = osa_distances(terms, pattern, transpositions)
    return band & (dist <= k)


def osa_distances(terms, pattern: str,
                  transpositions: bool = True) -> np.ndarray:
    """int32 OSA distances of every batch term to the pattern — the
    same banded-matrix DP osa_leq runs, exposed for rankers that need
    the distance itself (DirectSpellChecker's similarity ordering)."""
    terms = ["" if t is None else str(t) for t in terms]
    n = len(terms)
    if n == 0:
        return np.zeros(0, dtype=np.int32)
    m = len(pattern)
    lens = np.fromiter((len(t) for t in terms), dtype=np.int64, count=n)
    if m == 0:
        return lens.astype(np.int32)
    max_len = int(lens.max()) if n else 0
    if max_len == 0:
        return np.full(n, m, dtype=np.int32)
    T = _codepoint_matrix(terms, max_len)
    P = np.frombuffer(pattern.encode("utf-32-le"), dtype=np.uint32)
    # dp rows over target prefix length j; columns over pattern prefix i
    prev = np.broadcast_to(np.arange(m + 1, dtype=np.int32),
                           (n, m + 1)).copy()
    final = np.empty((n, max_len + 1), dtype=np.int32)
    final[:, 0] = m
    prev2 = None
    t_prev = None
    for j in range(1, max_len + 1):
        tc = T[:, j - 1]
        cur = np.empty_like(prev)
        cur[:, 0] = j
        for i in range(1, m + 1):
            cost = (tc != P[i - 1]).astype(np.int32)
            v = np.minimum(prev[:, i] + 1, prev[:, i - 1] + cost)
            v = np.minimum(v, cur[:, i - 1] + 1)
            if transpositions and i > 1 and j > 1:
                tr = (tc == P[i - 2]) & (t_prev == P[i - 1])
                if tr.any():
                    v = np.where(tr, np.minimum(v, prev2[:, i - 2] + 1), v)
            cur[:, i] = v
        final[:, j] = cur[:, m]
        prev2, prev, t_prev = prev, cur, tc
    return final[np.arange(n), np.minimum(lens, max_len)]


def osa_leq_udf(pattern: str, k: int):
    """Arrow-batched boolean pandas_udf: OSA(term, pattern) <= k —
    the shared executor-side filter for FuzzyQuery expansion, the
    fuzzy suggester, and context-suggester lookup (one definition,
    one place to evolve the band/transposition handling)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("boolean")
    def _ok(s: pd.Series) -> pd.Series:
        return pd.Series(osa_leq(s.tolist(), pattern, k), index=s.index)
    return _ok


def osa_dist_udf(pattern: str):
    """Arrow-batched int pandas_udf: OSA(term, pattern) — the spell
    checker's ranked-distance twin of osa_leq_udf."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def _d(s: pd.Series) -> pd.Series:
        return pd.Series(osa_distances(s.tolist(), pattern),
                         index=s.index).astype("int32")
    return _d
