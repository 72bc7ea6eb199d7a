"""StandardAnalyzer-parity tokenizer (vectorized pandas).

The reference default analyzer (StandardAnalyzer.java:37,52,85-92) is
StandardTokenizer (UAX#29 word break, StandardTokenizer.java:31-76)
+ LowerCaseFilter + StopFilter with an *empty* default stop set, and
maxTokenLength = 255 (tokens longer than the limit are split at
maxTokenLength-char intervals).

Scope: for ASCII alphanumeric corpora (the transcript fixture vocabulary —
lowercase words, digit runs, mixed-case variants) UAX#29 word break reduces
to runs of [0-9A-Za-z]. We implement exactly that subset, vectorized via
pandas ``str.findall`` (no per-row Python lambdas on the hot path), and
keep the tokenizer pluggable per field for richer analyzers later.

Parity notes vs UAX#29 for full Unicode: apostrophes/hyphens/CJK are NOT
handled; the fixture generator never emits them (FIXTURES.md §1).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

__all__ = ["MAX_TOKEN_LENGTH", "tokenize_series", "token_counts", "tokenize_one"]

MAX_TOKEN_LENGTH = 255  # StandardAnalyzer.java:52
_WORD_RE = re.compile(r"[0-9A-Za-z]+")


def _split_long(tokens: list) -> list:
    """StandardTokenizer splits super-long tokens at maxTokenLength
    intervals (StandardAnalyzer javadoc; maxTokenLength semantics)."""
    out = []
    for t in tokens:
        if len(t) <= MAX_TOKEN_LENGTH:
            out.append(t)
        else:
            out.extend(t[i:i + MAX_TOKEN_LENGTH] for i in range(0, len(t), MAX_TOKEN_LENGTH))
    return out


def tokenize_series(texts: pd.Series) -> pd.Series:
    """text -> list[str] tokens (lowercased), vectorized.

    pandas str ops run in C over the whole Arrow batch; the long-token
    split is a cheap per-list fixup only applied to rows that need it.
    """
    toks = texts.fillna("").str.lower().str.findall(_WORD_RE)
    # fast path: only rows containing a >255-char token need the split
    needs = texts.fillna("").str.len() > MAX_TOKEN_LENGTH
    if needs.any():
        toks = toks.copy()
        idx = toks.index[needs]
        toks.loc[idx] = [_split_long(t) for t in toks.loc[idx]]
    return toks


def token_counts(texts: pd.Series) -> np.ndarray:
    """Per-row token count (the field length fed to computeNorm)."""
    return tokenize_series(texts).str.len().to_numpy(dtype=np.int64)


def tokenize_one(text: str) -> list:
    """Single-string helper for tests/driver-side use."""
    return _split_long(_WORD_RE.findall((text or "").lower()))
