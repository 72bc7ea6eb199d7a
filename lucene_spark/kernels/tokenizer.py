"""StandardAnalyzer-parity tokenizer (vectorized pandas).

The reference default analyzer (StandardAnalyzer.java:37,52,85-92) is
StandardTokenizer (UAX#29 word break, StandardTokenizer.java:31-76)
+ LowerCaseFilter + StopFilter with an *empty* default stop set, and
maxTokenLength = 255 (tokens longer than the limit are split at
maxTokenLength-char intervals).

Scope: one vectorized regex (pandas ``str.findall`` — no per-row Python
on the hot path) approximating the UAX#29 word-break rules
(StandardTokenizerImpl.jflex) that real corpora hit:

- Unicode letter/digit/underscore runs (ALetter/Numeric/ExtendNumLet;
  WB5/8/9/10/13a/13b) — accented letters, mixed alphanumerics;
- MidNumLet ' ’ . between word chars joins (WB6/7, WB11/12):
  "don't", "o’clock", "u.s.a", "3.14" are single tokens;
- MidNum , between digits joins: "1,000"; MidLetter : between letters
  joins: Swedish "a:b" — but "1:2" and "a,b" split, like the reference;
- hyphens SPLIT ("state-of-the-art" -> 4 tokens) — UAX#29 behavior;
- Han and Hiragana emit one token PER CHARACTER (WB999), Katakana
  emits runs (WB13) — the reference's CJK behavior;
- everything else (punctuation, symbols, emoji) is dropped.

Known deviations, documented: the exotic MidLetter set (U+00B7 etc.)
beyond ':' is not joined; Extend/Format (combining marks, ZWJ) are not
made transparent; regional-indicator pairs are dropped. ASCII-alnum
corpora (the fixtures and the DuckDB oracle prelude) tokenize
identically to the previous [0-9A-Za-z]+ subset.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

__all__ = ["MAX_TOKEN_LENGTH", "tokenize_series", "token_counts",
           "tokenize_one", "analyze_series", "analyze_one", "analyze_term",
           "ANALYZERS"]

MAX_TOKEN_LENGTH = 255  # StandardAnalyzer.java:52

# word chars excluding Han/Hiragana/Katakana (handled by their own
# alternatives): [^\W...] = \w AND NOT kana/han
_W = r"[^\W぀-ヿ一-鿿]"
_LET = r"[^\W\d_぀-ヿ一-鿿]"  # letters only
_WORD_RE = re.compile(
    r"[゠-ヿ]+"                      # Katakana run (WB13)
    r"|[぀-ゟ一-鿿]"         # Hiragana/Han single (WB999)
    rf"|{_W}+(?:"
    rf"['’.]{_W}+"                      # MidNumLet between word chars
    rf"|(?<=\d),\d+"                         # MidNum between digits
    rf"|(?<={_LET}):{_LET}+"                 # MidLetter between letters
    r")*")


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


# ---------------------------------------------------------------------------
# analyzer chains (per-field analyzers, core:index/FieldInfos.java;
# PorterStemFilter, analysis/common/.../en/PorterStemFilter.java)
# ---------------------------------------------------------------------------

ANALYZERS = ("standard", "porter", "english", "fold", "cjk")


def analyze_series(texts: pd.Series, analyzer: str = "standard") -> pd.Series:
    """text -> list[str] tokens through the named analyzer chain.

    'standard' = StandardAnalyzer (tokenize + lowercase, empty stopset);
    'porter'   = standard + PorterStemFilter;
    'english'  = EnglishAnalyzer (possessive strip + the 33-word stop
                 set + Porter stem). Chains are vectorized at the
                 batch-vocabulary level: flatten, factorize, transform
                 only the UNIQUE tokens (Zipf: orders of magnitude fewer
                 than total), take. Token COUNT is invariant for
                 'porter' (rewrites, never drops); 'english' REMOVES
                 stop tokens — the indexer computes norms/token_count
                 from this chain's output, and removed tokens leave no
                 position hole (the StopFilter
                 enablePositionIncrements=false behavior; documented
                 deviation from the modern default, which keeps gaps).
    """
    if analyzer == "cjk":
        # CJKAnalyzer: its own tokenize pass (maximal CJK runs ->
        # bigrams) — token merging can't be expressed as a per-token
        # vocabulary map (kernels/cjk.py)
        from .cjk import cjk_tokenize_series
        return cjk_tokenize_series(texts.fillna(""))
    toks = tokenize_series(texts)
    if analyzer == "standard":
        return toks
    lens = toks.str.len().to_numpy(dtype=np.int64)
    total = int(lens.sum())
    if total == 0:
        return toks
    flat = np.concatenate([np.asarray(t, dtype=object) if t
                           else np.empty(0, object) for t in toks])
    import pandas as _pd
    codes, uniq = _pd.factorize(flat)
    if analyzer in ("porter", "fold"):
        if analyzer == "porter":
            from .stem import stem_unique as _map_unique
        else:
            # 'fold' = StandardAnalyzer + ASCIIFoldingFilter:
            # rewrites tokens, never drops them (kernels/fold.py)
            from .fold import fold_unique as _map_unique
        mapped = _map_unique(uniq)[codes]
        bounds = np.cumsum(lens)[:-1]
        return pd.Series([list(x) for x in np.split(mapped, bounds)],
                         index=toks.index)
    if analyzer != "english":
        raise ValueError(f"unknown analyzer {analyzer!r}")
    from .stem import english_unique
    mapped = english_unique(uniq)[codes]
    keep = mapped != ""
    row_idx = np.repeat(np.arange(lens.size), lens)[keep]
    kept = mapped[keep]
    counts = np.bincount(row_idx, minlength=lens.size)
    bounds = np.cumsum(counts)[:-1]
    return pd.Series([list(x) for x in np.split(kept, bounds)],
                     index=toks.index)


def analyze_one(text: str, analyzer: str = "standard") -> list:
    """Single-string analyzer chain (query/driver side)."""
    if analyzer == "cjk":
        from .cjk import cjk_analyze_one
        return cjk_analyze_one(text)
    toks = tokenize_one(text)
    if analyzer == "standard":
        return toks
    if analyzer == "porter":
        from .stem import porter_stem
        return [porter_stem(t) if t.isascii() and t.isalpha() else t
                for t in toks]
    if analyzer == "fold":
        from .fold import fold_one
        return [fold_one(t) for t in toks]
    if analyzer != "english":
        raise ValueError(f"unknown analyzer {analyzer!r}")
    from .stem import ENGLISH_STOP_WORDS, porter_stem, strip_possessive
    out = []
    for t in toks:
        t = strip_possessive(t)
        if t in ENGLISH_STOP_WORDS:
            continue
        out.append(porter_stem(t) if t.isascii() and t.isalpha() else t)
    return out


def analyze_term(term: str, analyzer: str = "standard") -> str:
    """One already-tokenized query term through the chain's filters
    (lowercase + possessive + stem) — what QueryBuilder does to a
    single term slot. A stop word analyzes to itself: stopped terms
    are simply absent from an 'english' index, so the clause matches
    nothing (the classic QueryParser drops the clause instead —
    documented deviation for required clauses)."""
    if analyzer == "standard":
        return term
    if analyzer == "porter":
        from .stem import porter_stem
        t = term.lower()
        return porter_stem(t) if t.isascii() and t.isalpha() else t
    if analyzer == "fold":
        from .fold import fold_one
        return fold_one(term.lower())
    if analyzer == "cjk":
        # single term slot: width fold + lowercase. A 2-char CJK term
        # IS its bigram; a longer CJK term analyzes to MULTIPLE bigram
        # tokens and needs query-level analysis (analyze_one) — same
        # single-slot caveat the stop-word note above documents.
        from .cjk import width_fold_one
        return width_fold_one(term.lower())
    if analyzer != "english":
        raise ValueError(f"unknown analyzer {analyzer!r}")
    from .stem import ENGLISH_STOP_WORDS, porter_stem, strip_possessive
    t = strip_possessive(term.lower())
    if t in ENGLISH_STOP_WORDS:
        return t
    return porter_stem(t) if t.isascii() and t.isalpha() else t
