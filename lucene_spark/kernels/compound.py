"""DictionaryCompoundWordTokenFilter — dictionary-driven decompounding.

Reference semantics (analysis/common/src/java/org/apache/lucene/
analysis/compound/DictionaryCompoundWordTokenFilter.java +
CompoundWordTokenFilterBase.java:36-76): tokens of length >=
minWordSize (default 5) are scanned at every start position for
dictionary subwords of length minSubwordSize (2) .. maxSubwordSize
(15); every match is emitted as an ADDITIONAL token right after the
original (the original is always kept). A dictionary word matching at
k positions emits k times — per-(start, length) emission, so the
multiset of emissions equals per-dictionary-word occurrence counts.

Deviations, same family as the shingle/edge chains: the reference
stacks subword tokens at the original's position (posInc 0); this
format assigns sequential positions, so phrase queries over a
compound field are not meaningful in either representation.
onlyLongestMatch=true and the hyphenation-grammar variant
(HyphenationCompoundWordTokenFilter) are not offered.

The chain hook is a spec parameter (kernels/tokenizer.py
parse_chain_spec): ``'standard?compound=foo,bar'`` or
``'german?compound=...'`` — decompounding runs on the raw lowercase
token stream BEFORE the base chain's stop/stem stages, so subwords
stem exactly like standalone words (the configuration the reference
javadoc describes for German).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

MIN_WORD_SIZE = 5      # CompoundWordTokenFilterBase.DEFAULT_MIN_WORD_SIZE
MIN_SUBWORD_SIZE = 2   # DEFAULT_MIN_SUBWORD_SIZE
MAX_SUBWORD_SIZE = 15  # DEFAULT_MAX_SUBWORD_SIZE


def subwords_of(token: str, dictionary: frozenset) -> list:
    """All dictionary subword emissions of one token, in the
    reference's (start asc, length asc) order."""
    n = len(token)
    if n < MIN_WORD_SIZE:
        return []
    out = []
    max_l = min(MAX_SUBWORD_SIZE, n)
    for i in range(n - MIN_SUBWORD_SIZE + 1):
        for ln in range(MIN_SUBWORD_SIZE, max_l + 1):
            if i + ln > n:
                break
            s = token[i:i + ln]
            if s in dictionary:
                out.append(s)
    return out


def decompound_lists(toks: pd.Series, dictionary: frozenset) -> pd.Series:
    """Token lists -> lists with each token followed by its dictionary
    subwords. Vectorized at the VOCABULARY level (emissions of a token
    depend only on the token): factorize the corpus stream, decompose
    only unique tokens, flat-map through the code array (same shape as
    shingle.edge_lists / ngram.ngram_lists)."""
    lens = toks.str.len().to_numpy(dtype=np.int64)
    if int(lens.sum()) == 0:
        return toks
    flat = np.concatenate([np.asarray(t, dtype=object) if t
                           else np.empty(0, object) for t in toks])
    codes, uniq = pd.factorize(flat)
    exp_u = [[t] + subwords_of(t, dictionary) for t in uniq]
    n_u = np.array([len(g) for g in exp_u], dtype=np.int64)
    if int(n_u.max(initial=0)) <= 1:
        return toks  # nothing decomposes
    flat_u = np.concatenate([np.asarray(g, dtype=object)
                             for g in exp_u])
    starts_u = np.concatenate(([0], np.cumsum(n_u)[:-1]))
    per_tok = n_u[codes]
    total = int(per_tok.sum())
    starts = np.repeat(np.cumsum(per_tok) - per_tok, per_tok)
    ramp = np.arange(total, dtype=np.int64) - starts
    idx = np.repeat(starts_u[codes], per_tok) + ramp
    expanded = flat_u[idx]
    row_id = np.repeat(np.arange(lens.size), lens)
    row_of = np.repeat(row_id, per_tok)
    counts = np.bincount(row_of, minlength=lens.size)
    bounds = np.cumsum(counts)[:-1]
    return pd.Series([list(x) for x in np.split(expanded, bounds)],
                     index=toks.index)


def decompound_one(tokens: list, dictionary: frozenset) -> list:
    return [x for t in tokens for x in [t] + subwords_of(t, dictionary)]
