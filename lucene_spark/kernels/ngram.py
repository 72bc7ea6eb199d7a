"""NGramTokenFilter chain — the trigram substring-search field.

Reference semantics: NGramTokenFilter (analysis/common/src/java/org/
apache/lucene/analysis/ngram/NGramTokenFilter.java:30-62): every
character n-gram of each token between minGram and maxGram;
preserveOriginal=true additionally emits the ORIGINAL token when its
length falls outside [minGram, maxGram] (keepShortTerm/keepLongTerm,
NGramTokenFilter.java:141-151).

The 'ngram' chain fixes (minGram=3, maxGram=3, preserveOriginal=true)
— the trigram-index configuration (the same field design as
code-search trigram indexes): a token of length >= 3 emits all its
3-grams in order; a shorter token survives as itself. With the
index's sequential position assignment, the trigrams of one token
occupy CONSECUTIVE positions, so a PhraseQuery over the trigrams of a
pattern matches exactly the docs where the pattern occurs as a
contiguous substring of the gram stream — the pruning engine behind
search/substring.py's index-accelerated substring grep.

Like the shingle/edge chains (kernels/shingle.py), positions are
sequential rather than token-stacked (the format stores no stacked
positions); the one observable consequence — trigram phrases can
bridge a token boundary — is handled by substring_search's verify
step.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

NGRAM_SIZE = 3  # minGram = maxGram = 3


def _ngrams_of(token: str) -> list:
    n = len(token)
    if n < NGRAM_SIZE:
        # keepShortTerm: preserveOriginal emits the too-short original
        return [token] if token else []
    out = [token[i:i + NGRAM_SIZE] for i in range(n - NGRAM_SIZE + 1)]
    if n > NGRAM_SIZE:
        # keepLongTerm: preserveOriginal ALSO emits the original after
        # its grams (NGramTokenFilter.java:141-151) — whole-token
        # TermQuery lookups stay exact on an ngram field, and the
        # original lands AFTER the token's (consecutive) grams so the
        # trigram-phrase contiguity argument is unchanged
        out.append(token)
    return out


def ngram_lists(toks: pd.Series) -> pd.Series:
    """Token lists -> per-row trigram lists. Vectorized at the
    VOCABULARY level (grams of a token depend only on the token):
    factorize the corpus stream, expand only unique tokens, flat-map
    through the code array (same shape as shingle.edge_lists)."""
    lens = toks.str.len().to_numpy(dtype=np.int64)
    if int(lens.sum()) == 0:
        return pd.Series([[] for _ in range(lens.size)], index=toks.index)
    flat = np.concatenate([np.asarray(t, dtype=object) if t
                           else np.empty(0, object) for t in toks])
    codes, uniq = pd.factorize(flat)
    grams_u = [_ngrams_of(t) for t in uniq]
    n_u = np.array([len(g) for g in grams_u], dtype=np.int64)
    flat_u = (np.concatenate([np.asarray(g, dtype=object)
                              for g in grams_u])
              if int(n_u.sum()) else np.empty(0, object))
    starts_u = np.concatenate(([0], np.cumsum(n_u)[:-1]))
    per_tok = n_u[codes]
    total = int(per_tok.sum())
    starts = np.repeat(np.cumsum(per_tok) - per_tok, per_tok)
    ramp = np.arange(total, dtype=np.int64) - starts
    idx = np.repeat(starts_u[codes], per_tok) + ramp
    expanded = flat_u[idx]
    row_id = np.repeat(np.arange(lens.size), lens)
    row_of_gram = np.repeat(row_id, per_tok)
    counts = np.bincount(row_of_gram, minlength=lens.size)
    bounds = np.cumsum(counts)[:-1]
    return pd.Series([list(x) for x in np.split(expanded, bounds)],
                     index=toks.index)


def ngram_series(texts: pd.Series) -> pd.Series:
    from .tokenizer import tokenize_series
    return ngram_lists(tokenize_series(texts))


def ngram_one(text: str) -> list:
    from .tokenizer import tokenize_one
    return [g for t in tokenize_one(text) for g in _ngrams_of(t)]
