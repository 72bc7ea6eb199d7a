"""ShingleFilter + EdgeNGramTokenFilter chains.

Reference semantics:
- ShingleFilter (analysis/common/src/java/org/apache/lucene/analysis/
  shingle/ShingleFilter.java:40-57): token n-grams joined with the
  default " " separator, DEFAULT_MIN/MAX_SHINGLE_SIZE = 2. The
  'shingle' chain here is ShingleAnalyzerWrapper with
  outputUnigrams=false (the common shingle-FIELD configuration — a
  second field carrying word bigrams for fast phrase-ish matching and
  the FreeTextSuggester/MLT family): each consecutive token pair emits
  ONE shingle at its own position, which is exactly the reference's
  position stream for that configuration (every shingle posInc=1 when
  unigrams are off). outputUnigrams=true needs stacked positions (two
  tokens at one position), which this index format does not store —
  same documented restriction as index-time synonym graphs.
- EdgeNGramTokenFilter (analysis/common/.../ngram/
  EdgeNGramTokenFilter.java:30-45): every prefix of each token between
  minGram and maxGram; the 'edge' chain fixes (minGram=1, maxGram=8,
  preserveOriginal=true) — the search-as-you-type configuration, so a
  query prefix typed by the user IS an index term and matches with
  plain TermQuery speed. Deviation: the reference keeps all grams of
  one token at the token's position; this chain assigns sequential
  positions (the format has no stacked positions) — phrase queries
  over an edge field are not meaningful in either representation.

Both chains transform the corpus side only; query terms against these
fields are dictionary-level strings (like MultiTermQuery patterns):
a shingle query term is the two words joined by one space, an edge
query term is the typed prefix, both lowercased by the caller-facing
analyze_term hook.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

EDGE_MIN_GRAM = 1
EDGE_MAX_GRAM = 8
SHINGLE_SIZE = 2
SEPARATOR = " "  # ShingleFilter.DEFAULT_TOKEN_SEPARATOR


def _flat(toks: pd.Series):
    lens = toks.str.len().to_numpy(dtype=np.int64)
    if int(lens.sum()) == 0:
        return lens, np.empty(0, dtype=object)
    flat = np.concatenate([np.asarray(t, dtype=object) if t
                           else np.empty(0, object) for t in toks])
    return lens, flat


def shingle_lists(toks: pd.Series) -> pd.Series:
    """Token lists -> per-row lists of space-joined bigram shingles
    (vectorized: one fused unicode add over the corpus token stream;
    row boundaries never pair)."""
    lens, flat = _flat(toks)
    counts = np.maximum(lens - 1, 0)
    if flat.size < 2:
        return pd.Series([[] for _ in range(lens.size)], index=toks.index)
    left = flat[:-1].astype("U")
    right = flat[1:].astype("U")
    pairs = np.char.add(np.char.add(left, SEPARATOR), right)
    row_id = np.repeat(np.arange(lens.size), lens)
    same_row = row_id[:-1] == row_id[1:]
    kept = pairs[same_row].astype(object)
    bounds = np.cumsum(counts)[:-1]
    return pd.Series([list(x) for x in np.split(kept, bounds)],
                     index=toks.index)


def _edge_grams_of(token: str) -> list:
    hi = min(len(token), EDGE_MAX_GRAM)
    out = [token[:g] for g in range(EDGE_MIN_GRAM, hi + 1)]
    if len(token) > EDGE_MAX_GRAM:
        out.append(token)  # preserveOriginal
    return out


def edge_lists(toks: pd.Series) -> pd.Series:
    """Token lists -> per-row lists of edge n-grams. Vectorized at the
    VOCABULARY level (grams of a token depend only on the token):
    factorize the corpus stream, expand only unique tokens, then
    flat-map through the code array."""
    lens, flat = _flat(toks)
    if flat.size == 0:
        return pd.Series([[] for _ in range(lens.size)], index=toks.index)
    codes, uniq = pd.factorize(flat)
    grams_u = [_edge_grams_of(t) for t in uniq]
    n_u = np.array([len(g) for g in grams_u], dtype=np.int64)
    flat_u = np.concatenate([np.asarray(g, dtype=object)
                             for g in grams_u])
    starts_u = np.concatenate(([0], np.cumsum(n_u)[:-1]))
    # expand per corpus token: gather each code's gram slice
    per_tok = n_u[codes]
    idx = (np.repeat(starts_u[codes], per_tok)
           + _ramp(per_tok))
    expanded = flat_u[idx]
    row_id = np.repeat(np.arange(lens.size), lens)
    row_of_gram = np.repeat(row_id, per_tok)
    counts = np.bincount(row_of_gram, minlength=lens.size)
    bounds = np.cumsum(counts)[:-1]
    return pd.Series([list(x) for x in np.split(expanded, bounds)],
                     index=toks.index)


def _ramp(counts: np.ndarray) -> np.ndarray:
    """[3, 2] -> [0, 1, 2, 0, 1] (per-group aranges, vectorized)."""
    total = int(counts.sum())
    starts = np.repeat(np.cumsum(counts) - counts, counts)
    return np.arange(total, dtype=np.int64) - starts


def shingle_series(texts: pd.Series) -> pd.Series:
    from .tokenizer import tokenize_series
    return shingle_lists(tokenize_series(texts))


def edge_series(texts: pd.Series) -> pd.Series:
    from .tokenizer import tokenize_series
    return edge_lists(tokenize_series(texts))


def shingle_one(text: str) -> list:
    from .tokenizer import tokenize_one
    toks = tokenize_one(text)
    return [toks[i] + SEPARATOR + toks[i + 1]
            for i in range(len(toks) - 1)]


def edge_one(text: str) -> list:
    from .tokenizer import tokenize_one
    return [g for t in tokenize_one(text) for g in _edge_grams_of(t)]
