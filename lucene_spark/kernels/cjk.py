"""CJKAnalyzer chain: width folding + CJK bigrams + stop filter.

Reference: analysis/common/src/java/org/apache/lucene/analysis/cjk/
CJKAnalyzer.java — StandardTokenizer -> CJKWidthFilter ->
LowerCaseFilter -> CJKBigramFilter -> StopFilter(stopwords.txt).

- CJKWidthFilter (cjk/CJKWidthFilter.java): folds fullwidth ASCII
  variants (U+FF01-FF5E) to Basic Latin, the ideographic space U+3000
  to a plain space, and halfwidth Katakana (U+FF61-FF9F) to fullwidth
  — including composing the halfwidth voiced/semi-voiced sound marks
  with the preceding kana (ｶ + ﾞ -> ガ), which NFKC performs exactly on
  that block.
- CJKBigramFilter (cjk/CJKBigramFilter.java, default flags
  HAN|HIRAGANA|KATAKANA|HANGUL, outputUnigrams=false): adjacent CJK
  characters form overlapping bigrams ("一二三" -> 一二, 二三); a CJK
  character with no flagged neighbor is emitted as a unigram. The
  filter buffers across the flagged scripts, so a Han char adjacent to
  Hiragana bigrams with it. Here the tokenizer captures each maximal
  CJK run as one match and the bigram expansion is a single vectorized
  numpy pass over the batch's concatenated runs — no per-row Python.
- Stop set: the cjk/stopwords.txt list (English function words plus
  's', 't', 'www' — stopwords.txt is ASCII-only by design; CJK bigrams
  are never stopped).

Deviation (documented): Lucene's StandardTokenizer also tags Hangul
*jamo* and rare-script singles; this chain covers the precomposed
Hangul syllable block U+AC00-D7A3 and the same Han/kana ranges the
standard chain tokenizes.
"""

from __future__ import annotations

import re
import unicodedata

import numpy as np
import pandas as pd

__all__ = ["CJK_STOP_WORDS", "width_fold_one", "width_fold_series",
           "cjk_tokenize_series", "cjk_analyze_one"]

# cjk/stopwords.txt (ASCII English stop list shipped with CJKAnalyzer)
CJK_STOP_WORDS = frozenset((
    "a", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "s",
    "such", "t", "that", "the", "their", "then", "there", "these",
    "they", "this", "to", "was", "will", "with", "www"))

# fullwidth ASCII -> Basic Latin; ideographic space -> space
_WIDTH_TABLE = {c: c - 0xFEE0 for c in range(0xFF01, 0xFF5F)}
_WIDTH_TABLE[0x3000] = 0x20
# halfwidth Katakana + halfwidth voiced marks: NFKC composes the block
# exactly the way CJKWidthFilter's KANA_NORM table does
_HALF_KANA_RE = re.compile(r"[｡-ﾟ]+")
_HALF_KANA_CHECK = re.compile(r"[｡-ﾟ]")
_WIDTH_CHECK = re.compile(r"[！-～　]")


def width_fold_one(text: str) -> str:
    """CJKWidthFilter over one string."""
    if _WIDTH_CHECK.search(text):
        text = text.translate(_WIDTH_TABLE)
    if _HALF_KANA_CHECK.search(text):
        text = _HALF_KANA_RE.sub(
            lambda m: unicodedata.normalize("NFKC", m.group()), text)
    return text


def width_fold_series(texts: pd.Series) -> pd.Series:
    """Vectorized CJKWidthFilter: only rows containing foldable chars
    pay the translate; everything else passes through untouched."""
    needs = texts.str.contains(r"[！-ﾟ　]", regex=True)
    if not needs.any():
        return texts
    texts = texts.copy()
    idx = texts.index[needs]
    texts.loc[idx] = [width_fold_one(t) for t in texts.loc[idx]]
    return texts


# CJK run: Hiragana+Katakana (3040-30FF), kana extensions (31F0-31FF),
# Han (4E00-9FFF), Hangul syllables (AC00-D7A3) — one maximal run per
# match; the bigram pass splits it
_CJK = "぀-ヿㇰ-ㇿ一-鿿가-힣"
_W = rf"[^\W{_CJK}]"
_LET = rf"[^\W\d_{_CJK}]"
_CJK_WORD_RE = re.compile(
    rf"[{_CJK}]+"                               # maximal CJK run
    rf"|{_W}+(?:"
    rf"['’.]{_W}+"
    rf"|(?<=\d),\d+"
    rf"|(?<={_LET}):{_LET}+"
    r")*")
_CJK_FIRST = re.compile(rf"[{_CJK}]")


def _expand_bigrams_flat(flat: np.ndarray) -> tuple:
    """One vectorized pass: expand CJK-run tokens in a flat object
    array into overlapping bigrams. Returns (out_flat, out_counts)
    where out_counts[i] is how many output tokens flat[i] produced.
    """
    n = flat.size
    out_counts = np.ones(n, dtype=np.int64)
    if n == 0:
        return flat, out_counts
    s = pd.Series(flat)
    is_cjk = s.str.match(_CJK_FIRST).to_numpy()
    lens = s.str.len().to_numpy(dtype=np.int64)
    multi = is_cjk & (lens >= 2)
    if not multi.any():
        return flat, out_counts
    out_counts[multi] = lens[multi] - 1
    # concatenate the multi-char runs into one UTF-32 code-point array
    runs = flat[multi]
    run_lens = lens[multi]
    chars = np.frombuffer("".join(runs).encode("utf-32-le"),
                          dtype=np.uint32)
    ends = np.cumsum(run_lens)
    starts = ends - run_lens
    # bigram start positions: every offset except each run's last char
    total = int(ends[-1])
    keep = np.ones(total, dtype=bool)
    keep[ends - 1] = False
    b0 = np.nonzero(keep)[0]
    pair = np.empty((b0.size, 2), dtype=np.uint32)
    pair[:, 0] = chars[b0]
    pair[:, 1] = chars[b0 + 1]
    # numpy's unicode dtype is UCS4: reinterpret the (n,2) code-point
    # matrix as n 2-char strings with zero copying or Python loops
    bigram_list = np.frombuffer(pair.tobytes(), dtype="<U2")
    # interleave: output order is flat order with each multi-run
    # replaced by its bigrams
    out_flat = np.empty(int(out_counts.sum()), dtype=object)
    out_pos = np.cumsum(out_counts) - out_counts
    single = ~multi
    out_flat[out_pos[single]] = flat[single]
    mpos = out_pos[multi]
    mcnt = out_counts[multi]
    dest = np.repeat(mpos, mcnt) + (
        np.arange(int(mcnt.sum())) - np.repeat(np.cumsum(mcnt) - mcnt,
                                               mcnt))
    out_flat[dest] = bigram_list.astype(object)
    return out_flat, out_counts


def cjk_tokenize_series(texts: pd.Series, max_len: int = 255) -> pd.Series:
    """texts -> list[str] tokens through the CJKAnalyzer chain,
    vectorized (width fold -> tokenize with maximal CJK runs ->
    bigram expansion -> stop filter)."""
    texts = width_fold_series(texts.fillna(""))
    toks = texts.str.lower().str.findall(_CJK_WORD_RE)
    # maxTokenLength split for NON-CJK word runs only, same contract as
    # tokenize_series. CJK runs are never split: the reference tokenizer
    # emits one IDEOGRAPHIC token per Han char, so maxTokenLength can't
    # hit a CJK run there, and splitting the raw run here would drop the
    # bigram spanning the cut. Only rows that actually hold a >max_len
    # run pay the fixup.
    idx = toks.index[texts.str.len() > max_len]
    if len(idx):
        toks.loc[idx] = [
            [p for x in t for p in
             ([x] if len(x) <= max_len or _CJK_FIRST.match(x) else
              [x[i:i + max_len] for i in range(0, len(x), max_len)])]
            for t in toks.loc[idx]]
    lens = toks.str.len().to_numpy(dtype=np.int64)
    total = int(lens.sum())
    if total == 0:
        return toks
    flat = np.concatenate([np.asarray(t, dtype=object) if t
                           else np.empty(0, object) for t in toks])
    row_idx = np.repeat(np.arange(lens.size), lens)
    out_flat, out_counts = _expand_bigrams_flat(flat)
    out_rows = np.repeat(row_idx, out_counts)
    # stop filter (vectorized membership over the batch vocabulary)
    codes, uniq = pd.factorize(out_flat)
    stopped = np.array([u in CJK_STOP_WORDS for u in uniq])[codes]
    out_flat = out_flat[~stopped]
    out_rows = out_rows[~stopped]
    counts = np.bincount(out_rows, minlength=lens.size)
    bounds = np.cumsum(counts)[:-1]
    return pd.Series([list(x) for x in np.split(out_flat, bounds)],
                     index=toks.index)


def cjk_analyze_one(text: str, max_len: int = 255) -> list:
    """Driver-side single-string CJKAnalyzer chain (same maxTokenLength
    split for non-CJK runs as cjk_tokenize_series — index and query
    paths must tokenize identically)."""
    text = width_fold_one(text or "").lower()
    out = []
    for t in _CJK_WORD_RE.findall(text):
        if _CJK_FIRST.match(t) and len(t) >= 2:
            out.extend(t[i:i + 2] for i in range(len(t) - 1))
        elif t not in CJK_STOP_WORDS:
            if len(t) <= max_len:
                out.append(t)
            else:
                out.extend(t[i:i + max_len]
                           for i in range(0, len(t), max_len))
    return out
