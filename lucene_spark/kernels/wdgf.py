"""WordDelimiterGraphFilter 'parts' chain (analysis/common/src/java/org/
apache/lucene/analysis/miscellaneous/WordDelimiterGraphFilter.java +
WordDelimiterIterator.java).

Chain ``wdgf`` = WhitespaceTokenizer + WordDelimiterGraphFilter(
GENERATE_WORD_PARTS | GENERATE_NUMBER_PARTS | SPLIT_ON_CASE_CHANGE |
SPLIT_ON_NUMERICS | STEM_ENGLISH_POSSESSIVE) + LowerCaseFilter — the
javadoc's recommended index-time configuration for product-code-like
text ("PowerShot500" -> power, shot, 500; "O'Neil's" -> o, neil;
"wi-fi" -> wi, fi). Catenation flags are intentionally not offered:
catenated tokens overlap positions (a graph), and the filter's own
javadoc warns against graph output at index time; the parts-only
configuration is position-linear and exact.

The subword iteration is a transcription of WordDelimiterIterator's
state machine (setBounds / next / isBreak / endsWithPossessive,
WordDelimiterIterator.java:27-401), golden-tested against the compiled
reference iterator (tools/make_wdgf_golden.py). Character typing
follows the reference exactly:

- below U+0100: the DEFAULT_WORD_DELIM_TABLE built from Java
  Character.isLowerCase/isUpperCase/isDigit (:88-105) — note ª, µ, º
  count LOWER there;
- BMP: Character.getType switch (:305-360) — Lu -> UPPER, Ll -> LOWER,
  Lt/Lm/Lo/Mn/Me/Mc -> ALPHA, Nd/Nl/No -> DIGIT, else SUBWORD_DELIM;
- supplementary planes: the reference iterates UTF-16 units, so both
  surrogates type as ALPHA|DIGIT "prevent splitting" (:346-347) — a
  supplementary code point therefore ALWAYS types ALPHA|DIGIT here,
  regardless of its real category.

UPPER -> lower does NOT break (:235-237), so "XMLHttpRequest" iterates
as [XMLHttp, Request] — reference behavior, not the smart acronym
split.
"""

from __future__ import annotations

import re
import unicodedata

import numpy as np
import pandas as pd

__all__ = ["wdgf_parts", "wdgf_analyze_one", "wdgf_tokenize_series",
           "wdgf_parts_unique"]

LOWER, UPPER, DIGIT, DELIM = 0x01, 0x02, 0x04, 0x08
_ALPHA = LOWER | UPPER

# Java Character.isLowerCase/isUpperCase/isDigit over the Latin-1 range
# (WordDelimiterIterator.java:88-105). isLowerCase is true for a-z, ª,
# µ, º, ß-ö, ø-ÿ; isUpperCase for A-Z, À-Ö, Ø-Þ; isDigit for 0-9 only.
_TABLE = bytearray([DELIM]) * 256


def _build_table():
    for c in range(ord("a"), ord("z") + 1):
        _TABLE[c] = LOWER
    for c in (0xAA, 0xB5, 0xBA):
        _TABLE[c] = LOWER
    for c in range(0xDF, 0x100):
        if c != 0xF7:
            _TABLE[c] = LOWER
    for c in range(ord("A"), ord("Z") + 1):
        _TABLE[c] = UPPER
    for c in range(0xC0, 0xDF):
        if c != 0xD7:
            _TABLE[c] = UPPER
    for c in range(ord("0"), ord("9") + 1):
        _TABLE[c] = DIGIT


_build_table()

_CAT_TYPE = {"Lu": UPPER, "Ll": LOWER,
             "Lt": _ALPHA, "Lm": _ALPHA, "Lo": _ALPHA,
             "Mn": _ALPHA, "Me": _ALPHA, "Mc": _ALPHA,
             "Nd": DIGIT, "Nl": DIGIT, "No": DIGIT,
             "Cs": _ALPHA | DIGIT}


def _char_type(ch: str) -> int:
    cp = ord(ch)
    if cp < 256:
        return _TABLE[cp]
    if cp > 0xFFFF:
        return _ALPHA | DIGIT  # surrogate pair in the reference
    return _CAT_TYPE.get(unicodedata.category(ch), DELIM)


def _is_break(last: int, typ: int, split_case: bool,
              split_num: bool) -> bool:
    """WordDelimiterIterator.isBreak (:227-246)."""
    if typ & last:
        return False
    if not split_case and (last & _ALPHA) and (typ & _ALPHA):
        return False
    if (last & UPPER) and (typ & _ALPHA):
        return False  # UPPER -> letter: don't split
    if not split_num and (((last & _ALPHA) and (typ & DIGIT))
                          or ((last & DIGIT) and (typ & _ALPHA))):
        return False
    return True


def wdgf_parts(token: str, split_case: bool = True,
               split_num: bool = True,
               possessive: bool = True) -> list:
    """Subword parts of one (case-preserved) token — the
    WordDelimiterIterator next() loop (:149-178, :262-278, :286-296)."""
    types = [_char_type(c) for c in token]
    n = len(token)
    # setBounds: strip leading/trailing delimiters
    start = 0
    while start < n and (types[start] & DELIM):
        start += 1
    endb = n
    while endb > start and (types[endb - 1] & DELIM):
        endb -= 1

    def ends_with_possessive(pos: int) -> bool:
        return (possessive and pos > 2
                and token[pos - 2] == "'"
                and token[pos - 1] in "sS"
                and (types[pos - 3] & _ALPHA)
                and (pos == endb or (types[pos] & DELIM)))

    out = []
    cur = start
    skip_poss = False
    while True:
        if skip_poss:
            cur += 2
            skip_poss = False
        last = 0
        while cur < endb and ((last := types[cur]) & DELIM):
            cur += 1
        if cur >= endb:
            break
        end = cur + 1
        while end < endb:
            t = types[end]
            if _is_break(last, t, split_case, split_num):
                break
            last = t
            end += 1
        if end < endb - 1 and ends_with_possessive(end + 2):
            skip_poss = True
        out.append(token[cur:end])
        cur = end
    return out


# Java Character.isWhitespace set (WhitespaceTokenizer's isTokenChar is
# its negation): \t-\r, \x1c-\x1f, space separators EXCEPT the
# no-break ones (U+00A0, U+2007, U+202F stay inside tokens — they then
# split as SUBWORD_DELIMs, so parts are unaffected), line/para seps.
_WS_RE = re.compile("[\t-\r\x1c-\x1f \u1680\u2000-\u2006"
                    "\u2008-\u200a\u2028\u2029\u205f\u3000]+")
_MAX_LEN = 255  # CharTokenizer DEFAULT_MAX_WORD_LEN


def _ws_tokens(text: str) -> list:
    toks = [t for t in _WS_RE.split(text) if t]
    if any(len(t) > _MAX_LEN for t in toks):
        toks = [t[i:i + _MAX_LEN] for t in toks
                for i in range(0, len(t), _MAX_LEN)]
    return toks


def wdgf_analyze_one(text: str) -> list:
    """Driver-side single-string wdgf chain: whitespace tokenize
    (case preserved) -> subword parts -> lowercase."""
    return [p.lower() for t in _ws_tokens(text or "")
            for p in wdgf_parts(t)]


def wdgf_parts_unique(uniq: np.ndarray) -> list:
    """Vocabulary-level map: unique whitespace token -> lowercased
    parts list (the factorize/take contract of the other chains, but
    one-to-many)."""
    return [[p.lower() for p in wdgf_parts(t)] for t in uniq]


def wdgf_tokenize_series(texts: pd.Series) -> pd.Series:
    """text -> list[str] through the wdgf chain, vectorized at the
    batch-vocabulary level: whitespace tokens factorize once, only the
    UNIQUE tokens run the iterator (Zipf: orders of magnitude fewer),
    and rows re-assemble by take + split."""
    texts = texts.fillna("")
    toks = [_ws_tokens(t) for t in texts]
    lens = np.fromiter((len(t) for t in toks), np.int64, len(toks))
    total = int(lens.sum())
    if total == 0:
        return pd.Series([[] for _ in toks], index=texts.index)
    flat = np.concatenate([np.asarray(t, object) if t
                           else np.empty(0, object) for t in toks])
    codes, uniq = pd.factorize(flat)
    mapped = np.empty(len(uniq), object)
    for i, lst in enumerate(wdgf_parts_unique(uniq)):
        mapped[i] = lst  # elementwise: equal-length lists must NOT
        # collapse into a 2-D array under bulk assignment
    parts = mapped[codes]  # per whitespace-token lists, row-ordered
    n_parts = np.fromiter((len(p) for p in parts), np.int64, len(parts))
    row_idx = np.repeat(np.arange(lens.size), lens)
    counts = np.bincount(np.repeat(row_idx, n_parts),
                         minlength=lens.size)
    flat_parts = [p for lst in parts for p in lst]
    bounds = np.cumsum(counts)[:-1]
    return pd.Series(
        [list(x) for x in
         np.split(np.asarray(flat_parts, object), bounds)],
        index=texts.index)
