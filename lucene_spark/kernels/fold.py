"""ASCIIFoldingFilter: fold Unicode Latin variants to ASCII.

Reference: analysis/common/src/java/org/apache/lucene/analysis/
miscellaneous/ASCIIFoldingFilter.java — a generated ~2000-case switch
mapping Latin-1 Supplement / Latin Extended A-B / typographic variants
to their ASCII equivalents ("café" -> "cafe", "straße" -> "strasse").

This implementation reaches the same mappings through Unicode data
instead of a switch table: per input character, NFKD decomposition +
dropping combining marks (category Mn) folds a precomposed accent the
Java table lists ONLY when the remaining base is ASCII, and a small
supplemental map covers the letters NFKD does NOT decompose (ø, æ, œ,
ß, đ, ð, þ, ł, ħ, ŋ, ı — the Java switch's non-decomposable cases).
Characters with no ASCII equivalent — CJK, Cyrillic, Greek, Hebrew,
Indic letters AND their combining marks — pass through unchanged,
matching the filter (its table has no entries for those scripts).

Tokens arrive already lowercased (LowerCaseFilter runs before folding
in the 'fold' chain), so only lowercase supplements are needed; NFKD
output of a lowercase input is lowercase. Applied at the batch
vocabulary level (factorize -> fold unique tokens -> take), same shape
as the Porter chain.
"""

from __future__ import annotations

import unicodedata

import numpy as np

__all__ = ["fold_one", "fold_unique"]

_SUPPLEMENT = str.maketrans({
    "ø": "o", "ǿ": "o", "æ": "ae", "ǽ": "ae", "ǣ": "ae", "œ": "oe",
    "ß": "ss", "đ": "d", "ð": "d", "þ": "th", "ł": "l", "ħ": "h",
    "ŋ": "n", "ı": "i", "ĸ": "k", "ƒ": "f", "ɨ": "i", "ɉ": "j",
    "ɇ": "e", "ȼ": "c", "ƀ": "b", "ǥ": "g", "ŧ": "t", "ⱥ": "a",
    "ƶ": "z", "ɍ": "r", "ʉ": "u", "ɏ": "y", "ʂ": "s", "ƙ": "k",
    "ƥ": "p", "ɵ": "o", "ƭ": "t", "ƞ": "n", "ɱ": "m", "ⱡ": "l",
})


def fold_one(token: str) -> str:
    """Fold one (already lowercased) token to its ASCII form.

    Folding is PER INPUT CHARACTER, like the reference's switch: a
    character is replaced only when its decomposition (or the
    supplement map) lands on ASCII. Characters whose base letter is
    not ASCII — Greek, Cyrillic, Hebrew, Indic, including their
    combining marks — pass through unchanged, exactly like the Java
    filter (its table has no entries for them); stripping marks
    script-wide would corrupt e.g. Devanagari conjuncts."""
    if token.isascii():
        return token
    out = []
    for ch in token:
        if ch.isascii():
            out.append(ch)
            continue
        sup = ch.translate(_SUPPLEMENT)
        if sup != ch:
            out.append(sup)
            continue
        dec = unicodedata.normalize("NFKD", ch)
        base = "".join(c for c in dec
                       if unicodedata.category(c) != "Mn")
        out.append(base if base and base.isascii() else ch)
    return "".join(out)


def fold_unique(uniques) -> np.ndarray:
    """Fold an array of UNIQUE tokens (a factorized batch vocabulary).
    The ascii fast path skips the NFKD machinery for the overwhelming
    majority of a real vocabulary."""
    out = np.empty(len(uniques), dtype=object)
    for i, u in enumerate(uniques):
        out[i] = u if u.isascii() else fold_one(u)
    return out
