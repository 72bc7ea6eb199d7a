"""Porter stemming (the PorterStemFilter slice of the analysis chain).

Implements Martin Porter's 1980 suffix-stripping algorithm ("An
algorithm for suffix stripping", Program 14(3), 130-137; public
algorithm, Release-3 behavior with the two published bounds bug fixes)
— the reference's analysis/common/src/java/org/apache/lucene/analysis/
en/PorterStemmer.java + PorterStemFilter.java capability. Validated
token-for-token against the reference Java stemmer on a 1000+ word
golden fixture (tests/golden/porter_stems.csv).

Vectorization: stemming is a per-token scalar transform, but token
streams are Zipf-distributed — a batch's UNIQUE tokens are 1-3 orders
of magnitude fewer than its total tokens. ``stem_unique`` stems only
the factorized vocabulary of a batch (the same trick the invert kernel
already uses for term codes), so per-token cost is a numpy take, not a
Python call. At 100 TB the vocabulary per Arrow batch stays bounded
(maxTokenLength 255, natural-language vocab growth is sub-linear),
keeping the Python share of the kernel metadata-sized.
"""

from __future__ import annotations

import numpy as np

__all__ = ["porter_stem", "stem_unique"]

_VOWELS = frozenset("aeiou")


def _is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return True if i == 0 else not _is_cons(w, i - 1)
    return True


def _measure(w: str, j: int) -> int:
    """m of w[0..j] — the number of VC sequences."""
    n = 0
    i = 0
    # skip initial consonants
    while True:
        if i > j:
            return n
        if not _is_cons(w, i):
            break
        i += 1
    i += 1
    while True:
        while True:
            if i > j:
                return n
            if _is_cons(w, i):
                break
            i += 1
        i += 1
        n += 1
        while True:
            if i > j:
                return n
            if not _is_cons(w, i):
                break
            i += 1
        i += 1


def _vowel_in_stem(w: str, j: int) -> bool:
    return any(not _is_cons(w, i) for i in range(j + 1))


def _doublec(w: str, j: int) -> bool:
    return j >= 1 and w[j] == w[j - 1] and _is_cons(w, j)


def _cvc(w: str, i: int) -> bool:
    """consonant-vowel-consonant ending at i, last consonant not w/x/y."""
    if i < 2 or not _is_cons(w, i) or _is_cons(w, i - 1) \
            or not _is_cons(w, i - 2):
        return False
    return w[i] not in "wxy"


def porter_stem(word: str) -> str:
    """Stem one lowercase word. Words shorter than 3 chars are returned
    unchanged (the algorithm's k0+1 < k+1 guard)."""
    if len(word) <= 2:
        return word
    b = word

    def ends(s: str) -> bool:
        return b.endswith(s)

    # ---- step 1a: plurals ------------------------------------------------
    if b.endswith("s"):
        if ends("sses"):
            b = b[:-2]
        elif ends("ies"):
            b = b[:-3] + "i"
        elif not b.endswith("ss"):
            b = b[:-1]

    # ---- step 1b: -ed / -ing --------------------------------------------
    if ends("eed"):
        # bug-fix 1: stem for m() is b[:-3] ('aed'/'eed'/'oed' safe)
        if _measure(b, len(b) - 4) > 0:
            b = b[:-1]
    else:
        hit = None
        if ends("ed") and _vowel_in_stem(b, len(b) - 3):
            hit = b[:-2]
        elif ends("ing") and _vowel_in_stem(b, len(b) - 4):
            hit = b[:-3]
        if hit is not None:
            b = hit
            if b.endswith(("at", "bl", "iz")):
                b = b + "e"
            elif _doublec(b, len(b) - 1):
                if b[-1] not in "lsz":
                    b = b[:-1]
            elif _measure(b, len(b) - 1) == 1 and _cvc(b, len(b) - 1):
                b = b + "e"

    # ---- step 1c: y -> i --------------------------------------------------
    if b.endswith("y") and _vowel_in_stem(b, len(b) - 2):
        b = b[:-1] + "i"

    # ---- step 2: double->single suffixes (m > 0) ---------------------------
    for suf, rep in (("ational", "ate"), ("tional", "tion"),
                     ("enci", "ence"), ("anci", "ance"), ("izer", "ize"),
                     ("bli", "ble"), ("alli", "al"), ("entli", "ent"),
                     ("eli", "e"), ("ousli", "ous"), ("ization", "ize"),
                     ("ation", "ate"), ("ator", "ate"), ("alism", "al"),
                     ("iveness", "ive"), ("fulness", "ful"),
                     ("ousness", "ous"), ("aliti", "al"),
                     ("iviti", "ive"), ("biliti", "ble"), ("logi", "log")):
        if b.endswith(suf):
            j = len(b) - len(suf) - 1
            if _measure(b, j) > 0:
                b = b[: j + 1] + rep
            break

    # ---- step 3 -------------------------------------------------------------
    for suf, rep in (("icate", "ic"), ("ative", ""), ("alize", "al"),
                     ("iciti", "ic"), ("ical", "ic"), ("ful", ""),
                     ("ness", "")):
        if b.endswith(suf):
            j = len(b) - len(suf) - 1
            if _measure(b, j) > 0:
                b = b[: j + 1] + rep
            break

    # ---- step 4: drop suffix when m > 1 ---------------------------------
    for suf in ("al", "ance", "ence", "er", "ic", "able", "ible", "ant",
                "ement", "ment", "ent", "ion", "ou", "ism", "ate", "iti",
                "ous", "ive", "ize"):
        if b.endswith(suf):
            j = len(b) - len(suf) - 1
            # bug-fix 2: 'ion' alone leaves j < 0 — require s/t before it
            if suf == "ion" and not (j >= 0 and b[j] in "st"):
                break
            if _measure(b, j) > 1:
                b = b[: j + 1]
            break

    # ---- step 5a: drop trailing e ----------------------------------------
    if b.endswith("e"):
        a = _measure(b, len(b) - 2)
        if a > 1 or (a == 1 and not _cvc(b, len(b) - 2)):
            b = b[:-1]

    # ---- step 5b: -ll -> -l when m > 1 ------------------------------------
    if b.endswith("ll") and _measure(b, len(b) - 1) > 1:
        b = b[:-1]

    return b


def stem_unique(uniques) -> np.ndarray:
    """Stem an array of UNIQUE tokens (a factorized batch vocabulary).
    ASCII-lowercase alpha tokens go through porter_stem; tokens with
    digits or non-ASCII letters pass through unchanged, matching
    PorterStemFilter (KeywordAttribute/`protected` behavior aside, the
    Java stemmer only rewrites [a-z] suffixes; our tokenizer already
    lowercased)."""
    out = np.empty(len(uniques), dtype=object)
    for i, u in enumerate(uniques):
        out[i] = porter_stem(u) if u.isascii() and u.isalpha() else u
    return out


# EnglishAnalyzer's default stop set (analysis/common/.../en/
# EnglishAnalyzer.java ENGLISH_STOP_WORDS_SET — the classic 33-word
# list, public since the original Lucene StandardAnalyzer)
ENGLISH_STOP_WORDS = frozenset((
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such",
    "that", "the", "their", "then", "there", "these", "they", "this",
    "to", "was", "will", "with"))


def strip_possessive(t: str) -> str:
    """EnglishPossessiveFilter (analysis/common/.../en/
    EnglishPossessiveFilter.java): drop a trailing 's / ’s."""
    if len(t) >= 2 and t.endswith("s") and t[-2] in "'’":
        return t[:-2]
    return t


def stem_unique_spec(uniques, protected=frozenset(),
                     overrides=None) -> np.ndarray:
    """stem_unique with KeywordMarkerFilter / StemmerOverrideFilter
    stages in front of the stemmer (analysis/common/.../miscellaneous/
    SetKeywordMarkerFilter.java, StemmerOverrideFilter.java:38-62):
    an override maps the surface form to its dictionary stem AND marks
    it keyword (later stemmers skip it); a protected token passes
    through unstemmed. Both are surface-form keyed, like the
    reference filters. PROTECTED WINS over an override for the same
    surface form: the marker filter runs first in the chain, and
    StemmerOverrideFilter.incrementToken applies only when
    !keywordAtt.isKeyword()."""
    overrides = overrides or {}
    out = np.empty(len(uniques), dtype=object)
    for i, u in enumerate(uniques):
        if u in protected:
            out[i] = u
        elif u in overrides:
            out[i] = overrides[u]
        else:
            out[i] = porter_stem(u) if u.isascii() and u.isalpha() else u
    return out


def english_unique(uniques) -> np.ndarray:
    """The EnglishAnalyzer chain over a factorized batch vocabulary:
    possessive strip -> stop filter (stopped tokens map to '', removed
    by the caller) -> Porter stem. Mirrors EnglishAnalyzer.java's
    createComponents: StandardTokenizer -> EnglishPossessiveFilter ->
    LowerCaseFilter -> StopFilter -> PorterStemFilter (lowercasing
    already happened in the tokenizer)."""
    out = np.empty(len(uniques), dtype=object)
    for i, u in enumerate(uniques):
        t = strip_possessive(u)
        if t in ENGLISH_STOP_WORDS:
            out[i] = ""
        else:
            out[i] = porter_stem(t) if t.isascii() and t.isalpha() else t
    return out


def english_unique_spec(uniques, protected=frozenset(),
                        overrides=None) -> np.ndarray:
    """english_unique with the keyword-marker/override stages inserted
    where the reference puts them — AFTER possessive strip and stop
    filtering, immediately before the stemmer (EnglishAnalyzer
    .createComponents order with SetKeywordMarkerFilter /
    StemmerOverrideFilter ahead of PorterStemFilter)."""
    overrides = overrides or {}
    out = np.empty(len(uniques), dtype=object)
    for i, u in enumerate(uniques):
        t = strip_possessive(u)
        if t in ENGLISH_STOP_WORDS:
            out[i] = ""
        elif t in protected:
            # marker filter precedes the override filter (see
            # stem_unique_spec): protected wins on a collision
            out[i] = t
        elif t in overrides:
            out[i] = overrides[t]
        else:
            out[i] = porter_stem(t) if t.isascii() and t.isalpha() else t
    return out
