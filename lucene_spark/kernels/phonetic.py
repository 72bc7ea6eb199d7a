"""Phonetic encoders + the 'phonetic' / 'metaphone' analyzer chains.

Reference: the analysis/phonetic module — PhoneticFilter
(lucene/analysis/phonetic/src/java/org/apache/lucene/analysis/phonetic/
PhoneticFilter.java:33) delegates to an Apache commons-codec Encoder
and either REPLACES each token with its phonetic code (inject=false)
or adds the code as a same-position synonym (inject=true).
DoubleMetaphoneFilter.java:28 is the dedicated Double-Metaphone filter
(primary + alternate codes).

This module implements the two encoders the reference's
PhoneticFilterFactory most commonly binds (PhoneticFilterFactory.java:
71 name registry):

- ``soundex``          — commons-codec ``Soundex`` (US English mapping,
  4-char codes, the census H/W silent rule).
- ``double_metaphone`` — commons-codec ``DoubleMetaphone`` (Lawrence
  Philips' 2000 algorithm; maxCodeLen=4 default), primary and alternate
  codes.

Both are golden-tested against the RUNNING commons-codec library (the
very jar PySpark ships) over the corpus vocabulary + 6k fuzz words:
tests/golden/phonetic_golden.tsv via tools/make_phonetic_golden.py.

Chain semantics (registered in kernels/tokenizer.py):

- ``phonetic``  = StandardAnalyzer + PhoneticFilter(Soundex,
  inject=false): 1:1 token replace; PhoneticFilter.java:66-77 pass-
  through rules (empty code or code == original keeps the original —
  e.g. pure-digit tokens, which clean() empties).
- ``metaphone`` = StandardAnalyzer + PhoneticFilter(DoubleMetaphone,
  inject=false): the factory configuration ``encoder="DoubleMetaphone"``
  — PhoneticFilter calls ``Encoder.encode`` which returns the PRIMARY
  code only (commons-codec ``DoubleMetaphone.encode``). The alternate
  code is exposed via :func:`double_metaphone` for MTQ/spell surfaces;
  the same-position alternate injection of DoubleMetaphoneFilter
  (inject=true) is intentionally not offered as a chain — our chain
  interface emits one position per token (deviation documented).

Everything operates at the factorized batch-vocabulary level (the
stem_unique pattern): per-row work is O(unique tokens), never
O(total tokens).
"""

from __future__ import annotations

import numpy as np

__all__ = ["soundex", "double_metaphone", "phonetic_encode",
           "soundex_unique", "metaphone_unique"]

# commons-codec Soundex.US_ENGLISH_MAPPING_STRING
_SOUNDEX_MAP = "01230120022455012623010202"

_VOWELS = "AEIOUY"


def _clean_letters(s: str) -> str:
    """SoundexUtils.clean: keep letters, uppercase (English locale)."""
    return "".join(c for c in s if c.isalpha()).upper()


def _sx_code(ch: str) -> str:
    o = ord(ch) - 65
    if 0 <= o < 26:
        return _SOUNDEX_MAP[o]
    raise ValueError(f"character {ch!r} is not mapped")


def soundex(s: str) -> str:
    """commons-codec ``Soundex.soundex`` (US English, 4 chars).

    The census H/W rule (Soundex.java, specialCaseHW): H and W after
    the first letter are skipped entirely WITHOUT updating the
    duplicate-collapse state, so same-coded consonants separated by
    H/W collapse while a vowel ('0') between them resets the state.
    Golden-verified against the running commons-codec Soundex over
    5,211 words (tests/golden/phonetic_golden.tsv).
    """
    s = _clean_letters(s)
    if not s:
        return s
    out = [s[0]]
    last = _sx_code(s[0])
    i = 1
    while i < len(s) and len(out) < 4:
        ch = s[i]
        i += 1
        if ch in "HW":
            continue
        m = _sx_code(ch)
        if m != "0" and m != last:
            out.append(m)
        last = m
    return "".join(out).ljust(4, "0")


# ---------------------------------------------------------------------------
# Double Metaphone (commons-codec DoubleMetaphone.java, Philips 2000)
# ---------------------------------------------------------------------------

_SILENT_START = ("GN", "KN", "PN", "WR", "PS")
_L_R_N_M_B_H_F_V_W_SPACE = ("L", "R", "N", "M", "B", "H", "F", "V", "W",
                            " ")
_ES_EP_EB_EL_EY_IB_IL_IN_IE_EI_ER = ("ES", "EP", "EB", "EL", "EY", "IB",
                                     "IL", "IN", "IE", "EI", "ER")
_L_T_K_S_N_M_B_Z = ("L", "T", "K", "S", "N", "M", "B", "Z")


class _DMResult:
    __slots__ = ("primary", "alternate", "max_len")

    def __init__(self, max_len: int) -> None:
        self.primary: list = []
        self.alternate: list = []
        self.max_len = max_len

    def append(self, p: str, a: str | None = None) -> None:
        self.append_primary(p)
        self.append_alternate(p if a is None else a)

    def append_primary(self, v: str) -> None:
        room = self.max_len - len(self.primary)
        if room > 0:
            self.primary.extend(v[:room])

    def append_alternate(self, v: str) -> None:
        room = self.max_len - len(self.alternate)
        if room > 0:
            self.alternate.extend(v[:room])

    def complete(self) -> bool:
        return (len(self.primary) >= self.max_len
                and len(self.alternate) >= self.max_len)


def _ch(v: str, i: int) -> str:
    """charAt with commons' out-of-bounds -> '\\0' behavior."""
    if 0 <= i < len(v):
        return v[i]
    return "\0"


def _has(v: str, start: int, length: int, *criteria: str) -> bool:
    """DoubleMetaphone.contains."""
    if start < 0 or start + length > len(v):
        return False
    return v[start:start + length] in criteria


def _is_vowel(c: str) -> bool:
    return c in _VOWELS


def double_metaphone(value: str, max_len: int = 4) -> tuple:
    """(primary, alternate) Double-Metaphone codes, commons-codec
    semantics (maxCodeLen default 4). Returns ("", "") for empty/
    letterless-after-trim input (commons returns null)."""
    v = value.strip().upper()
    if not v:
        return ("", "")
    slavo = ("W" in v or "K" in v or "CZ" in v or "WITZ" in v)
    index = 1 if v.startswith(_SILENT_START) else 0
    r = _DMResult(max_len)
    n = len(v)
    while not r.complete() and index <= n - 1:
        c = v[index]
        if c in "AEIOUY":
            if index == 0:
                r.append("A")
            index += 1
        elif c == "B":
            r.append("P")
            index += 2 if _ch(v, index + 1) == "B" else 1
        elif c == "Ç":          # Ç
            r.append("S")
            index += 1
        elif c == "C":
            index = _handle_c(v, r, index)
        elif c == "D":
            index = _handle_d(v, r, index)
        elif c == "F":
            r.append("F")
            index += 2 if _ch(v, index + 1) == "F" else 1
        elif c == "G":
            index = _handle_g(v, r, index, slavo)
        elif c == "H":
            index = _handle_h(v, r, index)
        elif c == "J":
            index = _handle_j(v, r, index, slavo)
        elif c == "K":
            r.append("K")
            index += 2 if _ch(v, index + 1) == "K" else 1
        elif c == "L":
            index = _handle_l(v, r, index)
        elif c == "M":
            r.append("M")
            index += 2 if _condition_m0(v, index) else 1
        elif c == "N":
            r.append("N")
            index += 2 if _ch(v, index + 1) == "N" else 1
        elif c == "Ñ":          # Ñ
            r.append("N")
            index += 1
        elif c == "P":
            index = _handle_p(v, r, index)
        elif c == "Q":
            r.append("K")
            index += 2 if _ch(v, index + 1) == "Q" else 1
        elif c == "R":
            index = _handle_r(v, r, index, slavo)
        elif c == "S":
            index = _handle_s(v, r, index, slavo)
        elif c == "T":
            index = _handle_t(v, r, index)
        elif c == "V":
            r.append("F")
            index += 2 if _ch(v, index + 1) == "V" else 1
        elif c == "W":
            index = _handle_w(v, r, index)
        elif c == "X":
            index = _handle_x(v, r, index)
        elif c == "Z":
            index = _handle_z(v, r, index, slavo)
        else:
            index += 1
    return ("".join(r.primary[:max_len]),
            "".join(r.alternate[:max_len]))


def _condition_c0(v: str, index: int) -> bool:
    if _has(v, index, 4, "CHIA"):                       # chianti
        return True
    if index <= 1:
        return False
    if _is_vowel(_ch(v, index - 2)):
        return False
    if not _has(v, index - 1, 3, "ACH"):
        return False
    c = _ch(v, index + 2)
    return (c != "I" and c != "E") or \
        _has(v, index - 2, 6, "BACHER", "MACHER")


def _handle_c(v: str, r: _DMResult, index: int) -> int:
    if _condition_c0(v, index):                         # micher, bacher
        r.append("K")
        index += 2
    elif index == 0 and _has(v, index, 6, "CAESAR"):
        r.append("S")
        index += 2
    elif _has(v, index, 2, "CH"):
        index = _handle_ch(v, r, index)
    elif _has(v, index, 2, "CZ") and not _has(v, index - 2, 4, "WICZ"):
        r.append("S", "X")                              # Czerny
        index += 2
    elif _has(v, index + 1, 3, "CIA"):                  # focaccia
        r.append("X")
        index += 3
    elif _has(v, index, 2, "CC") and \
            not (index == 1 and _ch(v, 0) == "M"):
        return _handle_cc(v, r, index)                  # not McClelland
    elif _has(v, index, 2, "CK", "CG", "CQ"):
        r.append("K")
        index += 2
    elif _has(v, index, 2, "CI", "CE", "CY"):
        if _has(v, index, 3, "CIO", "CIE", "CIA"):      # Italian vs Engl.
            r.append("S", "X")
        else:
            r.append("S")
        index += 2
    else:
        r.append("K")
        if _has(v, index + 1, 2, " C", " Q", " G"):     # Mac Caffrey
            index += 3
        elif _has(v, index + 1, 1, "C", "K", "Q") and \
                not _has(v, index + 1, 2, "CE", "CI"):
            index += 2
        else:
            index += 1
    return index


def _handle_cc(v: str, r: _DMResult, index: int) -> int:
    if _has(v, index + 2, 1, "I", "E", "H") and \
            not _has(v, index + 2, 2, "HU"):
        # bellocchio but not bacchus
        if (index == 1 and _ch(v, index - 1) == "A") or \
                _has(v, index - 1, 5, "UCCEE", "UCCES"):
            r.append("KS")                              # accident, succeed
        else:
            r.append("X")                               # bacci, bertucci
        index += 3
    else:                                               # Pierce's rule
        r.append("K")
        index += 2
    return index


def _condition_ch0(v: str, index: int) -> bool:
    if index != 0:
        return False
    if not _has(v, index + 1, 5, "HARAC", "HARIS") and \
            not _has(v, index + 1, 3, "HOR", "HYM", "HIA", "HEM"):
        return False
    return not _has(v, 0, 5, "CHORE")


def _condition_ch1(v: str, index: int) -> bool:
    return ((_has(v, 0, 4, "VAN ", "VON ") or _has(v, 0, 3, "SCH"))
            or _has(v, index - 2, 6, "ORCHES", "ARCHIT", "ORCHID")
            or _has(v, index + 2, 1, "T", "S")
            or ((_has(v, index - 1, 1, "A", "O", "U", "E") or index == 0)
                and (_has(v, index + 2, 1, *_L_R_N_M_B_H_F_V_W_SPACE)
                     or index + 1 == len(v) - 1)))


def _handle_ch(v: str, r: _DMResult, index: int) -> int:
    if index > 0 and _has(v, index, 4, "CHAE"):         # Michael
        r.append("K", "X")
        return index + 2
    if _condition_ch0(v, index):                        # Greek: chorus
        r.append("K")
        return index + 2
    if _condition_ch1(v, index):                        # Germanic/Greek
        r.append("K")
        return index + 2
    if index > 0:
        if _has(v, 0, 2, "MC"):
            r.append("K")
        else:
            r.append("X", "K")
    else:
        r.append("X")
    return index + 2


def _handle_d(v: str, r: _DMResult, index: int) -> int:
    if _has(v, index, 2, "DG"):
        if _has(v, index + 2, 1, "I", "E", "Y"):        # edge
            r.append("J")
            index += 3
        else:                                           # Edgar
            r.append("TK")
            index += 2
    elif _has(v, index, 2, "DT", "DD"):
        r.append("T")
        index += 2
    else:
        r.append("T")
        index += 1
    return index


def _handle_g(v: str, r: _DMResult, index: int, slavo: bool) -> int:
    if _ch(v, index + 1) == "H":
        return _handle_gh(v, r, index)
    if _ch(v, index + 1) == "N":
        if index == 1 and _is_vowel(_ch(v, 0)) and not slavo:
            r.append("KN", "N")
        elif not _has(v, index + 2, 2, "EY") and \
                _ch(v, index + 1) != "Y" and not slavo:
            r.append("N", "KN")
        else:
            r.append("KN")
        return index + 2
    if _has(v, index + 1, 2, "LI") and not slavo:
        r.append("KL", "L")
        return index + 2
    if index == 0 and (_ch(v, index + 1) == "Y" or
                       _has(v, index + 1, 2,
                            *_ES_EP_EB_EL_EY_IB_IL_IN_IE_EI_ER)):
        r.append("K", "J")                              # ges-, gep- starts
        return index + 2
    if (_has(v, index + 1, 2, "ER") or _ch(v, index + 1) == "Y") and \
            not _has(v, 0, 6, "DANGER", "RANGER", "MANGER") and \
            not _has(v, index - 1, 1, "E", "I") and \
            not _has(v, index - 1, 3, "RGY", "OGY"):
        r.append("K", "J")                              # -ger-, -gy-
        return index + 2
    if _has(v, index + 1, 1, "E", "I", "Y") or \
            _has(v, index - 1, 4, "AGGI", "OGGI"):      # Italian biaggi
        if _has(v, 0, 4, "VAN ", "VON ") or _has(v, 0, 3, "SCH") or \
                _has(v, index + 1, 2, "ET"):
            r.append("K")                               # obvious germanic
        elif _has(v, index + 1, 3, "IER"):
            r.append("J")
        else:
            r.append("J", "K")
        return index + 2
    if _ch(v, index + 1) == "G":
        r.append("K")
        return index + 2
    r.append("K")
    return index + 1


def _handle_gh(v: str, r: _DMResult, index: int) -> int:
    if index > 0 and not _is_vowel(_ch(v, index - 1)):
        r.append("K")
        return index + 2
    if index == 0:
        if _ch(v, index + 2) == "I":
            r.append("J")
        else:
            r.append("K")
        return index + 2
    if (index > 1 and _has(v, index - 2, 1, "B", "H", "D")) or \
            (index > 2 and _has(v, index - 3, 1, "B", "H", "D")) or \
            (index > 3 and _has(v, index - 4, 1, "B", "H")):
        return index + 2                                # Parker's: hugh
    if index > 2 and _ch(v, index - 1) == "U" and \
            _has(v, index - 3, 1, "C", "G", "L", "R", "T"):
        r.append("F")                                   # laugh, tough
    elif index > 0 and _ch(v, index - 1) != "I":
        r.append("K")
    return index + 2


def _handle_h(v: str, r: _DMResult, index: int) -> int:
    # keep only if first & before vowel, or between two vowels
    if (index == 0 or _is_vowel(_ch(v, index - 1))) and \
            _is_vowel(_ch(v, index + 1)):
        r.append("H")
        return index + 2
    return index + 1


def _handle_j(v: str, r: _DMResult, index: int, slavo: bool) -> int:
    if _has(v, index, 4, "JOSE") or _has(v, 0, 4, "SAN "):
        # obvious Spanish: Jose, San Jacinto
        if (index == 0 and _ch(v, index + 4) == " ") or len(v) == 4 or \
                _has(v, 0, 4, "SAN "):
            r.append("H")
        else:
            r.append("J", "H")
        return index + 1
    if index == 0:
        r.append("J", "A")                              # Yankelovich
    elif _is_vowel(_ch(v, index - 1)) and not slavo and \
            (_ch(v, index + 1) == "A" or _ch(v, index + 1) == "O"):
        r.append("J", "H")
    elif index == len(v) - 1:
        r.append("J", " ")
    elif not _has(v, index + 1, 1, *_L_T_K_S_N_M_B_Z) and \
            not _has(v, index - 1, 1, "S", "K", "L"):
        r.append("J")
    return index + 2 if _ch(v, index + 1) == "J" else index + 1


def _condition_l0(v: str, index: int) -> bool:
    if index == len(v) - 3 and \
            _has(v, index - 1, 4, "ILLO", "ILLA", "ALLE"):
        return True
    return (_has(v, len(v) - 2, 2, "AS", "OS") or
            _has(v, len(v) - 1, 1, "A", "O")) and \
        _has(v, index - 1, 4, "ALLE")


def _handle_l(v: str, r: _DMResult, index: int) -> int:
    if _ch(v, index + 1) == "L":
        if _condition_l0(v, index):                     # cabrillo, gallegos
            r.append_primary("L")
        else:
            r.append("L")
        return index + 2
    r.append("L")
    return index + 1


def _condition_m0(v: str, index: int) -> bool:
    if _ch(v, index + 1) == "M":
        return True
    return _has(v, index - 1, 3, "UMB") and \
        (index + 1 == len(v) - 1 or _has(v, index + 2, 2, "ER"))


def _handle_p(v: str, r: _DMResult, index: int) -> int:
    if _ch(v, index + 1) == "H":
        r.append("F")
        return index + 2
    r.append("P")
    return index + 2 if _has(v, index + 1, 1, "P", "B") else index + 1


def _handle_r(v: str, r: _DMResult, index: int, slavo: bool) -> int:
    if index == len(v) - 1 and not slavo and \
            _has(v, index - 2, 2, "IE") and \
            not _has(v, index - 4, 2, "ME", "MA"):
        r.append_alternate("R")                         # french: rogier
    else:
        r.append("R")
    return index + 2 if _ch(v, index + 1) == "R" else index + 1


def _handle_s(v: str, r: _DMResult, index: int, slavo: bool) -> int:
    if _has(v, index - 1, 3, "ISL", "YSL"):             # island, isle
        return index + 1
    if index == 0 and _has(v, index, 5, "SUGAR"):
        r.append("X", "S")
        return index + 1
    if _has(v, index, 2, "SH"):
        if _has(v, index + 1, 4, "HEIM", "HOEK", "HOLM", "HOLZ"):
            r.append("S")                               # germanic
        else:
            r.append("X")
        return index + 2
    if _has(v, index, 3, "SIO", "SIA") or _has(v, index, 4, "SIAN"):
        if slavo:                                       # Italian/Armenian
            r.append("S")
        else:
            r.append("S", "X")
        return index + 3
    if (index == 0 and _has(v, index + 1, 1, "M", "N", "L", "W")) or \
            _has(v, index + 1, 1, "Z"):
        # smith matches schmidt
        r.append("S", "X")
        return index + 2 if _has(v, index + 1, 1, "Z") else index + 1
    if _has(v, index, 2, "SC"):
        return _handle_sc(v, r, index)
    if index == len(v) - 1 and _has(v, index - 2, 2, "AI", "OI"):
        r.append_alternate("S")                         # resnais, artois
    else:
        r.append("S")
    return index + 2 if _has(v, index + 1, 1, "S", "Z") else index + 1


def _handle_sc(v: str, r: _DMResult, index: int) -> int:
    if _ch(v, index + 2) == "H":                        # Schlesinger's rule
        if _has(v, index + 3, 2, "OO", "ER", "EN", "UY", "ED", "EM"):
            if _has(v, index + 3, 2, "ER", "EN"):       # schenker
                r.append("X", "SK")
            else:                                       # school, schooner
                r.append("SK")
        elif index == 0 and not _is_vowel(_ch(v, 3)) and \
                _ch(v, 3) != "W":
            r.append("X", "S")
        else:
            r.append("X")
        return index + 3
    if _has(v, index + 2, 1, "I", "E", "Y"):
        r.append("S")
        return index + 3
    r.append("SK")
    return index + 3


def _handle_t(v: str, r: _DMResult, index: int) -> int:
    if _has(v, index, 4, "TION"):
        r.append("X")
        return index + 3
    if _has(v, index, 3, "TIA", "TCH"):
        r.append("X")
        return index + 3
    if _has(v, index, 2, "TH") or _has(v, index, 3, "TTH"):
        if _has(v, index + 2, 2, "OM", "AM") or \
                _has(v, 0, 4, "VAN ", "VON ") or _has(v, 0, 3, "SCH"):
            r.append("T")                               # thomas, thames
        else:
            r.append("0", "T")                          # yes: zero char
        return index + 2
    r.append("T")
    return index + 2 if _has(v, index + 1, 1, "T", "D") else index + 1


def _handle_w(v: str, r: _DMResult, index: int) -> int:
    if _has(v, index, 2, "WR"):                         # can also be Vr-
        r.append("R")
        return index + 2
    if index == 0 and (_is_vowel(_ch(v, index + 1)) or
                       _has(v, index, 2, "WH")):
        if _is_vowel(_ch(v, index + 1)):
            r.append("A", "F")                          # Wasserman/Vasserman
        else:
            r.append("A")                               # Uomo matches Womo
        return index + 1
    if (index == len(v) - 1 and _is_vowel(_ch(v, index - 1))) or \
            _has(v, index - 1, 5, "EWSKI", "EWSKY", "OWSKI", "OWSKY") or \
            _has(v, 0, 3, "SCH"):
        r.append_alternate("F")                         # Arnow/Arnoff
        return index + 1
    if _has(v, index, 4, "WICZ", "WITZ"):               # Polish
        r.append("TS", "FX")
        return index + 4
    return index + 1


def _handle_x(v: str, r: _DMResult, index: int) -> int:
    if index == 0:
        r.append("S")                                   # Xavier -> S
        return index + 1
    if not (index == len(v) - 1 and
            (_has(v, index - 3, 3, "IAU", "EAU") or
             _has(v, index - 2, 2, "AU", "OU"))):       # breaux
        r.append("KS")
    return index + 2 if _has(v, index + 1, 1, "C", "X") else index + 1


def _handle_z(v: str, r: _DMResult, index: int, slavo: bool) -> int:
    if _ch(v, index + 1) == "H":                        # zhao (pinyin)
        r.append("J")
        return index + 2
    if _has(v, index + 1, 2, "ZO", "ZI", "ZA") or \
            (slavo and index > 0 and _ch(v, index - 1) != "T"):
        r.append("S", "TS")
    else:
        r.append("S")
    return index + 2 if _ch(v, index + 1) == "Z" else index + 1


# ---------------------------------------------------------------------------
# PhoneticFilter semantics + chain vocabulary maps
# ---------------------------------------------------------------------------

def phonetic_encode(term: str, encoder: str = "soundex") -> str:
    """One token through PhoneticFilter(encoder, inject=false)
    (PhoneticFilter.java:66-85): empty code or code == original keeps
    the original token; encode errors pass the token through —
    INCLUDING the Soundex unmapped-character ValueError a non-ASCII
    letter raises (commons-codec throws IllegalArgumentException there
    and the reference filter's catch keeps the original, so 'café'
    must index as itself, not crash the task)."""
    if encoder not in ("soundex", "metaphone"):
        raise ValueError(f"unknown phonetic encoder {encoder!r}")
    try:
        if encoder == "soundex":
            code = soundex(term)
        else:
            code = double_metaphone(term)[0]
    except Exception:
        return term  # "just use the direct text" (PhoneticFilter.java:75)
    if code and code != term:
        return code
    return term


def soundex_unique(uniques) -> np.ndarray:
    """Soundex-encode an array of UNIQUE tokens (factorized batch
    vocabulary) with PhoneticFilter replace semantics."""
    out = np.empty(len(uniques), dtype=object)
    for i, u in enumerate(uniques):
        out[i] = phonetic_encode(u, "soundex")
    return out


def metaphone_unique(uniques) -> np.ndarray:
    """Double-Metaphone-primary-encode an array of UNIQUE tokens with
    PhoneticFilter replace semantics."""
    out = np.empty(len(uniques), dtype=object)
    for i, u in enumerate(uniques):
        out[i] = phonetic_encode(u, "metaphone")
    return out
