"""StandardAnalyzer-parity tokenizer (vectorized pandas).

The reference default analyzer (StandardAnalyzer.java:37,52,85-92) is
StandardTokenizer (UAX#29 word break, StandardTokenizer.java:31-76)
+ LowerCaseFilter + StopFilter with an *empty* default stop set, and
maxTokenLength = 255 (tokens longer than the limit are split at
maxTokenLength-char intervals).

Two execution paths, both golden-tested against the reference's
generated scanner (StandardTokenizerImpl.jflex / .java, run via
javac — tests/golden/uax29_golden.tsv, tools/make_uax29_golden.py):

- **ASCII fast path** (stdlib ``re``, C-speed): the exact UAX#29
  word-break subset reachable from pure-ASCII text — ALetter runs,
  Numeric runs, ExtendNumLet '_' joins (WB13a/b), MidNumLet '.' and
  SingleQuote ' between letters or between digits (WB6/7/11/12),
  MidLetter ':' letters-only, MidNum ','/';' digits-only, and direct
  letter<->digit concatenation ("mp3"). Hyphens split. Pure-ASCII
  rows never involve Extend/Format/ZWJ/emoji (all non-ASCII).

- **Full UAX#29 path** (the ``regex`` module's Unicode property
  classes, rows containing any non-ASCII char): a direct transcription
  of the jflex grammar — WB4 Extend/Format/ZWJ transparency (NFD
  combining marks, ZWNJ/ZWJ, soft hyphens stay inside the token, like
  the reference's scanner which copies the raw matched span), Hebrew
  letter + single/double-quote forms (WB7a-c), Katakana runs with
  ExtendNumLet joins, Han/Hiragana singles (WB999), Southeast-Asian
  Complex_Context runs (Thai/Lao/...), regional-indicator pairs and
  TR51 emoji sequences (ZWJ chains, skin modifiers, presentation
  selectors, keycaps, tag sequences) as single EMOJI tokens.

Unicode-version parity: an exhaustive per-codepoint differential
sweep (planes 0-2 + the tag block, 5 contexts each, 975k probes)
against the running reference scanner shows ZERO disagreement on
every code point the JDK's Unicode tables define — each class drift
between the reference's frozen 12.1 grammar and the regex module's
15.x tables is pinned back in the pattern (the _PIN_* classes: the
U+055F/U+055A-era MidLetter additions, the prepended-concatenation
marks, U+19DA, U+FE10/U+FE14, the U+1FBF0-9 segmented digits, ~230
later class reassignments, and 935 Extended_Pictographic code points
missing from the regex module's own table, restored in
_EXTPICT_GAP). The only residual difference: ~6.2k code points newer
than those tables are DROPPED by the reference but segmented by us
per current Unicode — strictly better for a modern corpus, precisely
characterized by the sweep.
We also lowercase BEFORE tokenizing (the reference tokenizes, then
LowerCaseFilter), which can differ only for the rare chars whose
word-break class changes under case mapping. ASCII-alnum corpora (the
fixtures and the DuckDB oracle prelude) tokenize identically to the
[0-9A-Za-z]+ subset.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

__all__ = ["MAX_TOKEN_LENGTH", "tokenize_series", "token_counts",
           "tokenize_one", "analyze_series", "analyze_one", "analyze_term",
           "ANALYZERS"]

MAX_TOKEN_LENGTH = 255  # StandardAnalyzer.java:52

# ---------------------------------------------------------------------------
# ASCII fast path: exact UAX#29 subset for pure-ASCII (lowercased) text.
# ASCII word-break classes: ALetter=[a-z], Numeric=[0-9], ExtendNumLet=_,
# MidNumLet=. , SingleQuote=' , MidLetter=: , MidNum=[,;]. A "core" is a
# digit or letter sequence with single mid-joiners (or '_' runs) between
# same-class chars; cores concatenate directly (WB9/10) or across '_'
# runs (WB13a/b), with leading/trailing '_' kept.
# ---------------------------------------------------------------------------
_A_NUM = r"[0-9]+(?:(?:_*|[.,;'])[0-9]+)*"
_A_LET = r"[a-z]+(?:(?:_*|[.':])[a-z]+)*"
_A_SEQ = rf"(?:{_A_NUM}|{_A_LET})+"
_ASCII_RE = re.compile(rf"_*{_A_SEQ}(?:_+{_A_SEQ})*_*")
# When a row contains NO mid-joiner char, the grammar degenerates to
# alnum+underscore runs containing at least one alnum (a bare '_' run
# is ExtendNumLet with no sequence — not a token). That simple pattern
# scans ~2x faster, and one C-speed joiner probe picks the engine —
# equivalence fuzz-tested against _ASCII_RE in test_tokenizer.
_A_HAS_JOINER = re.compile(r"[.,;:']")
_A_SIMPLE = re.compile(r"_*[0-9a-z][0-9a-z_]*")

# ---------------------------------------------------------------------------
# Full UAX#29 path: direct transcription of StandardTokenizerImpl.jflex
# using the `regex` module's Unicode property classes (V1 set operations).
# Every base class absorbs trailing Extend/Format/ZWJ (WB4); the emoji
# macros exclude FE0E/FE0F from the absorption so presentation-selector
# sequences parse, and hold back a ZWJ that glues the next emoji unit
# (jflex longest-match keeps it for the ZWJ-sequence loop; a backtracking
# regex needs the lookahead to avoid committing it to the absorption).
# ---------------------------------------------------------------------------
try:
    import regex as _rx
except ImportError:  # pragma: no cover - regex is a baked-in dependency
    _rx = None

_UAX29_RE = None
if _rx is not None:
    # Unicode-version pins (the reference grammar is frozen at 12.1;
    # the regex module ships 15.x tables). Derived from an exhaustive
    # per-codepoint sweep against the RUNNING reference scanner:
    # - prepended concatenation marks (Arabic number signs etc.) were
    #   Format in 12.1, Numeric later -> back to the absorption class
    # - U+19DA New Tai Lue Tham digit was Complex_Context -> SEA
    # - U+FE10/U+FE14 vertical comma/semicolon were MidNum in 12.1
    # - U+1FBF0-9 segmented digits were ExtPict-reserved, Nd since 13
    _PCM = r"\u0600-\u0605\u06DD\u070F\u08E2\U000110BD\U000110CD"
    # class-membership pins from the same sweep, restricted to code
    # points the JDK's Unicode 13 tables DEFINE (chars newer than that
    # are segmented per current Unicode — the reference simply
    # predates them): chars the regex module calls ALetter / Numeric /
    # Extend / Han that the reference treats as non-word chars
    _PIN_ALETTER = (
        r"\u00B8\u02E5-\u02EB\u055A\u058A\u08BE-\u08C7\u0D04\u31BB-"
        r"\u31BF\uA708-\uA716\uA7C7-\uA7CA\uA7F5-\uA7F6\uAB68-\uAB69"
        r"\U00010E80-\U00010EA9\U00010EB0-\U00010EB1\U00010FB0-"
        r"\U00010FC4\U00011147\U00011460-\U00011461\U00011900-"
        r"\U00011906\U00011909\U0001190C-\U00011913\U00011915-"
        r"\U00011916\U00011918-\U0001192F\U0001193F\U00011941"
        r"\U00011FB0")
    _PIN_EXTEND = (
        r"\u0B55\u0D81\u1ABF-\u1AC0\uA82C\U00010EAB-\U00010EAC"
        r"\U000111CE-\U000111CF\U00011930-\U00011935\U00011937-"
        r"\U00011938\U0001193B-\U0001193E\U00011940\U00011942-"
        r"\U00011943\U00016FE4\U00016FF0-\U00016FF1")
    _PIN_HAN = (
        r"\u4DB6-\u4DBF\u9FF0-\u9FFC\U00016FE2\U0002A6D7-\U0002A6DD"
        r"\U00016FF0-\U00016FF1")
    _PIN_NUMERIC = (
        r"\U00011950-\U00011959")
    _NUM_PIN = rf"[{_PCM}\u19DA\U0001FBF0-\U0001FBF9{_PIN_NUMERIC}]"
    _EFZ = (rf"[[\p{{WB=Format}}\p{{WB=Extend}}\p{{WB=ZWJ}}{_PCM}]"
            rf"--[{_PIN_EXTEND}]]*")
    _AHL = (rf"[[\p{{WB=ALetter}}--[{_PCM}{_PIN_ALETTER}]]"
            r"\p{WB=Hebrew_Letter}]" + _EFZ)
    _NUM = rf"[\p{{WB=Numeric}}--{_NUM_PIN}]" + _EFZ
    _KAT = r"\p{WB=Katakana}" + _EFZ
    # [--\u055F]: ARMENIAN ABBREVIATION MARK became MidLetter in
    # Unicode 14; the reference grammar is frozen at 12.1 (splits)
    _MIDL = (r"[[\p{WB=MidLetter}--[\u055F]]"
             r"\p{WB=MidNumLet}\p{WB=Single_Quote}]" + _EFZ)
    _MIDN = (r"[\p{WB=MidNum}\p{WB=MidNumLet}\p{WB=Single_Quote}"
             r"\uFE10\uFE14]" + _EFZ)
    _ENL = r"\p{WB=ExtendNumLet}" + _EFZ
    # WORD/NUMERIC rule (boundary-identical; the grammar's separate
    # NUMERIC/HANGUL/KATAKANA rules exist "for typing purposes only").
    # The grammar expresses WB7a-c as a standalone Hebrew branch; a
    # backtracking regex matches greedily, not longest, so a leading
    # AHLetter run would strand a trailing Hebrew quote form ("מא'").
    # Instead the quote forms live INSIDE the AHLetter loop, gated by a
    # Hebrew-letter lookbehind/lookahead: Hebrew x Single_Quote may end
    # the token (WB7a), Hebrew Double_Quote x Hebrew joins (WB7b/c).
    # ... but NOT when that Hebrew letter itself closed a MidLetter
    # join ("מ·מ"א" stays two tokens): in the grammar the quote-form
    # Hebrew letter starts its own sequence iteration, which a letter
    # consumed as a MidLetter join target can never do.
    # the blocking MidLetter must itself have JOINED (an AHLetter
    # precedes it) — a dropped MidLetter before a fresh token must not
    # block ("．ב'" still takes the quote; "מ·מ'" does not)
    _HEB_BEHIND = (r"(?<=\p{WB=Hebrew_Letter}"
                   r"[\p{WB=Format}\p{WB=Extend}\p{WB=ZWJ}]*)"
                   r"(?<![\p{WB=ALetter}\p{WB=Hebrew_Letter}]"
                   r"[\p{WB=Format}\p{WB=Extend}\p{WB=ZWJ}]*"
                   r"[\p{WB=MidLetter}\p{WB=MidNumLet}"
                   r"\p{WB=Single_Quote}]"
                   r"[\p{WB=Format}\p{WB=Extend}\p{WB=ZWJ}]*"
                   r"\p{WB=Hebrew_Letter}"
                   r"[\p{WB=Format}\p{WB=Extend}\p{WB=ZWJ}]*)")
    _HEBDQ = (rf"{_HEB_BEHIND}\p{{WB=Double_Quote}}{_EFZ}"
              r"(?=\p{WB=Hebrew_Letter})")
    _HEBSQ = rf"{_HEB_BEHIND}\p{{WB=Single_Quote}}{_EFZ}"
    _SEQ = (rf"(?:{_NUM}(?:(?:(?:{_ENL})*|{_MIDN}){_NUM})*"
            rf"|{_AHL}(?:(?:(?:{_ENL})*|{_MIDL}|{_HEBDQ}){_AHL})*"
            rf"(?:{_HEBSQ})?)+")
    _GRP = rf"(?:{_KAT}(?:(?:{_ENL})*{_KAT})*|{_SEQ})"
    _WORD = rf"(?:{_ENL})*{_GRP}(?:(?:{_ENL})+{_GRP})*(?:{_ENL})*"
    # The regex module's \p{Extended_Pictographic} table omits 935
    # code points the reference grammar includes (TR51 marks many
    # non-presentation symbols and reserved slots ExtPict=Yes, e.g.
    # U+2605 BLACK STAR, U+1F5E8 LEFT SPEECH BUBBLE). Derived by a
    # per-codepoint differential sweep against the RUNNING reference
    # scanner (tools/make_uax29_golden.py corpus methodology): these
    # ranges restore them so the EMOJI rule emits the same tokens.
    _EXTPICT_GAP = (
        r"\u2388\u2605\u2607-\u260D\u260F-\u2610\u2612\u2616-\u2617"
        r"\u2619-\u261C\u261E-\u261F\u2621\u2624-\u2625\u2627-\u2629"
        r"\u262B-\u262D\u2630-\u2637\u263B-\u263F\u2641\u2643-\u2647"
        r"\u2654-\u265E\u2661-\u2662\u2664\u2667\u2669-\u267A\u267C-\u267D"
        r"\u2680-\u2685\u2690-\u2691\u2698\u269A\u269D-\u269F\u26A2-\u26A6"
        r"\u26A8-\u26A9\u26AC-\u26AF\u26B2-\u26BC\u26BF-\u26C3"
        r"\u26C6-\u26C7\u26C9-\u26CD\u26D0\u26D2\u26D5-\u26E8\u26EB-\u26EF"
        r"\u26F6\u26FB-\u26FC\u26FE-\u2701\u2703-\u2704\u270E\u2710-\u2711"
        r"\u2765-\u2767\U0001F000-\U0001F003\U0001F005-\U0001F02B"
        r"\U0001F030-\U0001F093\U0001F0A0-\U0001F0AE\U0001F0B1-\U0001F0BF"
        r"\U0001F0C1-\U0001F0CE\U0001F0D1-\U0001F0F5\U0001F10D-\U0001F10F"
        r"\U0001F12F\U0001F16C-\U0001F16F\U0001F1AD\U0001F260-\U0001F265"
        r"\U0001F322-\U0001F323\U0001F394-\U0001F395\U0001F398"
        r"\U0001F39C-\U0001F39D\U0001F3F1-\U0001F3F2\U0001F3F6\U0001F4FE"
        r"\U0001F546-\U0001F548\U0001F54F\U0001F568-\U0001F56E"
        r"\U0001F571-\U0001F572\U0001F57B-\U0001F586\U0001F588-\U0001F589"
        r"\U0001F58E-\U0001F58F\U0001F591-\U0001F594\U0001F597-\U0001F5A3"
        r"\U0001F5A6-\U0001F5A7\U0001F5A9-\U0001F5B0\U0001F5B3-\U0001F5BB"
        r"\U0001F5BD-\U0001F5C1\U0001F5C5-\U0001F5D0\U0001F5D4-\U0001F5DB"
        r"\U0001F5DF-\U0001F5E0\U0001F5E2\U0001F5E4-\U0001F5E7"
        r"\U0001F5E9-\U0001F5EE\U0001F5F0-\U0001F5F2\U0001F5F4-\U0001F5F9"
        r"\U0001F6C6-\U0001F6CA\U0001F6D3-\U0001F6D4\U0001F6E6-\U0001F6E8"
        r"\U0001F6EA\U0001F6F1-\U0001F6F2\U0001F774-\U0001F77F"
        r"\U0001F7D5-\U0001F7D9\U0001F8B0-\U0001F8BB\U0001F8C0-\U0001F8C1"
        r"\U0001F8D0-\U0001F8D8\U0001FA00-\U0001FA57\U0001FA60-\U0001FA6D"
        r"\U0001FB00-\U0001FBEF\U0001FBFA-\U0001FBFF"
        r"\U0001FBF0-\U0001FBF9")
    # emoji macros (TR51 emoji_sequence, jflex EMOJI rule)
    _EMOJI_UNIT_START = (rf"(?:[\p{{Extended_Pictographic}}{_EXTPICT_GAP}]"
                         r"|[\p{Emoji}--[\p{WB=Regional_Indicator}"
                         r"0-9#*\u00A9\u00AE\u2122\u3030\u303D"
                         r"\p{Emoji_Modifier}]]"
                         r"|\p{Emoji_Modifier_Base}|\p{Emoji_Modifier})")
    _EFZE = (rf"(?:[[\p{{WB=Format}}\p{{WB=Extend}}{_PCM}]"
             rf"--[\uFE0E\uFE0F{_PIN_EXTEND}]]"
             rf"|\p{{WB=ZWJ}}(?!\p{{WB=ZWJ}}*{_EMOJI_UNIT_START}))*")
    _ECHAR = (rf"(?:[\p{{Extended_Pictographic}}{_EXTPICT_GAP}]"
              r"|[\p{Emoji}--[\p{WB=Regional_Indicator}"
              r"0-9#*\u00A9\u00AE\u2122\u3030\u303D\p{Emoji_Modifier}]])")
    _EPS = r"\uFE0F"
    _ECPM = (rf"(?:\p{{WB=ZWJ}}*{_ECHAR}{_EFZE}{_EPS}?"
             rf"|(?:\p{{WB=ZWJ}}*\p{{Emoji_Modifier_Base}}{_EFZE})?"
             rf"\p{{Emoji_Modifier}}{_EFZE})")
    # RegionalIndicatorEx uses the PLAIN ExtFmtZwj (the jflex defines it
    # in the word-rule macro block): FE0E/FE0F after a flag ARE absorbed
    _RI = r"\p{WB=Regional_Indicator}" + _EFZ
    _EMOJI = (rf"(?:{_ECPM}(?:(?:\p{{WB=ZWJ}}{_ECPM})*"
              rf"|[\U000E0020-\U000E007E]+\U000E007F)"
              rf"|[0-9#*]{_EFZE}{_EPS}?\u20E3{_EFZE}"
              rf"|(?:{_RI}){{2}})")
    _SEA = rf"(?:[\p{{LineBreak=Complex_Context}}\u19DA]{_EFZ})+"
    _HAN = rf"[\p{{Script=Han}}--[{_PIN_HAN}]]" + _EFZ
    _HIRA = r"\p{Script=Hiragana}" + _EFZ
    # WORD before EMOJI: where both match (digit keycaps — U+20E3 is
    # WB=Extend so the word rule absorbs it) the boundaries coincide and
    # the reference drops token types anyway; jflex longest-match even
    # prefers the word rule's longer span ("3\u20E34" is ONE numeric token).
    _UAX29_RE = _rx.compile(
        rf"{_WORD}|{_EMOJI}|{_SEA}|{_HAN}|{_HIRA}", flags=_rx.V1)

# legacy approximation, used only if the regex module is unavailable:
# word runs with MidNumLet/MidNum/MidLetter joins, Katakana runs,
# Han/Hiragana singles; no WB4 transparency, no emoji
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


def _ascii_pattern(text: str):
    return (_A_SIMPLE if _A_HAS_JOINER.search(text) is None
            else _ASCII_RE)


def _findall(text: str) -> list:
    """Word-break one lowercased string: ASCII rows through the exact
    C-speed subset, anything else through the full UAX#29 grammar."""
    if text.isascii():
        return _ascii_pattern(text).findall(text)
    if _UAX29_RE is not None:
        return _UAX29_RE.findall(text)
    return _WORD_RE.findall(text)


def tokenize_spans(text: str):
    """Offset-aware word break over RAW (original-case) text — same
    dispatch and boundaries as tokenize_series; used by the highlighter
    to locate term occurrences. Yields re/regex match objects
    (.group(0)/.start()/.end()). Case-insensitive: ASCII classes are
    lowercase-only and Unicode property classes are case-specific, so
    matching is done on the lowercased text; offsets transfer because
    str.lower() is length-preserving for every char the grammar can
    start or extend a token with (the rare length-changing case
    mappings like İ->i̇ are all single token-internal chars)."""
    low = (text or "").lower()
    if len(low) != len(text or ""):  # length-changing case mapping
        low = text or ""             # match original-case text instead
    if low.isascii():
        return _ascii_pattern(low).finditer(low)
    if _UAX29_RE is not None:
        return _UAX29_RE.finditer(low)
    return _WORD_RE.finditer(low)


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

    The per-row dispatch (str.isascii is a C-level scan) keeps ASCII
    corpora on the stdlib-re fast path; pandas .str.findall is itself a
    per-row loop over a C regex, so the comprehension costs the same.
    The long-token split is a cheap fixup only for rows that need it.
    """
    filled = texts.fillna("")
    lowered = filled.str.lower()
    toks = pd.Series([_findall(t) for t in lowered], index=texts.index)
    # fast path: only rows containing a >255-char token need the split
    needs = filled.str.len() > MAX_TOKEN_LENGTH
    if needs.any():
        idx = toks.index[needs]
        toks.loc[idx] = [_split_long(t) for t in toks.loc[idx]]
    return toks


def token_counts(texts: pd.Series) -> np.ndarray:
    """Per-row token count (the field length fed to computeNorm)."""
    return tokenize_series(texts).str.len().to_numpy(dtype=np.int64)


def tokenize_one(text: str) -> list:
    """Single-string helper for tests/driver-side use."""
    return _split_long(_findall((text or "").lower()))


# ---------------------------------------------------------------------------
# analyzer chains (per-field analyzers, core:index/FieldInfos.java;
# PorterStemFilter, analysis/common/.../en/PorterStemFilter.java)
# ---------------------------------------------------------------------------

ANALYZERS = ("standard", "porter", "english", "fold", "cjk", "german",
             "french", "portuguese", "spanish", "italian", "wdgf",
             "shingle", "edge", "ngram", "payload", "html", "phonetic",
             "metaphone")


# chains whose token stream flows through the shared tokenize_series
# path (eligible for the 'compound' spec parameter); the remaining
# chains run their own tokenize pass
_TOKS_PATH_BASES = ("standard", "porter", "english", "fold", "phonetic",
                    "metaphone", "german", "french", "portuguese",
                    "spanish", "italian")


def parse_chain_spec(analyzer: str):
    """Parameterized chain spec -> (base, protected, overrides,
    compound).

    ``'porter?protected=running,ran&override=mice:mouse,geese:goose'``
    configures KeywordMarkerFilter / StemmerOverrideFilter stages in
    front of the stemmer (analysis/common/.../miscellaneous/
    SetKeywordMarkerFilter.java, StemmerOverrideFilter.java): protected
    surface forms pass through unstemmed; override maps a surface form
    straight to its dictionary stem (and marks it keyword). Supported
    bases for protected/override: 'porter' and 'english' (the English
    stemming chains — where the reference filters are used in
    practice).

    ``'german?compound=schlüssel,haus'`` (any tokenize_series-path
    base) inserts a DictionaryCompoundWordTokenFilter stage
    (kernels/compound.py) right after tokenization, so dictionary
    subwords are emitted alongside the compound and then stop/stem
    like standalone words.

    The spec is a plain string, so it persists in the commit manifest
    and flows through the per-field analyzer plumbing unchanged. A
    plain chain name returns (name, None, None, None). The
    pattern-based PatternKeywordMarkerFilter and the
    hyphenation-grammar decompounder are not offered."""
    if not analyzer or "?" not in analyzer:
        return analyzer, None, None, None
    base, _, qs = analyzer.partition("?")
    protected, overrides, compound = None, None, None
    for part in qs.split("&"):
        if not part:
            continue
        k, _, v = part.partition("=")
        if k == "protected":
            if base not in ("porter", "english"):
                raise ValueError(
                    "protected/override spec parameters are supported "
                    f"for the porter/english chains, not {base!r}")
            protected = frozenset(w.lower() for w in v.split(",") if w)
        elif k == "override":
            if base not in ("porter", "english"):
                raise ValueError(
                    "protected/override spec parameters are supported "
                    f"for the porter/english chains, not {base!r}")
            overrides = {}
            for p in v.split(","):
                if not p:
                    continue
                src, sep, dst = p.partition(":")
                if not sep or not src or not dst:
                    raise ValueError(
                        f"override entry {p!r} in {analyzer!r} must be "
                        "'surface:stem' with both sides non-empty")
                overrides[src.lower()] = dst.lower()
        elif k == "compound":
            if base not in _TOKS_PATH_BASES:
                raise ValueError(
                    f"compound spec parameter is not supported for the "
                    f"{base!r} chain (own tokenize pass)")
            compound = frozenset(w.lower() for w in v.split(",") if w)
            if not compound:
                raise ValueError(
                    f"compound dictionary in {analyzer!r} is empty")
        else:
            raise ValueError(f"unknown chain spec parameter {k!r} "
                             f"in {analyzer!r}")
    if protected is not None or overrides is not None:
        protected = protected if protected is not None else frozenset()
        overrides = overrides or {}
    return base, protected, overrides, compound


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

    ``analyzer`` may be a parameterized chain spec (parse_chain_spec):
    'porter?...'/'english?...' insert keyword-marker/override stages
    before the stemmer; '<base>?compound=...' inserts the dictionary
    decompounder after tokenization.
    """
    analyzer, _prot, _over, _comp = parse_chain_spec(analyzer)
    if analyzer == "cjk":
        # CJKAnalyzer: its own tokenize pass (maximal CJK runs ->
        # bigrams) — token merging can't be expressed as a per-token
        # vocabulary map (kernels/cjk.py)
        from .cjk import cjk_tokenize_series
        return cjk_tokenize_series(texts.fillna(""))
    if analyzer == "wdgf":
        # WhitespaceTokenizer + WordDelimiterGraphFilter parts +
        # lowercase: its own case-preserving tokenize pass
        # (kernels/wdgf.py)
        from .wdgf import wdgf_tokenize_series
        return wdgf_tokenize_series(texts)
    if analyzer == "shingle":
        # ShingleAnalyzerWrapper(outputUnigrams=false): word bigrams
        # (kernels/shingle.py) — token count = max(n-1, 0)
        from .shingle import shingle_series
        return shingle_series(texts.fillna(""))
    if analyzer == "edge":
        # EdgeNGramTokenFilter(1, 8, preserveOriginal): every prefix of
        # each token — the search-as-you-type field (kernels/shingle.py)
        from .shingle import edge_series
        return edge_series(texts.fillna(""))
    if analyzer == "ngram":
        # NGramTokenFilter(3, 3, preserveOriginal): the trigram
        # substring-search field (kernels/ngram.py)
        from .ngram import ngram_series
        return ngram_series(texts.fillna(""))
    if analyzer == "payload":
        # WhitespaceTokenizer + LowerCase + DelimitedPayloadTokenFilter:
        # terms are the pre-'|' parts; payloads re-derive at query time
        # from the stored field (kernels/payload.py)
        from .payload import payload_tokenize_series
        return payload_tokenize_series(texts)
    if analyzer == "html":
        # HTMLStripCharFilter + StandardAnalyzer (kernels/htmlstrip.py)
        from .htmlstrip import html_tokenize_series
        return html_tokenize_series(texts)
    toks = tokenize_series(texts)
    if _comp is not None:
        # DictionaryCompoundWordTokenFilter stage: subwords join the
        # stream BEFORE stop/stem so they normalize like standalone
        # words (kernels/compound.py)
        from .compound import decompound_lists
        toks = decompound_lists(toks, _comp)
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
    if analyzer in ("porter", "fold", "phonetic", "metaphone"):
        if analyzer == "porter":
            if _prot is not None:
                from functools import partial
                from .stem import stem_unique_spec
                _map_unique = partial(stem_unique_spec,
                                      protected=_prot, overrides=_over)
            else:
                from .stem import stem_unique as _map_unique
        elif analyzer == "phonetic":
            # 'phonetic' = StandardAnalyzer + PhoneticFilter(Soundex,
            # inject=false): rewrites tokens 1:1 (kernels/phonetic.py)
            from .phonetic import soundex_unique as _map_unique
        elif analyzer == "metaphone":
            # 'metaphone' = StandardAnalyzer + PhoneticFilter(
            # DoubleMetaphone, inject=false): primary codes
            from .phonetic import metaphone_unique as _map_unique
        else:
            # 'fold' = StandardAnalyzer + ASCIIFoldingFilter:
            # rewrites tokens, never drops them (kernels/fold.py)
            from .fold import fold_unique as _map_unique
        mapped = _map_unique(uniq)[codes]
        bounds = np.cumsum(lens)[:-1]
        return pd.Series([list(x) for x in np.split(mapped, bounds)],
                         index=toks.index)
    if analyzer == "english":
        if _prot is not None:
            from functools import partial
            from .stem import english_unique_spec
            _drop_unique = partial(english_unique_spec,
                                   protected=_prot, overrides=_over)
        else:
            from .stem import english_unique as _drop_unique
    elif analyzer == "german":
        # GermanAnalyzer: stop set + normalization FSM + UniNE light
        # stem (kernels/de.py) — stop removal like the english chain
        from .de import german_unique as _drop_unique
    elif analyzer == "french":
        # FrenchAnalyzer: elision + stop set + UniNE light stem
        # (kernels/fr.py) — stop removal like the english chain
        from .fr import french_unique as _drop_unique
    elif analyzer == "portuguese":
        # PortugueseAnalyzer: stop set + UniNE light stem (kernels/pt.py)
        from .pt import portuguese_unique as _drop_unique
    elif analyzer == "spanish":
        # SpanishAnalyzer: stop set + CLEF-2001 light stem (kernels/es.py)
        from .es import spanish_unique as _drop_unique
    elif analyzer == "italian":
        # ItalianAnalyzer: elision + stop set + CLEF-2001 light stem
        from .it import italian_unique as _drop_unique
    else:
        raise ValueError(f"unknown analyzer {analyzer!r}")
    mapped = _drop_unique(uniq)[codes]
    keep = mapped != ""
    row_idx = np.repeat(np.arange(lens.size), lens)[keep]
    kept = mapped[keep]
    counts = np.bincount(row_idx, minlength=lens.size)
    bounds = np.cumsum(counts)[:-1]
    return pd.Series([list(x) for x in np.split(kept, bounds)],
                     index=toks.index)


def analyze_one(text: str, analyzer: str = "standard") -> list:
    """Single-string analyzer chain (query/driver side)."""
    analyzer, _prot, _over, _comp = parse_chain_spec(analyzer)
    if _prot is not None or _comp is not None:
        toks = tokenize_one(text)
        if _comp is not None:
            from .compound import decompound_one
            toks = decompound_one(toks, _comp)
        if _prot is not None:
            from .stem import (english_unique_spec, stem_unique_spec)
            fn = stem_unique_spec if analyzer == "porter" else \
                english_unique_spec
            mapped = fn(np.asarray(toks, dtype=object), protected=_prot,
                        overrides=_over) if toks else []
            return [t for t in mapped if t != ""]
        # compound-only: run the BASE chain over the expanded stream
        # by re-analyzing the joined tokens is wrong (re-tokenize may
        # merge) — instead apply the plain chain per token list
        return _analyze_token_list(toks, analyzer)
    if analyzer == "cjk":
        from .cjk import cjk_analyze_one
        return cjk_analyze_one(text)
    if analyzer == "wdgf":
        from .wdgf import wdgf_analyze_one
        return wdgf_analyze_one(text)
    if analyzer == "shingle":
        from .shingle import shingle_one
        return shingle_one(text)
    if analyzer == "edge":
        from .shingle import edge_one
        return edge_one(text)
    if analyzer == "ngram":
        from .ngram import ngram_one
        return ngram_one(text)
    if analyzer == "payload":
        from .payload import payload_analyze_one
        return payload_analyze_one(text)
    if analyzer == "html":
        from .htmlstrip import html_analyze_one
        return html_analyze_one(text)
    return _analyze_token_list(tokenize_one(text), analyzer)


def _analyze_token_list(toks: list, analyzer: str) -> list:
    """Apply a tokenize_series-path base chain's FILTER stages to an
    already-tokenized (lowercased) list — the per-token tail of
    analyze_one, shared with the compound-spec path (whose expanded
    stream must not be re-tokenized)."""
    if analyzer == "standard":
        return toks
    if analyzer == "porter":
        from .stem import porter_stem
        return [porter_stem(t) if t.isascii() and t.isalpha() else t
                for t in toks]
    if analyzer == "fold":
        from .fold import fold_one
        return [fold_one(t) for t in toks]
    if analyzer in ("phonetic", "metaphone"):
        from .phonetic import phonetic_encode
        enc = "soundex" if analyzer == "phonetic" else "metaphone"
        return [phonetic_encode(t, enc) for t in toks]
    if analyzer == "german":
        from .de import GERMAN_STOP_WORDS, german_light_stem, \
            german_normalize
        return [german_light_stem(german_normalize(t)) for t in toks
                if t not in GERMAN_STOP_WORDS]
    if analyzer == "french":
        from .fr import FRENCH_STOP_WORDS, french_elide, french_light_stem
        out = []
        for t in toks:
            t = french_elide(t)
            if t not in FRENCH_STOP_WORDS:
                out.append(french_light_stem(t))
        return out
    if analyzer == "portuguese":
        from .pt import PORTUGUESE_STOP_WORDS, portuguese_light_stem
        return [portuguese_light_stem(t) for t in toks
                if t not in PORTUGUESE_STOP_WORDS]
    if analyzer == "spanish":
        from .es import SPANISH_STOP_WORDS, spanish_light_stem
        return [spanish_light_stem(t) for t in toks
                if t not in SPANISH_STOP_WORDS]
    if analyzer == "italian":
        from .it import (ITALIAN_STOP_WORDS, italian_elide,
                         italian_light_stem)
        out = []
        for t in toks:
            t = italian_elide(t)
            if t not in ITALIAN_STOP_WORDS:
                out.append(italian_light_stem(t))
        return out
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
    documented deviation for required clauses). A compound spec does
    NOT decompound query terms — subwords are index terms, a query
    term seeks the dictionary directly (the reference applies the
    decompounder index-side only)."""
    analyzer, _prot, _over, _comp = parse_chain_spec(analyzer)
    if _prot is not None:
        from .stem import (ENGLISH_STOP_WORDS, porter_stem,
                           strip_possessive)
        t = term.lower()
        if analyzer == "english":
            t = strip_possessive(t)
            if t in ENGLISH_STOP_WORDS:
                return t
        if t in _prot:       # marker filter precedes override filter
            return t
        if t in _over:
            return _over[t]
        return porter_stem(t) if t.isascii() and t.isalpha() else t
    if analyzer == "standard":
        return term
    if analyzer == "porter":
        from .stem import porter_stem
        t = term.lower()
        return porter_stem(t) if t.isascii() and t.isalpha() else t
    if analyzer == "fold":
        from .fold import fold_one
        return fold_one(term.lower())
    if analyzer in ("phonetic", "metaphone"):
        # query term -> its phonetic code, the same PhoneticFilter
        # replace semantics the index side applied (query "smith"
        # seeks S530 / SM0 in the dictionary)
        from .phonetic import phonetic_encode
        enc = "soundex" if analyzer == "phonetic" else "metaphone"
        return phonetic_encode(term.lower(), enc)
    if analyzer == "cjk":
        # single term slot: width fold + lowercase. A 2-char CJK term
        # IS its bigram; a longer CJK term analyzes to MULTIPLE bigram
        # tokens and needs query-level analysis (analyze_one) — same
        # single-slot caveat the stop-word note above documents.
        from .cjk import width_fold_one
        return width_fold_one(term.lower())
    if analyzer == "wdgf":
        # single term slot: a one-part term lowercases ("Power" ->
        # "power"); a MULTI-part term ("PowerShot500") needs
        # query-level analysis (analyze_one) — same single-slot
        # caveat as cjk; lowercase-only keeps it a dictionary miss
        # rather than a silent wrong match.
        from .wdgf import wdgf_parts
        parts = wdgf_parts(term)
        return parts[0].lower() if len(parts) == 1 else term.lower()
    if analyzer in ("shingle", "edge", "ngram"):
        # dictionary-level terms (a shingle query term is the two
        # words joined by one space; an edge query term is the typed
        # prefix; an ngram query term is a trigram or — via
        # keepShortTerm/keepLongTerm — a whole token): lowercase only —
        # these chains store their tokens lowercased by the standard
        # tokenizer underneath
        return term.lower()
    if analyzer == "payload":
        from .payload import payload_term
        return payload_term(term)
    if analyzer == "html":
        # query terms are not HTML: the char filter is an index-side
        # transform; a single term slot just lowercases (the standard
        # chain underneath)
        return term.lower()
    if analyzer == "german":
        from .de import GERMAN_STOP_WORDS, german_light_stem, \
            german_normalize
        t = term.lower()
        if t in GERMAN_STOP_WORDS:
            return t
        return german_light_stem(german_normalize(t))
    if analyzer == "french":
        from .fr import FRENCH_STOP_WORDS, french_elide, french_light_stem
        t = french_elide(term.lower())
        if t in FRENCH_STOP_WORDS:
            return t
        return french_light_stem(t)
    if analyzer == "portuguese":
        from .pt import PORTUGUESE_STOP_WORDS, portuguese_light_stem
        t = term.lower()
        if t in PORTUGUESE_STOP_WORDS:
            return t
        return portuguese_light_stem(t)
    if analyzer == "spanish":
        from .es import SPANISH_STOP_WORDS, spanish_light_stem
        t = term.lower()
        if t in SPANISH_STOP_WORDS:
            return t
        return spanish_light_stem(t)
    if analyzer == "italian":
        from .it import (ITALIAN_STOP_WORDS, italian_elide,
                         italian_light_stem)
        t = italian_elide(term.lower())
        if t in ITALIAN_STOP_WORDS:
            return t
        return italian_light_stem(t)
    if analyzer != "english":
        raise ValueError(f"unknown analyzer {analyzer!r}")
    from .stem import ENGLISH_STOP_WORDS, porter_stem, strip_possessive
    t = strip_possessive(term.lower())
    if t in ENGLISH_STOP_WORDS:
        return t
    return porter_stem(t) if t.isascii() and t.isalpha() else t
