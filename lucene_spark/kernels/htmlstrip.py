"""HTMLStripCharFilter — strip markup before tokenization
(analysis/common/src/java/org/apache/lucene/analysis/charfilter/
HTMLStripCharFilter.jflex).

Semantics mirrored from the scanner:
- comments (incl. server-side includes) are removed outright;
- <script>/<style> elements vanish WITH their contents, leaving '\\n'
  (SCRIPT_REPLACEMENT / STYLE_REPLACEMENT, .jflex:148-150);
- <br> variants become '\\n' (BR_*_TAG_REPLACEMENT);
- the 26 INLINE elements (.jflex:117-143 InlineElment: a abbr acronym
  b basefont bdo big cite code dfn em font i img input kbd label q s
  samp select small span strike strong sub sup textarea tt u var)
  strip to NOTHING — "here is a <a href=..>link</a>" reads
  "here is a link";
- every other tag, declaration (<!DOCTYPE ...>) or processing
  instruction is BLOCK-LEVEL and becomes '\\n'
  (BLOCK_LEVEL_*_TAG_REPLACEMENT, .jflex:146-147);
- character entities decode to their code points, with the reference's
  one deliberate exception: "nbsp" maps to a PLAIN SPACE, not U+00A0
  (HTMLCharacterEntities.jflex:124). Decoding runs AFTER tag removal,
  so a decoded '<' never re-parses as markup (same as the scanner,
  which emits decoded characters directly to the output).

Documented deviations (subset, not offset-preserving): Python's
html.unescape implements the HTML5 entity table — a superset of the
scanner's HTML4 list; unterminated comments/scripts pass through
unchanged rather than consuming to EOF; the escapedTags/escapeBR
pass-through configuration is not offered. This engine needs no offset
correction map (BaseCharFilter) because positions are token indices
over the POST-filter text, and the highlighter works on spans of the
analyzed stream.
"""

from __future__ import annotations

import html as _html
import re

import pandas as pd

__all__ = ["html_strip", "html_strip_series", "html_analyze_one",
           "html_tokenize_series"]

_INLINE = ("a|abbr|acronym|b|basefont|bdo|big|cite|code|dfn|em|font|i|"
           "img|input|kbd|label|q|s|samp|select|small|span|strike|"
           "strong|sub|sup|textarea|tt|u|var")

_COMMENT_RE = re.compile(r"<!--.*?-->", re.S)
_SCRIPT_RE = re.compile(r"<script\b[^>]*>.*?</script\s*>", re.S | re.I)
_STYLE_RE = re.compile(r"<style\b[^>]*>.*?</style\s*>", re.S | re.I)
_BR_RE = re.compile(r"</?br\b[^>]*/?>", re.I)
_INLINE_RE = re.compile(r"</?(?:%s)(?:\s[^>]*)?/?>" % _INLINE, re.I)
_TAG_RE = re.compile(r"</?[a-zA-Z][^>]*>|<![^>]*>|<\?[^>]*\?>")
_NBSP_RE = re.compile(r"&nbsp;?", re.I)


def html_strip(text: str) -> str:
    """One string through the char filter."""
    s = _COMMENT_RE.sub("", text)
    s = _SCRIPT_RE.sub("\n", s)
    s = _STYLE_RE.sub("\n", s)
    s = _BR_RE.sub("\n", s)
    s = _INLINE_RE.sub("", s)
    s = _TAG_RE.sub("\n", s)
    s = _NBSP_RE.sub(" ", s)
    return _html.unescape(s)


def html_strip_series(texts: pd.Series) -> pd.Series:
    """Vectorized batch path: the five regex passes run as C-level
    pandas str.replace over the whole batch; only entity decoding is
    per-row (itself one C regex scan inside html.unescape)."""
    s = texts.fillna("")
    s = s.str.replace(_COMMENT_RE, "", regex=True)
    s = s.str.replace(_SCRIPT_RE, "\n", regex=True)
    s = s.str.replace(_STYLE_RE, "\n", regex=True)
    s = s.str.replace(_BR_RE, "\n", regex=True)
    s = s.str.replace(_INLINE_RE, "", regex=True)
    s = s.str.replace(_TAG_RE, "\n", regex=True)
    s = s.str.replace(_NBSP_RE, " ", regex=True)
    return pd.Series([_html.unescape(t) if "&" in t else t for t in s],
                     index=texts.index)


def html_tokenize_series(texts: pd.Series) -> pd.Series:
    """The 'html' analyzer chain: HTMLStripCharFilter + StandardAnalyzer
    (the HTMLStripCharFilterFactory javadoc's canonical composition)."""
    from .tokenizer import tokenize_series
    return tokenize_series(html_strip_series(texts))


def html_analyze_one(text: str) -> list:
    from .tokenizer import tokenize_one
    return tokenize_one(html_strip(text or ""))
