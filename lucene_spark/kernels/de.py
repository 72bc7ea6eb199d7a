"""GermanAnalyzer chain kernels: normalization + UniNE light stemmer.

Reference chain (analysis/common/src/java/org/apache/lucene/analysis/
de/GermanAnalyzer.java createComponents): StandardTokenizer ->
LowerCaseFilter -> StopFilter (snowball german_stop set) ->
GermanNormalizationFilter -> GermanLightStemFilter.

- ``german_normalize`` re-implements the 3-state FSM of
  GermanNormalizationFilter.java:40-100 ('ß'->'ss', umlauts folded,
  'ae'/'oe' -> 'a'/'o', 'ue' -> 'u' unless following a vowel/q — the
  state machine prevents "queue" -> "quu" and "neue" -> "nu").
- ``german_light_stem`` re-implements the Savoy UniNE light stemmer of
  GermanLightStemmer.java:61-141 (accent fold, plural/case suffix
  strip step1, superlative/inflection strip step2), published in
  "Light Stemming Approaches for the French, Portuguese, German and
  Hungarian Languages" (Jacques Savoy, SAC 2006).
- ``GERMAN_STOP_WORDS`` is the snowball german_stop.txt default set
  (231 words) GermanAnalyzer loads.

Golden-tested against the reference Java run via javac
(tests/golden/german_light.tsv: word -> normalized -> stemmed triples,
3,122 rows incl. FSM fuzz words).

Vectorization: like the Porter chain, transforms run on a batch's
FACTORIZED vocabulary (unique tokens only) — per-token cost is a
numpy take on the hot path.
"""

from __future__ import annotations

import numpy as np

__all__ = ["GERMAN_STOP_WORDS", "german_normalize", "german_light_stem",
           "german_unique"]

# snowball german_stop.txt (the GermanAnalyzer DEFAULT_STOPWORD_FILE):
# public Snowball-project data
GERMAN_STOP_WORDS = frozenset("""
aber alle allem allen aller alles als also am an ander andere anderem
anderen anderer anderes anderm andern anderr anders auch auf aus bei
bin bis bist da damit dann der den des dem die das daß derselbe
derselben denselben desselben demselben dieselbe dieselben dasselbe
dazu dein deine deinem deinen deiner deines denn derer dessen dich dir
du dies diese diesem diesen dieser dieses doch dort durch ein eine
einem einen einer eines einig einige einigem einigen einiger einiges
einmal er ihn ihm es etwas euer eure eurem euren eurer eures für gegen
gewesen hab habe haben hat hatte hatten hier hin hinter ich mich mir
ihr ihre ihrem ihren ihrer ihres euch im in indem ins ist jede jedem
jeden jeder jedes jene jenem jenen jener jenes jetzt kann kein keine
keinem keinen keiner keines können könnte machen man manche manchem
manchen mancher manches mein meine meinem meinen meiner meines mit
muss musste nach nicht nichts noch nun nur ob oder ohne sehr sein
seine seinem seinen seiner seines selbst sich sie ihnen sind so solche
solchem solchen solcher solches soll sollte sondern sonst über um und
uns unse unsem unsen unser unses unter viel vom von vor während war
waren warst was weg weil weiter welche welchem welchen welcher welches
wenn werde werden wie wieder will wir wird wirst wo wollen wollte
würde würden zu zum zur zwar zwischen
""".split())

_UMLAUT_FOLD = {"ä": "a", "ö": "o", "ü": "u"}
# GermanLightStemmer.stem's leading accent fold (broader than the
# normalization FSM: grave/acute/circumflex variants too)
_ACCENT_FOLD = str.maketrans({
    "ä": "a", "à": "a", "á": "a", "â": "a",
    "ö": "o", "ò": "o", "ó": "o", "ô": "o",
    "ï": "i", "ì": "i", "í": "i", "î": "i",
    "ü": "u", "ù": "u", "ú": "u", "û": "u",
})

_N, _V, _U = 0, 1, 2


def german_normalize(word: str) -> str:
    """The GermanNormalizationFilter FSM (see module docstring)."""
    out: list = []
    state = _N
    for c in word:
        if c in ("a", "o"):
            state = _U
            out.append(c)
        elif c == "u":
            state = _U if state == _N else _V
            out.append(c)
        elif c == "e":
            if state == _U:
                state = _V
                continue  # 'ae'/'oe'/'ue' -> drop the 'e'
            state = _V
            out.append(c)
        elif c in ("i", "q", "y"):
            state = _V
            out.append(c)
        elif c in _UMLAUT_FOLD:
            state = _V
            out.append(_UMLAUT_FOLD[c])
        elif c == "ß":
            state = _N
            out.append("ss")
        else:
            state = _N
            out.append(c)
    return "".join(out)


def _st_ending(ch: str) -> bool:
    return ch in "bdfghklmnt"


def german_light_stem(word: str) -> str:
    """The UniNE German light stemmer (GermanLightStemmer.java)."""
    s = word.translate(_ACCENT_FOLD)
    n = len(s)
    # step 1: plural / case endings
    if n > 5 and s.endswith("ern"):
        n -= 3
    elif n > 4 and s[n - 2] == "e" and s[n - 1] in "mnrs":
        n -= 2
    elif n > 3 and s[n - 1] == "e":
        n -= 1
    elif n > 3 and s[n - 1] == "s" and _st_ending(s[n - 2]):
        n -= 1
    s = s[:n]
    # step 2: superlatives / inflections
    if n > 5 and s.endswith("est"):
        n -= 3
    elif n > 4 and s[n - 2] == "e" and s[n - 1] in "rn":
        n -= 2
    elif n > 4 and s.endswith("st") and _st_ending(s[n - 3]):
        n -= 2
    return s[:n]


def german_unique(uniques) -> np.ndarray:
    """GermanAnalyzer per-unique-token transform: stop words map to ""
    (removed by the caller, like english_unique), everything else goes
    normalization -> light stem. Non-letter tokens still normalize
    (the Java filters run on every token)."""
    out = np.empty(len(uniques), dtype=object)
    for i, u in enumerate(uniques):
        out[i] = ("" if u in GERMAN_STOP_WORDS
                  else german_light_stem(german_normalize(u)))
    return out
