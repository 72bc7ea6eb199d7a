"""FrenchAnalyzer chain kernels: elision + UniNE light stemmer.

Reference chain (analysis/common/src/java/org/apache/lucene/analysis/
fr/FrenchAnalyzer.java createComponents): StandardTokenizer ->
ElisionFilter (l'avion -> avion; DEFAULT_ARTICLES, both ' and
U+2019) -> LowerCaseFilter -> StopFilter (snowball french_stop set)
-> FrenchLightStemFilter.

- ``french_elide`` re-implements ElisionFilter.java:49-66: strip the
  prefix before the FIRST apostrophe when it is one of the 13 default
  articles (we run it on already-lowercased tokens; the Java set is
  ignoreCase so the order change is invisible).
- ``french_light_stem`` re-implements the Savoy UniNE French light
  stemmer of FrenchLightStemmer.java:65-260 (plural -x/-s, the
  -aux -> -al rewrite, a suffix battery with agent/feminine/quality
  rewrites, and the norm() pass: accent fold, consecutive-duplicate
  letter collapse, -ie / trailing r/e/e strips).
- ``FRENCH_STOP_WORDS`` is the snowball french_stop.txt default set
  (154 words) FrenchAnalyzer loads.

Golden-tested against the reference Java run via javac
(tests/golden/french_light.tsv: word -> stemmed pairs, 3,608 rows of
real vocabulary + suffix-biased fuzz + digit edge cases).

Vectorization: per-unique-token transforms over the batch's
factorized vocabulary, like the porter/english/german chains.
"""

from __future__ import annotations

import numpy as np

__all__ = ["FRENCH_STOP_WORDS", "ELISION_ARTICLES", "french_elide",
           "french_light_stem", "french_unique"]

# snowball french_stop.txt (FrenchAnalyzer DEFAULT_STOPWORD_FILE)
FRENCH_STOP_WORDS = frozenset("""
au aux avec ce ces dans de des du elle en et eux il je la le leur lui
ma mais me même mes moi mon ne nos notre nous on ou par pas pour qu
que qui sa se ses sur ta te tes toi ton tu un une vos votre vous c d
j l à m n s t y étée étées étant suis es êtes sont serai seras sera
serons serez seront serais serait serions seriez seraient étais était
étions étiez étaient fus fut fûmes fûtes furent sois soit soyons
soyez soient fusse fusses fussions fussiez fussent ayant eu eue eues
eus ai avons avez ont aurai aurons aurez auront aurais aurait aurions
auriez auraient avais avait aviez avaient eut eûmes eûtes eurent aie
aies ait ayons ayez aient eusse eusses eût eussions eussiez eussent
ceci cela celà cet cette ici ils les leurs quel quels quelle quelles
sans soi
""".split())

# FrenchAnalyzer.DEFAULT_ARTICLES (FrenchAnalyzer.java:56-62)
ELISION_ARTICLES = frozenset(
    ("l", "m", "t", "qu", "n", "s", "j", "d", "c",
     "jusqu", "quoiqu", "lorsqu", "puisqu"))


def elide(token: str, articles) -> str:
    """ElisionFilter core: strip an article prefix before the first
    ' / ’ (analysis/common/.../util/ElisionFilter.java) — shared by the
    French and Italian chains, which differ only in the article set."""
    hits = [i for i in (token.find("'"), token.find("’")) if i >= 0]
    if not hits:
        return token
    i = min(hits)
    if token[:i] in articles:
        return token[i + 1:]
    return token


def french_elide(token: str) -> str:
    """ElisionFilter with the French 13-article set."""
    return elide(token, ELISION_ARTICLES)


_ACCENT_FOLD = str.maketrans({
    "à": "a", "á": "a", "â": "a", "ô": "o",
    "è": "e", "é": "e", "ê": "e",
    "ù": "u", "û": "u", "î": "i", "ç": "c",
})


def _norm(s: str) -> str:
    """FrenchLightStemmer.norm (accent fold + duplicate collapse +
    -ie / trailing r/e/e strips; each stage gated on len > 4)."""
    if len(s) > 4:
        s = s.translate(_ACCENT_FOLD)
        out = [s[0]]
        for c in s[1:]:
            if c == out[-1] and c.isalpha():
                continue
            out.append(c)
        s = "".join(out)
    if len(s) > 4 and s.endswith("ie"):
        s = s[:-2]
    if len(s) > 4:
        if s[-1] == "r":
            s = s[:-1]
        if s[-1] == "e":
            s = s[:-1]
        if s[-1] == "e":
            s = s[:-1]
        if len(s) >= 2 and s[-1] == s[-2] and s[-1].isalpha():
            s = s[:-1]
    return s


def french_light_stem(word: str) -> str:
    """The UniNE French light stemmer (FrenchLightStemmer.java)."""
    s = word
    n = len(s)
    if n > 5 and s[n - 1] == "x":
        if s[n - 3] == "a" and s[n - 2] == "u" and s[n - 4] != "e":
            s = s[:n - 2] + "l" + s[n - 1]  # chevaux -> cheval(x)
        n -= 1
        s = s[:n]
    n = len(s)
    if n > 3 and s.endswith("x"):
        s = s[:-1]
    if len(s) > 3 and s.endswith("s"):
        s = s[:-1]
    n = len(s)
    if n > 9 and s.endswith("issement"):
        return _norm(s[:n - 6 - 1] + "r")          # -issement -> ..ir
    if n > 8 and s.endswith("issant"):
        return _norm(s[:n - 4 - 1] + "r")          # -issant -> ..ir
    if n > 6 and s.endswith("ement"):
        s = s[:n - 4]
        if len(s) > 3 and s.endswith("ive"):
            s = s[:-1]
            s = s[:-1] + "f"
        return _norm(s)
    if n > 11 and s.endswith("ficatrice"):
        s = s[:n - 5]
        return _norm(s[:-2] + "er")
    if n > 10 and s.endswith("ficateur"):
        s = s[:n - 4]
        return _norm(s[:-2] + "er")
    if n > 9 and s.endswith("catrice"):
        s = s[:n - 3]
        return _norm(s[:-4] + "que" + s[-1])       # ..catr -> ..quer
    if n > 8 and s.endswith("cateur"):
        s = s[:n - 2]
        return _norm(s[:-4] + "quer")
    if n > 8 and s.endswith("atrice"):
        s = s[:n - 4]
        return _norm(s[:-2] + "er")
    if n > 7 and s.endswith("ateur"):
        s = s[:n - 3]
        return _norm(s[:-2] + "er")
    if n > 6 and s.endswith("trice"):
        s = s[:n - 1]
        s = s[:-3] + "eur"                          # no return (falls on)
    n = len(s)
    if n > 5 and s.endswith("ième"):
        return _norm(s[:n - 4])
    if n > 7 and s.endswith("teuse"):
        s = s[:n - 2]
        return _norm(s[:-1] + "r")
    if n > 6 and s.endswith("teur"):
        s = s[:n - 1]
        return _norm(s[:-1] + "r")
    if n > 5 and s.endswith("euse"):
        return _norm(s[:n - 2])
    if n > 8 and s.endswith("ère"):
        s = s[:n - 1]
        return _norm(s[:-2] + "e" + s[-1])          # ..ère -> ..er
    if n > 7 and s.endswith("ive"):
        s = s[:n - 1]
        return _norm(s[:-1] + "f")
    if n > 4 and (s.endswith("folle") or s.endswith("molle")):
        s = s[:n - 2]
        return _norm(s[:-1] + "u")                  # fou / mou
    if n > 9 and s.endswith("nnelle"):
        return _norm(s[:n - 5])
    if n > 9 and s.endswith("nnel"):
        return _norm(s[:n - 3])
    if n > 4 and s.endswith("ète"):
        s = s[:n - 1]
        s = s[:-2] + "e" + s[-1]                    # no return
    n = len(s)
    if n > 8 and s.endswith("ique"):
        s = s[:n - 4]
    n = len(s)
    if n > 8 and s.endswith("esse"):
        return _norm(s[:n - 3])
    if n > 7 and s.endswith("inage"):
        return _norm(s[:n - 3])
    if n > 9 and s.endswith("isation"):
        s = s[:n - 7]
        if len(s) > 5 and s.endswith("ual"):
            s = s[:-2] + "e" + s[-1]                # ..ual -> ..uel
        return _norm(s)
    if n > 9 and s.endswith("isateur"):
        return _norm(s[:n - 7])
    if n > 8 and s.endswith("ation"):
        return _norm(s[:n - 5])
    if n > 8 and s.endswith("ition"):
        return _norm(s[:n - 5])
    return _norm(s)


def french_unique(uniques) -> np.ndarray:
    """FrenchAnalyzer per-unique-token transform: elide articles, drop
    stop words (map to "", removed by the caller), light-stem the
    rest. Elision runs BEFORE the stop filter, like the Java chain
    (l'avion -> avion -> stem; l' alone never reaches the stop set)."""
    out = np.empty(len(uniques), dtype=object)
    for i, u in enumerate(uniques):
        t = french_elide(u)
        out[i] = "" if t in FRENCH_STOP_WORDS else french_light_stem(t)
    return out
