"""PortugueseAnalyzer chain kernels: UniNE light stemmer + stop set.

Reference chain (analysis/common/src/java/org/apache/lucene/analysis/
pt/PortugueseAnalyzer.java createComponents): StandardTokenizer ->
LowerCaseFilter -> StopFilter (snowball portuguese_stop set) ->
PortugueseLightStemFilter.

``portuguese_light_stem`` re-implements the Savoy UniNE Portuguese
light stemmer of PortugueseLightStemmer.java:63-210: plural suffix
removal (-es after r/s/l/z, -ns -> -m, the -eis/-ais/-óis/-is -> -l
family, -ões/-ães -> -ão, adverbial -mente, trailing -s), feminine
normalization (-inha/-osa/-ica/... -> -o, -ona -> -ão, -esa -> -ês),
final-vowel strip, then accent folding. ``PORTUGUESE_STOP_WORDS`` is
the snowball portuguese_stop.txt default set (203 words).

Golden-tested against the reference Java run via javac
(tests/golden/portuguese_light.tsv: 3,584 word -> stem pairs of real
vocabulary + suffix-biased fuzz). Vectorized per-unique-token over the
batch's factorized vocabulary like the other chains.
"""

from __future__ import annotations

import numpy as np

__all__ = ["PORTUGUESE_STOP_WORDS", "portuguese_light_stem",
           "portuguese_unique"]

# snowball portuguese_stop.txt (PortugueseAnalyzer DEFAULT_STOPWORD_FILE)
PORTUGUESE_STOP_WORDS = frozenset("""
de a o que e do da em um para com não uma os no se na por mais as dos
como mas ao ele das à seu sua ou quando muito nos já eu também só
pelo pela até isso ela entre depois sem mesmo aos seus quem nas me
esse eles você essa num nem suas meu às minha numa pelos elas qual
nós lhe deles essas esses pelas este dele tu te vocês vos lhes meus
minhas teu tua teus tuas nosso nossa nossos nossas dela delas esta
estes estas aquele aquela aqueles aquelas isto aquilo estou está
estamos estão estive esteve estivemos estiveram estava estávamos
estavam estivera estivéramos esteja estejamos estejam estivesse
estivéssemos estivessem estiver estivermos estiverem hei há havemos
hão houve houvemos houveram houvera houvéramos haja hajamos hajam
houvesse houvéssemos houvessem houver houvermos houverem houverei
houverá houveremos houverão houveria houveríamos houveriam sou somos
são era éramos eram fui foi fomos foram fora fôramos seja sejamos
sejam fosse fôssemos fossem for formos forem serei será seremos serão
seria seríamos seriam tenho tem temos tém tinha tínhamos tinham tive
teve tivemos tiveram tivera tivéramos tenha tenhamos tenham tivesse
tivéssemos tivessem tiver tivermos tiverem terei terá teremos terão
teria teríamos teriam
""".split())

_ACCENT_FOLD = str.maketrans({
    "à": "a", "á": "a", "â": "a", "ä": "a", "ã": "a",
    "ò": "o", "ó": "o", "ô": "o", "ö": "o", "õ": "o",
    "è": "e", "é": "e", "ê": "e", "ë": "e",
    "ù": "u", "ú": "u", "û": "u", "ü": "u",
    "ì": "i", "í": "i", "î": "i", "ï": "i",
    "ç": "c",
})


def _remove_suffix(s: str) -> str:
    n = len(s)
    if n > 4 and s.endswith("es") and s[n - 3] in "rslz":
        return s[:n - 2]
    if n > 3 and s.endswith("ns"):
        return s[:n - 2] + "m"
    if n > 4 and (s.endswith("eis") or s.endswith("éis")):
        return s[:n - 3] + "el"
    if n > 4 and s.endswith("ais"):
        return s[:n - 3] + "al"
    if n > 4 and s.endswith("óis"):
        return s[:n - 3] + "ol"
    if n > 4 and s.endswith("is"):
        return s[:n - 1] + "l"
    if n > 3 and (s.endswith("ões") or s.endswith("ães")):
        return s[:n - 3] + "ão"
    if n > 6 and s.endswith("mente"):
        return s[:n - 5]
    if n > 3 and s.endswith("s"):
        return s[:n - 1]
    return s


def _norm_feminine(s: str) -> str:
    n = len(s)
    if n > 7 and (s.endswith("inha") or s.endswith("iaca")
                  or s.endswith("eira")):
        return s[:n - 1] + "o"
    if n > 6:
        if s[n - 3:] in ("osa", "ica", "ida", "ada", "iva", "ama"):
            return s[:n - 1] + "o"
        if s.endswith("ona"):
            return s[:n - 3] + "ão"
        if s.endswith("ora"):
            return s[:n - 1]
        if s.endswith("esa"):
            return s[:n - 3] + "ês"
        if s.endswith("na"):
            return s[:n - 1] + "o"
    return s


def portuguese_light_stem(word: str) -> str:
    """The UniNE Portuguese light stemmer (PortugueseLightStemmer.java)."""
    if len(word) < 4:
        return word
    s = _remove_suffix(word)
    if len(s) > 3 and s.endswith("a"):
        s = _norm_feminine(s)
    if len(s) > 4 and s[-1] in "eao":
        s = s[:-1]
    return s.translate(_ACCENT_FOLD)


def portuguese_unique(uniques) -> np.ndarray:
    """PortugueseAnalyzer per-unique-token transform: stop words map
    to "" (removed by the caller), everything else light-stems."""
    out = np.empty(len(uniques), dtype=object)
    for i, u in enumerate(uniques):
        out[i] = ("" if u in PORTUGUESE_STOP_WORDS
                  else portuguese_light_stem(u))
    return out
