"""ItalianAnalyzer chain kernels: elision + CLEF-2001 light stemmer.

Reference chain (analysis/common/src/java/org/apache/lucene/analysis/
it/ItalianAnalyzer.java createComponents): StandardTokenizer ->
ElisionFilter (21 Italian articles, ItalianAnalyzer.java:48-54) ->
LowerCaseFilter -> StopFilter (snowball italian_stop set, 279 words)
-> ItalianLightStemFilter.

``italian_light_stem`` re-implements ItalianLightStemmer.java:61-115
(Savoy, "Report on CLEF-2001 Experiments"): accent fold, then strip
final vowels with the -ie/-he/-hi/-ii/-ia/-io doubles. Golden-tested
against the reference Java run via javac
(tests/golden/italian_light.tsv, 3,540 pairs). Vectorized
per-unique-token over the batch's factorized vocabulary.
"""

from __future__ import annotations

import numpy as np

__all__ = ["ITALIAN_STOP_WORDS", "ITALIAN_ARTICLES", "italian_elide",
           "italian_light_stem", "italian_unique"]

ITALIAN_STOP_WORDS = frozenset("""
ad al allo ai agli all agl alla alle con col coi da dal dallo dai
dagli dall dagl dalla dalle di del dello dei degli dell degl della
delle in nel nello nei negli nell negl nella nelle su sul sullo sui
sugli sull sugl sulla sulle per tra contro io tu lui lei noi voi loro
mio mia miei mie tuo tua tuoi tue suo sua suoi sue nostro nostra
nostri nostre vostro vostra vostri vostre mi ti ci vi lo la li le gli
ne il un uno una ma ed se perché anche come dov dove che chi cui non
più quale quanto quanti quanta quante quello quelli quella quelle
questo questi questa queste si tutto tutti a c e i l o ho hai ha
abbiamo avete hanno abbia abbiate abbiano avrò avrai avrà avremo
avrete avranno avrei avresti avrebbe avremmo avreste avrebbero avevo
avevi aveva avevamo avevate avevano ebbi avesti ebbe avemmo aveste
ebbero avessi avesse avessimo avessero avendo avuto avuta avuti avute
sono sei è siamo siete sia siate siano sarò sarai sarà saremo sarete
saranno sarei saresti sarebbe saremmo sareste sarebbero ero eri era
eravamo eravate erano fui fosti fu fummo foste furono fossi fosse
fossimo fossero essendo faccio fai facciamo fanno faccia facciate
facciano farò farai farà faremo farete faranno farei faresti farebbe
faremmo fareste farebbero facevo facevi faceva facevamo facevate
facevano feci facesti fece facemmo faceste fecero facessi facesse
facessimo facessero facendo sto stai sta stiamo stanno stia stiate
stiano starò starai starà staremo starete staranno starei staresti
starebbe staremmo stareste starebbero stavo stavi stava stavamo
stavate stavano stetti stesti stette stemmo steste stettero stessi
stesse stessimo stessero stando
""".split())

# ItalianAnalyzer.DEFAULT_ARTICLES (ItalianAnalyzer.java:48-54)
ITALIAN_ARTICLES = frozenset(
    ("c", "l", "all", "dall", "dell", "nell", "sull", "coll", "pell",
     "gl", "agl", "dagl", "degl", "negl", "sugl", "un", "m", "t", "s",
     "v", "d"))


def italian_elide(token: str) -> str:
    """ElisionFilter with the Italian article set (l'arte -> arte)."""
    from .fr import elide
    return elide(token, ITALIAN_ARTICLES)


_ACCENT_FOLD = str.maketrans({
    "à": "a", "á": "a", "â": "a", "ä": "a",
    "ò": "o", "ó": "o", "ô": "o", "ö": "o",
    "è": "e", "é": "e", "ê": "e", "ë": "e",
    "ù": "u", "ú": "u", "û": "u", "ü": "u",
    "ì": "i", "í": "i", "î": "i", "ï": "i",
})


def italian_light_stem(word: str) -> str:
    """The CLEF-2001 Italian light stemmer (ItalianLightStemmer.java)."""
    if len(word) < 6:
        return word
    s = word.translate(_ACCENT_FOLD)
    n = len(s)
    last, prev = s[n - 1], s[n - 2]
    if last == "e":
        return s[:n - 2] if prev in "ih" else s[:n - 1]
    if last == "i":
        return s[:n - 2] if prev in "hi" else s[:n - 1]
    if last == "a":
        return s[:n - 2] if prev == "i" else s[:n - 1]
    if last == "o":
        return s[:n - 2] if prev == "i" else s[:n - 1]
    return s


def italian_unique(uniques) -> np.ndarray:
    """ItalianAnalyzer per-unique-token transform: elide articles,
    drop stop words (-> ""), light-stem the rest."""
    out = np.empty(len(uniques), dtype=object)
    for i, u in enumerate(uniques):
        t = italian_elide(u)
        out[i] = "" if t in ITALIAN_STOP_WORDS else italian_light_stem(t)
    return out
