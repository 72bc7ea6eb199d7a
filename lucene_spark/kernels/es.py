"""SpanishAnalyzer chain kernels: CLEF-2001 light stemmer + stop set.

Reference chain (analysis/common/src/java/org/apache/lucene/analysis/
es/SpanishAnalyzer.java createComponents): StandardTokenizer ->
LowerCaseFilter -> StopFilter (snowball spanish_stop set, 308 words)
-> SpanishLightStemFilter.

``spanish_light_stem`` re-implements SpanishLightStemmer.java:61-114
(Savoy, "Report on CLEF-2001 Experiments"): accent fold, then strip a
final -o/-a/-e, or -es/-os/-as, with -eses -> -es and -ces -> -z.
Golden-tested against the reference Java run via javac
(tests/golden/spanish_light.tsv, 3,551 pairs). Vectorized
per-unique-token over the batch's factorized vocabulary.
"""

from __future__ import annotations

import numpy as np

__all__ = ["SPANISH_STOP_WORDS", "spanish_light_stem", "spanish_unique"]

SPANISH_STOP_WORDS = frozenset("""
de la que el en y a los del se las por un para con no una su al lo
como más pero sus le ya o este sí porque esta entre cuando muy sin
sobre también me hasta hay donde quien desde todo nos durante todos
uno les ni contra otros ese eso ante ellos e esto mí antes algunos qué
unos yo otro otras otra él tanto esa estos mucho quienes nada muchos
cual poco ella estar estas algunas algo nosotros mi mis tú te ti tu
tus ellas nosotras vosotros vosotras os mío mía míos mías tuyo tuya
tuyos tuyas suyo suya suyos suyas nuestro nuestra nuestros nuestras
vuestro vuestra vuestros vuestras esos esas estoy estás está estamos
estáis están esté estés estemos estéis estén estaré estarás estará
estaremos estaréis estarán estaría estarías estaríamos estaríais
estarían estaba estabas estábamos estabais estaban estuve estuviste
estuvo estuvimos estuvisteis estuvieron estuviera estuvieras
estuviéramos estuvierais estuvieran estuviese estuvieses estuviésemos
estuvieseis estuviesen estando estado estada estados estadas estad he
has ha hemos habéis han haya hayas hayamos hayáis hayan habré habrás
habrá habremos habréis habrán habría habrías habríamos habríais
habrían había habías habíamos habíais habían hube hubiste hubo hubimos
hubisteis hubieron hubiera hubieras hubiéramos hubierais hubieran
hubiese hubieses hubiésemos hubieseis hubiesen habiendo habido habida
habidos habidas soy eres es somos sois son sea seas seamos seáis sean
seré serás será seremos seréis serán sería serías seríamos seríais
serían era eras éramos erais eran fui fuiste fue fuimos fuisteis
fueron fuera fueras fuéramos fuerais fueran fuese fueses fuésemos
fueseis fuesen siendo sido tengo tienes tiene tenemos tenéis tienen
tenga tengas tengamos tengáis tengan tendré tendrás tendrá tendremos
tendréis tendrán tendría tendrías tendríamos tendríais tendrían tenía
tenías teníamos teníais tenían tuve tuviste tuvo tuvimos tuvisteis
tuvieron tuviera tuvieras tuviéramos tuvierais tuvieran tuviese
tuvieses tuviésemos tuvieseis tuviesen teniendo tenido tenida tenidos
tenidas tened
""".split())

_ACCENT_FOLD = str.maketrans({
    "à": "a", "á": "a", "â": "a", "ä": "a",
    "ò": "o", "ó": "o", "ô": "o", "ö": "o",
    "è": "e", "é": "e", "ê": "e", "ë": "e",
    "ù": "u", "ú": "u", "û": "u", "ü": "u",
    "ì": "i", "í": "i", "î": "i", "ï": "i",
})


def spanish_light_stem(word: str) -> str:
    """The CLEF-2001 Spanish light stemmer (SpanishLightStemmer.java)."""
    if len(word) < 5:
        return word
    s = word.translate(_ACCENT_FOLD)
    n = len(s)
    last = s[n - 1]
    if last in "oae":
        return s[:n - 1]
    if last == "s":
        if s[n - 2] == "e" and s[n - 3] == "s" and s[n - 4] == "e":
            return s[:n - 2]
        if s[n - 2] == "e" and s[n - 3] == "c":
            return s[:n - 3] + "z"
        if s[n - 2] in "oae":
            return s[:n - 2]
    return s


def spanish_unique(uniques) -> np.ndarray:
    """SpanishAnalyzer per-unique-token transform (stop words -> "")."""
    out = np.empty(len(uniques), dtype=object)
    for i, u in enumerate(uniques):
        out[i] = "" if u in SPANISH_STOP_WORDS else spanish_light_stem(u)
    return out
