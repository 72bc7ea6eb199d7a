"""FrenchAnalyzer chain: elision + stop set + UniNE light stemmer
(analysis/common/.../fr/FrenchAnalyzer.java createComponents order:
tokenize -> elision -> lowercase -> stop -> light stem).

Golden: tests/golden/french_light.tsv (word, stemmed) pairs generated
by compiling and RUNNING the reference FrenchLightStemmer.java under
javac — 3,608 rows: real French vocabulary (plural -x/-aux, agent
nouns, feminine forms, -ication family, superlatives) plus
suffix-biased fuzz and digit edge cases."""

import os

import pytest

from lucene_spark.kernels.fr import (ELISION_ARTICLES, FRENCH_STOP_WORDS,
                                     french_elide, french_light_stem)
from lucene_spark.kernels.tokenizer import (analyze_one, analyze_series,
                                            analyze_term)
from lucene_spark.search.oracle import BruteForceOracle
from lucene_spark.search.query import TermQuery

GOLD = os.path.join(os.path.dirname(__file__), "golden", "french_light.tsv")


def test_french_matches_reference_golden():
    n = 0
    for line in open(GOLD, encoding="utf-8"):
        w, want = line.rstrip("\n").split("\t")
        assert french_light_stem(w) == want, w
        n += 1
    assert n > 3500


def test_elision():
    assert french_elide("l'avion") == "avion"
    assert french_elide("d'été") == "été"
    assert french_elide("qu'il") == "il"
    assert french_elide("jusqu'ici") == "ici"
    assert french_elide("l’avion") == "avion"     # U+2019 too
    assert french_elide("xyz'abc") == "xyz'abc"   # not an article
    assert len(ELISION_ARTICLES) == 13


def test_inflections_unify():
    for a, b in (("chevaux", "cheval"), ("journaux", "journal"),
                 ("chanteurs", "chanteur"), ("nationale", "nationaux")):
        assert analyze_term(a, "french") == analyze_term(b, "french")
    assert "les" in FRENCH_STOP_WORDS and "une" in FRENCH_STOP_WORDS


def test_chain_consistency():
    import pandas as pd
    texts = pd.Series(["L'avion de la compagnie", "les châteaux démodés",
                       None, "", "qu'il chante"])
    got = analyze_series(texts, "french")
    for raw, toks in zip(texts.fillna(""), got):
        assert list(toks) == analyze_one(raw, "french")
    assert analyze_one("L'avion", "french") == ["avion"]


def test_french_index_end_to_end(spark, tmp_path):
    from lucene_spark.index import build_index
    from lucene_spark.search import IndexSearcher
    texts = ["les chevaux du roi galopent",
             "un cheval dans le pré",
             "la chanteuse et les chanteurs",
             "l'avion vole au-dessus des châteaux",
             "le château fort domine la vallée"]
    rows = [(f"c{i:04d}", 0, "user", t, "none")
            for i, t in enumerate(texts)]
    src = (spark.createDataFrame(rows,
                                 "conv_id string, turn_idx int, role string, "
                                 "text string, tool string")
           .selectExpr("*", "timestamp('2026-01-01') as ts"))
    out = str(tmp_path / "fr")
    build_index(spark, src, out, num_buckets=2,
                analyzers={"text": "french"})
    s = IndexSearcher(spark, out)
    import pandas as pd
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    oracle = BruteForceOracle(pdf, analyzer="french")
    got = s.search(TermQuery("cheval"), k=10)
    assert {d for d, _ in got} == {0, 1}
    want = oracle.topk({"type": "term",
                        "terms": [analyze_term("cheval", "french")],
                        "k": 10})
    assert [(d, sc) for d, sc in got] == want
    assert s.search(TermQuery("chevaux"), k=10) == got
    # châteaux / château unify; elided l'avion matches avion
    got = s.search(TermQuery("châteaux"), k=10)
    assert {d for d, _ in got} == {3, 4}
    got = s.search(TermQuery("avion"), k=10)
    assert {d for d, _ in got} == {3}
