"""Phonetic encoders + the 'phonetic' / 'metaphone' analyzer chains.

Reference: analysis/phonetic — PhoneticFilter.java:33 (encoder
delegate + replace/inject semantics), DoubleMetaphoneFilter.java:28.
The goldens in tests/golden/phonetic_golden.tsv are produced by
RUNNING the commons-codec encoders the reference delegates to
(tools/make_phonetic_golden.py — the jar PySpark itself ships).
"""

from __future__ import annotations

import os

import pytest

from lucene_spark.kernels.phonetic import (double_metaphone,
                                           phonetic_encode, soundex)
from lucene_spark.kernels.tokenizer import (analyze_one, analyze_series,
                                            analyze_term)
from lucene_spark.search.oracle import BruteForceOracle
from lucene_spark.search.query import OrQuery, TermQuery

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "phonetic_golden.tsv")


def _golden_rows():
    with open(GOLDEN) as fh:
        for line in fh:
            w, sx, dmp, dma = line.rstrip("\n").split("\t")
            yield w, sx, dmp, dma


def test_soundex_golden_zero_mismatch():
    n = 0
    for w, sx, _, _ in _golden_rows():
        assert soundex(w) == sx, w
        n += 1
    assert n > 5000


def test_double_metaphone_golden_zero_mismatch():
    n = 0
    for w, _, dmp, dma in _golden_rows():
        p, a = double_metaphone(w)
        assert p == dmp, w
        assert a == dma, w
        n += 1
    assert n > 5000


def test_soundex_classics():
    # census classics + the H/W silent rule
    assert soundex("Robert") == "R163"
    assert soundex("Rupert") == "R163"
    assert soundex("Ashcraft") == soundex("Ashcroft") == "A261"
    assert soundex("Tymczak") == "T522"
    assert soundex("Pfister") == "P236"
    assert soundex("schmidt") == soundex("smith") == "S530"  # the classic
    # same-code letters separated by H/W collapse; by a vowel they don't
    assert soundex("tgg") == "T200"       # adjacent same codes collapse
    assert soundex("tghg") == "T200"      # across H they still collapse
    assert soundex("tgag") == "T220"      # across a vowel they do NOT
    # the first letter's own code participates in collapsing
    assert soundex("sgcs") == "S000"


def test_double_metaphone_classics():
    assert double_metaphone("smith") == ("SM0", "XMT")
    assert double_metaphone("schmidt") == ("XMT", "SMT")
    assert double_metaphone("knight")[0] == "NT"      # silent start
    assert double_metaphone("night")[0] == "NT"
    assert double_metaphone("filipowicz") == ("FLPT", "FLPF")  # TS/FX
    assert double_metaphone("jose")[0] == "HS"
    assert double_metaphone("michael") == ("MKL", "MXL")


def test_phonetic_filter_passthrough():
    # PhoneticFilter.java:66-77: empty code or code == original keeps
    # the original token (pure digits clean() to empty)
    assert phonetic_encode("42", "soundex") == "42"
    assert phonetic_encode("42", "metaphone") == "42"
    assert phonetic_encode("smith", "soundex") == "S530"
    # mixed alnum tokens encode over their letters only
    assert phonetic_encode("abc123", "soundex") == soundex("abc")


def test_chain_series_matches_one():
    import pandas as pd
    texts = pd.Series(["Smith met Smyth at 42", "knight night nite",
                       "", None])
    for chain in ("phonetic", "metaphone"):
        got = analyze_series(texts.fillna(""), chain).tolist()
        want = [analyze_one(t or "", chain) for t in texts]
        assert got == want
    assert analyze_term("Smith", "phonetic") == "S530"
    assert analyze_term("smyth", "metaphone") == "SM0"


@pytest.fixture(scope="module")
def phonetic_index(spark, tmp_path_factory):
    from lucene_spark.index import build_index
    texts = ["ask smith about the merge plan",
             "smyth reviewed the shuffle stage",
             "smithe owns the query planner",
             "jones rewrote the tokenizer",
             "the planner merged both stages",
             "smith and smyth debated smithe"]
    rows = [(f"c{i:04d}", 0, "user", t, "none")
            for i, t in enumerate(texts)]
    src = (spark.createDataFrame(rows,
                                 "conv_id string, turn_idx int, role string, "
                                 "text string, tool string")
           .selectExpr("*", "timestamp('2026-01-01') as ts"))
    out = str(tmp_path_factory.mktemp("phx") / "idx")
    build_index(spark, src, out, num_buckets=2,
                analyzers={"text": "phonetic"})
    import pandas as pd
    return out, pd.DataFrame({"doc_id": range(len(texts)), "text": texts})


def test_phonetic_index_unifies_spellings(spark, phonetic_index):
    from lucene_spark.search import IndexSearcher
    out, pdf = phonetic_index
    s = IndexSearcher(spark, out)
    assert s.analyzers == {"text": "phonetic"}
    # smith / smyth / smithe (and schmidt!) -> S530; jones -> J520
    got = s.search(TermQuery("smith"), k=10)
    assert {d for d, _ in got} == {0, 1, 2, 5}
    for q in ("smyth", "smithe", "Smith", "schmidt"):
        assert s.search(TermQuery(q), k=10) == got
    assert {d for d, _ in s.search(TermQuery("jones"), k=10)} == {3}
    # BM25 parity with the brute oracle over the same chain
    oracle = BruteForceOracle(pdf, analyzer="phonetic")
    want = oracle.topk({"type": "term", "terms": ["S530"], "k": 10})
    assert [(d, sc) for d, sc in got] == want


def test_phonetic_boolean_over_codes(spark, phonetic_index):
    from lucene_spark.search import IndexSearcher
    out, pdf = phonetic_index
    s = IndexSearcher(spark, out)
    oracle = BruteForceOracle(pdf, analyzer="phonetic")
    got = s.search(OrQuery(("smith", "planner")), k=10)
    want = oracle.topk({"type": "or",
                        "terms": ["S530", soundex("planner")], "k": 10})
    assert [(d, sc) for d, sc in got] == want


@pytest.fixture(scope="module")
def metaphone_index(spark, tmp_path_factory):
    from lucene_spark.index import build_index
    texts = ["the knight guards the castle",
             "that night the index rebuilt",
             "nite shift merges segments",
             "nacht arbeit on the cluster",
             "daytime merges are cheaper"]
    rows = [(f"c{i:04d}", 0, "user", t, "none")
            for i, t in enumerate(texts)]
    src = (spark.createDataFrame(rows,
                                 "conv_id string, turn_idx int, role string, "
                                 "text string, tool string")
           .selectExpr("*", "timestamp('2026-01-01') as ts"))
    out = str(tmp_path_factory.mktemp("mpx") / "idx")
    build_index(spark, src, out, num_buckets=2,
                analyzers={"text": "metaphone"})
    import pandas as pd
    return out, pd.DataFrame({"doc_id": range(len(texts)), "text": texts})


def test_metaphone_index_unifies_spellings(spark, metaphone_index):
    from lucene_spark.search import IndexSearcher
    out, pdf = metaphone_index
    s = IndexSearcher(spark, out)
    # knight / night / nite -> NT; nacht -> NKT stays out
    got = s.search(TermQuery("knight"), k=10)
    assert {d for d, _ in got} == {0, 1, 2}
    assert s.search(TermQuery("nite"), k=10) == got
    assert {d for d, _ in s.search(TermQuery("nacht"), k=10)} == {3}
    oracle = BruteForceOracle(pdf, analyzer="metaphone")
    want = oracle.topk({"type": "term", "terms": ["NT"], "k": 10})
    assert [(d, sc) for d, sc in got] == want


def test_soundex_sql_expression_matches_python():
    """The ft_phonetic oracle's independent SQL soundex (DuckDB
    translate + per-digit run collapse) agrees with phonetic_encode
    on every golden word — so the CORRECTNESS gate's two sides are
    genuinely independent implementations of the same spec."""
    import duckdb
    import pandas as pd
    import __spark_entry__ as entry
    expr = entry._soundex_sql("t")
    words = [w for w, _, _, _ in _golden_rows()]
    con = duckdb.connect()
    con.register("w", pd.DataFrame({"t": words}))
    got = con.execute(f"SELECT t, {expr} AS c FROM w").df()
    for t, c in zip(got["t"], got["c"]):
        assert c == phonetic_encode(t, "soundex"), t


def test_non_ascii_tokens_pass_through():
    """PhoneticFilter.java:75 'just use the direct text': an encode
    error (Soundex unmapped non-ASCII letter) keeps the original token
    instead of crashing the chain (advisor-style r05 finding)."""
    from lucene_spark.kernels.phonetic import phonetic_encode
    from lucene_spark.kernels.tokenizer import analyze_one
    assert phonetic_encode("café", "soundex") == "café"
    got = analyze_one("Café latte", "phonetic")
    assert got[0] == "café" and len(got) == 2
    got = analyze_one("naïve test", "metaphone")
    assert len(got) == 2
    import pytest as _pt
    with _pt.raises(ValueError):
        phonetic_encode("x", "bogus")
