"""KeywordMarkerFilter + StemmerOverrideFilter chain specs.

Reference parity targets (analysis/common/.../miscellaneous/):
- SetKeywordMarkerFilter.java: tokens in the protected set are marked
  keyword, so the downstream stemmer passes them through.
- StemmerOverrideFilter.java:38-62: a dictionary maps surface forms
  straight to their stems AND marks them keyword.
Both filters sit immediately before the stemmer; in the english chain
that is after possessive strip and stop filtering
(EnglishAnalyzer.createComponents order).

Spec strings ('porter?protected=...&override=...') persist in the
commit manifest like any chain name, so index and query sides always
agree.
"""

import pandas as pd
import pytest

from lucene_spark.kernels.tokenizer import (analyze_one, analyze_series,
                                            analyze_term,
                                            parse_chain_spec)
from lucene_spark.search.oracle import BruteForceOracle
from lucene_spark.search.query import OrQuery, TermQuery

SPEC = "porter?protected=query&override=merge:combine"


def test_parse_chain_spec():
    assert parse_chain_spec("porter") == ("porter", None, None, None)
    base, prot, over, comp = parse_chain_spec(SPEC)
    assert (base, prot, over, comp) == ("porter", frozenset({"query"}),
                                        {"merge": "combine"}, None)
    with pytest.raises(ValueError):
        parse_chain_spec("cjk?protected=x")
    with pytest.raises(ValueError):
        parse_chain_spec("porter?bogus=1")


def test_protected_wins_over_override():
    # the marker filter runs BEFORE the override filter, and
    # StemmerOverrideFilter applies only to non-keyword tokens — a
    # surface form in both sets stays protected
    spec = "porter?protected=merge&override=merge:combine"
    assert analyze_term("merge", spec) == "merge"
    assert analyze_one("merge merging", spec) == ["merge", "merg"]
    import pandas as pd_
    assert list(analyze_series(pd_.Series(["merge"]), spec)) == [["merge"]]
    e = "english?protected=mice&override=mice:mouse"
    assert analyze_term("mice", e) == "mice"


def test_spec_validation_and_case():
    # empty override sides are malformed (an empty stem would write ''
    # postings on the index side while the query side dropped it)
    for bad in ("porter?override=merge:", "porter?override=:combine",
                "porter?override=merge"):
        with pytest.raises(ValueError):
            parse_chain_spec(bad)
    # spec words normalize to lowercase like the token stream
    base, prot, over, comp = parse_chain_spec(
        "porter?protected=Query&override=Merge:Combine")
    assert prot == frozenset({"query"}) and over == {"merge": "combine"}


def test_porter_spec_semantics():
    # override is surface-form keyed: 'merge' maps, 'merging' still
    # porter-stems; protected 'query' passes through while 'queries'
    # stems to the (now different) class 'queri'
    assert analyze_one("Merge merging queries query running", SPEC) == \
        ["combine", "merg", "queri", "query", "run"]
    assert analyze_term("merge", SPEC) == "combine"
    assert analyze_term("query", SPEC) == "query"
    assert analyze_term("queries", SPEC) == "queri"


def test_english_spec_order():
    # english chain: possessive strip and stop filtering happen BEFORE
    # the override/keyword stages (reference chain order)
    spec = "english?protected=running&override=mice:mouse"
    assert analyze_one("The mice's tails are running quickly", spec) == \
        ["mouse", "tail", "running", "quickli"]
    assert analyze_term("Mice's", spec) == "mouse"
    assert analyze_term("running", spec) == "running"
    # stop words still analyze to themselves (absent from the index)
    assert analyze_term("the", spec) == "the"


def test_series_equals_per_row():
    texts = pd.Series(["Merge merging queries query running", "",
                       "the mice and query merge"])
    for spec in (SPEC, "english?protected=query&override=mice:mouse"):
        got = analyze_series(texts, spec)
        for raw, toks in zip(texts, got):
            assert toks == analyze_one(raw, spec)


TEXTS = [
    "merge the sorted segments",          # 0: merge -> combine
    "merging sorted runs nightly",        # 1: merging -> merg (no override)
    "query planner chooses a join",       # 2: query protected
    "queries arrive in batches",          # 3: queries -> queri
    "combine harvester manual",           # 4: literal 'combine' collides
]


@pytest.fixture(scope="module")
def spec_index(spark, tmp_path_factory):
    from lucene_spark.index import build_index
    from lucene_spark.search import IndexSearcher
    rows = [(f"c{i:04d}", 0, "user", t, "none")
            for i, t in enumerate(TEXTS)]
    src = (spark.createDataFrame(rows,
                                 "conv_id string, turn_idx int, role string, "
                                 "text string, tool string")
           .selectExpr("*", "timestamp('2026-01-01') as ts"))
    out = str(tmp_path_factory.mktemp("spec") / "idx")
    build_index(spark, src, out, num_buckets=2,
                analyzers={"text": SPEC})
    return IndexSearcher(spark, out)


def test_spec_index_end_to_end(spec_index):
    s = spec_index
    assert s.analyzers == {"text": SPEC}
    oracle = BruteForceOracle(
        pd.DataFrame({"doc_id": range(len(TEXTS)), "text": TEXTS}),
        analyzer=SPEC)
    # query-side analysis routes through the same spec: 'merge' seeks
    # the override term 'combine'. The LITERAL 'combine' in doc 4 does
    # NOT join that class — unoverridden tokens still porter-stem, so
    # it indexes as 'combin' (the reference behaves the same way: the
    # override dictionary emits its value verbatim while natural text
    # goes through the stemmer). The brute oracle takes
    # DICTIONARY-level terms, so feed it the analyzed forms.
    got = s.search(TermQuery("merge"), k=10)
    assert {d for d, _ in got} == {0}
    assert got == oracle.topk({"type": "term", "terms": ["combine"],
                               "k": 10})
    # ...and doc 4 is reachable through the natural stem class
    got = s.search(TermQuery("combining"), k=10)
    assert {d for d, _ in got} == {4}
    # protected term matches only the surface form
    got = s.search(TermQuery("query"), k=10)
    assert {d for d, _ in got} == {2}
    assert got == oracle.topk({"type": "term", "terms": ["query"],
                               "k": 10})
    # 'queries' stems to 'queri' — a DIFFERENT class than protected
    # 'query', so inflection unification is intentionally broken
    got = s.search(TermQuery("queries"), k=10)
    assert [d for d, _ in got] == [3]
    assert got == oracle.topk({"type": "term", "terms": ["queri"],
                               "k": 10})
    assert s.count(TermQuery("queries")) == 1
    # disjunction across the classes agrees with the brute oracle
    got = s.search(OrQuery(("merge", "query", "queries")), k=10)
    assert got == oracle.topk({"type": "or",
                               "terms": ["combine", "query", "queri"],
                               "k": 10})
