"""Dictionary-driven synonyms (SynonymMap / SynonymGraphFilter +
QueryBuilder graph analysis — round-4 verdict "what's missing #1").

Parsing follows SolrSynonymParser ("a, b, c" equivalence classes with
expand true/false; "a, b => c, d" explicit mappings); matching is the
FST's longest-match non-overlapping scan; query building follows
QueryBuilder.analyzeGraphBoolean: all-single-token spans blend as
SynonymQuery, multi-word paths become per-path Term/Phrase disjunctions
scored with their own stats. Applied at query time (the configuration
the reference javadoc recommends).
"""

import pytest

from lucene_spark.kernels.synonyms import SynonymMap, synonym_query
from lucene_spark.search.query import (BooleanQuery, PhraseQuery,
                                       PreAnalyzed, SynonymQuery,
                                       TermQuery)


def test_equivalence_class_expand_true():
    m = SynonymMap(["fast, quick, rapid"])
    assert m.map[("fast",)] == {("fast",), ("quick",), ("rapid",)}
    assert m.map[("quick",)] == m.map[("fast",)]


def test_equivalence_class_expand_false_maps_to_first():
    m = SynonymMap(["big, large, huge"], expand=False)
    assert m.map[("large",)] == {("big",)}
    assert m.map[("big",)] == {("big",)}


def test_explicit_rule_replaces_input():
    m = SynonymMap(["usa => united states"])
    assert m.map[("usa",)] == {("united", "states")}
    assert ("united", "states") not in m.map


def test_multiword_input_and_longest_match():
    m = SynonymMap(["merge join, join", "merge, combine"])
    spans = m.match(["a", "merge", "join", "b"])
    # 'merge join' (len 2) wins over 'merge' (len 1) at position 1
    assert spans == [(0, 1, [("a",)]),
                     (1, 2, [("join",), ("merge", "join")]),
                     (3, 1, [("b",)])]
    spans2 = m.match(["merge", "sort"])
    assert spans2[0] == (0, 1, [("combine",), ("merge",)])


def test_rule_terms_run_through_analyzer_chain():
    m = SynonymMap(["merging, combining"], analyzer="porter")
    assert m.map[("merg",)] == {("merg",), ("combin",)}


def test_query_shapes():
    m = SynonymMap(["slow, fast", "merge join, join"])
    q = synonym_query("slow merge join", m)
    assert isinstance(q, PreAnalyzed)
    b = q.query
    assert isinstance(b, BooleanQuery) and len(b.should) == 2
    syn, inner = b.should
    assert isinstance(syn, SynonymQuery) and syn.terms_ == ("fast", "slow")
    assert isinstance(inner, BooleanQuery)
    kinds = {type(c) for c in inner.should}
    assert kinds == {TermQuery, PhraseQuery}
    # AND operator -> must clauses
    qa = synonym_query("slow scan", m, operator="and").query
    assert isinstance(qa, BooleanQuery) and len(qa.must) == 2
    # single expanded span unwraps
    qs = synonym_query("usa", SynonymMap(["usa => united states"])).query
    assert isinstance(qs, PhraseQuery) and qs.terms_ == ("united", "states")
    # un-matched single term stays a TermQuery
    qt = synonym_query("scan", m).query
    assert isinstance(qt, TermQuery) and qt.term == "scan"


@pytest.fixture(scope="module")
def syn_corpus(spark, tmp_path_factory):
    from lucene_spark.index import build_index
    import pandas as pd
    texts = ["the slow scan finished",
             "a fast merge join beats a slow hash join",
             "merge join plans dominate",
             "join the stream with the table",
             "fast vector scan",
             "sort then merge the runs",
             "hash join against the build side",
             "slow slow slow queries"]
    rows = [(f"c{i:04d}", 0, "user", t, "none")
            for i, t in enumerate(texts)]
    src = (spark.createDataFrame(rows,
                                 "conv_id string, turn_idx int, role string,"
                                 " text string, tool string")
           .selectExpr("*", "timestamp('2026-01-01') as ts"))
    out = str(tmp_path_factory.mktemp("syn") / "idx")
    build_index(spark, src, out, num_buckets=2)
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    return out, pdf


def test_graph_query_rank_identical_to_oracle(spark, syn_corpus):
    from lucene_spark.search import IndexSearcher
    from lucene_spark.search.oracle import BruteForceOracle
    out, pdf = syn_corpus
    s = IndexSearcher(spark, out)
    m = SynonymMap(["slow, fast", "merge join, join"])
    q = synonym_query("slow merge join", m)
    got = s.search(q, k=10)
    oracle = BruteForceOracle(pdf)
    want = oracle.topk_query(q.query, 10)
    assert got == want
    # every doc containing slow/fast OR join matches
    assert {d for d, _ in got} == {0, 1, 2, 3, 4, 6, 7}


def test_graph_query_on_stemmed_index(spark, tmp_path_factory):
    from lucene_spark.index import build_index
    from lucene_spark.search import IndexSearcher
    texts = ["merging the sorted runs", "combination of sorted runs",
             "unrelated stream processing"]
    rows = [(f"c{i:04d}", 0, "user", t, "none")
            for i, t in enumerate(texts)]
    src = (spark.createDataFrame(rows,
                                 "conv_id string, turn_idx int, role string,"
                                 " text string, tool string")
           .selectExpr("*", "timestamp('2026-01-01') as ts"))
    out = str(tmp_path_factory.mktemp("synp") / "idx")
    build_index(spark, src, out, num_buckets=2,
                analyzers={"text": "porter"})
    s = IndexSearcher(spark, out)
    # rules AND query text go through the porter chain; the built query
    # is PreAnalyzed so the searcher does not stem twice
    m = SynonymMap(["merging, combination"], analyzer="porter")
    q = synonym_query("merges", m, analyzer="porter")
    got = {d for d, _ in s.search(q, k=10)}
    assert got == {0, 1}


def test_phrase_context_shapes():
    """QueryBuilder.analyzeGraphPhrase (QueryBuilder.java:560-620):
    stacked single tokens -> MultiPhraseQuery; a multi-token path ->
    disjunction of complete phrase paths."""
    from lucene_spark.kernels.synonyms import synonym_phrase_query
    from lucene_spark.search.query import MultiPhraseQuery
    m = SynonymMap(["slow, fast", "merge join, join"])
    # "slow scan": one position with alternatives + one plain term
    q = synonym_phrase_query("slow scan", m).query
    assert isinstance(q, MultiPhraseQuery)
    assert q.slots == [("fast", "slow"), ("scan",)]
    assert q.slop == 0
    # slop threads through
    q = synonym_phrase_query("slow scan", m, slop=2).query
    assert q.slop == 2
    # multi-token path -> all complete paths, each its own phrase
    q = synonym_phrase_query("fast merge join", m).query
    assert isinstance(q, BooleanQuery)
    paths = {tuple(c.terms_) for c in q.should}
    assert paths == {("fast", "merge", "join"), ("slow", "merge", "join"),
                     ("fast", "join"), ("slow", "join")}
    # single unmatched term collapses
    q = synonym_phrase_query("scan", m).query
    assert isinstance(q, TermQuery)
    # the path-explosion guard
    mm = SynonymMap(["a0 b0, c0"])
    with pytest.raises(ValueError):
        synonym_phrase_query(" ".join(["a0 b0"] * 8), mm)


def test_phrase_context_rank_identical_to_oracle(spark, syn_corpus):
    from lucene_spark.kernels.synonyms import synonym_phrase_query
    from lucene_spark.search import IndexSearcher
    from lucene_spark.search.oracle import BruteForceOracle
    out, pdf = syn_corpus
    s = IndexSearcher(spark, out)
    m = SynonymMap(["merge, hash"])
    # "(merge|hash) join" as ONE MultiPhraseQuery
    q = synonym_phrase_query("merge join", m)
    got = s.search(q, k=10)
    oracle = BruteForceOracle(pdf)
    want = oracle.topk_query(q.query, 10)
    assert got == want
    assert {d for d, _ in got} == {1, 2, 6}  # merge join / hash join
