"""Monitor with arbitrary query shapes + QueryAnalyzer presearcher
(monitor/src/java/org/apache/lucene/monitor/QueryAnalyzer.java,
Monitor.java register/match)."""

import pytest

from lucene_spark.ops import percolate as PC
from lucene_spark.search.query import (BooleanQuery, ConstantScoreQuery,
                                       DisMaxQuery, MultiTermQuery, OrQuery,
                                       PhraseQuery, TermQuery)

DOCS = [
    (0, "slow fast batch vector"),
    (1, "slow vector stream"),
    (2, "slow dup vector"),
    (3, "query sort merge"),
    (4, "fast slow fast batch"),
    (5, "quick quack"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id bigint, text string")


def test_presearcher_term_extraction():
    P = PC.presearcher_terms
    assert P(TermQuery("a")) == {"a"}
    # conjunction: one (minimal) required term suffices
    assert P(PhraseQuery(("slow", "fast"))) == {"fast"}
    assert P(OrQuery(("a", "bb"))) == {"a", "bb"}
    # boolean picks the smallest required child set over must+filter
    q = BooleanQuery(must=(OrQuery(("aa", "bb")),), filter_=("c",),
                     should=("d",))
    assert P(q) == {"c"}
    # pure-should boolean unions; an MTQ child forces ANYTOKEN
    assert P(BooleanQuery(should=("a", "b"))) == {"a", "b"}
    assert P(MultiTermQuery("prefix", "qu")) is PC.ANYTOKEN
    assert P(BooleanQuery(should=(MultiTermQuery("prefix", "x"), "a"))) \
        is PC.ANYTOKEN
    assert P(ConstantScoreQuery(TermQuery("z"))) == {"z"}
    assert P(DisMaxQuery(("a", TermQuery("b")))) == {"a", "b"}


def test_registered_percolate_matches(spark, docs):
    registered = [
        ("nested", BooleanQuery(must=("slow",),
                                should=("vector", "stream"),
                                min_should_match=1, must_not=("dup",))),
        ("mtq", MultiTermQuery("prefix", "qu")),
        ("phrase_filter", BooleanQuery(must=(PhraseQuery(("slow", "fast")),),
                                       filter_=("batch",))),
        ("sloppy", PhraseQuery(("slow", "batch"), slop=1)),
        ("fuzzy", MultiTermQuery("fuzzy", "quik", max_edits=1)),
    ]
    got = {(r["query_id"], r["doc_id"])
           for r in PC.percolate_registered(docs, registered).collect()}
    want = {
        ("nested", 0), ("nested", 1),          # doc 2 killed by dup
        ("mtq", 3), ("mtq", 5),                # query / quick / quack
        ("phrase_filter", 0), ("phrase_filter", 4),
        ("sloppy", 0), ("sloppy", 4),          # one gap within slop
        ("fuzzy", 5),                          # quick ~1~ quik
    }
    assert got == want


def test_registered_matches_doc_match_brute(spark, docs):
    """percolate_registered == brute doc_match over every (q, doc)."""
    from lucene_spark.kernels.tokenizer import tokenize_one
    registered = [
        ("a", DisMaxQuery((PhraseQuery(("slow", "fast")),
                           TermQuery("merge")))),
        ("b", BooleanQuery(should=("quick", "stream"),
                           min_should_match=1)),
    ]
    got = {(r["query_id"], r["doc_id"])
           for r in PC.percolate_registered(docs, registered).collect()}
    want = set()
    for qid, q in registered:
        for did, text in DOCS:
            toks = tokenize_one(text)
            if PC.doc_match(q, toks, set(toks)):
                want.add((qid, did))
    assert got == want
