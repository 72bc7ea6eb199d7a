"""explain() must report the same score search() computes, for every
query shape — flat decomposition for flat shapes, tree-kernel total for
tree shapes (Weight.explain's contract: Explanation.getValue() ==
scorer.score())."""

import pytest

from lucene_spark.search import IndexSearcher
from lucene_spark.search.query import (BooleanQuery, ConstantScoreQuery,
                                       DisMaxQuery, OrQuery, PhraseQuery,
                                       TermQuery)
from lucene_spark.fixtures.transcripts import term_string

T = [term_string(k) for k in range(10)]


@pytest.fixture(scope="module")
def searcher(spark, small_index):
    return IndexSearcher(spark, small_index)


SHAPES = [
    TermQuery(T[2]),
    OrQuery((T[2], T[5], T[7])),
    PhraseQuery((T[1], T[2])),
    BooleanQuery(must=(TermQuery(T[2], boost=2.0),),
                 should=(TermQuery(T[5]),)),
    BooleanQuery(must=(BooleanQuery(should=(T[2], T[5])),),
                 must_not=(T[9],)),
    DisMaxQuery((TermQuery(T[2]), TermQuery(T[5])), tie_breaker=0.3),
    ConstantScoreQuery(OrQuery((T[2], T[5])), boost=1.5),
]


@pytest.mark.parametrize("q", SHAPES, ids=lambda q: type(q).__name__)
def test_explain_matches_search(searcher, q):
    top = searcher.search(q, k=3)
    assert top, f"shape must match something: {q}"
    for doc, score in top:
        ex = searcher.explain(q, doc)
        assert ex["matches"]
        assert ex["score"] == pytest.approx(score, rel=1e-5), q


def test_explain_nonmatching_doc(searcher):
    q = TermQuery(T[2])
    matched = {d for d, _ in searcher.search(q, k=10 ** 6)}
    probe = next(d for d in range(10 ** 6) if d not in matched)
    ex = searcher.explain(q, probe)
    assert not ex["matches"] and ex.get("score", 0.0) == 0.0
