"""MemoryIndex — single-document in-memory index (memory module,
memory/src/java/org/apache/lucene/index/memory/MemoryIndex.java).

The core claim: MemoryIndex.search(q) == IndexSearcher.search(q) on a
REAL one-document index, bit-for-bit in float32.
"""

from __future__ import annotations

import numpy as np
import pytest

from lucene_spark.index.memory import MemoryIndex
from lucene_spark.search.query import (AndQuery, BooleanQuery,
                                       ConstantScoreQuery, DisMaxQuery,
                                       FieldExistsQuery, MatchAllQuery,
                                       OrQuery, PhraseQuery, SynonymQuery,
                                       TermQuery)

TEXT = ("the query planner merges sorted segments and the planner "
        "rewrites slow scans into fast index seeks")


@pytest.fixture(scope="module")
def one_doc_index(spark, tmp_path_factory):
    from lucene_spark.index import build_index
    rows = [("c0001", 0, "user", TEXT, "none")]
    src = (spark.createDataFrame(rows,
                                 "conv_id string, turn_idx int, role string, "
                                 "text string, tool string")
           .selectExpr("*", "timestamp('2026-01-01') as ts"))
    out = str(tmp_path_factory.mktemp("mi") / "idx")
    build_index(spark, src, out, num_buckets=1)
    return out


QUERIES = [
    TermQuery("planner"),
    TermQuery("segments"),
    OrQuery(("planner", "scans", "missing")),
    AndQuery(("planner", "segments")),
    PhraseQuery(("query", "planner")),
    PhraseQuery(("planner", "scans"), slop=3),
    SynonymQuery(("fast", "slow")),
    DisMaxQuery(("planner", "scans"), tie_breaker=0.4),
    BooleanQuery(must=("planner",), should=("fast", "missing"),
                 must_not=("absent",)),
    BooleanQuery(should=(PhraseQuery(("index", "seeks")),
                         TermQuery("planner", boost=2.0))),
]


def test_scores_match_real_one_doc_index(spark, one_doc_index):
    """MemoryIndex == the distributed engine on the same document —
    same float32 BM25, same single-segment stats."""
    from lucene_spark.search import IndexSearcher
    s = IndexSearcher(spark, one_doc_index)
    mi = MemoryIndex().add_field("text", TEXT)
    for q in QUERIES:
        got = mi.search(q)
        want = s.search(q, k=1)
        assert want, q
        assert np.float32(got) == np.float32(want[0][1]), q


def test_no_match_returns_zero():
    mi = MemoryIndex().add_field("text", TEXT)
    assert mi.search(TermQuery("absent")) == 0.0
    assert not mi.matches(AndQuery(("planner", "absent")))
    assert mi.search(PhraseQuery(("planner", "query"))) == 0.0
    # msm exceeding the optional count matches nothing
    assert mi.search(BooleanQuery(must=("planner",),
                                  min_should_match=1)) == 0.0


def test_match_all_and_field_exists():
    mi = MemoryIndex().add_field("title", "merge policy")
    assert mi.search(MatchAllQuery()) == 1.0
    assert mi.search(FieldExistsQuery("title")) == 1.0
    assert mi.search(FieldExistsQuery("body")) == 0.0


def test_multi_field_and_cross_field_boolean():
    mi = MemoryIndex.from_document(
        {"title": "tiered merge policy",
         "body": "segments merge into larger tiers and merge again"})
    assert mi.fields() == ["body", "title"]
    t = mi.search(TermQuery("merge", field="title"))
    b = mi.search(TermQuery("merge", field="body"))
    # single-doc index: dl == avgdl in EVERY field, so only tf moves
    # the score (tf=2 in body beats tf=1 in title)
    assert 0 < t < b
    q = BooleanQuery(must=(TermQuery("merge", field="title"),
                           TermQuery("tiers", field="body")))
    got = mi.search(q)
    assert np.float32(got) == np.float32(
        np.float64(np.float32(t))
        + np.float64(np.float32(mi.search(TermQuery("tiers",
                                                    field="body")))))
    # cross-field must_not and ConstantScore
    assert mi.search(BooleanQuery(
        must=(TermQuery("merge", field="title"),),
        must_not=(TermQuery("tiers", field="body"),))) == 0.0
    assert mi.search(ConstantScoreQuery(
        DisMaxQuery((TermQuery("merge", field="title"),
                     TermQuery("absent", field="body"))),
        boost=2.5)) == 2.5


def test_multi_valued_field_appends():
    # Analyzer.getPositionIncrementGap default 0: streams concatenate,
    # a phrase may match across the value boundary
    mi = (MemoryIndex()
          .add_field("text", "fast index")
          .add_field("text", "seeks win"))
    assert mi.matches(PhraseQuery(("index", "seeks")))
    assert mi.search(TermQuery("fast")) > 0


def test_analyzer_chain_per_field():
    mi = MemoryIndex().add_field("text", "merging conversations",
                                 analyzer="porter")
    # porter-stemmed index terms
    assert mi.matches(TermQuery("merg"))
    assert not mi.matches(TermQuery("merging"))
    with pytest.raises(ValueError):
        mi.add_field("text", "more", analyzer="english")


def test_matches_agrees_with_percolator_doc_match():
    """The monitor's CandidateMatcher (ops/percolate.doc_match) and
    MemoryIndex agree on every query shape both support — the
    reference wires MemoryIndex into exactly that verification step."""
    from lucene_spark.kernels.tokenizer import analyze_one
    from lucene_spark.ops.percolate import doc_match
    toks = analyze_one(TEXT, "standard")
    tset = set(toks)
    shapes = QUERIES + [
        BooleanQuery(should=("fast", "slow"), min_should_match=2),
        BooleanQuery(should=("fast", "absent"), min_should_match=2),
        PhraseQuery(("sorted", "segments")),
        AndQuery(("planner", "absent")),
    ]
    mi = MemoryIndex().add_field("text", TEXT)
    for q in shapes:
        assert mi.matches(q) == doc_match(q, toks, tset), q


def test_matchall_and_mtq_shapes_score_not_crash():
    """Shapes outside the brute oracle's vocabulary — negation
    (MatchAll arm), prefix/fuzzy MTQs — must score, not raise
    (review r05: TypeError escaped the oracle delegation)."""
    from lucene_spark.index.memory import MemoryIndex
    from lucene_spark.search.query import (BooleanQuery, MatchAllQuery,
                                           MultiTermQuery, TermQuery)
    from lucene_spark.search.simple_parser import parse_simple
    mi = MemoryIndex.from_document({"text": "hello world"})
    assert mi.search(parse_simple("-foo")) == 1.0       # negation
    assert mi.search(MultiTermQuery("prefix", "hel", "text")) > 0
    assert mi.search(MultiTermQuery("fuzzy", "helo", "text")) > 0
    assert mi.search(MultiTermQuery("prefix", "zzz", "text")) == 0.0
    assert mi.search(BooleanQuery(
        must=(TermQuery("hello", "text"),),
        should=(MatchAllQuery(),))) > 0


def test_cross_field_boolean_boost_applies():
    from lucene_spark.index.memory import MemoryIndex
    from lucene_spark.search.query import BooleanQuery, TermQuery
    mi = MemoryIndex.from_document({"text": "hello", "f2": "world"})
    q1 = BooleanQuery(must=(TermQuery("hello", "text"),
                            TermQuery("world", "f2")))
    q2 = BooleanQuery(must=(TermQuery("hello", "text"),
                            TermQuery("world", "f2")), boost=2.0)
    import pytest as _pt
    assert mi.search(q2) == _pt.approx(2 * mi.search(q1), rel=1e-6)
