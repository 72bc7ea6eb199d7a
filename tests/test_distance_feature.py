"""DistanceFeatureQuery — recency/proximity boosting
(core/src/java/org/apache/lucene/document/LongDistanceFeatureQuery.java,
LongPoint.newDistanceFeatureQuery)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_spark.fixtures.transcripts import term_string
from lucene_spark.ops.features import (boost_by_distance,
                                       distance_feature_score)
from lucene_spark.search import IndexSearcher
from lucene_spark.search.query import TermQuery


@pytest.fixture(scope="module")
def searcher(spark, small_index):
    return IndexSearcher(spark, small_index)


def test_score_matches_reference_formula(spark):
    # LongDistanceFeatureQuery.java:265 — boost * pivot/(pivot + dist)
    df = spark.createDataFrame(
        [(0, 50), (1, 0), (2, 53), (3, 1000), (4, None)],
        "id int, v long")
    out = {r["id"]: r["s"] for r in df.select(
        "id", distance_feature_score("v", origin=50, pivot=10,
                                     weight=2.0).alias("s")).collect()}
    assert out[0] == pytest.approx(2.0)                    # dist 0 -> weight
    assert out[1] == pytest.approx(2.0 * 10 / (10 + 50))
    assert out[2] == pytest.approx(2.0 * 10 / (10 + 3))
    assert out[3] == pytest.approx(2.0 * 10 / (10 + 950))
    assert out[4] == 0.0                                   # missing field


def test_pivot_must_be_positive():
    # the reference rejects pivotDistance <= 0 (:53-55)
    with pytest.raises(ValueError):
        distance_feature_score("v", origin=0, pivot=0)
    with pytest.raises(ValueError):
        distance_feature_score("v", origin=0, pivot=-3)


def test_boost_by_distance_matches_brute_force(searcher):
    q = TermQuery(term_string(1))
    k = 15
    got = [(r["doc_id"], r["score"])
           for r in boost_by_distance(searcher, q, "token_count",
                                      origin=50, pivot=10, k=k,
                                      weight=2.0).collect()]
    assert len(got) == k

    m = {r["doc_id"]: r["score"] for r in searcher.matches_df(q).collect()}
    tc = {r["doc_id"]: r["token_count"]
          for r in searcher._read_cached(searcher.docstore_paths)
          .select("doc_id", "token_count").collect()}
    want = sorted(
        ((d, s + 2.0 * 10.0 / (10.0 + abs(tc[d] - 50.0)))
         for d, s in m.items()),
        key=lambda t: (-t[1], t[0]))[:k]
    assert [d for d, _ in got] == [d for d, _ in want]
    np.testing.assert_allclose([s for _, s in got],
                               [s for _, s in want], rtol=1e-6)


def test_distance_clause_reorders_ranking(searcher):
    """A strong recency-style boost must actually change the order vs
    plain BM25 (docs near the origin length get promoted)."""
    q = TermQuery(term_string(1))
    plain = [r["doc_id"] for r in searcher.search_df(q, k=15).collect()]
    boosted = [r["doc_id"]
               for r in boost_by_distance(searcher, q, "token_count",
                                          origin=30, pivot=2, k=15,
                                          weight=50.0).collect()]
    assert plain != boosted
