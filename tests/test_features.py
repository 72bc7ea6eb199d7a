"""FeatureField score functions + boost_by_feature composition
(core/src/java/org/apache/lucene/document/FeatureField.java)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_spark.fixtures.transcripts import term_string
from lucene_spark.ops.features import boost_by_feature, feature_score
from lucene_spark.search import IndexSearcher
from lucene_spark.search.query import TermQuery


@pytest.fixture(scope="module")
def searcher(spark, small_index):
    return IndexSearcher(spark, small_index)


@pytest.fixture(scope="module")
def vals_df(spark):
    return spark.createDataFrame(
        [(0, 0.0), (1, 1.0), (2, 3.5), (3, 120.0), (4, None)],
        "id int, v double")


def _collect(df, col):
    return {r["id"]: r[col] for r in df.collect()}


@pytest.mark.parametrize("fn,params,ref", [
    # FeatureField.java LinearFunction (:585): w * S
    ("linear", dict(weight=2.0), lambda v: 2.0 * v),
    # LogFunction (:606): w * ln(scalingFactor + S)
    ("log", dict(weight=1.5, scaling=2.0),
     lambda v: 1.5 * math.log(2.0 + v)),
    # SaturationFunction (:634): w * S / (S + pivot)
    ("saturation", dict(weight=3.0, pivot=4.0),
     lambda v: 3.0 * v / (v + 4.0)),
    # SigmoidFunction (:681): w * S^a / (S^a + pivot^a)
    ("sigmoid", dict(weight=1.0, pivot=2.0, exponent=0.6),
     lambda v: v ** 0.6 / (v ** 0.6 + 2.0 ** 0.6)),
])
def test_score_functions_match_reference_formulas(vals_df, fn, params, ref):
    out = _collect(
        vals_df.select("id", feature_score("v", fn, **params).alias("s")),
        "s")
    for i, v in [(0, 0.0), (1, 1.0), (2, 3.5), (3, 120.0)]:
        assert out[i] == pytest.approx(ref(v), rel=1e-12), (fn, v)
    # a doc without the feature does not match the feature clause -> 0
    assert out[4] == 0.0


def test_unknown_function_rejected(vals_df):
    with pytest.raises(ValueError):
        vals_df.select(feature_score("v", "bm25ish"))


def test_boost_by_feature_matches_brute_force(searcher):
    q = TermQuery(term_string(1))
    k = 15
    got = [(r["doc_id"], r["score"])
           for r in boost_by_feature(searcher, q, "token_count",
                                     fn="saturation", k=k,
                                     weight=2.0, pivot=40.0).collect()]
    assert len(got) == k

    # brute force: BM25 match stream + saturation(token_count)
    m = {r["doc_id"]: r["score"] for r in searcher.matches_df(q).collect()}
    tc = {r["doc_id"]: r["token_count"]
          for r in searcher._read_cached(searcher.docstore_paths)
          .select("doc_id", "token_count").collect()}
    want = sorted(
        ((d, s + 2.0 * tc[d] / (tc[d] + 40.0)) for d, s in m.items()),
        key=lambda t: (-t[1], t[0]))[:k]
    assert [d for d, _ in got] == [d for d, _ in want]
    np.testing.assert_allclose([s for _, s in got],
                               [s for _, s in want], rtol=1e-6)


def test_feature_clause_reorders_ranking(searcher):
    """The feature SHOULD clause must actually change the order vs
    plain BM25 on this corpus (long docs get promoted)."""
    q = TermQuery(term_string(1))
    plain = [r["doc_id"] for r in searcher.search_df(q, k=15).collect()]
    boosted = [r["doc_id"]
               for r in boost_by_feature(searcher, q, "token_count",
                                         fn="saturation", k=15,
                                         weight=50.0, pivot=10.0).collect()]
    assert plain != boosted
