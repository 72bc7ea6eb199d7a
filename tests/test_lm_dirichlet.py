"""LM Dirichlet similarity plug-in (LMDirichletSimilarity analog) +
the filter cache (LRUQueryCache analog)."""

import numpy as np
import pytest

from lucene_spark.fixtures.transcripts import term_string
from lucene_spark.index.catalog import IndexCatalog
from lucene_spark.kernels.bm25 import LMDirichletScorer
from lucene_spark.kernels.smallfloat import LENGTH_TABLE, int_to_byte4
from lucene_spark.search import IndexSearcher
from lucene_spark.search.oracle import BruteForceOracle
from lucene_spark.search.query import OrQuery, TermQuery

T = [term_string(k) for k in range(30)]


def test_lm_dirichlet_formula():
    sc = LMDirichletScorer(doc_freq=10, doc_count=100, sum_ttf=5000,
                           ttf=50, mu=2000.0)
    code = int(int_to_byte4(np.array([30]))[0])
    got = float(sc.score(np.array([3]), np.array([code]))[0])
    p_col = 51.0 / 5001.0
    dl = float(LENGTH_TABLE[code])
    want = np.log1p(3.0 / (2000.0 * p_col)) + np.log(2000.0 / (dl + 2000.0))
    assert got == pytest.approx(max(want, 0.0), rel=1e-6)


def test_lm_dirichlet_search_matches_bruteforce(spark, small_index):
    s = IndexSearcher(spark, small_index, similarity=LMDirichletScorer)
    cat = IndexCatalog(small_index)
    pdf = (spark.read.parquet(cat.table_path("docstore"))
           .select("doc_id", "text").orderBy("doc_id").toPandas())
    o = BruteForceOracle(pdf)

    def brute(term, k):
        sc = LMDirichletScorer(o.df[term], o.doc_count, o.sum_ttf,
                               ttf=sum(c.get(term, 0) for c in o.tfs))
        tf = np.array([c.get(term, 0) for c in o.tfs], dtype=np.int64)
        sv = sc.score(tf, o.norms)
        idx = np.flatnonzero(tf > 0)
        order = np.lexsort((o.doc_ids[idx], -sv[idx]))[:k]
        return [(int(o.doc_ids[idx[i]]), np.float32(sv[idx[i]]))
                for i in order]

    for term in (T[0], T[3], T[9]):
        got = s.search(TermQuery(term), k=10)
        assert got == brute(term, 10), term


def test_lm_dirichlet_pruned_equals_exhaustive(spark, small_index):
    s = IndexSearcher(spark, small_index, similarity=LMDirichletScorer)
    q = OrQuery((T[1], T[4], T[8]))
    assert s.search(q, k=10, pruned=True) == s.search(q, k=10, pruned=False)


def test_filter_cache_reuses_bitmaps(spark, small_index):
    s = IndexSearcher(spark, small_index)
    r1 = s.search(TermQuery(T[1]), k=8, doc_filter="role = 'user'")
    df_first = s._filter_cache.get("role = 'user'")
    assert df_first is not None
    r2 = s.search(TermQuery(T[2]), k=8, doc_filter="role = 'user'")
    assert s._filter_cache["role = 'user'"] is df_first  # same cached DF
    # results still correct vs uncached searcher
    s2 = IndexSearcher(spark, small_index)
    assert r2 == s2.search(TermQuery(T[2]), k=8, doc_filter="role = 'user'")
    assert r1 == s2.search(TermQuery(T[1]), k=8, doc_filter="role = 'user'")


def test_filter_cache_evicts_lru(spark, small_index):
    s = IndexSearcher(spark, small_index)
    for i in range(s.FILTER_CACHE_MAX + 2):
        s._doc_filter_bitmaps(f"token_count > {i}")
    assert len(s._filter_cache) == s.FILTER_CACHE_MAX
    assert "token_count > 0" not in s._filter_cache
