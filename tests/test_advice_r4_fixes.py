"""Regression tests for the round-4 advisor findings.

1 (medium): the pruned-path bound cache keyed combined-field wrapper
   scorers on id(wrapper); ephemeral wrappers can be garbage collected
   and their id reused by a wrapper with a DIFFERENT weight/zero_norm,
   serving a stale (wrong) upper bound. Fixed by a value-identity
   cache_key on _ScaledFreqBound.
2 (low): percolate doc_match skipped the min_should_match gate for
   boolean queries with musts and ZERO should clauses; Lucene (and the
   oracle) treat msm > |should| as matching nothing.
3 (low): eval_tree's combined branch recomputed the SmallFloat
   combined-norm re-encode per pruned window; now memoized per bucket
   via _CachingNorms.
5 (low): term_postings / phrase_matches / interval_search took RAW
   terms on analyzed indexes while search_df analyzed them — the
   match-stream APIs now route through the field's analyzer chain.
"""

import gc

import numpy as np
import pytest

from lucene_spark.kernels.bm25 import BM25Scorer
from lucene_spark.search.kernels import (_CachingNorms, _ScaledFreqBound,
                                         _combined_norm_codes,
                                         _window_leaf_bounds, TermChunk)


def _one_block_chunk():
    """A chunk with one block whose impact skyline is (freq=3, norm=1)."""
    block = {"first_doc": 0, "last_doc": 9, "imp_freqs": [3],
             "imp_norms": [1], "docs_delta": b"", "tfs": b"",
             "positions": b""}
    # TermChunk only needs blocks + bounds for the bound path
    return TermChunk([block], [0.0])


# ---------------------------------------------------------------------------
# 1: bound cache must not serve a stale wrapper bound after id() reuse
# ---------------------------------------------------------------------------

def test_scaled_freq_bound_cache_key_is_value_identity():
    base = BM25Scorer(5, 100, 1000)
    w2 = _ScaledFreqBound(base, 2.0)
    w3 = _ScaledFreqBound(base, 3.0)
    assert w2.cache_key != w3.cache_key
    assert (_ScaledFreqBound(base, 2.0, zero_norm=True).cache_key
            != w2.cache_key)
    # equal parameters -> equal key (the memo actually hits)
    assert _ScaledFreqBound(base, 2.0).cache_key == w2.cache_key


def test_window_bounds_survive_wrapper_id_reuse():
    """Simulate the failure mode directly: compute bounds with a weight-2
    wrapper, drop it, create a weight-5 wrapper (CPython frequently
    reuses the freed id for same-sized objects), and require the cached
    entry NOT to be served for the new wrapper."""
    base = BM25Scorer(5, 100, 1000)
    chunk = _one_block_chunk()
    w_lo = np.array([0], dtype=np.int64)
    cache: dict = {}
    w = _ScaledFreqBound(base, 2.0)
    b2, cov = _window_leaf_bounds(chunk, w, w_lo, cache)
    assert cov[0]
    del w
    gc.collect()
    w5 = _ScaledFreqBound(base, 5.0)
    b5, _ = _window_leaf_bounds(chunk, w5, w_lo, cache)
    # weight-5 bound must be strictly larger than the weight-2 bound
    # (score is increasing in freq); a stale cache hit would equal b2
    assert b5[0] > b2[0]
    # and the direct scorer agrees
    want5 = float(w5.score(np.array([3]), np.array([1]))[0])
    assert b5[0] == pytest.approx(want5, rel=1e-6)


# ---------------------------------------------------------------------------
# 2: percolate msm gate with zero should clauses
# ---------------------------------------------------------------------------

def test_doc_match_msm_exceeding_should_count_matches_nothing():
    from lucene_spark.ops.percolate import doc_match
    from lucene_spark.search.query import BooleanQuery, TermQuery
    toks = ["alpha", "beta"]
    tset = set(toks)
    q = BooleanQuery(must=(TermQuery("alpha"),), min_should_match=2)
    assert doc_match(q, toks, tset) is False
    # msm=0 with musts still matches (no optional gate)
    q0 = BooleanQuery(must=(TermQuery("alpha"),))
    assert doc_match(q0, toks, tset) is True
    # msm satisfiable by present shoulds still matches
    q1 = BooleanQuery(must=(TermQuery("alpha"),),
                      should=(TermQuery("beta"), TermQuery("zzz")),
                      min_should_match=1)
    assert doc_match(q1, toks, tset) is True
    # and the engine-side oracle agrees on the degenerate shape
    q2 = BooleanQuery(must=(TermQuery("alpha"),),
                      should=(TermQuery("zzz"),), min_should_match=1)
    assert doc_match(q2, toks, tset) is False


# ---------------------------------------------------------------------------
# 3: combined-norm re-encode memoized across pruned windows
# ---------------------------------------------------------------------------

def test_caching_norms_memoizes_fields_and_combined_codes():
    calls = {"n": 0}
    norms = np.array([1, 2, 3, 4], dtype=np.uint8)

    def raw_norms_for(f):
        calls["n"] += 1
        return norms

    wrapped = _CachingNorms(raw_norms_for)
    nf = (("text", 1.0), ("title", 2.0))
    c1 = _combined_norm_codes(wrapped, nf, "text")
    under = calls["n"]
    c2 = _combined_norm_codes(wrapped, nf, "text")
    assert c2 is c1  # memo hit — no recompute
    assert calls["n"] == under  # underlying callable untouched
    # distinct norm_fields keys compute separately
    c3 = _combined_norm_codes(wrapped, (("text", 1.0),), "text")
    assert c3 is not c1
    # un-wrapped callables still work (exhaustive path unchanged)
    plain = _combined_norm_codes(raw_norms_for, nf, "text")
    assert np.array_equal(plain, c1)


def test_combined_query_pruned_equals_exhaustive(spark, small_index):
    from lucene_spark.search import IndexSearcher
    from lucene_spark.search.query import CombinedFieldQuery, OrQuery

    s = IndexSearcher(spark, small_index)
    q = CombinedFieldQuery(terms=("scan", "merge"),
                           fields=(("text", 1.0), ("role", 2.0)))
    pruned = s.search(q, k=10, pruned=True)
    exact = s.search(q, k=10, pruned=False)
    assert pruned == exact
    # two combined nodes sharing (field, term) chunks in ONE tree —
    # the shape of the id-reuse hazard — still rank-identical
    q2 = OrQuery((
        CombinedFieldQuery(terms=("scan",),
                           fields=(("text", 1.0), ("role", 2.0))),
        CombinedFieldQuery(terms=("scan",),
                           fields=(("text", 3.0), ("role", 5.0))),
    ))
    assert s.search(q2, k=10, pruned=True) == s.search(q2, k=10,
                                                       pruned=False)


# ---------------------------------------------------------------------------
# 5: match-stream APIs analyze terms on analyzed indexes
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def porter_idx(spark, tmp_path_factory):
    from lucene_spark.index import build_index
    texts = ["merging sorted runs into larger segments",
             "the merge policy merges adjacent segments",
             "merged segments are compacted by the scheduler",
             "relational queries over sorted tables",
             "merging merged merges",  # tf=3 for 'merg'
             "stream processing with windows"]
    rows = [(f"c{i:04d}", 0, "user", t, "none")
            for i, t in enumerate(texts)]
    src = (spark.createDataFrame(rows,
                                 "conv_id string, turn_idx int, role string,"
                                 " text string, tool string")
           .selectExpr("*", "timestamp('2026-01-01') as ts"))
    out = str(tmp_path_factory.mktemp("r4an") / "idx")
    build_index(spark, src, out, num_buckets=2,
                analyzers={"text": "porter"})
    return out


def test_term_postings_analyzes_query_term(spark, porter_idx):
    from lucene_spark.search import IndexSearcher
    s = IndexSearcher(spark, porter_idx)
    rows = {r["doc_id"]: r["tf"]
            for r in s.term_postings("merging").collect()}
    assert set(rows) == {0, 1, 2, 4}
    assert rows[4] == 3
    # already-stemmed input is found too (stem("merg") == "merg")
    rows2 = {r["doc_id"] for r in s.term_postings("merg").collect()}
    assert rows2 == {0, 1, 2, 4}


def test_phrase_matches_analyzes_terms(spark, porter_idx):
    from lucene_spark.search import IndexSearcher
    s = IndexSearcher(spark, porter_idx)
    got = {r["doc_id"]: r["freq"]
           for r in s.phrase_matches(["merging", "sorted"]).collect()}
    assert got == {0: 1}


def test_interval_search_analyzes_leaf_terms(spark, porter_idx):
    from lucene_spark.search import IndexSearcher
    from lucene_spark.search.intervals import Ordered, Term
    s = IndexSearcher(spark, porter_idx)
    src = Ordered((Term("merging"), Term("segments")))
    got = {r["doc_id"] for r in s.interval_search(src).collect()}
    assert got == {0, 1, 2}


def test_interval_matches_analyzes_terms(spark, porter_idx):
    from lucene_spark.search import IndexSearcher
    s = IndexSearcher(spark, porter_idx)
    got = {r["doc_id"]
           for r in s.interval_matches(["merging", "segments"],
                                       max_gaps=10).collect()}
    assert got == {0, 1, 2}
