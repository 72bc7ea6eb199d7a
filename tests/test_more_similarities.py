"""Additional similarity plug-ins: LM Jelinek-Mercer, Axiomatic F2EXP,
DFR I(n)/L/H2 and IB LL/D/H2 (core:search/similarities/) — formula
golden checks, brute-force search parity, pruned==exhaustive under
bound recompute."""

import numpy as np
import pytest

from lucene_spark.fixtures.transcripts import term_string
from lucene_spark.index.catalog import IndexCatalog
from lucene_spark.kernels.bm25 import (AxiomaticF2EXPScorer,
                                       DFRInLH2Scorer, IBLLDScorer,
                                       LMJelinekMercerScorer)
from lucene_spark.kernels.smallfloat import LENGTH_TABLE, int_to_byte4
from lucene_spark.search import IndexSearcher
from lucene_spark.search.oracle import BruteForceOracle
from lucene_spark.search.query import OrQuery, TermQuery

T = [term_string(k) for k in range(30)]


def test_lm_jelinek_mercer_formula():
    sc = LMJelinekMercerScorer(doc_freq=10, doc_count=100, sum_ttf=5000,
                               ttf=50, lam=0.1)
    code = int(int_to_byte4(np.array([30]))[0])
    got = float(sc.score(np.array([3]), np.array([code]))[0])
    p_col = 51.0 / 5001.0
    dl = float(LENGTH_TABLE[code])
    want = np.log1p((0.9 * 3.0 / dl) / (0.1 * p_col))
    assert got == pytest.approx(want, rel=1e-6)


def test_axiomatic_f2exp_formula():
    sc = AxiomaticF2EXPScorer(doc_freq=10, doc_count=100, sum_ttf=5000)
    code = int(int_to_byte4(np.array([30]))[0])
    got = float(sc.score(np.array([3]), np.array([code]))[0])
    dl = float(LENGTH_TABLE[code])
    avgdl = np.float32(5000.0 / 100.0)
    idf = (101.0 / 10.0) ** 0.35
    want = np.float32(idf) * (3.0 / (3.0 + 0.5 + 0.5 * dl / float(avgdl)))
    assert got == pytest.approx(float(want), rel=1e-5)


@pytest.mark.parametrize("scorer_cls", [LMJelinekMercerScorer,
                                        AxiomaticF2EXPScorer,
                                        DFRInLH2Scorer, IBLLDScorer])
def test_search_matches_bruteforce(spark, small_index, scorer_cls):
    s = IndexSearcher(spark, small_index, similarity=scorer_cls)
    cat = IndexCatalog(small_index)
    pdf = (spark.read.parquet(cat.table_path("docstore"))
           .select("doc_id", "text").orderBy("doc_id").toPandas())
    o = BruteForceOracle(pdf)

    def brute(term, k):
        sc = scorer_cls(o.df[term], o.doc_count, o.sum_ttf,
                        ttf=sum(c.get(term, 0) for c in o.tfs))
        tf = np.array([c.get(term, 0) for c in o.tfs], dtype=np.int64)
        sv = sc.score(tf, o.norms)
        idx = np.flatnonzero(tf > 0)
        order = np.lexsort((o.doc_ids[idx], -sv[idx]))[:k]
        return [(int(o.doc_ids[idx[i]]), np.float32(sv[idx[i]]))
                for i in order]

    for term in (T[0], T[3], T[9]):
        assert s.search(TermQuery(term), k=10) == brute(term, 10), term


@pytest.mark.parametrize("scorer_cls", [LMJelinekMercerScorer,
                                        AxiomaticF2EXPScorer,
                                        DFRInLH2Scorer, IBLLDScorer])
def test_pruned_equals_exhaustive(spark, small_index, scorer_cls):
    s = IndexSearcher(spark, small_index, similarity=scorer_cls)
    q = OrQuery((T[1], T[4], T[8]))
    assert s.search(q, k=10, pruned=True) == s.search(q, k=10, pruned=False)


def test_dfr_in_l_h2_formula():
    import numpy as np
    sc = DFRInLH2Scorer(doc_freq=10, doc_count=100, sum_ttf=5000)
    code = int(int_to_byte4(np.array([30]))[0])
    got = float(sc.score(np.array([3]), np.array([code]))[0])
    dl = float(LENGTH_TABLE[code])
    tfn = 3.0 * np.log2(1.0 + (5000.0 / 100.0) / dl)
    want = np.log2(101.0 / 10.5) * tfn / (1.0 + tfn)
    assert got == pytest.approx(want, rel=1e-6)


def test_ib_ll_d_formula():
    import numpy as np
    sc = IBLLDScorer(doc_freq=10, doc_count=100, sum_ttf=5000)
    code = int(int_to_byte4(np.array([30]))[0])
    got = float(sc.score(np.array([3]), np.array([code]))[0])
    dl = float(LENGTH_TABLE[code])
    lam = float(np.float32(11.0 / 101.0))
    tfn = 3.0 * np.log2(1.0 + (5000.0 / 100.0) / dl)
    want = -np.log(lam / (tfn + lam))
    assert got == pytest.approx(want, rel=1e-6)


# ---- DFI / Boolean / SweetSpot (round-5 family completion) -------------

def test_dfi_formulas():
    from lucene_spark.kernels.bm25 import DFIScorer
    code = int(int_to_byte4(np.array([30]))[0])
    dl = float(LENGTH_TABLE[code])
    e = (50.0 + 1.0) * dl / (5000.0 + 1.0)
    for measure, m in [("chi_squared", (3.0 - e) ** 2 / e),
                       ("standardized", (3.0 - e) / np.sqrt(e)),
                       ("saturated", (3.0 - e) / e)]:
        sc = DFIScorer(10, 100, 5000, ttf=50, independence=measure)
        got = float(sc.score(np.array([3]), np.array([code]))[0])
        assert got == pytest.approx(np.log2(m + 1.0), rel=1e-6), measure
        # freq <= expected scores exactly 0 (DFISimilarity.java:77)
        big = int(int_to_byte4(np.array([200000]))[0])
        assert float(sc.score(np.array([1]), np.array([big]))[0]) == 0.0


def test_boolean_similarity_scores_boost():
    from lucene_spark.kernels.bm25 import BooleanScorer
    sc = BooleanScorer(10, 100, boost=2.5)
    code = int(int_to_byte4(np.array([30]))[0])
    assert list(sc.score(np.array([1, 7]), np.array([code, 3]))) == \
        [np.float32(2.5)] * 2
    assert sc.max_score_for_impacts(np.array([9]), np.array([code])) == \
        np.float32(2.5)


def test_sweetspot_default_degrades_to_classic():
    from lucene_spark.kernels.bm25 import ClassicScorer, SweetSpotScorer
    f = np.array([0, 1, 2, 5, 11])
    n = np.array([int(int_to_byte4(np.array([x]))[0])
                  for x in (1, 7, 30, 120, 4000)])
    assert np.array_equal(SweetSpotScorer(10, 100).score(f, n),
                          ClassicScorer(10, 100).score(f, n))


def test_sweetspot_plateau_and_baseline():
    from lucene_spark.kernels.bm25 import SweetSpotScorer
    sc = SweetSpotScorer(1, 2, ln_min=20, ln_max=60, steepness=0.5,
                         tf_base=1.5, tf_min=2.0)
    codes = [int(int_to_byte4(np.array([x]))[0]) for x in (5, 20, 40, 60, 200)]
    s = sc.score(np.array([3] * 5), np.array(codes))
    # flat 1.0 lengthNorm inside [ln_min, ln_max]
    assert s[1] == s[2] == s[3]
    # non-monotone: shorter-than-plateau docs score LOWER than plateau
    assert s[0] < s[1] and s[4] < s[3]
    # baselineTf: 0 < f <= tf_min pins tf at tf_base
    one = sc.score(np.array([1, 2, 3]), np.array([codes[2]] * 3))
    assert one[0] == one[1]  # both <= tf_min -> tf_base
    assert one[2] > one[1]
    assert float(sc.score(np.array([0]), np.array([codes[2]]))[0]) == 0.0


def _extra_sims():
    from lucene_spark.kernels.bm25 import (BooleanScorer, dfi_scorer,
                                           sweetspot_scorer)
    return [dfi_scorer("chi_squared"), dfi_scorer("standardized"),
            BooleanScorer, sweetspot_scorer(10, 40, 0.5)]


@pytest.mark.parametrize("scorer_cls", _extra_sims())
def test_new_sims_search_matches_bruteforce(spark, small_index, scorer_cls):
    s = IndexSearcher(spark, small_index, similarity=scorer_cls)
    cat = IndexCatalog(small_index)
    pdf = (spark.read.parquet(cat.table_path("docstore"))
           .select("doc_id", "text").orderBy("doc_id").toPandas())
    o = BruteForceOracle(pdf)

    def brute(term, k):
        sc = scorer_cls(o.df[term], o.doc_count, o.sum_ttf,
                        ttf=sum(c.get(term, 0) for c in o.tfs))
        tf = np.array([c.get(term, 0) for c in o.tfs], dtype=np.int64)
        sv = sc.score(tf, o.norms)
        idx = np.flatnonzero(tf > 0)
        order = np.lexsort((o.doc_ids[idx], -sv[idx]))[:k]
        return [(int(o.doc_ids[idx[i]]), np.float32(sv[idx[i]]))
                for i in order]

    for term in (T[0], T[3], T[9]):
        assert s.search(TermQuery(term), k=10) == brute(term, 10), term


@pytest.mark.parametrize("scorer_cls", _extra_sims())
def test_new_sims_pruned_equals_exhaustive(spark, small_index, scorer_cls):
    # sweetspot's plateau violates the skyline dominance assumption —
    # its conservative global-max-norm bound must keep pruning safe
    s = IndexSearcher(spark, small_index, similarity=scorer_cls)
    q = OrQuery((T[1], T[4], T[8]))
    assert s.search(q, k=10, pruned=True) == s.search(q, k=10, pruned=False)


# ---- Indri / RawTF / Multi (similarity directory completion) -----------

def test_indri_dirichlet_formula_and_negative_scores():
    from lucene_spark.kernels.bm25 import IndriDirichletScorer
    sc = IndriDirichletScorer(10, 100, 5000, ttf=50)
    code = int(int_to_byte4(np.array([30]))[0])
    dl = float(LENGTH_TABLE[code])
    got = float(sc.score(np.array([3]), np.array([code]))[0])
    want = np.log((3.0 + 2000.0 * (50.0 / 5000.0)) / (dl + 2000.0))
    assert got == pytest.approx(want, rel=1e-6)
    assert got < 0  # log-probabilities: NO zero clamp (unlike LMDirichlet)


def test_rawtf_formula():
    from lucene_spark.kernels.bm25 import RawTFScorer
    sc = RawTFScorer(10, 100, boost=2.0)
    assert list(sc.score(np.array([0, 3, 7]), np.array([5, 5, 5]))) == \
        [np.float32(0.0), np.float32(6.0), np.float32(14.0)]


def test_multi_similarity_sums():
    from lucene_spark.kernels.bm25 import (BM25Scorer, ClassicScorer,
                                           multi_scorer)
    m = multi_scorer(BM25Scorer, ClassicScorer)(10, 100, 5000)
    b = BM25Scorer(10, 100, 5000)
    c = ClassicScorer(10, 100, 5000)
    f = np.array([1, 2, 9])
    n = np.array([int(int_to_byte4(np.array([x]))[0]) for x in (4, 30, 900)])
    assert np.allclose(m.score(f, n), b.score(f, n) + c.score(f, n))
    # bound: sum of sub-bounds upper-bounds every scored point
    assert float(m.max_score_for_impacts(f, n)) >= float(m.score(f, n).max())


def _dir_completion_sims():
    from lucene_spark.kernels.bm25 import (BM25Scorer, ClassicScorer,
                                           IndriDirichletScorer,
                                           RawTFScorer, multi_scorer)
    return [IndriDirichletScorer, RawTFScorer,
            multi_scorer(BM25Scorer, ClassicScorer)]


@pytest.mark.parametrize("scorer_cls", _dir_completion_sims())
def test_dir_completion_search_matches_bruteforce(spark, small_index,
                                                  scorer_cls):
    s = IndexSearcher(spark, small_index, similarity=scorer_cls)
    cat = IndexCatalog(small_index)
    pdf = (spark.read.parquet(cat.table_path("docstore"))
           .select("doc_id", "text").orderBy("doc_id").toPandas())
    o = BruteForceOracle(pdf)

    def brute(term, k):
        sc = scorer_cls(o.df[term], o.doc_count, o.sum_ttf,
                        ttf=sum(c.get(term, 0) for c in o.tfs))
        tf = np.array([c.get(term, 0) for c in o.tfs], dtype=np.int64)
        sv = sc.score(tf, o.norms)
        idx = np.flatnonzero(tf > 0)
        order = np.lexsort((o.doc_ids[idx], -sv[idx]))[:k]
        return [(int(o.doc_ids[idx[i]]), np.float32(sv[idx[i]]))
                for i in order]

    for term in (T[0], T[3], T[9]):
        assert s.search(TermQuery(term), k=10) == brute(term, 10), term


@pytest.mark.parametrize("scorer_cls", _dir_completion_sims())
def test_dir_completion_pruned_equals_exhaustive(spark, small_index,
                                                 scorer_cls):
    # Indri scores are NEGATIVE log-probs — theta starts at -inf with
    # plain comparisons, so pruning must stay exact below zero too
    s = IndexSearcher(spark, small_index, similarity=scorer_cls)
    q = OrQuery((T[1], T[4], T[8]))
    assert s.search(q, k=10, pruned=True) == s.search(q, k=10, pruned=False)


def test_indri_nested_tree_pruned_equals_exhaustive(spark, small_index):
    # nested trees route negative-score similarities to the exhaustive
    # evaluator (composed bounds assume non-negative sub-scores)
    from lucene_spark.kernels.bm25 import IndriDirichletScorer
    from lucene_spark.search.query import BooleanQuery, PhraseQuery
    s = IndexSearcher(spark, small_index, similarity=IndriDirichletScorer)
    q = BooleanQuery(must=(T[1],),
                     should=(T[4], PhraseQuery((T[2], T[3]))))
    got = s.search(q, k=10, pruned=True)
    assert got == s.search(q, k=10, pruned=False)
    assert got  # non-empty: negative scores survive the tree path
