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
