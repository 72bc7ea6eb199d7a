"""Ordered-sloppy phrase: engine vs brute-force oracle, slop 0..3."""

import numpy as np
import pytest

from lucene_spark.index.catalog import IndexCatalog
from lucene_spark.search import IndexSearcher
from lucene_spark.search.oracle import BruteForceOracle
from lucene_spark.search.query import PhraseQuery


@pytest.fixture(scope="module")
def searcher(spark, small_index):
    return IndexSearcher(spark, small_index)


@pytest.fixture(scope="module")
def oracle(spark, small_index):
    cat = IndexCatalog(small_index)
    pdf = (spark.read.parquet(cat.table_path("docstore"))
           .select("doc_id", "text").orderBy("doc_id").toPandas())
    return BruteForceOracle(pdf)


@pytest.mark.parametrize("slop", [0, 1, 2, 3])
def test_sloppy_matches_equal_oracle(searcher, oracle, slop):
    toks = oracle.tokens[0]
    phrase = [toks[0], toks[2]]  # non-adjacent pair -> slop sensitivity
    got = {int(r["doc_id"]): int(r["freq"]) for r in
           searcher.phrase_matches(phrase, slop=slop).collect()}
    want = {}
    for d, tk in zip(oracle.doc_ids, oracle.tokens):
        f = (BruteForceOracle._phrase_freq(tk, phrase) if slop == 0
             else BruteForceOracle._phrase_freq_sloppy(tk, phrase, slop))
        if f:
            want[int(d)] = f
    assert got == want, f"slop={slop}"
    if slop >= 2:
        assert len(got) > 0  # the pair does co-occur within window


def test_sloppy_topk_rank_identical(searcher, oracle):
    toks = oracle.tokens[0]
    q = {"type": "phrase", "terms": [toks[0], toks[2]], "slop": 2, "k": 10}
    want = oracle.topk(q)
    got = searcher.search(PhraseQuery(tuple(q["terms"]), slop=2), k=10)
    assert [d for d, _ in got] == [d for d, _ in want]
    for (gd, gs), (wd, ws) in zip(got, want):
        assert np.float32(gs) == np.float32(ws)


def test_slop_monotone(searcher, oracle):
    toks = oracle.tokens[0]
    phrase = [toks[0], toks[2]]
    sizes = [searcher.phrase_matches(phrase, slop=s).count()
             for s in (0, 1, 3)]
    assert sizes[0] <= sizes[1] <= sizes[2]
