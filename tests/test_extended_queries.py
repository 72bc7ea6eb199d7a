"""Synonym / DisMax / Boolean(occur) queries: rank-identity vs the
brute-force oracle, plus exact-integer APIs (term_postings,
phrase_matches) vs recount from source text."""

import numpy as np
import pytest

from lucene_spark.fixtures.transcripts import term_string
from lucene_spark.index.catalog import IndexCatalog
from lucene_spark.search import IndexSearcher
from lucene_spark.search.oracle import BruteForceOracle
from lucene_spark.search.query import from_dict


@pytest.fixture(scope="module")
def searcher(spark, small_index):
    return IndexSearcher(spark, small_index)


@pytest.fixture(scope="module")
def corpus_pdf(spark, small_index):
    cat = IndexCatalog(small_index)
    return (spark.read.parquet(cat.table_path("docstore"))
            .select("doc_id", "conv_id", "turn_idx", "text")
            .orderBy("doc_id").toPandas())


@pytest.fixture(scope="module")
def oracle(corpus_pdf):
    return BruteForceOracle(corpus_pdf)


T = [term_string(k) for k in range(40)]

EXT_QUERIES = [
    {"qid": "syn0", "type": "synonym", "terms": [T[0], T[3]], "k": 10},
    {"qid": "syn1", "type": "synonym", "terms": [T[5], T[11], T[23]], "k": 15},
    {"qid": "dm0", "type": "dismax", "terms": [T[1], T[4]], "k": 10},
    {"qid": "dm_tie", "type": "dismax", "terms": [T[2], T[7], T[9]],
     "tie_breaker": 0.3, "k": 12},
    {"qid": "b_must", "type": "boolean", "must": [T[0], T[2]], "k": 10},
    {"qid": "b_mustnot", "type": "boolean", "must": [T[1]],
     "must_not": [T[6]], "k": 20},
    {"qid": "b_filter", "type": "boolean", "must": [T[3]],
     "filter": [T[0]], "k": 10},
    {"qid": "b_should", "type": "boolean", "should": [T[4], T[8], T[12]],
     "k": 10},
    {"qid": "b_msm", "type": "boolean", "should": [T[4], T[8], T[12]],
     "min_should_match": 2, "k": 10},
    {"qid": "b_mixed", "type": "boolean", "must": [T[2]],
     "should": [T[9], T[13]], "must_not": [T[30]], "filter": [T[1]],
     "min_should_match": 1, "k": 10},
]


@pytest.mark.parametrize("q", EXT_QUERIES, ids=[q["qid"] for q in EXT_QUERIES])
def test_extended_rank_identical_vs_oracle(searcher, oracle, q):
    want = oracle.topk(q)
    got = searcher.search(from_dict(q), k=q["k"], pruned=True)
    assert [d for d, _ in got] == [d for d, _ in want], q
    for (gd, gs), (wd, ws) in zip(got, want):
        assert np.float32(gs) == np.float32(ws), (q["qid"], gd, gs, ws)


@pytest.mark.parametrize("q", EXT_QUERIES[:6], ids=[q["qid"] for q in EXT_QUERIES[:6]])
def test_extended_pruned_equals_exhaustive(searcher, q):
    a = searcher.search(from_dict(q), k=q["k"], pruned=True)
    b = searcher.search(from_dict(q), k=q["k"], pruned=False)
    assert a == b, q


def test_term_postings_exact(searcher, oracle):
    term = T[7]
    got = {int(r["doc_id"]): int(r["tf"])
           for r in searcher.term_postings(term).collect()}
    want = {int(d): c[term] for d, c in zip(oracle.doc_ids, oracle.tfs)
            if c.get(term, 0) > 0}
    assert got == want


def test_phrase_matches_exact(searcher, oracle):
    # find a phrase that actually occurs: first bigram of doc 0
    toks = oracle.tokens[0]
    phrase = [toks[0], toks[1]]
    got = {int(r["doc_id"]): int(r["freq"])
           for r in searcher.phrase_matches(phrase).collect()}
    want = {}
    for d, tk in zip(oracle.doc_ids, oracle.tokens):
        f = BruteForceOracle._phrase_freq(tk, phrase)
        if f:
            want[int(d)] = f
    assert got == want
