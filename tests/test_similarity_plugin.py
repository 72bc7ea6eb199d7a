"""Pluggable Similarity: ClassicSimilarity (TF-IDF) through the same
query kernels, rank-identical to a numpy brute force with the same
formula; pruned == exhaustive under recomputed bounds."""

import numpy as np
import pytest

from lucene_spark.fixtures.transcripts import term_string
from lucene_spark.index.catalog import IndexCatalog
from lucene_spark.kernels.bm25 import ClassicScorer
from lucene_spark.kernels.smallfloat import int_to_byte4
from lucene_spark.kernels.tokenizer import tokenize_one
from lucene_spark.search import IndexSearcher
from lucene_spark.search.query import OrQuery, TermQuery

T = [term_string(k) for k in range(10)]


@pytest.fixture(scope="module")
def classic(spark, small_index):
    return IndexSearcher(spark, small_index, similarity=ClassicScorer)


@pytest.fixture(scope="module")
def corpus(spark, small_index):
    cat = IndexCatalog(small_index)
    pdf = (spark.read.parquet(cat.table_path("docstore"))
           .select("doc_id", "text").orderBy("doc_id").toPandas())
    toks = [tokenize_one(t) for t in pdf["text"]]
    return pdf["doc_id"].to_numpy(), toks


def _brute_classic(doc_ids, toks, term, k):
    from collections import Counter
    tfs = [Counter(t) for t in toks]
    df = sum(1 for c in tfs if c.get(term, 0))
    n = len(toks)
    norms = np.asarray(int_to_byte4(
        np.array([len(t) for t in toks], np.int64)), np.uint8)
    sc = ClassicScorer(df, n)
    tf = np.array([c.get(term, 0) for c in tfs], np.int64)
    s = sc.score(tf, norms)
    mask = tf > 0
    idx = np.flatnonzero(mask)
    order = np.lexsort((doc_ids[idx], -s[idx]))[:k]
    sel = idx[order]
    return [(int(doc_ids[i]), np.float32(s[i])) for i in sel]


def test_classic_term_rank_identical(classic, corpus):
    doc_ids, toks = corpus
    want = _brute_classic(doc_ids, toks, T[2], 10)
    got = classic.search(TermQuery(T[2]), k=10)
    assert [d for d, _ in got] == [d for d, _ in want]
    for (gd, gs), (wd, ws) in zip(got, want):
        assert np.float32(gs) == np.float32(ws)


def test_classic_pruned_equals_exhaustive(classic):
    q = OrQuery((T[1], T[5], T[7]))
    a = classic.search(q, k=15, pruned=True)
    b = classic.search(q, k=15, pruned=False)
    assert a == b


def test_classic_differs_from_bm25(spark, small_index, classic):
    bm = IndexSearcher(spark, small_index)
    qa = classic.search(TermQuery(T[3]), k=5)
    qb = bm.search(TermQuery(T[3]), k=5)
    assert [s for _, s in qa] != [s for _, s in qb]
