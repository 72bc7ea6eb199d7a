"""MultiPhraseQuery: alternative terms per phrase position.

Reference parity targets (core:search/MultiPhraseQuery.java):
- matching unions each position's postings (UnionPostingsEnum,
  :480-560) — "data (store|storage)" matches either continuation;
- weight statistics include EVERY term (MultiPhraseWeight ctor loops
  all termArrays into the similarity) — idf is summed over all terms
  in all slots;
- rewrite (:116-131): one position -> SHOULD-boolean of its terms;
  all-single positions are PhraseQuery;
- slop uses the same exact/sloppy split as PhraseQuery.

Engine results are asserted rank-identical against the independent
BruteForceOracle's multi-phrase evaluator, with pruned == exhaustive
(block-max bounds for union slots are Σ member bounds; union postings
carry no impacts, like the reference's SlowImpactsEnum there).
"""

import numpy as np
import pandas as pd
import pytest

from lucene_spark.search.oracle import BruteForceOracle
from lucene_spark.search.query import (BooleanQuery, MultiPhraseQuery,
                                       OrQuery, PhraseQuery, TermQuery,
                                       rewrite)

TEXTS = ["the data store holds rows",
         "a data storage engine for rows",
         "data lake storage",
         "store data quickly",
         "the storage data layer",
         "big data store and data storage combined",
         "data data store store",
         "rows of data in cold storage",
         "storing data is what a data store does",
         "engine rows data store storage data"]


@pytest.fixture(scope="module")
def mpq_index(spark, tmp_path_factory):
    from lucene_spark.index import build_index
    rows = [(f"c{i:04d}", 0, "user", t, "none")
            for i, t in enumerate(TEXTS)]
    src = (spark.createDataFrame(rows,
                                 "conv_id string, turn_idx int, role string, "
                                 "text string, tool string")
           .selectExpr("*", "timestamp('2026-01-01') as ts"))
    out = str(tmp_path_factory.mktemp("mpq") / "idx")
    build_index(spark, src, out, num_buckets=3)
    pdf = pd.DataFrame({"doc_id": range(len(TEXTS)), "text": TEXTS})
    return out, pdf


def _want(oracle, q, k=10):
    d, s = oracle.eval_query(q)
    return sorted(zip(d.tolist(), np.asarray(s, np.float32).tolist()),
                  key=lambda x: (-x[1], x[0]))[:k]


def _got(searcher, q, k=10, **kw):
    return [(d, float(s)) for d, s in searcher.search(q, k=k, **kw)]


def test_rewrite_collapses():
    assert rewrite(MultiPhraseQuery((("data",),))) == TermQuery("data")
    assert rewrite(MultiPhraseQuery((("a", "b"),))) == OrQuery(("a", "b"))
    assert rewrite(MultiPhraseQuery((("a",), ("b",)), slop=1)) == \
        PhraseQuery(("a", "b"), slop=1)
    q = MultiPhraseQuery((("a",), ("b", "c")))
    assert rewrite(q) is q


def test_exact_matches_oracle(spark, mpq_index):
    from lucene_spark.search import IndexSearcher
    out, pdf = mpq_index
    s = IndexSearcher(spark, out)
    oracle = BruteForceOracle(pdf)
    q = MultiPhraseQuery((("data",), ("store", "storage")))
    got = _got(s, q)
    assert [(d, np.float32(v)) for d, v in got] == \
        [(d, np.float32(v)) for d, v in _want(oracle, q)]
    # matches docs with either continuation, not reversed order
    assert 4 not in {d for d, _ in got}
    assert {0, 1, 5} <= {d for d, _ in got}


def test_pruned_equals_exhaustive(spark, mpq_index):
    from lucene_spark.search import IndexSearcher
    out, _ = mpq_index
    s = IndexSearcher(spark, out)
    shapes = [
        MultiPhraseQuery((("data",), ("store", "storage"))),
        MultiPhraseQuery((("data",), ("store", "storage")), slop=2),
        MultiPhraseQuery((("store", "storage", "rows"), ("data",)),
                         boost=2.5),
        BooleanQuery(must=(MultiPhraseQuery((("data",),
                                             ("store", "storage"))),),
                     should=("engine",), must_not=("lake",)),
    ]
    for q in shapes:
        a = _got(s, q, k=5, pruned=True)
        b = _got(s, q, k=5, pruned=False)
        assert a == b, q


def test_sloppy_and_nested_match_oracle(spark, mpq_index):
    from lucene_spark.search import IndexSearcher
    out, pdf = mpq_index
    s = IndexSearcher(spark, out)
    oracle = BruteForceOracle(pdf)
    q = MultiPhraseQuery((("data",), ("store", "storage")), slop=2)
    assert [(d, np.float32(v)) for d, v in _got(s, q)] == \
        [(d, np.float32(v)) for d, v in _want(oracle, q)]
    q = BooleanQuery(must=(MultiPhraseQuery((("data",),
                                             ("store", "storage"))),),
                     must_not=("lake",))
    assert [(d, np.float32(v)) for d, v in _got(s, q)] == \
        [(d, np.float32(v)) for d, v in _want(oracle, q)]


def test_count_and_missing_terms(spark, mpq_index):
    from lucene_spark.search import IndexSearcher
    out, pdf = mpq_index
    s = IndexSearcher(spark, out)
    oracle = BruteForceOracle(pdf)
    q = MultiPhraseQuery((("data",), ("store", "storage")))
    assert s.count(q) == len(_want(oracle, q, k=100))
    # absent alternative is pruned, present one still matches
    q = MultiPhraseQuery((("data",), ("store", "zzzmissing")))
    want = _want(oracle, MultiPhraseQuery((("data",), ("store",))), k=100)
    got = _got(s, q, k=100)
    assert {d for d, _ in got} == {d for d, _ in want}
    # a slot with NO present alternative matches nothing
    q = MultiPhraseQuery((("data",), ("zzzmissing",)))
    assert s.search(q, k=10) == []
    assert s.count(q) == 0


def test_boost_and_idf_sum(spark, mpq_index):
    from lucene_spark.search import IndexSearcher
    out, pdf = mpq_index
    s = IndexSearcher(spark, out)
    oracle = BruteForceOracle(pdf)
    q = MultiPhraseQuery((("data",), ("store", "storage")), boost=3.0)
    assert [(d, np.float32(v)) for d, v in _got(s, q)] == \
        [(d, np.float32(v)) for d, v in _want(oracle, q)]
    # idf includes BOTH alternatives: score differs from the
    # single-alternative phrase on the same matching doc
    ph = _got(s, PhraseQuery(("data", "store")), k=10)
    mp = _got(s, MultiPhraseQuery((("data",), ("store", "storage"))), k=10)
    d_ph = dict(ph)
    d_mp = dict(mp)
    common = set(d_ph) & set(d_mp)
    assert common and all(d_mp[d] != d_ph[d] for d in common)


def test_percolate_multiphrase(spark):
    """Monitor registration of MultiPhraseQuery: presearcher picks the
    smallest slot; the vectorized verifier's shifted membership-in-slot
    run agrees with the scalar doc_match walk."""
    from lucene_spark.kernels.tokenizer import tokenize_one
    from lucene_spark.ops import percolate as PC
    docs_rows = [(i, t) for i, t in enumerate(TEXTS)]
    docs = spark.createDataFrame(docs_rows, "doc_id bigint, text string")
    q = MultiPhraseQuery((("data",), ("store", "storage")))
    qs = MultiPhraseQuery((("data",), ("store", "storage")), slop=2)
    assert PC.presearcher_terms(q) == {"data"}  # smallest slot
    registered = [("mpq", q), ("mpq_sloppy", qs),
                  ("nested", BooleanQuery(must=(q,), must_not=("lake",)))]
    got = {(r["query_id"], r["doc_id"])
           for r in PC.percolate_registered(docs, registered).collect()}
    want = set()
    for qid, qq in registered:
        for did, text in docs_rows:
            toks = tokenize_one(text)
            if PC.doc_match(qq, toks, set(toks)):
                want.add((qid, did))
    assert got == want
    assert ("mpq", 0) in got and ("mpq", 4) not in got
    assert ("mpq_sloppy", 4) in got
    assert ("nested", 2) not in got


def test_stemmed_index_analyzes_slot_members(spark, tmp_path_factory):
    from lucene_spark.index import build_index
    from lucene_spark.search import IndexSearcher
    texts = ["merging data stores", "merged data storage units",
             "data storage only"]
    rows = [(f"c{i:04d}", 0, "user", t, "none")
            for i, t in enumerate(texts)]
    src = (spark.createDataFrame(rows,
                                 "conv_id string, turn_idx int, role string, "
                                 "text string, tool string")
           .selectExpr("*", "timestamp('2026-01-01') as ts"))
    out = str(tmp_path_factory.mktemp("mpqstem") / "idx")
    build_index(spark, src, out, num_buckets=1,
                analyzers={"text": "porter"})
    s = IndexSearcher(spark, out)
    # slot members go through the porter chain: merging/merged -> merg,
    # stores/storage -> store/storag
    q = MultiPhraseQuery((("merging",), ("data",),
                          ("stores", "storage")))
    assert {d for d, _ in s.search(q, k=10)} == {0, 1}
