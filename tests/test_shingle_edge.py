"""ShingleFilter + EdgeNGramTokenFilter chains.

Reference parity targets:
- ShingleFilter.java (analysis/common/.../shingle/ShingleFilter.java):
  word bigrams joined with the default " " separator, min=max=2,
  outputUnigrams=false (the shingle-FIELD configuration) — each
  consecutive token pair emits one shingle at its own position.
- EdgeNGramTokenFilter.java (analysis/common/.../ngram/
  EdgeNGramTokenFilter.java): every prefix of each token with
  (minGram=1, maxGram=8, preserveOriginal=true) — the
  search-as-you-type chain, a typed prefix IS an index term.

End-to-end: an index built with analyzers={"text": "shingle"|"edge"}
is rank-identical to the brute-force oracle running the same chain.
"""

import numpy as np
import pandas as pd
import pytest

from lucene_spark.kernels.shingle import (edge_lists, edge_one,
                                          shingle_lists, shingle_one)
from lucene_spark.kernels.tokenizer import (analyze_one, analyze_series,
                                            analyze_term)
from lucene_spark.search.oracle import BruteForceOracle
from lucene_spark.search.query import TermQuery


def test_shingle_semantics():
    assert shingle_one("Vector search with BM25") == [
        "vector search", "search with", "with bm25"]
    assert shingle_one("one") == []
    assert shingle_one("") == []
    assert shingle_one("a b") == ["a b"]


def test_edge_semantics():
    # short token: every prefix, the token itself is the longest gram
    assert edge_one("scan") == ["s", "sc", "sca", "scan"]
    # long token (>8): grams 1..8 plus the ORIGINAL (preserveOriginal)
    got = edge_one("internationalization")
    assert got[:8] == ["i", "in", "int", "inte", "inter", "intern",
                       "interna", "internat"]
    assert got[8] == "internationalization" and len(got) == 9


def test_series_equals_per_row():
    texts = pd.Series(["Merging sorted runs", "", "x",
                       "internationalization of tokenizers", "a b c d"])
    for chain in ("shingle", "edge"):
        got = analyze_series(texts, chain)
        for raw, toks in zip(texts, got):
            assert toks == analyze_one(raw, chain)
    # kernels agree with the list-level entry points
    from lucene_spark.kernels.tokenizer import tokenize_series
    toks = tokenize_series(texts)
    assert [list(x) for x in shingle_lists(toks)] == \
        [shingle_one(t) for t in texts]
    assert [list(x) for x in edge_lists(toks)] == \
        [edge_one(t) for t in texts]


def test_analyze_term_is_lowercase_passthrough():
    assert analyze_term("Merge Policy", "shingle") == "merge policy"
    assert analyze_term("VECT", "edge") == "vect"


@pytest.fixture(scope="module")
def gram_corpus(spark):
    texts = ["the merge policy merges adjacent segments",
             "merging sorted runs into larger segments",
             "vector search with approximate neighbors",
             "a vectorized kernel scores the postings",
             "internationalization of the tokenizer pipeline",
             "sorted tables join on hashed keys",
             "the policy merges happen nightly",
             "merge policy tuning for tiered compaction"]
    rows = [(f"c{i:04d}", 0, "user", t, "none") for i, t in enumerate(texts)]
    src = (spark.createDataFrame(rows,
                                 "conv_id string, turn_idx int, role string, "
                                 "text string, tool string")
           .selectExpr("*", "timestamp('2026-01-01') as ts"))
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    return src, pdf


def _built(spark, tmp_path_factory, src, chain):
    from lucene_spark.index import build_index
    out = str(tmp_path_factory.mktemp(chain) / "idx")
    build_index(spark, src, out, num_buckets=2,
                analyzers={"text": chain})
    return out


def test_shingle_index_end_to_end(spark, tmp_path_factory, gram_corpus):
    from lucene_spark.search import IndexSearcher
    src, pdf = gram_corpus
    out = _built(spark, tmp_path_factory, src, "shingle")
    s = IndexSearcher(spark, out)
    assert s.analyzers == {"text": "shingle"}
    got = s.search(TermQuery("merge policy"), k=10)
    # docs 0 and 7 contain the consecutive pair; doc 6 has the words
    # non-adjacent ("policy merges") and must NOT match
    assert {d for d, _ in got} == {0, 7}
    oracle = BruteForceOracle(pdf, analyzer="shingle")
    want = oracle.topk({"type": "term", "terms": ["merge policy"], "k": 10})
    assert got == want
    assert s.count(TermQuery("merge policy")) == 2


def test_edge_index_end_to_end(spark, tmp_path_factory, gram_corpus):
    from lucene_spark.search import IndexSearcher
    src, pdf = gram_corpus
    out = _built(spark, tmp_path_factory, src, "edge")
    s = IndexSearcher(spark, out)
    oracle = BruteForceOracle(pdf, analyzer="edge")
    # typed prefix matches every continuation as a PLAIN term lookup
    got = s.search(TermQuery("merg"), k=10)
    assert {d for d, _ in got} == {0, 1, 6, 7}
    assert got == oracle.topk({"type": "term", "terms": ["merg"], "k": 10})
    # 'vect' spans vector + vectorized
    got = s.search(TermQuery("vect"), k=10)
    assert {d for d, _ in got} == {2, 3}
    assert got == oracle.topk({"type": "term", "terms": ["vect"], "k": 10})
    # preserveOriginal: the full >8-char token is still a term
    got = s.search(TermQuery("internationalization"), k=10)
    assert {d for d, _ in got} == {4}
