"""MoreLikeThis (queries/mlt) + QueryRescorer second-pass re-ranking."""

import math
from collections import Counter

import numpy as np
import pytest

from lucene_spark.index.catalog import IndexCatalog
from lucene_spark.kernels.tokenizer import tokenize_one
from lucene_spark.search import IndexSearcher
from lucene_spark.search.query import OrQuery, TermQuery
from lucene_spark.fixtures.transcripts import term_string

T = [term_string(k) for k in range(30)]


@pytest.fixture(scope="module")
def searcher(spark, small_index):
    return IndexSearcher(spark, small_index)


@pytest.fixture(scope="module")
def docstore_pdf(spark, small_index):
    cat = IndexCatalog(small_index)
    return (spark.read.parquet(cat.table_path("docstore"))
            .select("doc_id", "text", "token_count")
            .orderBy("doc_id").toPandas())


def test_mlt_selects_top_tfidf_terms(searcher, docstore_pdf):
    doc_id = int(docstore_pdf["doc_id"].iloc[3])
    q = searcher.more_like_this(doc_id, max_terms=6, min_df=2)
    assert isinstance(q, OrQuery) and 0 < len(q.terms) <= 6
    # independent recomputation of the selection
    text = docstore_pdf.loc[docstore_pdf["doc_id"] == doc_id,
                            "text"].iloc[0]
    tfs = Counter(tokenize_one(text))
    stats = searcher.term_stats(list(tfs), "text")
    dc = searcher.doc_count
    scored = sorted(
        (-tfs[t] * math.log(1 + (dc - stats[t][0] + 0.5)
                            / (stats[t][0] + 0.5)), t)
        for t in tfs if t in stats and stats[t][0] >= 2)
    want = tuple(t for _, t in scored[:6])
    assert tuple(q.terms) == want
    # the source doc itself matches its own MLT query
    hits = dict(searcher.search(q, k=10 ** 6))
    assert doc_id in hits


def test_rescore_reorders_by_expression(searcher, docstore_pdf):
    top = searcher.search_df(TermQuery(T[1]), k=20)
    res = searcher.rescore(top, "score + 100.0 / (1 + token_count)", k=20)
    rows = res.collect()
    assert rows
    tc = dict(zip(docstore_pdf["doc_id"], docstore_pdf["token_count"]))
    want = sorted(
        ((float(np.float32(r["score"])) + 100.0 / (1 + tc[r["doc_id"]]),
          -r["doc_id"]) for r in rows), reverse=True)
    got = [(float(r["new_score"]), -r["doc_id"]) for r in rows]
    for (ws, wd), (gs, gd) in zip(want, got):
        assert gd == wd and gs == pytest.approx(ws, rel=1e-9)
    # the expression actually changed the order vs raw BM25
    raw_order = [d for d, _ in searcher.search(TermQuery(T[1]), k=20)]
    assert [r["doc_id"] for r in rows] != raw_order
