"""MatchAllDocsQuery / FieldExistsQuery: constant-score matches from
the norms table (no postings scan), deletes- and filter-aware."""

import numpy as np
import pytest

from lucene_spark.fixtures.transcripts import transcripts_df
from lucene_spark.index import build_index
from lucene_spark.index.catalog import IndexCatalog
from lucene_spark.index.deletes import delete_docs
from lucene_spark.search import IndexSearcher
from lucene_spark.search.query import FieldExistsQuery, MatchAllQuery


@pytest.fixture(scope="module")
def docstore_pdf(spark, small_index):
    cat = IndexCatalog(small_index)
    return (spark.read.parquet(cat.table_path("docstore"))
            .select("doc_id", "role", "tool").orderBy("doc_id").toPandas())


def test_match_all_returns_every_doc(spark, small_index, docstore_pdf):
    s = IndexSearcher(spark, small_index)
    got = s.search(MatchAllQuery(boost=2.5), k=10 ** 6)
    assert [d for d, _ in got] == docstore_pdf["doc_id"].tolist()
    assert all(sc == np.float32(2.5) for _, sc in got)
    assert s.count(MatchAllQuery()) == len(docstore_pdf)


def test_match_all_k_limits_by_doc_id(spark, small_index, docstore_pdf):
    s = IndexSearcher(spark, small_index)
    got = s.search(MatchAllQuery(), k=7)
    assert [d for d, _ in got] == docstore_pdf["doc_id"].tolist()[:7]


def test_match_all_with_doc_filter(spark, small_index, docstore_pdf):
    s = IndexSearcher(spark, small_index)
    got = s.search(MatchAllQuery(), k=10 ** 6, doc_filter="role = 'user'")
    want = docstore_pdf.loc[docstore_pdf["role"] == "user",
                            "doc_id"].tolist()
    assert [d for d, _ in got] == want


def test_field_exists(spark, small_index, docstore_pdf):
    s = IndexSearcher(spark, small_index)
    got = s.search(FieldExistsQuery("tool"), k=10 ** 6)
    want = docstore_pdf.loc[docstore_pdf["tool"].notna(),
                            "doc_id"].tolist()
    assert [d for d, _ in got] == want
    assert len(want) < len(docstore_pdf)  # nulls exist => non-trivial
    assert s.count(FieldExistsQuery("tool")) == len(want)


def test_match_all_respects_deletes(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("madel") / "idx")
    build_index(spark, transcripts_df(spark, n_convs=30, seed=2,
                                      partitions=2), idx, num_buckets=2)
    n_del = delete_docs(spark, idx, "role = 'tool'")
    assert n_del > 0
    s = IndexSearcher(spark, idx)
    cat = IndexCatalog(idx)
    pdf = (spark.read.parquet(cat.table_path("docstore"))
           .select("doc_id", "role", "tool").orderBy("doc_id").toPandas())
    live = pdf.loc[pdf["role"] != "tool", "doc_id"].tolist()
    got = s.search(MatchAllQuery(), k=10 ** 6)
    assert [d for d, _ in got] == live
    assert s.count(MatchAllQuery()) == len(live)
    want_fe = pdf.loc[(pdf["role"] != "tool")
                      & pdf["tool"].notna(), "doc_id"].tolist()
    got_fe = s.search(FieldExistsQuery("tool"), k=10 ** 6)
    assert [d for d, _ in got_fe] == want_fe
    assert s.count(FieldExistsQuery("tool")) == len(want_fe)
