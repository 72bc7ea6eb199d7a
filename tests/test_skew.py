"""Skew stress (SURVEY §4.3): a Zipf-head term occurring in EVERY doc
must stay chunked at (term, bucket) grain through the merge — no single
reducer/row ever holds the full posting list — and still score
rank-identically."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_spark.fixtures.transcripts import transcripts_df
from lucene_spark.index import build_index
from lucene_spark.index.catalog import IndexCatalog
from lucene_spark.search import IndexSearcher
from lucene_spark.search.oracle import BruteForceOracle
from lucene_spark.search.query import AndQuery, TermQuery


@pytest.fixture(scope="module")
def skew_index(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("skew"))
    src = (transcripts_df(spark, n_convs=120, seed=7, partitions=4)
           .withColumn("text", F.concat(F.lit("hotterm hotterm "),
                                        F.col("text"))))
    build_index(spark, src, out, num_buckets=8)
    return out


def test_hot_term_stays_chunked(spark, skew_index):
    s = IndexSearcher(spark, skew_index)
    cat = IndexCatalog(skew_index)
    post = spark.read.parquet(cat.table_path("postings"))
    hot = post.filter(F.col("term") == "hotterm") \
              .select("bucket_id", "df").collect()
    # one chunk per non-empty bucket; no chunk holds everything
    assert len(hot) > 1
    assert max(r["df"] for r in hot) < s.doc_count
    assert sum(r["df"] for r in hot) == s.doc_count  # df == every doc


def test_hot_term_count_and_search(spark, skew_index):
    s = IndexSearcher(spark, skew_index)
    assert s.count(TermQuery("hotterm")) == s.doc_count
    pdf = (spark.read.parquet(IndexCatalog(skew_index).table_path("docstore"))
           .select("doc_id", "text").orderBy("doc_id").toPandas())
    oracle = BruteForceOracle(pdf)
    for q in ({"type": "term", "terms": ["hotterm"], "k": 10},
              {"type": "and", "terms": ["hotterm", "w000000"], "k": 10}):
        want = oracle.topk(q)
        got = s.search(TermQuery("hotterm") if q["type"] == "term"
                       else AndQuery(tuple(q["terms"])), k=10)
        assert [d for d, _ in got] == [d for d, _ in want]
        for (gd, gs), (wd, ws) in zip(got, want):
            assert np.float32(gs) == np.float32(ws)
