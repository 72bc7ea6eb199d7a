"""count() without sorting: per-bucket count kernel + sum for non-term
shapes (the old path materialized and globally sorted every match just
to count). Equality vs brute force + plan shape."""

import pytest

from lucene_spark.fixtures.transcripts import term_string
from lucene_spark.index.catalog import IndexCatalog
from lucene_spark.search import IndexSearcher
from lucene_spark.search.oracle import BruteForceOracle
from lucene_spark.search.query import (AndQuery, BooleanQuery, OrQuery,
                                       PhraseQuery, TermQuery)

T = [term_string(k) for k in range(30)]


@pytest.fixture(scope="module")
def searcher(spark, small_index):
    return IndexSearcher(spark, small_index)


@pytest.fixture(scope="module")
def oracle(spark, small_index):
    cat = IndexCatalog(small_index)
    pdf = (spark.read.parquet(cat.table_path("docstore"))
           .select("doc_id", "text").orderBy("doc_id").toPandas())
    return BruteForceOracle(pdf)


CASES = [
    AndQuery((T[0], T[2])),
    OrQuery((T[3], T[8], T[11])),
    PhraseQuery((T[0], T[1])),
    BooleanQuery(must=(T[0],), must_not=(T[4],)),
    BooleanQuery(must=(PhraseQuery((T[0], T[1])),), should=(T[3],)),
]


@pytest.mark.parametrize("q", CASES,
                         ids=[f"c{i}" for i in range(len(CASES))])
def test_count_equals_oracle(searcher, oracle, q):
    assert searcher.count(q) == len(oracle.topk_query(q, 10 ** 9))


def test_term_count_shortcut(searcher, oracle):
    q = TermQuery(T[1])
    assert searcher.count(q) == len(oracle.topk_query(q, 10 ** 9))


def test_count_plan_has_no_global_sort(searcher):
    df = searcher.count_df(AndQuery((T[0], T[2])))
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    assert "TakeOrderedAndProject" not in plan
    assert "DESC" not in plan  # nothing orders by score anywhere


def test_count_zero_for_absent_term(searcher):
    assert searcher.count(AndQuery((T[0], "zzznotaterm"))) == 0
