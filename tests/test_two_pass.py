"""Two-pass global-θ pruning (cross-partition minCompetitiveScore):
must be rank-identical to single-pass on every query."""

import numpy as np
import pytest

from lucene_spark.fixtures.queryset import generate_queries
from lucene_spark.search import IndexSearcher
from lucene_spark.search.query import from_dict


@pytest.fixture(scope="module")
def searcher(spark, small_index):
    return IndexSearcher(spark, small_index)


QS = [q for q in generate_queries(n_queries=30, seed=321)
      if q["type"] in ("term", "or")][:12]


@pytest.mark.parametrize("q", QS, ids=[q["qid"] for q in QS])
def test_two_pass_rank_identical(searcher, q):
    a = searcher.search(from_dict(q), k=q["k"], two_pass=True)
    b = searcher.search(from_dict(q), k=q["k"], two_pass=False)
    assert a == b, q
