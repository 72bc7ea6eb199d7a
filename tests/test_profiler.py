"""QueryProfiler analog (sandbox/.../QueryProfilerIndexSearcher.java):
phase breakdown of a search, results identical to unprofiled."""

import pytest

from lucene_spark.fixtures.transcripts import term_string
from lucene_spark.search import IndexSearcher
from lucene_spark.search.profiler import profile_search
from lucene_spark.search.query import BooleanQuery, MultiTermQuery

T = [term_string(k) for k in range(12)]


@pytest.fixture(scope="module")
def searcher(spark, small_index):
    return IndexSearcher(spark, small_index)


def test_profile_result_identical_and_phases_present(spark, searcher):
    q = BooleanQuery(must=(T[1],), should=(T[4], T[9]))
    rows, prof = profile_search(searcher, q, k=10)
    plain = searcher.search_df(q, k=10).collect()
    assert [(r["doc_id"], r["score"]) for r in rows] \
        == [(r["doc_id"], r["score"]) for r in plain]
    for key in ("rewrite_ms", "stats_ms", "plan_ms", "execute_ms",
                "total_ms"):
        assert prof[key] >= 0.0
    assert prof["n_rows"] == len(rows) > 0
    # phase sum never exceeds the measured total
    assert (prof["rewrite_ms"] + prof["stats_ms"] + prof["plan_ms"]
            + prof["execute_ms"]) <= prof["total_ms"] + 1.0


def test_profile_mtq_rewrite_is_attributed(spark, searcher):
    """An MTQ expansion hits the term dictionary during the REWRITE
    phase — the profiler must attribute that work to rewrite_ms, and
    the execute phase still returns the right rows."""
    q = MultiTermQuery("prefix", T[1][:5])
    rows, prof = profile_search(searcher, q, k=10)
    plain = searcher.search_df(q, k=10).collect()
    assert [(r["doc_id"],) for r in rows] == [(r["doc_id"],) for r in plain]
    assert prof["rewrite_ms"] > 0.0
