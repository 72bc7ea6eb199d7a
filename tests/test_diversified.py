"""DiversifiedTopDocsCollector tests (misc/search/
DiversifiedTopDocsCollector.java): quota enforcement, greedy-equals-
reference selection vs a brute-force simulation, and null-key
pass-through."""

from collections import Counter

import pytest

from lucene_spark.fixtures.transcripts import term_string
from lucene_spark.search.query import OrQuery
from lucene_spark.search.searcher import IndexSearcher


@pytest.fixture(scope="module")
def searcher(spark, small_index):
    return IndexSearcher(spark, small_index)


def _brute(searcher, query, key_field, max_per_key, k):
    """Greedy score-order selection with per-key quotas — the
    reference collector's net semantics."""
    m = searcher.matches_df(query).collect()
    keys = {r["doc_id"]: r[key_field] for r in
            searcher._read_cached(searcher.docstore_paths)
            .select("doc_id", key_field).collect()}
    taken, used = [], Counter()
    for r in sorted(m, key=lambda r: (-r["score"], r["doc_id"])):
        kv = keys[r["doc_id"]]
        if kv is not None and used[kv] >= max_per_key:
            continue
        used[kv] += 1
        taken.append((r["doc_id"], kv))
        if len(taken) == k:
            break
    return taken


@pytest.mark.parametrize("max_per_key", [1, 2, 3])
def test_matches_greedy_selection(searcher, max_per_key):
    q = OrQuery((term_string(3), term_string(8), term_string(11)))
    got = [(r["doc_id"], r["key"]) for r in
           searcher.diversified_search(q, "role", max_per_key,
                                       k=10).collect()]
    assert got == _brute(searcher, q, "role", max_per_key, 10)
    counts = Counter(kv for _, kv in got if kv is not None)
    assert all(c <= max_per_key for c in counts.values())


def test_quota_actually_binds(searcher):
    """With 3 roles and k=10, quota 1 returns at most 3 hits."""
    q = OrQuery((term_string(3), term_string(8), term_string(11)))
    rows = searcher.diversified_search(q, "role", 1, k=10).collect()
    assert 1 <= len(rows) <= 3
    assert len({r["key"] for r in rows}) == len(rows)


def test_null_keys_unconstrained(searcher):
    """tool is NULL on most docs: null-key hits are never capped."""
    q = OrQuery((term_string(3), term_string(8), term_string(11)))
    rows = searcher.diversified_search(q, "tool", 1, k=10).collect()
    nulls = [r for r in rows if r["key"] is None]
    non_null = Counter(r["key"] for r in rows if r["key"] is not None)
    assert all(c <= 1 for c in non_null.values())
    assert len(nulls) > 1  # multiple null-key docs allowed through
    assert got_is_greedy(searcher, q, rows)


def got_is_greedy(searcher, q, rows):
    m = {r["doc_id"]: r["score"] for r in
         searcher.matches_df(q).collect()}
    scores = [m[r["doc_id"]] for r in rows]
    return scores == sorted(scores, reverse=True)
