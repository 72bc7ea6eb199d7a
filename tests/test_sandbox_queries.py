"""ToChildBlockJoinQuery, CoveringQuery, and MultiRangeQuery analogs
(join/.../ToChildBlockJoinQuery.java, sandbox/.../CoveringQuery.java,
sandbox/.../MultiRangeQuery.java), each verified against a brute-force
recomputation from the exhaustive match stream / docstore."""

import numpy as np
import pytest

from lucene_spark.fixtures.transcripts import term_string
from lucene_spark.index.catalog import IndexCatalog
from lucene_spark.search import IndexSearcher
from lucene_spark.search.query import (OrQuery, TermQuery,
                                       multi_range_predicate)

T = [term_string(k) for k in range(30)]


@pytest.fixture(scope="module")
def env(spark, small_index):
    s = IndexSearcher(spark, small_index)
    ds = (spark.read.parquet(IndexCatalog(small_index).table_path("docstore"))
          .select("doc_id", "conv_id", "turn_idx", "role").toPandas())
    return s, ds


# ---------------------------------------------------------------------------
# ToChildBlockJoinQuery
# ---------------------------------------------------------------------------


def _parent_scores(s, q, mode):
    by_conv: dict = {}
    conv_of = s._tc_conv_of
    for d, sc in s._tc_matches:
        by_conv.setdefault(conv_of[d], []).append(float(sc))
    out = {}
    for c, ss in by_conv.items():
        v = {"max": max, "min": min, "total": sum,
             "avg": lambda x: sum(x) / len(x)}[mode](ss)
        out[c] = np.float32(v)
    return out


@pytest.mark.parametrize("mode", ["max", "total"])
def test_to_child_join_matches_brute(spark, env, mode):
    s, ds = env
    q = OrQuery((T[1], T[4], T[9]))
    conv_of = dict(zip(ds["doc_id"], ds["conv_id"]))
    matches = [(int(r["doc_id"]), np.float32(r["score"]))
               for r in s.matches_df(q).collect()]
    assert matches
    s._tc_conv_of, s._tc_matches = conv_of, matches
    par = _parent_scores(s, q, mode)
    # brute: every child turn of a matching conversation, parent score
    want = sorted(((int(d), c, par[c]) for d, c in
                   zip(ds["doc_id"], ds["conv_id"]) if c in par),
                  key=lambda r: (-r[2], r[0]))[:12]
    got = [(int(r["doc_id"]), r["conv_id"], np.float32(r["score"]))
           for r in s.to_child_join_search(q, k=12,
                                           parent_score_mode=mode).collect()]
    assert [g[0] for g in got] == [w[0] for w in want]
    for g, w in zip(got, want):
        assert g[1] == w[1]
        assert g[2] == pytest.approx(w[2], rel=1e-6)


def test_to_child_join_none_mode(spark, env):
    s, ds = env
    q = TermQuery(T[2])
    conv_of = dict(zip(ds["doc_id"], ds["conv_id"]))
    matched = {conv_of[int(r["doc_id"])] for r in s.matches_df(q).collect()}
    want = sorted(int(d) for d, c in zip(ds["doc_id"], ds["conv_id"])
                  if c in matched)[:9]
    got = s.to_child_join_search(q, k=9, parent_score_mode="none").collect()
    assert [int(r["doc_id"]) for r in got] == want
    assert all(r["score"] == 0.0 for r in got)


def test_to_child_emits_whole_blocks(spark, env):
    """Every turn of a matched conversation appears (with a k beyond
    the corpus) — the child-emission contract."""
    s, ds = env
    q = TermQuery(T[7])
    conv_of = dict(zip(ds["doc_id"], ds["conv_id"]))
    matched = {conv_of[int(r["doc_id"])] for r in s.matches_df(q).collect()}
    got = s.to_child_join_search(q, k=10 ** 6).collect()
    n_children = sum(1 for c in ds["conv_id"] if c in matched)
    assert len(got) == n_children
    assert {r["conv_id"] for r in got} == matched


# ---------------------------------------------------------------------------
# CoveringQuery
# ---------------------------------------------------------------------------


def _covering_brute(s, ds, queries, min_of, k):
    per: dict = {}
    for q in queries:
        for r in s.matches_df(q).collect():
            d = int(r["doc_id"])
            n, tot = per.get(d, (0, 0.0))
            per[d] = (n + 1, tot + float(r["score"]))
    rows = []
    for d, (n, tot) in per.items():
        mm = min_of(d)
        if mm is None:
            continue
        if n >= max(int(mm), 1):
            rows.append((d, n, np.float32(tot)))
    rows.sort(key=lambda r: (-r[2], r[0]))
    return rows[:k]


def test_covering_per_doc_min_match(spark, env):
    s, ds = env
    queries = [TermQuery(T[1]), TermQuery(T[4]), TermQuery(T[9])]
    turn_of = dict(zip(ds["doc_id"].astype(int), ds["turn_idx"].astype(int)))
    want = _covering_brute(s, ds, queries,
                           lambda d: 1 + (turn_of[d] % 3), k=15)
    got = [(int(r["doc_id"]), int(r["n_matches"]), np.float32(r["score"]))
           for r in s.covering_search(queries, "1 + (turn_idx % 3)",
                                      k=15).collect()]
    assert got == [(w[0], w[1], pytest.approx(w[2], rel=1e-6))
                   for w in want] or got == want
    # the per-doc minimum actually bites: some doc matching 1-2 queries
    # must be excluded relative to min_match=1
    loose = {d for d, _, _ in
             _covering_brute(s, ds, queries, lambda d: 1, k=10 ** 6)}
    strict = {d for d, _, _ in
              _covering_brute(s, ds, queries,
                              lambda d: 1 + (turn_of[d] % 3), k=10 ** 6)}
    assert strict < loose


def test_covering_null_min_never_matches(spark, env):
    s, ds = env
    queries = [TermQuery(T[1]), TermQuery(T[4])]
    got = s.covering_search(
        queries, "IF(role = 'user', NULL, 1)", k=10 ** 6).collect()
    role_of = dict(zip(ds["doc_id"].astype(int), ds["role"]))
    assert got
    assert all(role_of[int(r["doc_id"])] != "user" for r in got)


def test_covering_clamps_min_to_one(spark, env):
    """Values < 1 are treated as 1 (CoveringScorer.java:134-135)."""
    s, ds = env
    queries = [TermQuery(T[1]), TermQuery(T[4])]
    a = s.covering_search(queries, "-7", k=10 ** 6).collect()
    b = s.covering_search(queries, "1", k=10 ** 6).collect()
    assert [(r["doc_id"], r["n_matches"]) for r in a] \
        == [(r["doc_id"], r["n_matches"]) for r in b]


# ---------------------------------------------------------------------------
# MultiRangeQuery
# ---------------------------------------------------------------------------


def test_multi_range_merges_overlaps():
    # overlap merges; disjoint stays; containment collapses
    p = multi_range_predicate("x", [(5, 10), (8, 20), (30, 40), (32, 35)])
    assert p == "(x BETWEEN 5 AND 20 OR x BETWEEN 30 AND 40)"
    # adjacency (lo > cur_hi by 1) does NOT merge — reference `> 0` cmp
    p2 = multi_range_predicate("x", [(1, 2), (3, 4)])
    assert p2 == "(x BETWEEN 1 AND 2 OR x BETWEEN 3 AND 4)"
    # touching bounds DO merge (lo == cur_hi)
    p3 = multi_range_predicate("x", [(1, 3), (3, 4)])
    assert p3 == "(x BETWEEN 1 AND 4)"


def test_multi_range_open_bounds():
    assert multi_range_predicate("x", [(None, 5), (10, 20)]) \
        == "(x <= 5 OR x BETWEEN 10 AND 20)"
    assert multi_range_predicate("x", [(10, None), (12, 15)]) \
        == "(x >= 10)"
    assert multi_range_predicate("x", [(None, None)]) == "x IS NOT NULL"
    assert multi_range_predicate("x", [(None, 4), (2, None)]) \
        == "x IS NOT NULL"


def test_multi_range_as_doc_filter(spark, env):
    s, ds = env
    pred = multi_range_predicate("turn_idx", [(0, 1), (1, 2), (5, None)])
    assert pred == "(turn_idx BETWEEN 0 AND 2 OR turn_idx >= 5)"
    got = {int(r["doc_id"])
           for r in s.search_df(TermQuery(T[3]), k=10 ** 6,
                                doc_filter=pred).collect()}
    turn_of = dict(zip(ds["doc_id"].astype(int), ds["turn_idx"].astype(int)))
    base = {int(r["doc_id"])
            for r in s.search_df(TermQuery(T[3]), k=10 ** 6).collect()}
    want = {d for d in base if turn_of[d] <= 2 or turn_of[d] >= 5}
    assert got == want
