"""Grouping-module collectors (grouping/src/java/org/apache/lucene/
search/grouping/: AllGroupsCollector, AllGroupHeadsCollector,
DistinctValuesCollector, GroupFacetCollector) and the misc module's
DocValuesStatsCollector — validated against brute-force recomputation
from the exhaustive match stream."""

import math

import pytest
from pyspark.sql import functions as F

from lucene_spark.index.catalog import IndexCatalog
from lucene_spark.search import IndexSearcher
from lucene_spark.search.query import TermQuery
from lucene_spark.fixtures.transcripts import term_string

Q = TermQuery(term_string(2))


@pytest.fixture(scope="module")
def searcher(spark, small_index):
    return IndexSearcher(spark, small_index)


@pytest.fixture(scope="module")
def brute(spark, searcher, small_index):
    """(doc_id, score, role, tool) for every match — the ground truth."""
    cat = IndexCatalog(small_index)
    ds = (spark.read.parquet(cat.table_path("docstore"))
          .select("doc_id", "role", "tool"))
    m = searcher.matches_df(Q).join(ds, "doc_id")
    return [(int(r.doc_id), float(r.score), r.role, r.tool)
            for r in m.collect()]


def test_all_groups(searcher, brute):
    got = {(r.grp, int(r.n_docs))
           for r in searcher.all_groups(Q, "role").collect()}
    want = {}
    for _, _, role, _ in brute:
        want[role] = want.get(role, 0) + 1
    assert got == set(want.items())


def test_group_heads_relevance(searcher, brute):
    got = {r.grp: (int(r.doc_id), float(r.score))
           for r in searcher.group_heads(Q, "role").collect()}
    want = {}
    for doc_id, s, role, _ in sorted(brute):
        cur = want.get(role)
        # score desc, earlier doc wins ties (reference comparator)
        if cur is None or s > cur[1] + 1e-9:
            want[role] = (doc_id, s)
    assert set(got) == set(want)
    for g in want:
        assert got[g][0] == want[g][0]
        assert got[g][1] == pytest.approx(want[g][1], rel=1e-6)


def test_group_heads_by_field(spark, searcher, small_index):
    cat = IndexCatalog(small_index)
    md = (spark.read.parquet(cat.table_path("docstore"))
          .select("doc_id", "token_count"))
    got = {r.grp: int(r.doc_id)
           for r in searcher.group_heads(Q, "role", by="token_count",
                                         metadata=md).collect()}
    mm = {int(r.doc_id): int(r.token_count) for r in md.collect()}
    ds = {int(r.doc_id): r.role for r in
          (spark.read.parquet(cat.table_path("docstore"))
           .select("doc_id", "role")).collect()}
    matches = [int(r.doc_id) for r in searcher.matches_df(Q).collect()]
    want = {}
    for d in sorted(matches):
        g = ds[d]
        if g not in want or mm[d] > mm[want[g]]:
            want[g] = d
    assert got == want


def test_distinct_values(searcher, brute):
    rows = searcher.distinct_values(Q, "role", "tool",
                                    k_groups=2).collect()
    # first pass: top-2 groups by head score, ties group asc
    heads = {}
    for _, s, role, _ in brute:
        heads[role] = max(heads.get(role, -1.0), s)
    top2 = sorted(heads, key=lambda g: (-heads[g], g))[:2]
    assert sorted(r.grp for r in rows) == sorted(top2)
    for r in rows:
        uniq = {t for _, _, role, t in brute if role == r.grp}
        want = sorted(t for t in uniq if t is not None)
        assert list(r["values"]) == want
        # null membership counts like the reference's uniqueValues
        assert bool(r.has_null) == (None in uniq)
        assert int(r.n_distinct) == len(uniq)


def test_group_facets(searcher, brute):
    got = [(r.fv, int(r.n_groups))
           for r in searcher.group_facets(Q, "role", "tool",
                                          n=100).collect()]
    pairs = {(role, tool) for _, _, role, tool in brute
             if tool is not None}
    cnt = {}
    for _, t in pairs:
        cnt[t] = cnt.get(t, 0) + 1
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    assert got == want


def test_docvalues_stats(spark, searcher, small_index):
    cat = IndexCatalog(small_index)
    md = (spark.read.parquet(cat.table_path("docstore"))
          .select("doc_id",
                  F.when(F.col("doc_id") % 3 != 0,
                         F.col("token_count")).alias("tc")))
    row = searcher.docvalues_stats(Q, "tc", metadata=md).collect()[0]
    vals = {int(r.doc_id): r.tc for r in md.collect()}
    matches = [int(r.doc_id) for r in searcher.matches_df(Q).collect()]
    present = [int(vals[d]) for d in matches if vals[d] is not None]
    assert int(row["count"]) == len(present)
    assert int(row.missing) == len(matches) - len(present)
    assert int(row.vmin) == min(present)
    assert int(row.vmax) == max(present)
    assert int(row.vsum) == sum(present)
    mean = sum(present) / len(present)
    var = sum((v - mean) ** 2 for v in present) / len(present)
    assert row.mean == pytest.approx(mean, rel=1e-9)
    assert row.variance == pytest.approx(var, rel=1e-9)
    assert row.stdev == pytest.approx(math.sqrt(var), rel=1e-9)


def test_all_groups_honors_doc_filter(searcher, brute):
    flt = "tool is not null"
    got = {(r.grp, int(r.n_docs))
           for r in searcher.all_groups(Q, "role",
                                        doc_filter=flt).collect()}
    want = {}
    for _, _, role, tool in brute:
        if tool is not None:
            want[role] = want.get(role, 0) + 1
    assert got == set(want.items())
    # and it differs from the unfiltered counts (fixture has NULL tools)
    assert got != {(r.grp, int(r.n_docs))
                   for r in searcher.all_groups(Q, "role").collect()}
