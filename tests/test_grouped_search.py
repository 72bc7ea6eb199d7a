"""TopGroups search (grouping module: FirstPassGroupingCollector +
TopGroupsCollector analog)."""

import pytest
from pyspark.sql import functions as F

from lucene_spark.fixtures.transcripts import term_string
from lucene_spark.search import IndexSearcher
from lucene_spark.search.query import OrQuery, TermQuery


@pytest.fixture(scope="module")
def searcher(spark, small_index):
    return IndexSearcher(spark, small_index)


def _brute(searcher, q, field, k_groups, per_group):
    m = {r["doc_id"]: float(r["score"])
         for r in searcher.matches_df(q).collect()}
    gv = {r["doc_id"]: r[field]
          for r in searcher._read_cached(searcher.docstore_paths)
          .select("doc_id", field).collect()}
    groups = {}
    for d, s in m.items():
        groups.setdefault(gv[d], []).append((d, s))
    heads = sorted(((max(s for _, s in v), g) for g, v in groups.items()),
                   key=lambda t: (-t[0], t[1] if t[1] is not None else "￿"))
    out = []
    for gs, g in heads[:k_groups]:
        hits = sorted(groups[g], key=lambda t: (-t[1], t[0]))[:per_group]
        for rank, (d, s) in enumerate(hits, 1):
            out.append((g, round(gs, 5), d, round(s, 5), rank))
    return out


@pytest.mark.parametrize("q,field,kg,pg", [
    (TermQuery(term_string(1)), "role", 2, 3),
    (OrQuery((term_string(2), term_string(9))), "role", 3, 2),
    (TermQuery(term_string(4)), "tool", 4, 2),  # tool is NULL-able
], ids=["term-role", "or-role", "term-tool-nulls"])
def test_grouped_search_matches_brute_force(searcher, q, field, kg, pg):
    got = [(r["grp"], round(float(r["group_score"]), 5), r["doc_id"],
            round(float(r["score"]), 5), r["grp_rank"])
           for r in searcher.grouped_search(
               q, field, k_groups=kg, docs_per_group=pg).collect()]
    assert got == _brute(searcher, q, field, kg, pg)
    assert got  # non-vacuous


def test_grouped_search_respects_quota_and_order(searcher):
    rows = searcher.grouped_search(TermQuery(term_string(1)), "role",
                                   k_groups=3, docs_per_group=2).collect()
    per = {}
    for r in rows:
        per.setdefault(r["grp"], []).append(r)
    assert len(per) <= 3
    for g, hits in per.items():
        assert len(hits) <= 2
        assert [h["grp_rank"] for h in hits] == list(
            range(1, len(hits) + 1))
        # group_score is the group's best hit score
        assert hits[0]["group_score"] == pytest.approx(
            max(h["score"] for h in hits))
