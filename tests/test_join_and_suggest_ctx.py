"""Query-time term join (JoinUtil.createJoinQuery) and context-filtered
suggester (AnalyzingInfixSuggester contexts) — round-4 verdict
"what's missing #5/#6".
"""

import pytest
from pyspark.sql import functions as F

from lucene_spark.fixtures.transcripts import term_string
from lucene_spark.index.catalog import read_table
from lucene_spark.search import IndexSearcher
from lucene_spark.search.query import TermQuery
from lucene_spark.search.suggest import ContextSuggester, build_suggester

T = [term_string(k) for k in range(30)]


@pytest.fixture(scope="module")
def searcher(spark, small_index):
    return IndexSearcher(spark, small_index)


def _brute_join(searcher, term, from_field, to_field, mode):
    m = {r["doc_id"]: r["score"]
         for r in searcher.matches_df(TermQuery(term)).collect()}
    ds = read_table(searcher.spark, searcher.docstore_paths) \
        .select("doc_id", from_field, to_field).collect()
    by_val = {}
    for r in ds:
        if r["doc_id"] in m:
            by_val.setdefault(r[from_field], []).append(
                float(m[r["doc_id"]]))
    agg = {"max": max, "total": sum, "min": min,
           "avg": lambda xs: sum(xs) / len(xs),
           "none": lambda xs: 1.0}[mode]
    vals = {v: agg(xs) for v, xs in by_val.items()}
    out = [(r["doc_id"], vals[r[to_field]]) for r in ds
           if r[to_field] in vals]
    out.sort(key=lambda t: (-t[1], t[0]))
    return out


@pytest.mark.parametrize("mode", ["none", "max", "total", "avg"])
def test_join_search_matches_brute(spark, searcher, mode):
    got = [(r["doc_id"], round(float(r["score"]), 4))
           for r in searcher.join_search(TermQuery(T[2]), "role", "role",
                                         k=15, score_mode=mode).collect()]
    want = [(d, round(s, 4))
            for d, s in _brute_join(searcher, T[2], "role", "role",
                                    mode)[:15]]
    assert got == want


def test_join_search_two_index_surface(spark, searcher):
    """to_docs from a DIFFERENT table: only its docs can appear."""
    to = spark.createDataFrame(
        [(9001, "user"), (9002, "assistant"), (9003, "nomatch")],
        "doc_id long, role string")
    got = searcher.join_search(TermQuery(T[2]), "role", "role",
                               k=10, score_mode="none",
                               to_docs=to).collect()
    ids = {r["doc_id"] for r in got}
    assert ids <= {9001, 9002}
    assert all(r["score"] == 1.0 for r in got)


def test_join_search_plan_broadcasts_values(spark, searcher):
    df = searcher.join_search(TermQuery(T[2]), "role", "role", k=5,
                              score_mode="max")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan


@pytest.fixture(scope="module")
def sugg(spark, tmp_path_factory):
    docs = spark.createDataFrame(
        [(0, "scan the sorted stream", "en"),
         (1, "scan scan scan", "en"),
         (2, "schnell scannen", "de"),
         (3, "sort and merge", "en"),
         (4, "scanner scanning", "de")],
        "doc_id long, text string, lang string")
    path = str(tmp_path_factory.mktemp("sugg") / "sx")
    build_suggester(docs, path, context_col="lang")
    return ContextSuggester(docs.sparkSession, path)


def test_context_suggester_filters_by_context(sugg):
    en = [(r["term"], r["weight"]) for r in
          sugg.lookup("sc", "prefix", n=5, contexts=["en"]).collect()]
    assert en == [("scan", 4)]
    de = [(r["term"], r["weight"]) for r in
          sugg.lookup("sc", "prefix", n=5, contexts=["de"]).collect()]
    assert de == [("scannen", 1), ("scanner", 1), ("scanning", 1),
                  ("schnell", 1)]
    # no contexts -> weights sum across contexts
    allc = dict((r["term"], r["weight"]) for r in
                sugg.lookup("sc", "prefix", n=10).collect())
    assert allc["scan"] == 4 and allc["schnell"] == 1


def test_context_suggester_infix_and_fuzzy(sugg):
    inf = [r["term"] for r in
           sugg.lookup("ort", "infix", n=5, contexts=["en"]).collect()]
    assert inf == ["sort", "sorted"]
    fz = [r["term"] for r in
          sugg.lookup("sacn", "fuzzy", n=5, contexts=["en"],
                      max_edits=1).collect()]
    assert fz == ["scan"]  # transposition = one edit


def test_entries_suggester_returns_payloads(spark, tmp_path):
    # InputIterator entries model (AnalyzingInfixSuggester.build):
    # (text, weight, payload, contexts) in -> payload out per result
    from lucene_spark.search.suggest import (ContextSuggester,
                                             build_suggester_entries)
    rows = [
        ("search syntax guide", 50, "url:/docs/syntax", "en"),
        ("search operators", 90, "url:/docs/ops", "en"),
        ("searching basics", 20, "url:/docs/basics", "en"),
        ("suchmaschine intern", 70, "url:/de/intern", "de"),
        ("search operators", 90, "url:/docs/ops", "de"),  # 2nd context
    ]
    df = spark.createDataFrame(
        rows, "text string, weight long, payload string, lang string")
    path = str(tmp_path / "sugg_entries")
    build_suggester_entries(df, path, payload_col="payload",
                            context_col="lang")
    s = ContextSuggester(spark, path)
    got = [(r["term"], r["weight"], r["payload"])
           for r in s.lookup("search", kind="prefix", n=3).collect()]
    # no-context lookup sums weights across contexts, keeps the payload
    assert got == [("search operators", 180, "url:/docs/ops"),
                   ("search syntax guide", 50, "url:/docs/syntax"),
                   ("searching basics", 20, "url:/docs/basics")]
    got_de = [(r["term"], r["payload"])
              for r in s.lookup("s", kind="prefix", n=5,
                                contexts=["de"]).collect()]
    assert got_de == [("search operators", "url:/docs/ops"),
                      ("suchmaschine intern", "url:/de/intern")]
    # infix + payload
    got_in = [(r["term"], r["payload"])
              for r in s.lookup("basics", kind="infix", n=5).collect()]
    assert got_in == [("searching basics", "url:/docs/basics")]
    # a payload-free entries index keeps the two-column shape
    build_suggester_entries(df, path + "2", context_col="lang")
    s2 = ContextSuggester(spark, path + "2")
    assert s2.lookup("search", n=1).columns == ["term", "weight"]
