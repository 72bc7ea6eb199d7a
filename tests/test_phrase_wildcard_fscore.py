"""PhraseWildcardQuery (sandbox) and FunctionScoreQuery (queries
module) tests: rewrite equivalence, empty-slot semantics, full-stream
function ranking vs the top-N rescorer."""

import pytest
from pyspark.sql import functions as F

from lucene_spark.fixtures.transcripts import term_string
from lucene_spark.search.query import (MultiPhraseQuery, MultiTermQuery,
                                       TermQuery)
from lucene_spark.search.searcher import IndexSearcher


@pytest.fixture(scope="module")
def searcher(spark, small_index):
    return IndexSearcher(spark, small_index)


def test_phrase_wildcard_equals_expanded_multiphrase(searcher):
    t0 = term_string(0)
    pfx = term_string(5)[:5]  # w0000* — a handful of dictionary matches
    q = searcher.phrase_wildcard([t0, MultiTermQuery("prefix", pfx)],
                                 max_expansions=128)
    terms = searcher.expand_terms(
        MultiTermQuery("prefix", pfx, max_expansions=128))
    assert 2 <= len(terms) <= 128
    want = searcher.search_df(
        MultiPhraseQuery(((t0,), tuple(terms))), k=10).collect()
    got = searcher.search_df(q, k=10).collect()
    assert [(r["doc_id"], r["score"]) for r in got] \
        == [(r["doc_id"], r["score"]) for r in want]
    assert len(got) > 0


def test_phrase_wildcard_empty_slot_matches_nothing(searcher):
    q = searcher.phrase_wildcard(
        [term_string(0), MultiTermQuery("prefix", "zzzzqxunseen")])
    assert searcher.search_df(q, k=10).count() == 0


def test_phrase_wildcard_literal_slots_analyzed(searcher):
    """Literal (non-MTQ) slots route through the field analyzer and a
    plain two-literal call equals PhraseQuery semantics."""
    t0, t1 = term_string(0), term_string(1)
    from lucene_spark.search.query import PhraseQuery
    got = searcher.search_df(
        searcher.phrase_wildcard([t0, t1]), k=10).collect()
    want = searcher.search_df(PhraseQuery((t0, t1)), k=10).collect()
    assert [(r["doc_id"], r["score"]) for r in got] \
        == [(r["doc_id"], r["score"]) for r in want]


def test_function_score_full_stream_ranking(searcher):
    """The function ranks ALL matches: a doc outside the BM25 top-k
    must win when the function favors it."""
    t = term_string(0)
    # replace score entirely with a doc-value function: shortest docs
    # first regardless of BM25
    out = searcher.function_score_df(
        TermQuery(t), "1.0 / (1 + token_count)", k=5).collect()
    m = searcher.matches_df(TermQuery(t)).collect()
    ds = {r["doc_id"]: r["token_count"] for r in
          searcher._read_cached(searcher.docstore_paths)
          .select("doc_id", "token_count").collect()}
    want = sorted(((1.0 / (1 + ds[r["doc_id"]]), -r["doc_id"])
                   for r in m), reverse=True)[:5]
    got = [(r["score"], -r["doc_id"]) for r in out]
    assert [(pytest.approx(w[0]), w[1]) for w in want] == got


def test_function_score_identity_matches_search(searcher):
    """expr='score' reproduces the BM25 ranking exactly."""
    t = term_string(2)
    a = searcher.function_score_df(TermQuery(t), "score", k=10).collect()
    b = searcher.search_df(TermQuery(t), k=10).collect()
    assert [(r["doc_id"], pytest.approx(r["score"], rel=1e-6))
            for r in a] == [(r["doc_id"], r["score"]) for r in b]


# ---------------------------------------------------------------------------
# ComplexPhraseQueryParser (queryparser/complexPhrase)
# ---------------------------------------------------------------------------

def test_complex_phrase_parser_equals_phrase_wildcard(searcher):
    from lucene_spark.search.query import (ComplexPhraseQuery,
                                           parse_complex_phrase_query,
                                           parse_query)
    t0 = term_string(0)
    pfx = term_string(5)[:5]
    q = parse_complex_phrase_query(f'"{t0} {pfx}*"')
    assert isinstance(q, ComplexPhraseQuery)
    want = searcher.search_df(
        searcher.phrase_wildcard([t0, MultiTermQuery("prefix", pfx)]),
        k=10).collect()
    got = searcher.search_df(q, k=10).collect()
    assert [(r["doc_id"], r["score"]) for r in got] \
        == [(r["doc_id"], r["score"]) for r in want]
    assert len(got) > 0
    # the CLASSIC parser keeps the literal star (reference parity:
    # wildcards in phrases are ComplexPhraseQueryParser-only)
    from lucene_spark.search.query import PhraseQuery
    assert isinstance(parse_query(f'"{t0} {pfx}*"'), PhraseQuery)


def test_complex_phrase_parses_fuzzy_and_wildcard_slots():
    from lucene_spark.search.query import (ComplexPhraseQuery,
                                           parse_complex_phrase_query)
    q = parse_complex_phrase_query('"smyth~ jo?n w*rd plain"~3^2')
    assert isinstance(q, ComplexPhraseQuery)
    assert q.slop == 3 and q.boost == 2.0
    kinds = [getattr(s, "kind", "term") for s in q.slots_]
    assert kinds == ["fuzzy", "wildcard", "wildcard", "term"]
    assert q.slots_[0].max_edits == 2      # bare ~ = maxEdits 2
    q1 = parse_complex_phrase_query('"smyth~1 x"')
    assert q1.slots_[0].max_edits == 1
    # a quoted phrase with no MTQ atoms stays a plain PhraseQuery
    from lucene_spark.search.query import PhraseQuery
    assert isinstance(parse_complex_phrase_query('"plain words"'),
                      PhraseQuery)


def test_complex_phrase_inside_boolean(searcher):
    from lucene_spark.search.query import parse_complex_phrase_query
    t0, t1 = term_string(0), term_string(1)
    pfx = term_string(5)[:5]
    q = parse_complex_phrase_query(f'{t1} AND "{t0} {pfx}*"')
    got = searcher.search_df(q, k=10)
    assert got.count() > 0
    # count/matches paths resolve the node too
    assert searcher.count(q) >= got.count()
