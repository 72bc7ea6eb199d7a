"""Classic QueryParser subset v2: field:term, +/-, AND/OR/NOT, boosts,
sloppy phrases, wildcard/fuzzy terms, /regexp/ terms, grouping
(queryparser/classic/QueryParser.java:82). Round-trips into the Query
AST and executes end-to-end against the oracle."""

import pytest

from lucene_spark.fixtures.transcripts import term_string
from lucene_spark.index.catalog import IndexCatalog
from lucene_spark.search import IndexSearcher
from lucene_spark.search.oracle import BruteForceOracle
from lucene_spark.search.query import (AndQuery, BooleanQuery,
                                       MultiTermQuery, OrQuery, PhraseQuery,
                                       TermQuery, parse_query)

T = [term_string(k) for k in range(30)]


# ---- AST round-trips --------------------------------------------------

def test_bare_term():
    assert parse_query("Hello") == TermQuery("hello")


def test_default_or():
    assert parse_query("a b c") == OrQuery(("a", "b", "c"))


def test_and_operator_promotes_both_sides():
    assert parse_query("a AND b") == AndQuery(("a", "b"))
    assert parse_query("a AND b AND c") == AndQuery(("a", "b", "c"))


def test_plus_minus_prefixes():
    q = parse_query("+a b -c")
    assert q == BooleanQuery(must=("a",), should=("b",), must_not=("c",))


def test_not_operator():
    q = parse_query("a NOT b")
    assert q == BooleanQuery(should=("a",), must_not=("b",))


def test_field_term():
    assert parse_query("role:user") == TermQuery("user", "role")
    q = parse_query("+role:user b")
    assert q == BooleanQuery(must=(TermQuery("user", "role"),),
                             should=("b",))


def test_phrase_and_sloppy_phrase():
    assert parse_query('"a b"') == PhraseQuery(("a", "b"))
    assert parse_query('"a b"~2') == PhraseQuery(("a", "b"), slop=2)


def test_field_phrase():
    q = parse_query('tool:"grep search"')
    assert q == PhraseQuery(("grep", "search"), "tool")


def test_boost():
    assert parse_query("a^2.5") == TermQuery("a", boost=2.5)
    q = parse_query("a^2 b")
    assert q == BooleanQuery(should=(TermQuery("a", boost=2.0), "b"))


def test_term_ranges():
    q = parse_query("[alpha TO beta]")
    assert q == MultiTermQuery("range", ("alpha", "beta\x00"))
    q2 = parse_query("{alpha TO beta}")
    assert q2 == MultiTermQuery("range", ("alpha\x00", "beta"))
    q3 = parse_query("role:[a TO z]")
    assert q3 == MultiTermQuery("range", ("a", "z\x00"), "role")
    q4 = parse_query("+x [b TO *]")
    assert q4 == BooleanQuery(
        must=("x",), should=(MultiTermQuery("range", ("b", None)),))


def test_wildcard_and_fuzzy():
    assert parse_query("wi*d") == MultiTermQuery("wildcard", "wi*d")
    assert parse_query("term~1") == MultiTermQuery("fuzzy", "term",
                                                   max_edits=1)


def test_grouping_nested():
    q = parse_query('+(a b) -c')
    assert q == BooleanQuery(must=(OrQuery(("a", "b")),), must_not=("c",))


def test_group_with_boost():
    q = parse_query('(a b)^2 +c')
    inner = q.should[0]
    assert inner == OrQuery(("a", "b"), boost=2.0)


def test_phrase_as_must_with_wildcard_should():
    q = parse_query('+"slow fast" quer*')
    assert q == BooleanQuery(must=(PhraseQuery(("slow", "fast")),),
                             should=(MultiTermQuery("wildcard", "quer*"),))


# ---- end-to-end: parsed query equals hand-built query -----------------

@pytest.fixture(scope="module")
def searcher(spark, small_index):
    return IndexSearcher(spark, small_index)


@pytest.fixture(scope="module")
def oracle(spark, small_index):
    cat = IndexCatalog(small_index)
    pdf = (spark.read.parquet(cat.table_path("docstore"))
           .select("doc_id", "text").orderBy("doc_id").toPandas())
    return BruteForceOracle(pdf)


def test_parsed_nested_executes(searcher, oracle):
    q = parse_query(f'+"{T[0]} {T[1]}" {T[3]}')
    got = searcher.search(q, k=10)
    want = oracle.topk_query(
        BooleanQuery(must=(PhraseQuery((T[0], T[1])),), should=(T[3],)), 10)
    assert got == want


def test_parsed_boolean_of_boolean_executes(searcher, oracle):
    q = parse_query(f"+({T[1]} {T[2]}) +({T[4]} {T[5]})")
    got = searcher.search(q, k=10)
    want = oracle.topk_query(
        BooleanQuery(must=(BooleanQuery(should=(T[1], T[2])),
                           BooleanQuery(should=(T[4], T[5])))), 10)
    assert got == want


# ---- /regexp/ syntax (QueryParser.java Regexp production) --------------

def test_regexp_atom():
    q = parse_query("/s(low|ort)/")
    assert q == MultiTermQuery("regexp", "s(low|ort)")


def test_regexp_with_field_boost_and_clauses():
    q = parse_query("vector AND /ind.*/^2")
    assert isinstance(q, BooleanQuery)
    assert MultiTermQuery("regexp", "ind.*", boost=2.0) in q.must
    q2 = parse_query("text:/w[0-9]+/ fast")
    assert MultiTermQuery("regexp", "w[0-9]+", "text") in q2.should
    # slash inside a bare term stays a term (paths are not regexps)
    assert parse_query("a/b") == TermQuery("a/b")


def test_regexp_parsed_executes(searcher, oracle):
    # parsed /regexp/ == hand-built MultiTermQuery, including a
    # non-tail-intersection pattern that runs the DFA fallback
    for pat in ("w.*&.*1", "(w.*&.*1)()"):
        got = searcher.search(parse_query(f"/{pat}/"), k=10)
        want = searcher.search(MultiTermQuery("regexp", pat), k=10)
        assert got == want and got
