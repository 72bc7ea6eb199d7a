"""SimpleQueryParser structural parity.

Cases transcribed from the reference test model
(queryparser/src/test/org/apache/lucene/queryparser/simple/
TestSimpleQueryParser.java) — same inputs, expected trees expressed in
our AST. The reference helper parses with default operator MUST, so
these do too unless noted. End-to-end scoring runs against the engine
+ BruteForceOracle on a real index.
"""

import pytest

from lucene_spark.fixtures.transcripts import transcripts_df
from lucene_spark.index import build_index
from lucene_spark.index.catalog import IndexCatalog
from lucene_spark.search import IndexSearcher
from lucene_spark.search.oracle import BruteForceOracle
from lucene_spark.search.query import (BooleanQuery, MatchAllQuery,
                                       MultiTermQuery, PhraseQuery,
                                       TermQuery)
from lucene_spark.search.simple_parser import (AND_OPERATOR, NOT_OPERATOR,
                                               OR_OPERATOR, PHRASE_OPERATOR,
                                               PRECEDENCE_OPERATORS,
                                               SimpleQueryParser,
                                               parse_simple)

F = "field"


def parse(text, flags=-1, op="must"):
    return SimpleQueryParser(F, flags=flags, default_operator=op) \
        .parse(text)


def T(t):
    return TermQuery(t, F)


def NOT(q):
    return BooleanQuery(must_not=(q,), should=(MatchAllQuery(F),))


# --- term / fuzzy / phrase / prefix (TestSimpleQueryParser:78-145) ---------

def test_term():
    assert parse("foobar") == T("foobar")


def test_fuzzy():
    expected = MultiTermQuery("fuzzy", "foobar", F, max_edits=2)
    assert parse("foobar~2") == expected
    assert parse("foobar~") == expected          # bare ~ means 2
    assert parse("foobar~a") == T("foobar")      # garbage -> 0 -> plain
    assert parse("foobar~1a") == T("foobar")
    assert parse("foobar~-1") == T("foobar")     # negative -> 0
    # fuzziness caps at the automaton maximum (2)
    assert parse("foobar~5") == expected


def test_phrase_and_slop():
    assert parse('"foo bar"') == PhraseQuery(("foo", "bar"), F)
    assert parse('"foo bar"~2') == PhraseQuery(("foo", "bar"), F, slop=2)
    assert parse('"foo bar"~10') == PhraseQuery(("foo", "bar"), F, slop=10)
    assert parse('"foo bar"~') == PhraseQuery(("foo", "bar"), F)
    assert parse('"foo bar"~a') == PhraseQuery(("foo", "bar"), F)
    assert parse('"foo bar"~-1') == PhraseQuery(("foo", "bar"), F)


def test_prefix():
    assert parse("foobar*") == MultiTermQuery("prefix", "foobar", F)
    # '*' not in last position is literal -> tokenizer splits on it
    assert parse("st*ar*") == MultiTermQuery("prefix", "st*ar", F)


# --- operators (:146-215) ---------------------------------------------------

def test_and_or_not():
    assert parse("foo+bar") == BooleanQuery(must=(T("foo"), T("bar")),
                                            field=F)
    assert parse("foo bar") == BooleanQuery(must=(T("foo"), T("bar")),
                                            field=F)
    should = BooleanQuery(should=(T("foo"), T("bar")), field=F)
    assert parse("foo|bar") == should
    assert parse("foo||bar") == should
    assert parse("foo bar", op="should") == should
    assert parse('"foo bar"+"star wars"') == BooleanQuery(
        must=(PhraseQuery(("foo", "bar"), F),
              PhraseQuery(("star", "wars"), F)), field=F)
    assert parse("-foo") == NOT(T("foo"))
    assert parse("-(foo)") == NOT(T("foo"))
    assert parse("---foo") == NOT(T("foo"))
    assert parse("--foo") == T("foo")  # double negation cancels


# --- garbage tolerance (:242-320) -------------------------------------------

def test_garbage():
    for s in ("star", "star\n", "star\r", "star\t", "star(", "star)",
              'star"', "\t \r\n\nstar   \n \r \t ", '- + "" - star \\'):
        assert parse(s) == T("star"), s
    for s in ("", "  ", "\\ ", "\\ \\ ", '""', '" "', '" "|" "',
              '(" "|" ")', '" " " "'):
        assert parse(s) is None, repr(s)
    g_and = BooleanQuery(must=(T("star"), T("wars")), field=F)
    for s in ("star wars", "star+wars", "     star     wars   ",
              "     star +    wars   ", "  |     star + + |   wars   ",
              "  |     star + + |   wars   \\"):
        assert parse(s) == g_and, s
    g_or = BooleanQuery(should=(T("star"), T("wars")), field=F)
    for s in ("star|wars", "     star |    wars   ",
              "  |     star | + |   wars   ",
              "  +     star | + +   wars   \\"):
        assert parse(s) == g_or, s
    for s in ("-star", "---star", "- -star -"):
        assert parse(s) == NOT(T("star")), s
    ph = PhraseQuery(("star", "wars"), F)
    for s in ('"star wars"', '"star wars\\ "', '"" | "star wars"',
              '          "star wars"        ""\\'):
        assert parse(s) == ph, s
    for s in ("(star)", "(star))", "((star)",
              "     -()(star)        \n\n\r     ",
              "| + - ( + - |      star    \n      ) \n"):
        assert parse(s) == T("star"), s


# --- precedence (:320-380) ---------------------------------------------------

def test_compound_and_precedence():
    assert parse("star wars empire") == BooleanQuery(
        must=(T("star"), T("wars"), T("empire")), field=F)
    assert parse("star|wars|empire") == BooleanQuery(
        should=(T("star"), T("wars"), T("empire")), field=F)
    # operator change wraps the accumulated tree (right-to-left runs)
    inner_or = BooleanQuery(should=(T("star"), T("wars")), field=F)
    c00 = BooleanQuery(must=(inner_or, T("empire")), field=F)
    for s in ("star|wars empire", "star|wars + empire",
              "star| + wars + ----empire |"):
        assert parse(s) == c00, s
    inner_and = BooleanQuery(must=(T("star"), T("wars")), field=F)
    c01 = BooleanQuery(should=(inner_and, T("empire")), field=F)
    for s in ("star wars | empire", "star + wars|empire",
              "star + | wars | ----empire +"):
        assert parse(s) == c01, s
    # explicit parens beat the implicit run grouping
    grouped = BooleanQuery(
        must=(T("star"),
              BooleanQuery(should=(T("wars"), T("empire")), field=F)),
        field=F)
    assert parse("star (wars|empire)") == grouped


def test_flags_and_weights():
    # disabled NOT operator: '-' becomes a literal token character
    assert parse("-star", flags=AND_OPERATOR | OR_OPERATOR
                 | PHRASE_OPERATOR | PRECEDENCE_OPERATORS | 1 << 7) \
        == T("star")  # tokenizer drops the dash
    # disabled phrase operator: quotes are literal
    got = parse('"star"', flags=NOT_OPERATOR | AND_OPERATOR | 1 << 7)
    assert got == T("star")
    # multi-field weights expand to a should-boolean of boosted leaves
    p = SimpleQueryParser(weights={"a": 1.0, "b": 2.0},
                          default_operator="must")
    assert p.parse("foo") == BooleanQuery(
        should=(TermQuery("foo", "a"), TermQuery("foo", "b", boost=2.0)))
    assert parse("*") == MatchAllQuery(F)


def test_multi_token_term_analysis():
    # a consumed token that analyzes to several terms becomes a
    # default-operator boolean (createBooleanQuery); '.' between
    # letters does NOT split (UAX#29 MidNumLet), '-' does
    assert parse("foo.bar") == T("foo.bar")
    assert parse("foo-bar", flags=AND_OPERATOR | OR_OPERATOR | 1 << 7) \
        == BooleanQuery(must=(T("foo"), T("bar")), field=F)


# --- end-to-end against the engine + brute oracle ---------------------------

@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sqp") / "idx")
    src = transcripts_df(spark, n_convs=50, seed=3, partitions=4)
    build_index(spark, src, out, num_buckets=4,
                keyword_fields=("role", "tool"))
    return out


def test_end_to_end_scoring(spark, idx):
    s = IndexSearcher(spark, idx)
    cat = IndexCatalog(idx)
    pdf = (spark.read.parquet(cat.table_path("docstore"))
           .select("doc_id", "text").orderBy("doc_id").toPandas())
    oracle = BruteForceOracle(pdf)
    terms = [t for t, _ in sorted(oracle.df.items())[:3]]
    qtext = f"{terms[0]}|{terms[1]} -{terms[2]}"
    q = parse_simple(qtext, field="text", default_operator="must")
    rows = {int(r["doc_id"]): float(r["score"])
            for r in s.matches_df(q).collect()}
    # expected: (t0 OR t1) AND NOT ... no — buildQueryTree: the NOT arm
    # is a regular MUST clause, so matches = docs holding (t0|t1) and
    # NOT t2 — verify per doc from the token lists
    id_tok = dict(zip(oracle.doc_ids.tolist(), oracle.tokens))
    want = {d for d, toks in id_tok.items()
            if (terms[0] in toks or terms[1] in toks)
            and terms[2] not in toks}
    assert set(rows) == want and rows
    # pure negation end-to-end
    qn = parse_simple(f"-{terms[2]}")
    got_n = {int(r["doc_id"]) for r in s.matches_df(qn).collect()}
    assert got_n == {d for d, tk in id_tok.items() if terms[2] not in tk}
    # top-k path agrees with exhaustive ranking
    top = [(int(r["doc_id"]), float(r["score"]))
           for r in s.search_df(q, k=5).collect()]
    allm = sorted(rows.items(), key=lambda t: (-t[1], t[0]))
    assert top == allm[:5]
