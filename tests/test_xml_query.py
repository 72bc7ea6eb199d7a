"""XML query syntax (queryparser/xml/CoreParser.java): element
vocabulary -> engine query trees, attribute inheritance, occurs
validation, PointRangeQuery doc_filter folding."""

import pytest

from lucene_spark.search import IndexSearcher
from lucene_spark.search.query import (BooleanQuery, ConstantScoreQuery,
                                       DisMaxQuery, MatchAllQuery,
                                       MultiTermQuery, PreAnalyzed,
                                       TermQuery)
from lucene_spark.search.xmlquery import (XmlParserError,
                                          parse_xml_query)


def _unwrap(q):
    return q.query if isinstance(q, PreAnalyzed) else q


def test_term_and_inheritance():
    p = parse_xml_query(
        '<BooleanQuery fieldName="body">'
        '<Clause occurs="must"><TermQuery>alpha</TermQuery></Clause>'
        '<Clause occurs="should">'
        '<TermQuery fieldName="title">beta</TermQuery></Clause>'
        '</BooleanQuery>')
    q = p.query
    assert isinstance(q, BooleanQuery) and q.field == "body"
    # TermQuery leaves are VERBATIM (PreAnalyzed, like the reference)
    assert _unwrap(q.must[0]) == TermQuery("alpha", "body")
    assert _unwrap(q.should[0]) == TermQuery("beta", "title")
    assert p.doc_filter is None


def test_occurs_validation_and_mnm():
    with pytest.raises(XmlParserError):
        parse_xml_query('<BooleanQuery><Clause occurs="nope">'
                        '<TermQuery>x</TermQuery></Clause></BooleanQuery>')
    q = parse_xml_query(
        '<BooleanQuery fieldName="text" minimumNumberShouldMatch="2">'
        '<Clause occurs="should"><TermQuery>a</TermQuery></Clause>'
        '<Clause occurs="should"><TermQuery>b</TermQuery></Clause>'
        '</BooleanQuery>').query
    assert q.min_should_match == 2


def test_boost_attributes():
    q = _unwrap(parse_xml_query(
        '<TermQuery fieldName="text" boost="2.5">x</TermQuery>').query)
    assert q.boost == pytest.approx(2.5)
    q2 = parse_xml_query(
        '<DisjunctionMaxQuery fieldName="text" tieBreaker="0.4" '
        'boost="3"><TermQuery>a</TermQuery><TermQuery>b</TermQuery>'
        '</DisjunctionMaxQuery>').query
    assert isinstance(q2, DisMaxQuery)
    assert q2.tie_breaker == pytest.approx(0.4)
    assert q2.boost == pytest.approx(3.0)


def test_match_all_and_constant_score():
    assert isinstance(parse_xml_query('<MatchAllDocsQuery/>').query,
                      MatchAllQuery)
    q = parse_xml_query(
        '<ConstantScoreQuery boost="0.5">'
        '<TermQuery fieldName="text">x</TermQuery>'
        '</ConstantScoreQuery>').query
    assert isinstance(q, ConstantScoreQuery) and q.boost == 0.5


def test_point_range_folds_to_doc_filter():
    p = parse_xml_query(
        '<PointRangeQuery fieldName="token_count" lowerTerm="5" '
        'upperTerm="9"/>')
    assert isinstance(p.query, MatchAllQuery)
    assert p.doc_filter == "token_count >= 5 and token_count <= 9"
    p2 = parse_xml_query(
        '<BooleanQuery fieldName="text">'
        '<Clause occurs="must"><TermQuery>x</TermQuery></Clause>'
        '<Clause occurs="filter"><PointRangeQuery '
        'fieldName="token_count" lowerTerm="5"/></Clause>'
        '</BooleanQuery>')
    assert p2.doc_filter == "token_count >= 5"
    assert len(p2.query.filter_) == 0  # folded out of the tree
    with pytest.raises(XmlParserError):
        parse_xml_query(
            '<BooleanQuery><Clause occurs="should"><PointRangeQuery '
            'fieldName="x" lowerTerm="1"/></Clause></BooleanQuery>')


def test_terms_query_analyzed(spark, small_index):
    s = IndexSearcher(spark, small_index)
    q = _unwrap(parse_xml_query(
        '<TermsQuery fieldName="text" minimumNumberShouldMatch="1">'
        'W000001 w000002</TermsQuery>', searcher=s).query)
    # mixed case lowercased by the standard chain; analyzed ONCE at
    # parse time (PreAnalyzed wrapper)
    assert tuple(q.should) == ("w000001", "w000002")


def test_range_query_bound_inclusivity(spark, small_index):
    s = IndexSearcher(spark, small_index)
    inc = parse_xml_query(
        '<RangeQuery fieldName="text" lowerTerm="w000001" '
        'upperTerm="w000003"/>').query
    assert isinstance(inc, MultiTermQuery) and inc.kind == "range"
    got = set(s.expand_terms(inc))
    assert {"w000001", "w000002", "w000003"} <= got
    exc = parse_xml_query(
        '<RangeQuery fieldName="text" lowerTerm="w000001" '
        'upperTerm="w000003" includeLower="false" '
        'includeUpper="false"/>').query
    got2 = set(s.expand_terms(exc))
    assert "w000001" not in got2 and "w000003" not in got2
    assert "w000002" in got2


def test_xml_matches_hand_built(spark, small_index):
    """The parsed tree scores identically to the same query built by
    hand."""
    s = IndexSearcher(spark, small_index)
    xml = ('<BooleanQuery fieldName="text">'
           '<Clause occurs="must"><TermQuery>w000002</TermQuery></Clause>'
           '<Clause occurs="should"><TermQuery>w000005</TermQuery>'
           '</Clause></BooleanQuery>')
    got = s.search(parse_xml_query(xml, searcher=s).query, k=20)
    want = s.search(BooleanQuery(must=("w000002",),
                                 should=("w000005",)), k=20)
    # hand-built uses flat string clauses; parsed uses TermQuery nodes
    assert [(d, pytest.approx(v, rel=1e-6)) for d, v in want] == got


def test_malformed_and_unknown():
    with pytest.raises(XmlParserError):
        parse_xml_query("<TermQuery>unclosed")
    with pytest.raises(XmlParserError):
        parse_xml_query("<NoSuchQuery>x</NoSuchQuery>")


def test_filter_only_boolean_matches_range(spark, small_index):
    """A boolean whose only clauses are folded PointRangeQuerys must
    match every doc in the range (reference: a filter-only boolean
    still iterates), not an empty boolean."""
    s = IndexSearcher(spark, small_index)
    p = parse_xml_query(
        '<BooleanQuery><Clause occurs="filter"><PointRangeQuery '
        'fieldName="token_count" lowerTerm="5"/></Clause>'
        '</BooleanQuery>')
    assert isinstance(p.query, MatchAllQuery)
    assert p.doc_filter == "token_count >= 5"
    n = s.search_df(p.query, k=10 ** 6,
                    doc_filter=p.doc_filter).count()
    want = (s._read_cached(s.docstore_paths)
            .filter("token_count >= 5").count())
    assert n == want > 0


def test_constant_score_field_inheritance():
    q = parse_xml_query(
        '<ConstantScoreQuery fieldName="title">'
        '<TermQuery>x</TermQuery></ConstantScoreQuery>').query
    assert _unwrap(q.query).field == "title"


def test_flt_nested_in_boolean(spark, small_index):
    """A FuzzyLikeThisQuery clause (PreAnalyzed) nests inside a
    BooleanQuery and still searches (nested PreAnalyzed stripping)."""
    from lucene_spark.fixtures.transcripts import term_string
    s = IndexSearcher(spark, small_index)
    xml = ('<BooleanQuery fieldName="text">'
           '<Clause occurs="should"><FuzzyLikeThisQuery>'
           '<Field fieldName="text">w00000a</Field>'
           '</FuzzyLikeThisQuery></Clause>'
           '<Clause occurs="should"><TermQuery>'
           + term_string(2) + '</TermQuery></Clause></BooleanQuery>')
    p = parse_xml_query(xml, searcher=s)
    assert s.search_df(p.query, k=5).count() > 0


def test_must_range_fold_keeps_shoulds_optional():
    """Folding the boolean's ONLY must clause (a PointRangeQuery) into
    doc_filter must not flip SHOULD clauses to required: the parser
    re-anchors with a zero-score MatchAll must."""
    p = parse_xml_query(
        '<BooleanQuery fieldName="text">'
        '<Clause occurs="must"><PointRangeQuery fieldName="token_count"'
        ' lowerTerm="30" upperTerm="70"/></Clause>'
        '<Clause occurs="should"><TermQuery>foo</TermQuery></Clause>'
        '</BooleanQuery>')
    assert p.doc_filter == "token_count >= 30 and token_count <= 70"
    q = p.query
    assert len(q.must) == 1 and isinstance(q.must[0], MatchAllQuery)
    assert q.must[0].boost == 0.0
    assert len(q.should) == 1


def test_must_range_fold_end_to_end(spark, small_index):
    """In-range docs WITHOUT the should term still match (score 0 from
    the anchor, bonus from the should when present)."""
    s = IndexSearcher(spark, small_index)
    lo, hi = 5, 60
    p = parse_xml_query(
        '<BooleanQuery fieldName="text">'
        f'<Clause occurs="must"><PointRangeQuery fieldName="turn_idx"'
        f' lowerTerm="{lo}" upperTerm="{hi}"/></Clause>'
        '<Clause occurs="should"><TermQuery>w000001</TermQuery>'
        '</Clause></BooleanQuery>', searcher=s)
    got = s.count_df(p.query, doc_filter=p.doc_filter).collect()[0][0]
    want = (s._read_cached(s.docstore_paths)
            .filter(f"turn_idx >= {lo} and turn_idx <= {hi}").count())
    assert got == want and want > 0


def test_flt_boost_applies(spark, small_index):
    from lucene_spark.fixtures.transcripts import term_string
    from lucene_spark.search.query import PreAnalyzed
    s = IndexSearcher(spark, small_index)
    t = term_string(1)
    xml = (f'<FuzzyLikeThisQuery boost="2.5"><Field fieldName="text">'
           f'{t}</Field></FuzzyLikeThisQuery>')
    q = parse_xml_query(xml, searcher=s).query
    inner = q.query if isinstance(q, PreAnalyzed) else q
    assert inner.boost == pytest.approx(2.5)
