"""Surround query language (queryparser/surround): parser shapes,
reference guards, and match-set parity against brute position scans.
"""

from __future__ import annotations

import numpy as np
import pytest

from lucene_spark.search.query import PhraseQuery
from lucene_spark.search.surround import (SAnd, SDist, SField, SNot, SOr,
                                          SPrefix, STerm, STrunc,
                                          SurroundParseError,
                                          parse_surround, surround_search)


def test_parse_shapes():
    assert parse_surround("3W(a, b)") == SDist(3, True,
                                               (STerm("a"), STerm("b")))
    assert parse_surround("5n(a, b, c)") == SDist(
        5, False, (STerm("a"), STerm("b"), STerm("c")))
    # infix left-assoc pairwise; default distance 1
    assert parse_surround("a w b w c") == SDist(
        1, True, (SDist(1, True, (STerm("a"), STerm("b"))), STerm("c")))
    # W binds tighter than N than NOT than AND than OR (QueryParser.jj)
    q = parse_surround("a OR b AND c NOT d 2N e W f")
    assert q == SOr((STerm("a"),
                     SAnd((STerm("b"),
                           SNot(STerm("c"),
                                SDist(2, False,
                                      (STerm("d"),
                                       SDist(1, True, (STerm("e"),
                                                       STerm("f"))))))))))
    assert parse_surround("body: abc* AND xy?z") == SField(
        "body", SAnd((SPrefix("abc"), STrunc("xy?z"))))
    # ^boost parses and is ignored; quoted words escape keywords
    assert parse_surround('"not" ^2 W "and"') == SDist(
        1, True, (STerm("not"), STerm("and")))
    assert parse_surround("OR(a, b)") == SOr((STerm("a"), STerm("b")))


def test_parse_errors():
    for src in ("", "ab*",            # MINIMUM_PREFIX_LENGTH = 3
                "a?",                 # MINIMUM_CHARS_IN_TRUNC = 3
                "W(a)",               # operators need two operands
                "NOT a",              # NOT is infix-only
                "a AND OR", "a )", "100W(a, b)"):
        with pytest.raises(SurroundParseError):
            parse_surround(src)
    # AND inside a distance operator is rejected at evaluation
    # (DistanceSubQuery.distanceSubQueryNotAllowed)
    from lucene_spark.search.surround import _to_intervals
    with pytest.raises(SurroundParseError):
        _to_intervals(parse_surround("W(a AND b, c)"), lambda p: [p])


@pytest.fixture(scope="module")
def searcher_and_tokens(spark, small_index):
    from lucene_spark.index.catalog import IndexCatalog
    from lucene_spark.kernels.tokenizer import tokenize_one
    from lucene_spark.search import IndexSearcher
    s = IndexSearcher(spark, small_index)
    pdf = (spark.read.parquet(IndexCatalog(small_index)
                              .table_path("docstore"))
           .select("doc_id", "text").toPandas())
    toks = {int(r.doc_id): tokenize_one(r.text)
            for r in pdf.itertuples(index=False)}
    return s, toks


def _brute_dist(toks, a_terms, b_terms, dist, ordered):
    """exists a-position p1, b-position p2 with the distance relation"""
    out = set()
    for d, ts in toks.items():
        pa = [i for i, t in enumerate(ts) if t in a_terms]
        pb = [i for i, t in enumerate(ts) if t in b_terms]
        for p1 in pa:
            for p2 in pb:
                diff = p2 - p1 if ordered else abs(p2 - p1)
                if 1 <= diff <= dist:
                    out.add(d)
                    break
    return out


def _probe_terms(toks):
    from collections import Counter
    c = Counter(t for ts in toks.values() for t in ts)
    return [t for t, _ in c.most_common(4)]


def test_distance_matches_brute(searcher_and_tokens):
    s, toks = searcher_and_tokens
    t1, t2, t3, _ = _probe_terms(toks)
    got = {r.doc_id for r in
           surround_search(s, f"3W({t1}, {t2})").collect()}
    assert got == _brute_dist(toks, {t1}, {t2}, 3, True)
    got = {r.doc_id for r in
           surround_search(s, f"2N({t1}, {t2})").collect()}
    assert got == _brute_dist(toks, {t1}, {t2}, 2, False)
    got = {r.doc_id for r in
           surround_search(s, f"W(OR({t1}, {t3}), {t2})").collect()}
    assert got == _brute_dist(toks, {t1, t3}, {t2}, 1, True)


def test_adjacent_w_equals_phrase(searcher_and_tokens):
    s, toks = searcher_and_tokens
    t1, t2, _, _ = _probe_terms(toks)
    got = {r.doc_id for r in
           surround_search(s, f"{t1} W {t2}").collect()}
    phrase = {d for d, _ in s.search(PhraseQuery((t1, t2)), k=10_000)}
    assert got == phrase


def test_boolean_level(searcher_and_tokens):
    s, toks = searcher_and_tokens
    t1, t2, t3, t4 = _probe_terms(toks)
    has = {t: {d for d, ts in toks.items() if t in ts}
           for t in (t1, t2, t3, t4)}
    got = {r.doc_id for r in
           surround_search(s, f"{t1} AND {t2}").collect()}
    assert got == has[t1] & has[t2]
    got = {r.doc_id for r in
           surround_search(s, f"OR({t1}, {t2}) NOT {t3}").collect()}
    assert got == (has[t1] | has[t2]) - has[t3]
    w = _brute_dist(toks, {t1}, {t2}, 2, True)
    got = {r.doc_id for r in
           surround_search(s, f"{t3} NOT 2W({t1}, {t2})").collect()}
    assert got == has[t3] - w


def test_truncation(searcher_and_tokens):
    s, toks = searcher_and_tokens
    t1 = _probe_terms(toks)[0]
    pre = t1[:3]
    got = {r.doc_id for r in surround_search(s, f"{pre}*").collect()}
    want = {d for d, ts in toks.items()
            if any(t.startswith(pre) for t in ts)}
    assert got == want
    if len(t1) >= 4:
        pat = t1[0] + "?" + t1[2:]
        got = {r.doc_id for r in surround_search(s, pat).collect()}
        import re
        rx = re.compile("^" + pat.replace("?", ".") + "$")
        want = {d for d, ts in toks.items()
                if any(rx.match(t) for t in ts)}
        assert got == want


def test_quoted_wildcards_are_literal():
    """A QUOTED token is a literal SrndTermQuery: * and ? inside
    quotes are plain characters, never truncation operators."""
    from lucene_spark.search.surround import parse_surround, STerm
    assert parse_surround('"abc*"') == STerm("abc*")
    assert parse_surround('"ab*"') == STerm("ab*")  # no length guard
    assert parse_surround('"a?c"') == STerm("a?c")


def test_distance_prefix_10_to_19():
    """'10W' is a distance operator, not a term — the 2..99 range has
    no gap at 10-19."""
    from lucene_spark.search.surround import SDist, parse_surround
    q = parse_surround("10W(aaa, bbb)")
    assert isinstance(q, SDist) and q.dist == 10 and q.ordered
    q = parse_surround("aaa 15N bbb")
    assert isinstance(q, SDist) and q.dist == 15 and not q.ordered
    q = parse_surround("99N(aaa, bbb)")
    assert q.dist == 99
    # '1W' is not a valid distance prefix (bare W/N means adjacent)
    from lucene_spark.search.surround import STerm
    assert isinstance(parse_surround('"1w"'), STerm)
