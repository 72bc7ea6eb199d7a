"""Lucene RegExp syntax translation (round-4 verdict item #9:
RegexpQuery patterns are Lucene RegExp — util/automaton/RegExp.java —
not Java regex; complement ~, intersection &, any-string @, empty #,
quoted literals, and numeric intervals <m-n> now translate to
equivalent Java/Python regexes; non-tail complement/intersection and
repeated complement raise a documented LuceneRegexpError).
"""

import re

import pytest

from lucene_spark.kernels.regexp import LuceneRegexpError, translate


def _full(pat, s):
    return re.fullmatch(translate(pat), s) is not None


def test_core_subset_unchanged():
    assert _full("s(low|ort)", "slow")
    assert _full("s(low|ort)", "sort")
    assert not _full("s(low|ort)", "scan")
    assert _full("ab*c", "ac") and _full("ab*c", "abbbc")
    assert _full("a.c", "abc") and not _full("a.c", "ac")
    assert _full("[a-c]+", "cab") and not _full("[a-c]+", "cad")
    assert _full("a{2,3}", "aa") and not _full("a{2,3}", "a")


def test_intersection():
    assert _full("s.*&.*t", "sort")
    assert not _full("s.*&.*t", "slow")
    assert _full("ab(c&c)", "abc")       # tail position after a prefix
    assert _full("[a-z]+&.*o.*", "slow")
    assert not _full("[a-z]+&.*o.*", "scan")


def test_complement():
    # ~ binds to ONE charclass expression (RegExp.java parseComplExp),
    # so the practical form is ~(group), legal only in tail position
    assert _full("~(foo)", "bar")
    assert _full("~(foo)", "")
    assert not _full("~(foo)", "foo")
    assert _full("f~(oo)", "fa") and _full("f~(oo)", "f")
    assert not _full("f~(oo)", "foo")


def test_anystring_nothing_quoted():
    assert _full("@", "anything") and _full("a@", "abc")
    assert not _full("#", "") and not _full("#", "x")
    assert _full('"a.c"', "a.c") and not _full('"a.c"', "abc")


@pytest.mark.parametrize("lo,hi", [(0, 0), (5, 17), (7, 7), (90, 110),
                                   (1, 1000), (250, 255), (38, 4002)])
def test_numeric_interval_brute(lo, hi):
    rx = re.compile(translate(f"<{lo}-{hi}>"))
    for n in range(0, 4200):
        for s in (str(n), "0" + str(n)):
            assert (rx.fullmatch(s) is not None) == (lo <= n <= hi), s
    assert rx.fullmatch("x") is None


def test_reversed_interval_bounds_swap():
    assert _full("<17-5>", "9")  # RegExp.java swaps reversed bounds


def test_unsupported_shapes_raise():
    for bad in ["(a&b)c", "~foo", "(~(a))*", "(a&b)+"]:
        with pytest.raises(LuceneRegexpError):
            translate(bad)


def test_regexp_query_uses_lucene_syntax(spark, small_index):
    from lucene_spark.search import IndexSearcher
    from lucene_spark.search.query import MultiTermQuery
    s = IndexSearcher(spark, small_index)
    vocab = set(s._sorted_terms_for("text"))
    got = set(s.expand_terms(MultiTermQuery("regexp", "w.*&.*1",
                                            max_expansions=10000)))
    want = {t for t in vocab if t.startswith("w") and t.endswith("1")}
    assert got == want and got
    got2 = set(s.expand_terms(MultiTermQuery("regexp", "w~(000001)",
                                             max_expansions=10000)))
    want2 = {t for t in vocab
             if t.startswith("w") and t != "w000001"}
    assert got2 == want2
    # numeric interval against the corpus's numeric token
    got3 = set(s.expand_terms(MultiTermQuery("regexp", "<99999-100001>",
                                             max_expansions=10000)))
    assert got3 == {t for t in vocab
                    if t.isdigit() and 99999 <= int(t) <= 100001}
    assert got3


def test_percolate_regexp_lucene_syntax():
    from lucene_spark.ops.percolate import doc_match
    from lucene_spark.search.query import MultiTermQuery
    toks = ["sort", "fast"]
    q = MultiTermQuery("regexp", "s.*&.*t")
    assert doc_match(q, toks, set(toks)) is True
    q2 = MultiTermQuery("regexp", "f~(ast)")
    assert doc_match(q2, toks, set(toks)) is False
