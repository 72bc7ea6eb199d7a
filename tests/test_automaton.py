"""True code-point automaton for Lucene RegExp (kernels/automaton.py):
closes the round-4 documented deviation — non-tail and repeated
complement/intersection now compile to a real DFA (RegExp.java:
toAutomaton + Operations.java determinize/complement/intersection)
instead of raising, and RegexpQuery expansion falls back to a
vectorized Arrow-batch DFA filter when the Java-regex translation
can't express the pattern.

Correctness is checked three independent ways: (1) agreement with the
``translate``/``re`` path on the shared subset, (2) an EXHAUSTIVE
comparison against a slow denotational matcher over every string of a
small alphabet for patterns exercising ~/& in every position, and
(3) end-to-end through the searcher's expand_terms fallback.
"""

import itertools
import re

import pytest

from lucene_spark.kernels.automaton import (CompiledDfa, compile_pattern,
                                            match_terms)
from lucene_spark.kernels.regexp import (LuceneRegexpError, parse,
                                         translate)


# ---------------------------------------------------------------------------
# slow denotational reference: language membership by structural recursion
# (independent of both the regex translation and the NFA construction)
# ---------------------------------------------------------------------------

def _splits(s):
    return [(s[:i], s[i:]) for i in range(len(s) + 1)]


def _matches(node, s) -> bool:
    kind = node[0]
    if kind == "char":
        return s == node[1]
    if kind == "string":
        return s == node[1]
    if kind == "any":
        return len(s) == 1
    if kind == "anystring":
        return True
    if kind == "nothing":
        return False
    if kind == "class":
        if len(s) != 1:
            return False
        return re.fullmatch(node[1], s) is not None
    if kind == "interval":
        return s.isdigit() and node[1] <= int(s) <= node[2]
    if kind == "union":
        return _matches(node[1], s) or _matches(node[2], s)
    if kind == "inter":
        return _matches(node[1], s) and _matches(node[2], s)
    if kind == "comp":
        return not _matches(node[1], s)
    if kind == "concat":
        parts = node[1]
        if len(parts) == 1:
            return _matches(parts[0], s)
        head, rest = parts[0], ("concat", parts[1:])
        return any(_matches(head, a) and _matches(rest, b)
                   for a, b in _splits(s))
    if kind == "repeat":
        inner, spec = node[1], node[2]
        if spec == "?":
            return s == "" or _matches(inner, s)
        if spec in ("*", "+"):
            if s == "":
                return spec == "*"
            # s = non-empty prefix in L(inner) + remainder in inner*
            return any(a and _matches(inner, a)
                       and _matches(("repeat", inner, "*"), b)
                       for a, b in _splits(s))
        body = spec[1:-1]
        if "," in body:
            lo_s, hi_s = body.split(",", 1)
            lo, hi = int(lo_s), (int(hi_s) if hi_s else None)
        else:
            lo = hi = int(body)
        if lo > 0:
            return any(_matches(inner, a)
                       and _matches(("repeat", inner,
                                     "{%d,%s}" % (lo - 1,
                                                  "" if hi is None
                                                  else hi - 1)), b)
                       for a, b in _splits(s))
        if hi is None:
            return _matches(("repeat", inner, "*"), s)
        if hi == 0:
            return s == ""
        return s == "" or any(
            a and _matches(inner, a)
            and _matches(("repeat", inner, "{0,%d}" % (hi - 1)), b)
            for a, b in _splits(s))
    raise AssertionError(kind)


EXHAUSTIVE_PATTERNS = [
    # ~ and & in every position the regex translation rejects
    "(a&b)c", "(ab&a.)c", "([ab]*&.*a)b", "c(a&[ab])c",
    "(~(ab))c", "a(~(b))c", "(~(a))(~(b))",
    "(~(ab))*", "(a&[ab])+", "(~(a)){2}", "(~(ab)){1,2}",
    # plus tail shapes that must agree with the old path
    "a~(bc)", "ab&.*b", "~(abc)", "[ab]~([ab])",
    # nesting
    "((a&[ab])|(~(bb)))c", "~((a&[ab])c)",
]


@pytest.mark.parametrize("pat", EXHAUSTIVE_PATTERNS)
def test_exhaustive_small_alphabet(pat):
    ast = parse(pat)
    dfa = compile_pattern(pat)
    strings = [""]
    for n in range(1, 5):
        strings += ["".join(t) for t in itertools.product("abc", repeat=n)]
    got = dfa.accepts(strings)
    for s, g in zip(strings, got):
        assert bool(g) == _matches(ast, s), (pat, s)


SHARED_PATTERNS = [
    "s(low|ort)", "ab?c+", "[a-c]{2,3}", "a[^b]c", "<5-17>", '"lit.eral"',
    "@", "#", "(a|b)*abb", "x\\.y", "[\\d]+", "s.*&.*t", "s~(can)",
    "f~(oo)", "[a-z]+&.*o.*", "a{2,}", "(ab){2}c?", "[x-z\\d]*",
]


def test_agrees_with_translate_on_shared_subset():
    terms = ["slow", "sort", "scan", "scant", "abc", "abbc", "ac", "accc",
             "aa", "abab", "5", "05", "0017", "18", "lit.eral", "litXeral",
             "", "x.y", "xzy", "123", "12a", "abb", "ababb", "sxt", "axc",
             "foo", "fa", "f", "abababc", "xyz123", "yy"]
    for pat in SHARED_PATTERNS:
        rx = re.compile("^(?:" + translate(pat) + ")$")
        got = match_terms(pat, terms)
        for t, g in zip(terms, got):
            assert bool(g) == (rx.match(t) is not None), (pat, t)


def test_interval_brute():
    dfa = compile_pattern("<38-4002>")
    strs = [str(n) for n in range(0, 4200)] + \
           ["0" + str(n) for n in range(0, 4200)] + ["x", "", "00"]
    got = dfa.accepts(strs)
    for s, g in zip(strs, got):
        want = s.isdigit() and 38 <= int(s) <= 4002
        assert bool(g) == want, s


def test_state_cap_raises():
    # exponential blowup pattern: (a|aa){30} stays finite but a
    # classic (.*a.{25}) complement forces >10k states when
    # determinized — assert the documented guard trips, not a hang
    with pytest.raises(LuceneRegexpError):
        compile_pattern("~(.*a" + "." * 25 + ")&.*")


def test_batch_matches_scalar_and_empty():
    dfa = compile_pattern("(a&[ab])c")
    assert dfa.accepts([]).shape == (0,)
    assert list(dfa.accepts(["ac", "bc", "c", ""])) == [True, False,
                                                        False, False]
    # non-BMP code points survive the utf-32 matrix round-trip
    d2 = compile_pattern("\U0001F600+x")
    assert list(d2.accepts(["\U0001F600x", "\U0001F600\U0001F600x",
                            "x", "\U0001F600"])) == [True, True,
                                                     False, False]


def test_expand_terms_dfa_fallback(spark, small_index):
    from lucene_spark.search import IndexSearcher
    from lucene_spark.search.query import MultiTermQuery
    s = IndexSearcher(spark, small_index)
    vocab = set(s._sorted_terms_for("text"))
    # non-tail intersection: (w-prefix AND 1-suffix) then nothing —
    # same language as the tail form, but forced down the DFA path
    with pytest.raises(LuceneRegexpError):
        translate("(w.*&.*1)()")
    got = set(s.expand_terms(MultiTermQuery("regexp", "(w.*&.*1)()",
                                            max_expansions=10000)))
    want = {t for t in vocab if t.startswith("w") and t.endswith("1")}
    assert got == want and got
    # non-tail complement concatenated with a suffix
    got2 = set(s.expand_terms(MultiTermQuery("regexp", "(~(w00000))1",
                                             max_expansions=10000)))
    want2 = {t for t in vocab
             if t.endswith("1") and t[:-1] != "w00000"}
    assert got2 == want2 and got2


def test_percolate_dfa_fallback():
    from lucene_spark.ops.percolate import doc_match
    from lucene_spark.search.query import MultiTermQuery
    toks = ["sort", "fast"]
    q = MultiTermQuery("regexp", "(s.*&.*r)t")
    assert doc_match(q, toks, set(toks)) is True
    q2 = MultiTermQuery("regexp", "(~(sor))t")
    assert doc_match(q2, toks, set(toks)) is True    # "fast" = fas+t
    q3 = MultiTermQuery("regexp", "(~(sor|fas))t")
    assert doc_match(q3, toks, set(toks)) is False


def test_repeat_min_greater_than_max_is_empty_language():
    """{n,m} with n > m matches NOTHING (Operations.repeat(min > max)
    yields the empty automaton; Java regex throws)."""
    from lucene_spark.kernels.automaton import match_terms
    assert list(match_terms("a{3,2}", ["aaa", "aa", ""])) == \
        [False, False, False]


def test_null_terms_never_match():
    from lucene_spark.kernels.automaton import match_terms
    assert list(match_terms("a+", ["aa", None, ""])) == \
        [True, False, False]
