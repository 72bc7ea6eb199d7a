"""WordBreakSpellChecker analogs (suggest/.../WordBreakSpellChecker
.java): word breaks + word combinations vs an independent brute
recursion over dfs recomputed from the raw docstore text."""

import re

import pytest

from lucene_spark.fixtures.transcripts import term_string
from lucene_spark.index.catalog import IndexCatalog
from lucene_spark.search import IndexSearcher

T = [term_string(k) for k in range(30)]


@pytest.fixture(scope="module")
def env(spark, small_index):
    s = IndexSearcher(spark, small_index)
    ds = (spark.read.parquet(
        IndexCatalog(small_index).table_path("docstore"))
        .select("text").toPandas())
    df_of: dict = {}
    for t in ds["text"]:
        for w in set(re.findall("[0-9a-z]+", t.lower())):
            df_of[w] = df_of.get(w, 0) + 1
    return s, df_of


def _brute_breaks(word, df_of, max_changes, floor=1):
    out = []

    def rec(rest, parts, breaks):
        if len(rest) < 2:
            return
        valid = []
        for i in range(1, len(rest)):
            le, ri = rest[:i], rest[i:]
            if df_of.get(le, 0) >= floor:
                valid.append(i)
                if df_of.get(ri, 0) >= floor:
                    out.append(parts + [le, ri])
        if breaks + 1 > max_changes:
            return
        for i in valid:
            rec(rest[i:], parts + [rest[:i]], breaks + 1)

    rec(word, [], 1)
    rows = [(" ".join(p), len(p) - 1, max(df_of.get(x, 0) for x in p))
            for p in out]
    rows.sort(key=lambda r: (r[1], -r[2], r[0]))
    return rows


def test_break_matches_brute(spark, env):
    s, df_of = env
    word = T[1] + T[4]
    assert df_of.get(word, 0) == 0
    got = [(r["suggestion"], r["n_changes"], r["freq"])
           for r in s.word_break_suggest(word, n=8).collect()]
    assert got == _brute_breaks(word, df_of, 1)[:8]
    assert (T[1] + " " + T[4]) in [g[0] for g in got]


def test_break_multi_change(spark, env):
    s, df_of = env
    word = T[1] + T[4] + T[9]
    got = [(r["suggestion"], r["n_changes"], r["freq"])
           for r in s.word_break_suggest(word, n=10,
                                         max_changes=2).collect()]
    assert got == _brute_breaks(word, df_of, 2)[:10]
    assert (f"{T[1]} {T[4]} {T[9]}", 2,
            max(df_of[T[1]], df_of[T[4]], df_of[T[9]])) in got


def test_break_modes(spark, env):
    s, df_of = env
    # a word already in the index: not_in_index yields nothing
    assert s.word_break_suggest(T[1] + T[4], n=5).count() > 0
    assert s.word_break_suggest(T[1], n=5).count() == 0
    # more_popular: parts must reach the word's own df — an absent
    # word floors at 1 (reference origFreq==0 -> 1)
    got = s.word_break_suggest(T[1] + T[4], n=5,
                               mode="more_popular").collect()
    assert all(r["freq"] >= 1 for r in got)


def test_combine_matches_dictionary(spark, env):
    s, df_of = env
    base = T[2]
    assert len(base) >= 4
    a, b = base[:3], base[3:]
    got = [(r["suggestion"], r["n_changes"], r["freq"])
           for r in s.word_combine_suggest([a, b, "zz"], n=5).collect()]
    assert (base, 1, df_of[base]) in got
    # runs never exceed max_changes+1 terms
    assert all(g[1] <= 1 for g in got)
    three = s.word_combine_suggest([a, b, "zz"], n=5,
                                   max_changes=2).collect()
    assert all(r["n_changes"] <= 2 for r in three)


def test_combine_not_in_index_gate(spark, env):
    s, df_of = env
    # both members in the index -> the not_in_index mode rejects the run
    got = [r["suggestion"] for r in
           s.word_combine_suggest([T[1], T[4]], n=5).collect()]
    assert got == []
    always = s.word_combine_suggest([T[1], T[4]], n=5, mode="always")
    # concatenation is not a dictionary word, so still empty via df
    assert always.count() == 0
