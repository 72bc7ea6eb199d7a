"""Trigram substring search ('ngram' chain + search/substring.py) and
the HighFreqTerms diagnostic.

Reference parity targets:
- NGramTokenFilter.java (analysis/common/.../ngram/NGramTokenFilter
  .java): every 3-gram of each token with minGram=maxGram=3,
  preserveOriginal=true (tokens shorter than 3 survive as themselves).
- WildcardQuery('*pat*') over AutomatonTermsEnum is the reference's
  substring surface; substring_search reproduces its MATCHES with the
  trigram-phrase prune + stored-field verify (and dictionary-exact
  short patterns).
- HighFreqTerms.java (misc/src/java/org/apache/lucene/misc/
  HighFreqTerms.java): top-n terms by docFreq / totalTermFreq.
"""

import numpy as np
import pandas as pd
import pytest

from lucene_spark.kernels.ngram import ngram_lists, ngram_one
from lucene_spark.kernels.tokenizer import (analyze_one, analyze_series,
                                            tokenize_one)
from lucene_spark.search.query import TermQuery
from lucene_spark.search.substring import substring_search


def test_ngram_semantics():
    # keepLongTerm: preserveOriginal emits the original AFTER its
    # grams for tokens longer than maxGram (NGramTokenFilter.java
    # :141-151) — whole-token TermQuery stays exact on an ngram field
    assert ngram_one("merge") == ["mer", "erg", "rge", "merge"]
    assert ngram_one("abc") == ["abc"]
    # shorter than minGram: keepShortTerm keeps the token
    assert ngram_one("ab") == ["ab"]
    assert ngram_one("a") == ["a"]
    assert ngram_one("") == []
    assert ngram_one("Scan Merge") == ["sca", "can", "scan",
                                       "mer", "erg", "rge", "merge"]


def test_ngram_series_equals_per_row():
    texts = pd.Series(["Merging sorted runs", "", "x", "ab cd efgh",
                       "internationalization"])
    got = analyze_series(texts, "ngram")
    for raw, toks in zip(texts, got):
        assert toks == analyze_one(raw, "ngram")
    from lucene_spark.kernels.tokenizer import tokenize_series
    assert [list(x) for x in ngram_lists(tokenize_series(texts))] == \
        [ngram_one(t) for t in texts]


TEXTS = [
    "the merge policy merges adjacent segments",      # 0
    "merging sorted runs into larger segments",       # 1
    "vector search with approximate neighbors",       # 2
    "a vectorized kernel scores the postings",        # 3
    "internationalization of the tokenizer pipeline", # 4
    "sorted tables join on hashed keys",              # 5
    "mer ergel bridge trap",                          # 6 gram-boundary FP
    "qq zz ab short tokens only",                     # 7
    "aaaaa abab bell",                                # 8 repeated grams
]


def _brute(pat):
    pat = pat.lower()
    return {i for i, t in enumerate(TEXTS)
            if any(pat in tok for tok in tokenize_one(t))}


@pytest.fixture(scope="module")
def ngram_index(spark, tmp_path_factory):
    from lucene_spark.index import build_index
    from lucene_spark.search import IndexSearcher
    rows = [(f"c{i:04d}", 0, "user", t, "none")
            for i, t in enumerate(TEXTS)]
    src = (spark.createDataFrame(rows,
                                 "conv_id string, turn_idx int, role string, "
                                 "text string, tool string")
           .selectExpr("*", "timestamp('2026-01-01') as ts"))
    out = str(tmp_path_factory.mktemp("ngram") / "idx")
    build_index(spark, src, out, num_buckets=2,
                analyzers={"text": "ngram"})
    return IndexSearcher(spark, out)


def _got(searcher, pat):
    return {r["doc_id"] for r in substring_search(searcher, pat).collect()}


def test_substring_long_patterns(ngram_index):
    for pat in ("merg", "merge", "merging", "sorted", "ation",
                "ernationaliz", "segment"):
        assert _got(ngram_index, pat) == _brute(pat), pat


def test_substring_short_patterns_exact_via_dictionary(ngram_index):
    # len <= 3: wildcard over the trigram dictionary, no verify pass
    for pat in ("mer", "ge", "q", "ab", "ion", "x"):
        assert _got(ngram_index, pat) == _brute(pat), pat


def test_substring_gram_boundary_false_positive_rejected(ngram_index):
    # doc 6: 'mer ergel' puts the grams mer,erg,rge consecutively in
    # the stream (the 3-char token emits no preserved original, so
    # nothing separates it from the next token's grams) WITHOUT any
    # token containing 'merge' — the phrase prune admits it, the
    # stored-field verify must reject it
    assert 6 not in _got(ngram_index, "merge")
    # and the candidate really was a phrase match (the prune fired):
    from lucene_spark.search.query import PhraseQuery, PreAnalyzed
    cand = {r["doc_id"] for r in ngram_index.matches_df(
        PreAnalyzed(PhraseQuery(("mer", "erg", "rge")))).collect()}
    assert 6 in cand


def test_ngram_whole_token_termquery_exact(ngram_index):
    # keepLongTerm makes whole-token lookups exact: 'segments' is an
    # index term (docs 0, 1), and analyze_term routes it through the
    # chain's lowercase-only dictionary-level path
    got = {d for d, _ in ngram_index.search(TermQuery("Segments"), k=10)}
    assert got == {0, 1}


def test_substring_repeated_grams(ngram_index):
    # patterns whose trigram sequence repeats a gram ('aaaa' -> aaa,
    # aaa) must still phrase-match correctly; 'abab' -> aba, bab
    for pat in ("aaaa", "aaaaa", "abab", "baba"):
        assert _got(ngram_index, pat) == _brute(pat), pat


def test_substring_no_match_and_case(ngram_index):
    assert _got(ngram_index, "zzqxv") == set()
    assert _got(ngram_index, "MERGE") == _brute("merge")


def test_substring_rejects_non_token_patterns(ngram_index):
    for bad in ("two words", "", "a-b"):
        with pytest.raises(ValueError):
            substring_search(ngram_index, bad)


def test_substring_requires_ngram_chain(spark, tmp_path_factory):
    from lucene_spark.index import build_index
    from lucene_spark.search import IndexSearcher
    rows = [("c0", 0, "user", "plain text field", "none")]
    src = (spark.createDataFrame(rows,
                                 "conv_id string, turn_idx int, role string, "
                                 "text string, tool string")
           .selectExpr("*", "timestamp('2026-01-01') as ts"))
    out = str(tmp_path_factory.mktemp("plain") / "idx")
    build_index(spark, src, out, num_buckets=1)
    with pytest.raises(ValueError):
        substring_search(IndexSearcher(spark, out), "text")


def test_high_freq_terms(spark, tmp_path_factory):
    from collections import Counter
    from lucene_spark.index import build_index
    from lucene_spark.search import IndexSearcher
    rows = [(f"c{i:04d}", 0, "user", t, "none")
            for i, t in enumerate(TEXTS)]
    src = (spark.createDataFrame(rows,
                                 "conv_id string, turn_idx int, role string, "
                                 "text string, tool string")
           .selectExpr("*", "timestamp('2026-01-01') as ts"))
    out = str(tmp_path_factory.mktemp("hft") / "idx")
    build_index(spark, src, out, num_buckets=2)
    s = IndexSearcher(spark, out)
    df_c, ttf_c = Counter(), Counter()
    for t in TEXTS:
        toks = tokenize_one(t)
        ttf_c.update(toks)
        df_c.update(set(toks))
    for by, cnt in (("df", df_c), ("ttf", ttf_c)):
        got = [(r["term"], r[by])
               for r in s.high_freq_terms(5, by=by).collect()]
        want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
        assert got == want, by
    with pytest.raises(ValueError):
        s.high_freq_terms(5, by="freq")


def test_substring_fuzz_many_patterns(ngram_index):
    """One built index, many patterns: every substring family the
    operator distinguishes (1..2 dictionary-exact, 3 exact TermQuery,
    >3 phrase+verify), derived from real corpus tokens plus
    mutations, each checked against the tokenizer-level brute."""
    import itertools
    vocab = sorted({t for txt in TEXTS for t in tokenize_one(txt)})
    pats = set()
    for tok in vocab[::3]:
        for ln in (1, 2, 3, 4, 5, len(tok)):
            if ln <= len(tok):
                pats.add(tok[:ln])
                pats.add(tok[-ln:])
                mid = max(0, (len(tok) - ln) // 2)
                pats.add(tok[mid:mid + ln])
        # mutated (likely-absent) variants exercise the negative path
        pats.add(tok[:3] + "zq")
        pats.add("zq" + tok[-2:])
    checked = 0
    for pat in sorted(pats):
        if tokenize_one(pat) != [pat]:
            continue
        assert _got(ngram_index, pat) == _brute(pat), pat
        checked += 1
    assert checked >= 40


def test_substring_respects_deletes(spark, tmp_path_factory):
    """Deleted docs drop out of every substring path (the candidate
    stream is live-masked; the verify join must not resurrect them)."""
    from lucene_spark.index import build_index
    from lucene_spark.index.deletes import delete_docs
    from lucene_spark.search import IndexSearcher
    rows = [(f"c{i:04d}", 0, "user", t, "none")
            for i, t in enumerate(TEXTS)]
    src = (spark.createDataFrame(rows,
                                 "conv_id string, turn_idx int, role string, "
                                 "text string, tool string")
           .selectExpr("*", "timestamp('2026-01-01') as ts"))
    out = str(tmp_path_factory.mktemp("ngram_del") / "idx")
    build_index(spark, src, out, num_buckets=2,
                analyzers={"text": "ngram"})
    delete_docs(spark, out, "doc_id = 0")
    s = IndexSearcher(spark, out)
    for pat in ("merge", "mer", "ge", "sorted"):
        got = {r["doc_id"] for r in substring_search(s, pat).collect()}
        assert got == _brute(pat) - {0}, pat
