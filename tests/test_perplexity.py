"""CCNet-style trigram stupid-backoff perplexity scoring
(ops/perplexity.py) vs an independent brute-force model."""

import math
import re

import pytest

from lucene_spark.ops.perplexity import (LM_ALPHA, lm_perplexity,
                                         perplexity_buckets,
                                         train_trigram_lm)

TOK = re.compile(r"[0-9a-z]+")

TRAIN = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown cat sleeps"),
    (2, "a quick brown fox runs fast and the dog sleeps"),
    (3, "the lazy dog jumps"),
]
SCORE = TRAIN + [
    (10, "the quick brown fox sleeps"),       # seen pieces, new trigrams
    (11, "purple elephants compute quickly"),  # all OOV
    (12, "fox the quick"),                     # unseen orders, seen words
    (13, ""),                                  # empty
]


def _brute_lm(train):
    uni, bi, tri = {}, {}, {}
    tot = 0
    for _, t in train:
        toks = TOK.findall(t.lower())
        tot += len(toks)
        for i, w in enumerate(toks):
            uni[w] = uni.get(w, 0) + 1
            if i >= 1:
                bi[(toks[i - 1], w)] = bi.get((toks[i - 1], w), 0) + 1
            if i >= 2:
                k = (toks[i - 2] + " " + toks[i - 1], w)
                tri[k] = tri.get(k, 0) + 1
    return uni, bi, tri, tot


def _brute_ppl(text, lm, a=LM_ALPHA):
    uni, bi, tri, tot = lm
    toks = TOK.findall(text.lower())
    if not toks:
        return 0, None
    lps = []
    for i, w in enumerate(toks):
        p1 = uni.get(w, 0) / tot if uni.get(w, 0) else 1.0 / tot
        if i == 0:
            s = p1
        else:
            b = bi.get((toks[i - 1], w))
            p2 = (b / uni[toks[i - 1]]) if b else None
            if i == 1:
                s = p2 if p2 is not None else a * p1
            else:
                t3 = tri.get((toks[i - 2] + " " + toks[i - 1], w))
                if t3:
                    s = t3 / bi[(toks[i - 2], toks[i - 1])]
                elif p2 is not None:
                    s = a * p2
                else:
                    s = a * a * p1
        lps.append(math.log(s))
    return len(toks), math.exp(-sum(lps) / len(lps))


@pytest.fixture(scope="module")
def frames(spark):
    train = spark.createDataFrame(TRAIN, "doc_id long, text string")
    score = spark.createDataFrame(SCORE, "doc_id long, text string")
    return train, score


def test_perplexity_matches_brute(frames):
    train, score = frames
    lm = train_trigram_lm(train)
    got = {r["doc_id"]: (r["n_toks"], r["ppl"])
           for r in lm_perplexity(score, lm).collect()}
    blm = _brute_lm(TRAIN)
    assert set(got) == {d for d, _ in SCORE}
    for d, t in SCORE:
        n, ppl = _brute_ppl(t, blm)
        assert got[d][0] == n, d
        if ppl is None:
            assert got[d][1] is None
        else:
            assert got[d][1] == pytest.approx(ppl, rel=1e-12), (d, t)
    # training docs self-score lower (better) than the all-OOV doc
    assert got[0][1] < got[11][1]


def test_buckets(frames):
    train, score = frames
    lm = train_trigram_lm(train)
    scored = lm_perplexity(score, lm)
    b = {r["doc_id"]: r["bucket"]
         for r in perplexity_buckets(scored).collect()}
    assert set(b.values()) <= {1, 2, 3}
    # ntile follows perplexity order: the all-OOV doc lands in the tail
    ppl = {r["doc_id"]: r["ppl"] for r in scored.collect()}
    order = sorted((d for d in ppl if ppl[d] is not None),
                   key=lambda d: (ppl[d], d)) + [13]  # NULL sorts last
    n, k = len(order), 3
    sizes = [n // k + (1 if i < n % k else 0) for i in range(k)]
    want, rank = {}, 0
    for i, sz in enumerate(sizes):
        for _ in range(sz):
            want[order[rank]] = i + 1
            rank += 1
    assert b == want
    assert b[11] == 3 and b[13] == 3
