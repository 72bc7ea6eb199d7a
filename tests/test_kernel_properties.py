"""Property-based kernel contracts (RandomPostingsTester analog,
tests/index/BasePostingsFormatTestCase.java:104-190): random posting
lists -> encode -> every kernel execution (pruned and exhaustive) must
equal a naive numpy evaluation. Pure-kernel tests — no Spark session."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_spark.kernels import codec
from lucene_spark.kernels.bm25 import BM25Scorer
from lucene_spark.kernels.smallfloat import int_to_byte4
from lucene_spark.search.kernels import (TermChunk, and_topk, boolean_topk,
                                         or_topk, term_topk, topk_select)

N_DOCS = 700


def _mk_corpus(rng):
    lengths = rng.integers(1, 120, N_DOCS)
    norms = np.asarray(int_to_byte4(lengths.astype(np.int64)), np.uint8)
    return lengths, norms


def _mk_chunk(rng, scorer, df):
    docs = np.sort(rng.choice(N_DOCS, size=df, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 9, df).astype(np.int64)
    return docs, tfs


def _chunk_of(docs, tfs, norms, scorer):
    blocks = codec.encode_chunk(docs, tfs, norms[docs],
                                [np.arange(t) for t in tfs])
    bms = [float(scorer.score(np.array(b["imp_freqs"]),
                              np.array(b["imp_norms"])).max())
           if b["imp_freqs"] else 0.0 for b in blocks]
    return TermChunk(blocks, bms)


@settings(max_examples=20, deadline=None)
@given(st.integers(0, 2**31 - 1), st.integers(1, 600), st.integers(1, 20))
def test_term_topk_pruned_equals_naive(seed, df, k):
    rng = np.random.default_rng(seed)
    lengths, norms = _mk_corpus(rng)
    sc = BM25Scorer(df, N_DOCS, int(lengths.sum()))
    docs, tfs = _mk_chunk(rng, sc, df)
    ch = _chunk_of(docs, tfs, norms, sc)
    want = topk_select(docs, sc.score(tfs, norms[docs]), k)
    for pruned in (True, False):
        got = term_topk(ch, sc, norms, 0, k, pruned=pruned)
        np.testing.assert_array_equal(got[0], want[0])
        np.testing.assert_array_equal(got[1], want[1])


@settings(max_examples=15, deadline=None)
@given(st.integers(0, 2**31 - 1), st.integers(2, 4), st.integers(1, 15))
def test_or_and_topk_pruned_equals_naive(seed, m, k):
    rng = np.random.default_rng(seed)
    lengths, norms = _mk_corpus(rng)
    sttf = int(lengths.sum())
    chunks, scorers, per = [], [], []
    for _ in range(m):
        df = int(rng.integers(1, 500))
        sc = BM25Scorer(df, N_DOCS, sttf)
        docs, tfs = _mk_chunk(rng, sc, df)
        chunks.append(_chunk_of(docs, tfs, norms, sc))
        scorers.append(sc)
        s = np.zeros(N_DOCS)
        s[docs] = sc.score(tfs, norms[docs]).astype(np.float64)
        per.append((docs, s))
    # OR naive
    tot = np.sum([s for _, s in per], axis=0)
    mask_or = np.zeros(N_DOCS, bool)
    for d, _ in per:
        mask_or[d] = True
    idx = np.flatnonzero(mask_or)
    want_or = topk_select(idx, tot[idx].astype(np.float32), k)
    for pruned in (True, False):
        got = or_topk(chunks, scorers, norms, 0, k, pruned=pruned)
        np.testing.assert_array_equal(got[0], want_or[0])
        np.testing.assert_array_equal(got[1], want_or[1])
    # AND naive
    mask_and = np.ones(N_DOCS, bool)
    for d, _ in per:
        mm = np.zeros(N_DOCS, bool)
        mm[d] = True
        mask_and &= mm
    idx = np.flatnonzero(mask_and)
    want_and = topk_select(idx, tot[idx].astype(np.float32), k)
    for pruned in (True, False):
        got = and_topk(chunks, scorers, norms, 0, k, pruned=pruned)
        np.testing.assert_array_equal(got[0], want_and[0])
        np.testing.assert_array_equal(got[1], want_and[1])


@settings(max_examples=10, deadline=None)
@given(st.integers(0, 2**31 - 1))
def test_boolean_msm_naive(seed):
    rng = np.random.default_rng(seed)
    lengths, norms = _mk_corpus(rng)
    sttf = int(lengths.sum())
    mk = []
    for _ in range(4):
        df = int(rng.integers(50, 400))
        sc = BM25Scorer(df, N_DOCS, sttf)
        docs, tfs = _mk_chunk(rng, sc, df)
        mk.append((_chunk_of(docs, tfs, norms, sc), sc, docs, tfs))
    must, should = mk[:1], mk[1:3]
    must_not = mk[3:]
    got = boolean_topk([m[0] for m in must], [s[0] for s in should],
                       [n[0] for n in must_not], [],
                       [m[1] for m in must], [s[1] for s in should],
                       norms, 0, 20, min_should_match=1)
    # naive
    tot = np.zeros(N_DOCS)
    m_mask = np.zeros(N_DOCS, bool)
    m_mask[must[0][2]] = True
    tmp = np.zeros(N_DOCS)
    tmp[must[0][2]] = must[0][1].score(must[0][3], norms[must[0][2]]).astype(np.float64)
    tot += tmp
    n_sh = np.zeros(N_DOCS, int)
    for ch, sc, docs, tfs in should:
        tmp = np.zeros(N_DOCS)
        tmp[docs] = sc.score(tfs, norms[docs]).astype(np.float64)
        tot += tmp
        n_sh[docs] += 1
    dead = np.zeros(N_DOCS, bool)
    dead[must_not[0][2]] = True
    keep = m_mask & ~dead & (n_sh >= 1)
    idx = np.flatnonzero(keep)
    want = topk_select(idx, tot[idx].astype(np.float32), 20)
    np.testing.assert_array_equal(got[0], want[0])
    np.testing.assert_array_equal(got[1], want[1])
