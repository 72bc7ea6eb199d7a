"""Scale-shape guard for the vectorized position kernels: tens of
thousands of candidate docs in one bucket (the shape that made the old
per-candidate Python loops a scale hazard) must stay correct — verified
against the independent per-doc oracles on a sample, with exact totals.
"""

import numpy as np

from lucene_spark.kernels import codec
from lucene_spark.search.kernels import (TermChunk, min_span_freqs,
                                         phrase_freqs, sloppy_freqs)
from lucene_spark.search.oracle import BruteForceOracle


def _make_corpus(n_docs=20_000, seed=5):
    """Every doc contains both 'a' and 'b' => every doc is a phrase
    candidate; positions drawn so exact/sloppy/unordered all vary."""
    rng = np.random.default_rng(seed)
    vocab = np.array(["a", "b", "x", "y", "z"])
    probs = np.array([0.25, 0.25, 0.2, 0.15, 0.15])
    docs = []
    for _ in range(n_docs):
        n = int(rng.integers(4, 30))
        toks = vocab[rng.choice(len(vocab), size=n, p=probs)].tolist()
        # force both terms present (at distinct positions)
        i_a = int(rng.integers(0, n))
        toks[i_a] = "a"
        toks[(i_a + 1 + int(rng.integers(0, n - 1))) % n] = "b"
        docs.append(toks)
    return docs


def _chunks(corpus, terms):
    out = []
    for term in terms:
        ds, tfs, poss = [], [], []
        for d, toks in enumerate(corpus):
            pl = [i for i, t in enumerate(toks) if t == term]
            if pl:
                ds.append(d)
                tfs.append(len(pl))
                poss.append(pl)
        blocks = codec.encode_chunk(np.array(ds), np.array(tfs),
                                    np.ones(len(ds)), poss)
        out.append(TermChunk(blocks, [0.0] * len(blocks)))
    return out


CORPUS = _make_corpus()
CHUNKS = _chunks(CORPUS, ("a", "b"))


def test_exact_phrase_at_20k_candidates():
    docs, freqs = phrase_freqs(CHUNKS, pruned=True, slop=0)
    got = dict(zip(docs.tolist(), freqs.tolist()))
    # exact totals vs per-doc brute force
    want_total = 0
    for d in range(len(CORPUS)):
        f = BruteForceOracle._phrase_freq(CORPUS[d], ["a", "b"])
        want_total += f
        if d % 997 == 0:  # sampled exact-doc check
            assert got.get(d, 0) == f, d
    assert sum(freqs.tolist()) == want_total
    assert len(got) > 5000  # the shape is genuinely dense


def test_sloppy_at_20k_candidates():
    docs, freqs = sloppy_freqs(CHUNKS, slop=2, pruned=True)
    got = dict(zip(docs.tolist(), freqs.tolist()))
    total = np.float64(0)
    want_total = np.float64(0)
    for d in range(len(CORPUS)):
        f = BruteForceOracle._sloppy_freq_true(CORPUS[d], ["a", "b"], 2)
        want_total += f
        if d % 997 == 0:
            assert got.get(d, np.float32(0)) == np.float32(f), d
    total = np.sum(np.asarray(freqs, dtype=np.float64))
    assert abs(total - want_total) / max(want_total, 1) < 1e-5


def test_min_span_at_20k_candidates():
    docs, spans = min_span_freqs(CHUNKS, pruned=True)
    got = dict(zip(docs.tolist(), spans.tolist()))
    for d in range(0, len(CORPUS), 997):
        toks = CORPUS[d]
        pa = [i for i, t in enumerate(toks) if t == "a"]
        pb = [i for i, t in enumerate(toks) if t == "b"]
        want = min(abs(i - j) for i in pa for j in pb) - 1
        assert got[d] == want, d
