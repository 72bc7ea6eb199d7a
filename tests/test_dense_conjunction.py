"""Dense-conjunction counting path (DenseConjunctionBulkScorer analog):
same candidates as the sorted-set intersection path on dense and sparse
corpora, and the counting path actually triggers for dense clauses."""

import numpy as np

from lucene_spark.kernels import codec
from lucene_spark.search.kernels import TermChunk, _conj_candidates


def _chunk(docs):
    docs = np.asarray(sorted(docs), dtype=np.int64)
    ones = np.ones(docs.size, dtype=np.int64)
    blocks = codec.encode_chunk(docs, ones, ones,
                                [[0]] * docs.size)
    return TermChunk(blocks, [0.0] * len(blocks))


def _brute(doc_sets):
    out = set(doc_sets[0])
    for s in doc_sets[1:]:
        out &= set(s)
    return sorted(out)


def test_dense_equals_brute():
    rng = np.random.default_rng(3)
    n = 2000
    sets = [sorted(rng.choice(n, size=1500, replace=False)),
            sorted(rng.choice(n, size=1600, replace=False)),
            sorted(rng.choice(n, size=1400, replace=False))]
    chunks = [_chunk(s) for s in sets]
    got = _conj_candidates(chunks, pruned=True).tolist()
    assert got == _brute(sets)
    got_u = _conj_candidates(chunks, pruned=False).tolist()
    assert got_u == _brute(sets)


def test_sparse_still_equals_brute():
    rng = np.random.default_rng(4)
    n = 100_000
    sets = [sorted(rng.choice(n, size=300, replace=False)) + [50_000],
            sorted(rng.choice(n, size=400, replace=False)) + [50_000]]
    sets = [sorted(set(s)) for s in sets]
    chunks = [_chunk(s) for s in sets]
    got = _conj_candidates(chunks, pruned=True).tolist()
    assert got == _brute(sets)


def test_disjoint_ranges_short_circuit():
    chunks = [_chunk(range(0, 100)), _chunk(range(200, 300))]
    assert _conj_candidates(chunks, pruned=True).size == 0


def test_many_random_mixes():
    rng = np.random.default_rng(7)
    for trial in range(20):
        n = int(rng.integers(50, 3000))
        m = int(rng.integers(2, 5))
        sets = [sorted(rng.choice(n, size=int(rng.integers(1, n)),
                                  replace=False)) for _ in range(m)]
        chunks = [_chunk(s) for s in sets]
        got = _conj_candidates(chunks, pruned=True).tolist()
        assert got == _brute(sets), f"trial {trial}"
