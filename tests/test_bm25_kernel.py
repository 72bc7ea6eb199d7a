"""Bit-exactness tests for the float32 BM25 kernel.

Oracle: tests/golden/bm25_golden.csv — float bit patterns produced by a
Java harness evaluating the exact float expression chain of the reference
BM25Similarity.java (idf :101-104, avgdl :106-109, cache :181-187, the
rewritten score :221-237). Scores must match bit-for-bit.
"""

import csv
import pathlib

import numpy as np

from lucene_spark.kernels import bm25

GOLDEN = pathlib.Path(__file__).parent / "golden" / "bm25_golden.csv"


def _bits(f32) -> int:
    return int(np.asarray(f32, dtype=np.float32).view(np.int32))


def _rows():
    with open(GOLDEN) as fh:
        yield from csv.DictReader(fh)


def test_idf_avgdl_bits_match_java():
    seen = set()
    for r in _rows():
        key = (int(r["df"]), int(r["docCount"]), int(r["sumTtf"]))
        if key in seen:
            continue
        seen.add(key)
        assert _bits(bm25.idf(key[0], key[1])) == int(r["idf_bits"]), key
        assert _bits(bm25.avg_field_length(key[2], key[1])) == int(r["avgdl_bits"]), key


def test_score_bits_match_java_exhaustively():
    scorers = {}
    n = 0
    for r in _rows():
        key = (int(r["df"]), int(r["docCount"]), int(r["sumTtf"]))
        if key not in scorers:
            scorers[key] = bm25.BM25Scorer(*key)
        s = scorers[key]
        got = s.score(np.array([int(r["tf"])]), np.array([int(r["norm"])]))[0]
        assert _bits(got) == int(r["score_bits"]), (key, r["tf"], r["norm"])
        n += 1
    assert n >= 500


def test_score_monotonicity():
    """Lucene's rewritten form is monotone in freq and in norm-inverse by
    construction (BM25Similarity.java:221-229) — verify on a dense grid."""
    s = bm25.BM25Scorer(100, 100000, 5000000)
    tfs = np.arange(1, 2000)
    for code in (0, 24, 100, 255):
        sc = s.score(tfs, np.full(tfs.shape, code))
        assert np.all(np.diff(sc) >= 0)
    # longer doc (higher decoded length) never scores higher at same tf
    codes = np.arange(256)
    sc = s.score(np.full(256, 5), codes)
    dec = bm25.LENGTH_TABLE[codes.astype(np.int64)]
    order = np.argsort(dec, kind="stable")
    assert np.all(np.diff(sc[order]) <= 1e-9 + 0)  # non-increasing with length


def test_sum_idf_matches_double_accumulation():
    idfs = [bm25.idf(3, 2000), bm25.idf(17, 2000), bm25.idf(999, 2000)]
    total = np.float64(0.0)
    for v in idfs:
        total += np.float64(v)
    assert _bits(bm25.sum_idf(idfs)) == _bits(np.float32(total))


def test_max_score_for_impacts_bounds_block():
    s = bm25.BM25Scorer(10, 10000, 400000)
    rng = np.random.default_rng(42)
    tfs = rng.integers(1, 50, 300)
    norms = rng.integers(0, 256, 300)
    ub = s.max_score_for_impacts(tfs, norms)
    assert np.all(s.score(tfs, norms) <= ub)
