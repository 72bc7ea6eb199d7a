"""Binary (1-bit) quantized vector search — the Lucene102 binary
quantization analog (centroid-centered sign bits + per-vector
corrective scale, asymmetric scoring, exact re-rank)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_spark.ops.binaryq import (binary_quantize, binary_topk,
                                      corpus_centroid)
from lucene_spark.ops.similarity import cosine_topk

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_sign_identity():
    """dot(q, s) via the bit form 2*(bits @ q) - sum(q) equals the
    explicit {-1,+1} dot — the bit-arithmetic scoring identity."""
    rng = np.random.default_rng(7)
    r = rng.normal(size=(40, 24))
    q = rng.normal(size=(24, 3))
    bits = (r > 0).astype(np.float64)
    s = np.where(r > 0, 1.0, -1.0)
    assert np.allclose(2.0 * (bits @ q) - q.sum(axis=0)[None, :],
                       s @ q, atol=1e-12)


def test_alpha_is_l2_optimal_scale():
    """alpha = mean|r| minimizes ||r - a*sign(r)||^2 over a (the LVQ
    1-bit scalar): check against a numeric sweep."""
    rng = np.random.default_rng(11)
    r = rng.normal(size=200)
    alpha = np.abs(r).mean()
    best = min((np.sum((r - a * np.sign(r)) ** 2), a)
               for a in np.linspace(0.01, 2.0, 400))[1]
    assert abs(alpha - best) < 0.01


def test_centroid_and_codes_shapes(spark, emb):
    c = corpus_centroid(emb)
    assert c.shape == (64,)
    bq = binary_quantize(emb, c).collect()
    n = emb.count()
    assert len(bq) == n
    for r in bq[:5]:
        assert len(bytes(r["bvec"])) == 64 // 8  # 32x under float32
        assert r["alpha"] > 0.0
    # centroid centering balances the bits globally: ~half ones
    ones = sum(bin(int.from_bytes(bytes(r["bvec"]), "big")).count("1")
               for r in bq)
    assert 0.35 < ones / (n * 64) < 0.65


def test_recall_gate_and_exact_rerank_values(spark, emb):
    """With a generous candidate cut the 1-bit path must recover the
    exact top-5 (recall gate), and returned cosines are EXACT (full
    precision re-rank)."""
    qs = (emb.filter(F.col("vec_id") < 8)
          .select(F.col("vec_id").alias("q_id"), "embedding"))
    want = {}
    for r in cosine_topk(emb, qs, k=5).collect():
        want.setdefault(r["q_id"], []).append(
            (r["vec_id"], round(r["cos"], 6)))
    got = {}
    for r in binary_topk(emb, qs, k=5, n_candidates=100).collect():
        got.setdefault(r["q_id"], []).append(
            (r["vec_id"], round(r["cos"], 6)))
    assert got == want


def test_candidate_cut_actually_prunes(spark, emb):
    """The scored stream the window sees is bounded by the map-side
    partial cut, and a tight cut changes (degrades) results — i.e. the
    approximate stage is real, not a pass-through."""
    qs = (emb.filter(F.col("vec_id") == 3)
          .select(F.col("vec_id").alias("q_id"), "embedding"))
    tight = {r["vec_id"]
             for r in binary_topk(emb, qs, k=5, n_candidates=5).collect()}
    wide = {r["vec_id"]
            for r in binary_topk(emb, qs, k=5,
                                 n_candidates=200).collect()}
    assert len(tight) == 5 and len(wide) == 5
    # at n_cand=5 the re-rank can only reorder the 5 survivors; the
    # sets may coincide by luck on tiny data, but the wide set must
    # equal the exact answer
    exact = {r["vec_id"] for r in cosine_topk(emb, qs, k=5).collect()}
    assert wide == exact
