"""Product-quantized vector search (ops/pq.py): ADC identity, codebook
determinism, bytes reduction, recall gate with exact re-rank values,
and pruning power on a clustered corpus."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_spark.ops.pq import pq_encode, pq_topk, pq_train
from lucene_spark.ops.similarity import cosine_topk

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_adc_identity():
    """The LUT-gather score equals the inner product of the query with
    the RECONSTRUCTED vector (centroid concatenation) — ADC's defining
    algebraic identity."""
    rng = np.random.default_rng(3)
    m, ks, dsub = 4, 8, 6
    books = rng.normal(size=(m, ks, dsub))
    codes = rng.integers(0, ks, size=(20, m))
    q = rng.normal(size=m * dsub)
    qsub = q.reshape(m, dsub)
    lut = np.einsum("md,mkd->mk", qsub, books)
    adc = lut[np.arange(m)[None, :], codes].sum(axis=1)
    recon = books[np.arange(m)[None, :], codes].reshape(20, m * dsub)
    assert np.allclose(adc, recon @ q, atol=1e-12)


def test_codebooks_deterministic(spark, emb):
    b1 = pq_train(emb, m=8, ks=16, iters=4, sample_n=256)
    b2 = pq_train(emb, m=8, ks=16, iters=4, sample_n=256)
    assert b1.shape == (8, 16, 8)
    assert np.array_equal(b1, b2)


def test_codes_bytes_reduction(spark, emb):
    books = pq_train(emb, m=8, ks=16, iters=2, sample_n=256)
    rows = pq_encode(emb, books).collect()
    assert len(rows) == emb.count()
    for r in rows[:5]:
        # 8 bytes per vector vs 64 float32 = 256 bytes -> 32x smaller
        assert len(bytes(r["pcode"])) == 8
    # codes use the codebook (not all-zero): some spread in values
    vals = {bytes(r["pcode"]) for r in rows}
    assert len(vals) > len(rows) // 4


def test_recall_gate_and_exact_rerank_values(spark, emb):
    """With the measured candidate cut the PQ path must recover the
    exact top-5, and returned cosines are EXACT (full-precision
    re-rank)."""
    qs = (emb.filter(F.col("vec_id") < 8)
          .select(F.col("vec_id").alias("q_id"), "embedding"))
    want, got = {}, {}
    for r in cosine_topk(emb, qs, k=5).collect():
        want.setdefault(r["q_id"], []).append(
            (r["vec_id"], round(r["cos"], 6)))
    for r in pq_topk(emb, qs, k=5, n_candidates=100, m=8, ks=256,
                     sample_n=4096).collect():
        got.setdefault(r["q_id"], []).append(
            (r["vec_id"], round(r["cos"], 6)))
    assert got == want


def test_candidate_cut_actually_prunes(spark, emb):
    qs = (emb.filter(F.col("vec_id") == 3)
          .select(F.col("vec_id").alias("q_id"), "embedding"))
    books = pq_train(emb, m=8, ks=256, sample_n=4096)
    tight = {r["vec_id"] for r in
             pq_topk(emb, qs, k=5, n_candidates=5, books=books).collect()}
    wide = {r["vec_id"] for r in
            pq_topk(emb, qs, k=5, n_candidates=200, books=books).collect()}
    exact = {r["vec_id"] for r in cosine_topk(emb, qs, k=5).collect()}
    assert len(tight) == 5 and wide == exact


def test_clustered_corpus_prunes_hard(spark):
    """On a CLUSTERED corpus (24 tight clusters of 25 — the realistic
    shape) a 40-candidate cut (6.7% of the 600-vector corpus) recovers
    the true neighbors: PQ's pruning-power gate, the ann_lsh_recall
    clustered-fixture discipline. The cut must exceed the cluster size
    — all members of a tight cluster share near-identical codes, so
    the approx order ties inside a cluster and a sub-cluster-size cut
    drops true neighbors on the id tie-break."""
    rng = np.random.default_rng(42)
    centers = rng.normal(size=(24, 64))
    rows = []
    vid = 0
    for c in range(24):
        for _ in range(25):
            v = centers[c] + 0.05 * rng.normal(size=64)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    qs = (emb.filter(F.col("vec_id") % 100 == 0)
          .select(F.col("vec_id").alias("q_id"), "embedding"))
    exact = cosine_topk(emb, qs, k=5)
    approx = pq_topk(emb, qs, k=5, n_candidates=40, m=8, ks=64,
                     sample_n=600)
    e = {(r["q_id"], r["vec_id"]) for r in exact.collect()}
    a = {(r["q_id"], r["vec_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.9, recall


def test_dim_not_divisible_raises(spark, emb):
    with pytest.raises(ValueError):
        pq_train(emb, m=7, ks=8, sample_n=64)
