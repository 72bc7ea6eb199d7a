"""Metadata-filtered ANN (KnnFloatVectorQuery with a filter,
core:search/KnnFloatVectorQuery.java:48 + AbstractKnnVectorQuery's
selective-filter exact fallback)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_spark.ops import similarity as SIM


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    return df.persist()


@pytest.fixture(scope="module")
def queries(emb):
    return (emb.filter(F.col("vec_id") < 4)
            .select(F.col("vec_id").alias("q_id"), "embedding"))


def _brute(emb, queries, cond, k):
    vf = emb.filter(cond)
    return {(r["q_id"], r["vec_id"]): round(r["cos"], 6)
            for r in SIM.cosine_topk(vf, queries, k=k).collect()}


def test_selective_filter_falls_back_to_exact(emb, queries):
    cond = "label = 5"  # 44 eligible rows at sf0.01 -> cost <= factor*k
    res, method = SIM.filtered_ann_topk(emb, queries, dim=64, k=5,
                                        filter_cond=cond)
    assert method == "exact"
    got = {(r["q_id"], r["vec_id"]): round(r["cos"], 6)
           for r in res.collect()}
    assert got == _brute(emb, queries, cond, 5)


def test_filtered_lsh_candidates_respect_filter(emb, queries):
    cond = "label % 2 = 0"  # ~half the corpus: approximate path
    res, method = SIM.filtered_ann_topk(emb, queries, dim=64, k=5,
                                        filter_cond=cond, bands=8)
    assert method == "lsh"
    rows = res.collect()
    eligible = {r["vec_id"] for r in emb.filter(cond).collect()}
    assert all(r["vec_id"] in eligible for r in rows)
    # recall vs exact-on-filtered: near-random synthetic embeddings,
    # 2-bit bands (16/8) -> recall gate at 0.4 overall (same gate shape
    # as ann_lsh_recall; real clustered corpora sit far higher)
    want = set(_brute(emb, queries, cond, 5))
    got = {(r["q_id"], r["vec_id"]) for r in rows}
    recall = len(got & want) / len(want)
    assert recall >= 0.4, recall


def test_filtered_ivf_respects_filter(emb, queries):
    cond = "label % 2 = 1"
    res, method = SIM.filtered_ann_topk(emb, queries, dim=64, k=5,
                                        filter_cond=cond, method="ivf",
                                        n_probe=8)
    assert method == "ivf"
    rows = res.collect()
    eligible = {r["vec_id"] for r in emb.filter(cond).collect()}
    assert all(r["vec_id"] in eligible for r in rows)
    want = set(_brute(emb, queries, cond, 5))
    got = {(r["q_id"], r["vec_id"]) for r in rows}
    assert len(got & want) / len(want) >= 0.4


def test_no_filter_is_plain_ann(emb, queries):
    res, method = SIM.filtered_ann_topk(emb, queries, dim=64, k=5,
                                        fallback_factor=1)
    assert method == "lsh"
    assert res.count() > 0
