"""LSH pruning power on a CLUSTERED corpus (verdict r04 observation:
the sf0.1 recall gate runs on near-random synthetic embeddings where
band buckets approach the whole corpus, proving correctness but not
pruning). Here the corpus has real cluster structure — the regime LSH
is for — so the gate can assert BOTH high recall AND candidate-set
shrinkage (reference analog: HNSW visits a corpus fraction, not the
corpus; core:search/KnnFloatVectorQuery.java approximate path)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_spark.ops.similarity import (cosine_topk, lsh_candidates,
                                         lsh_cosine_topk)

DIM = 16
N_CLUSTERS = 24
PER_CLUSTER = 80
N = N_CLUSTERS * PER_CLUSTER


@pytest.fixture(scope="module")
def clustered(spark):
    rng = np.random.default_rng(20260818)
    centers = rng.normal(size=(N_CLUSTERS, DIM)).astype(np.float64)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    pts = np.repeat(centers, PER_CLUSTER, axis=0)
    pts = pts + rng.normal(scale=0.05, size=pts.shape)  # tight clusters
    pdf = {"vec_id": list(range(N)),
           "embedding": [row.astype(np.float32).tolist() for row in pts]}
    import pandas as pd
    df = spark.createDataFrame(pd.DataFrame(pdf)).persist()
    df.count()
    return df


@pytest.fixture(scope="module")
def queries(clustered):
    # one query per fourth cluster, taken from the corpus
    ids = [c * PER_CLUSTER for c in range(0, N_CLUSTERS, 4)]
    return (clustered.filter(F.col("vec_id").isin(ids))
            .select(F.col("vec_id").alias("q_id"), "embedding"))


def test_clustered_recall_and_pruning(clustered, queries):
    k = 10
    exact = {}
    for r in cosine_topk(clustered, queries, k=k).collect():
        exact.setdefault(r["q_id"], set()).add(r["vec_id"])
    approx = {}
    got = lsh_cosine_topk(clustered, queries, dim=DIM, k=k,
                          n_planes=32, bands=4)
    for r in got.collect():
        approx.setdefault(r["q_id"], set()).add(r["vec_id"])
    recalls = [len(exact[q] & approx.get(q, set())) / k for q in exact]
    assert min(recalls) >= 0.8 and np.mean(recalls) >= 0.9, recalls

    # pruning: the candidate stage must touch a small corpus fraction
    cand = lsh_candidates(clustered, queries, dim=DIM,
                          n_planes=32, bands=4)
    per_q = {r["q_id"]: r["n"] for r in
             cand.groupBy("q_id").agg(F.count("*").alias("n")).collect()}
    frac = max(per_q.values()) / N
    assert frac <= 0.20, f"candidates not pruned: max frac {frac:.2f}"
    # and the mean fraction should be well under the max bound
    assert np.mean(list(per_q.values())) / N <= 0.12


def test_clustered_candidates_cover_topk(clustered, queries):
    """Every top-k hit the approximate path returns must come from the
    candidate set (re-rank is exact over candidates, no fabrication)."""
    got = lsh_cosine_topk(clustered, queries, dim=DIM, k=5,
                          n_planes=32, bands=4).collect()
    cand = {(r["q_id"], r["vec_id"]) for r in
            lsh_candidates(clustered, queries, dim=DIM,
                           n_planes=32, bands=4).collect()}
    assert all((r["q_id"], r["vec_id"]) in cand for r in got)
