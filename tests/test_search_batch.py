"""search_batch: many queries in one job must equal per-query search."""

import numpy as np
import pytest

from lucene_spark.fixtures.queryset import generate_queries
from lucene_spark.search import IndexSearcher
from lucene_spark.search.query import from_dict


@pytest.fixture(scope="module")
def searcher(spark, small_index):
    return IndexSearcher(spark, small_index)


def test_batch_equals_individual(searcher):
    qs = generate_queries(n_queries=16, seed=77)
    qmap = {q["qid"]: from_dict(q) for q in qs}
    k = 10
    batch = searcher.search_batch(qmap, k=k).collect()
    got = {}
    for r in batch:
        got.setdefault(r["query_id"], []).append(
            (int(r["doc_id"]), np.float32(r["score"])))
    for q in qs:
        want = searcher.search(from_dict(q), k=k)
        res = sorted(got.get(q["qid"], []),
                     key=lambda ds: (-ds[1], ds[0]))
        assert res == want, q["qid"]


def test_batch_single_job_faster_than_serial(searcher):
    import time
    qs = generate_queries(n_queries=16, seed=99)
    qmap = {q["qid"]: from_dict(q) for q in qs}
    searcher.search_batch(qmap, k=10).count()  # warm
    t0 = time.time()
    searcher.search_batch(qmap, k=10).count()
    batch_t = time.time() - t0
    t0 = time.time()
    for q in qs[:4]:
        searcher.search(from_dict(q), k=10)
    serial4_t = time.time() - t0
    # 16 queries in batch should cost less than 4 serial ones
    assert batch_t < serial4_t, (batch_t, serial4_t)
