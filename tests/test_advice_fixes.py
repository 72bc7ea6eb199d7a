"""Regression tests for the round-1 advisor findings (ADVICE.md):

1. DocSetChunk.tf_at on an empty docset (all-deleted bucket) must not
   crash any consumer.
2. search_batch must recompute pruning bounds after an NRT append /
   under a non-BM25 similarity (stale baked floats are not upper
   bounds) — and boosted queries must recompute too.
3. foreachBatch batch_id=0 replay must be deduplicated (exactly-once).
4. term_h partition values must survive Spark's partition-column type
   inference as strings.
5. explain() must use the searcher's pluggable similarity.
6. constant-score MultiTermQuery must honor doc_filter.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_spark.fixtures.transcripts import term_string, transcripts_df
from lucene_spark.index import build_index
from lucene_spark.index.catalog import IndexCatalog
from lucene_spark.kernels.bm25 import ClassicScorer
from lucene_spark.search import IndexSearcher
from lucene_spark.search.kernels import DocSetChunk, MaskedChunk, TermChunk
from lucene_spark.search.query import MultiTermQuery, OrQuery, TermQuery
from lucene_spark.streaming import NRTIndexWriter

T = [term_string(k) for k in range(30)]


# ---- 1. empty docset kernel safety ------------------------------------

def test_empty_docset_tf_at_returns_zeros():
    ds = DocSetChunk(b"\x00\x00", base_doc=100, num_docs=16)
    assert ds.n_blocks() == 0
    out = ds.tf_at(np.array([100, 101, 115], dtype=np.int64))
    assert out.tolist() == [0, 0, 0]


def test_masked_chunk_over_empty_docset():
    from lucene_spark.kernels import codec
    blocks = codec.encode_chunk(np.array([5, 9]), np.array([2, 1]),
                                np.array([3, 3]), [[0, 4], [1]])
    ch = TermChunk(blocks, [1.0])
    dead = DocSetChunk(b"\x00\x00", base_doc=0, num_docs=16)
    m = MaskedChunk(ch, dead)
    docs, tfs = m.decode_all()
    assert docs.size == 0
    assert m.tf_at(np.array([5, 9])).tolist() == [0, 0]


# ---- 2/3. NRT: batch 0 replay + search_batch bound recompute ----------

@pytest.fixture(scope="module")
def nrt_index(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("advfix")
    idx = str(root / "idx")
    base = transcripts_df(spark, n_convs=60, seed=7, partitions=2)
    build_index(spark, base, idx, num_buckets=2)
    batch = (transcripts_df(spark, n_convs=80, seed=7, partitions=2)
             .filter(F.col("conv_id") >= "conv00000060"))
    w = NRTIndexWriter(spark, idx, rows_per_bucket=400)
    n = w.append_batch(batch, batch_id=0)
    assert n > 0
    return idx, batch


def test_batch_zero_replay_is_noop(spark, nrt_index):
    idx, batch = nrt_index
    s0 = IndexSearcher(spark, idx)
    count_before = s0.doc_count
    w = NRTIndexWriter(spark, idx, rows_per_bucket=400)
    assert w.append_batch(batch, batch_id=0) == 0  # replay deduped
    assert IndexSearcher(spark, idx).doc_count == count_before


def test_search_batch_recomputes_bounds_when_dirty(spark, nrt_index):
    idx, _ = nrt_index
    s = IndexSearcher(spark, idx)
    assert s.nrt_dirty
    qs = {"t": TermQuery(T[1]), "o": OrQuery((T[2], T[5], T[9]))}
    pruned = {(r["query_id"], r["doc_id"]): np.float32(r["score"])
              for r in s.search_batch(qs, k=10, pruned=True).collect()}
    exact = {(r["query_id"], r["doc_id"]): np.float32(r["score"])
             for r in s.search_batch(qs, k=10, pruned=False).collect()}
    assert pruned == exact


def test_search_batch_recomputes_for_classic_similarity(spark, small_index):
    s = IndexSearcher(spark, small_index, similarity=ClassicScorer)
    qs = {"t": TermQuery(T[0]), "o": OrQuery((T[1], T[4]))}
    pruned = {(r["query_id"], r["doc_id"]): np.float32(r["score"])
              for r in s.search_batch(qs, k=10, pruned=True).collect()}
    exact = {(r["query_id"], r["doc_id"]): np.float32(r["score"])
             for r in s.search_batch(qs, k=10, pruned=False).collect()}
    assert pruned == exact


def test_boosted_term_pruned_equals_exhaustive(spark, small_index):
    s = IndexSearcher(spark, small_index)
    q = TermQuery(T[1], boost=3.0)
    got_p = s.search(q, k=10, pruned=True)
    got_e = s.search(q, k=10, pruned=False)
    assert got_p == got_e


# ---- 4. term_h inference safety ---------------------------------------

def test_term_h_reads_back_as_string(spark, small_index):
    s = IndexSearcher(spark, small_index)
    sch = dict(spark.read.parquet(s.postings_path).dtypes)
    assert sch["term_h"] == "string"
    # every value is 'h' + 2 hex chars, never all-numeric
    vals = [r["term_h"] for r in (spark.read.parquet(s.postings_path)
                                  .select("term_h").distinct().collect())]
    assert all(v.startswith("h") and len(v) == 3 for v in vals)


# ---- 5. explain() respects the plugged similarity ---------------------

def test_explain_uses_plugged_similarity(spark, small_index):
    s = IndexSearcher(spark, small_index, similarity=ClassicScorer)
    q = TermQuery(T[0])
    top = s.search(q, k=1)
    assert top
    doc_id, score = top[0]
    ex = s.explain(q, doc_id)
    assert ex["matches"]
    assert np.float32(ex["score"]) == pytest.approx(float(score), rel=1e-6)


# ---- 6. constant-score rewrite honors doc_filter ----------------------

def test_constant_score_doc_filter(spark, small_index):
    s = IndexSearcher(spark, small_index)
    q = MultiTermQuery("prefix", T[3][:4], rewrite="constant_score")
    unfiltered = {d for d, _ in s.search(q, k=10 ** 6)}
    filtered = {d for d, _ in s.search(q, k=10 ** 6,
                                       doc_filter="role = 'user'")}
    cat = IndexCatalog(small_index)
    allowed = {r["doc_id"] for r in
               (spark.read.parquet(cat.table_path("docstore"))
                .filter("role = 'user'").select("doc_id").collect())}
    assert filtered == unfiltered & allowed
    assert filtered != unfiltered  # the filter actually removed docs
