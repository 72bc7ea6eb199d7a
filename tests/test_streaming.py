"""NRT streaming appends: micro-batches appended via foreachBatch must
yield exactly the same search results as a cold full rebuild over the
union corpus (the NRT-reader == full-reader equivalence Lucene tests
via DirectoryReader.openIfChanged)."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_spark.fixtures.transcripts import term_string, transcripts_df
from lucene_spark.index import build_index
from lucene_spark.index.catalog import IndexCatalog
from lucene_spark.search import IndexSearcher
from lucene_spark.search.query import OrQuery, TermQuery, from_dict
from lucene_spark.streaming import NRTIndexWriter, index_stream

T = [term_string(k) for k in range(30)]

QS = [
    {"type": "term", "terms": [T[1]], "k": 12},
    {"type": "or", "terms": [T[2], T[7], T[19]], "k": 10},
    {"type": "and", "terms": [T[0], T[4]], "k": 10},
    {"type": "phrase", "terms": [T[0], T[1]], "k": 10},
]


@pytest.fixture(scope="module")
def nrt_setup(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("nrt")
    base_dir = str(root / "idx")
    # base index: conversations 0..99
    base = transcripts_df(spark, n_convs=100, seed=42, partitions=4)
    build_index(spark, base, base_dir, num_buckets=4)
    # two appended micro-batches: 100..119 and 120..139
    batch1 = (transcripts_df(spark, n_convs=120, seed=42, partitions=4)
              .filter(F.col("conv_id") >= "conv00000100"))
    batch2 = (transcripts_df(spark, n_convs=140, seed=42, partitions=4)
              .filter(F.col("conv_id") >= "conv00000120"))
    w = NRTIndexWriter(spark, base_dir, rows_per_bucket=500)
    n1 = w.append_batch(batch1, batch_id=1)
    n2 = w.append_batch(batch2, batch_id=2)
    assert n1 > 0 and n2 > 0
    # reference: cold rebuild over the union corpus
    full_dir = str(root / "full")
    full = transcripts_df(spark, n_convs=140, seed=42, partitions=4)
    build_index(spark, full, full_dir, num_buckets=6)
    return base_dir, full_dir


def test_nrt_sees_appended_docs(spark, nrt_setup):
    nrt_dir, full_dir = nrt_setup
    s = IndexSearcher(spark, nrt_dir)
    f = IndexSearcher(spark, full_dir)
    assert s.nrt_dirty
    assert s.doc_count == f.doc_count
    assert s.sum_ttf == f.sum_ttf


@pytest.mark.parametrize("q", QS, ids=[q["type"] for q in QS])
def test_nrt_equals_full_rebuild(spark, nrt_setup, q):
    nrt_dir, full_dir = nrt_setup
    s = IndexSearcher(spark, nrt_dir)
    f = IndexSearcher(spark, full_dir)
    got = s.search(from_dict(q), k=q["k"], pruned=True)
    want = f.search(from_dict(q), k=q["k"], pruned=True)
    assert [d for d, _ in got] == [d for d, _ in want]
    for (gd, gs), (wd, ws) in zip(got, want):
        assert np.float32(gs) == np.float32(ws)


def test_termstats_append_is_batch_sized(spark, nrt_setup):
    """An append's termstats write must be O(batch-touched terms): each
    append adds a DELTA generation whose rows are exactly the batch's
    (field, term) pairs — never a rewrite of the whole dictionary."""
    nrt_dir, full_dir = nrt_setup
    cat = IndexCatalog(nrt_dir)
    locs = cat.table_locations("termstats")
    assert len(locs) == 3  # base + one delta per append
    base_rows = spark.read.parquet(locs[0]).count()
    batch2 = (transcripts_df(spark, n_convs=140, seed=42, partitions=4)
              .filter(F.col("conv_id") >= "conv00000120"))
    from lucene_spark.kernels.tokenizer import tokenize_one
    batch_terms = set()
    for r in batch2.select("text").collect():
        batch_terms.update(tokenize_one(r["text"] or ""))
    delta_rows = (spark.read.parquet(locs[2])
                  .filter(F.col("field") == "text").count())
    assert delta_rows == len(batch_terms)
    assert delta_rows < base_rows  # strictly smaller than the dictionary
    # aggregated view == full-rebuild dictionary (df/ttf per term;
    # max_score legitimately differs — baked under different stats)
    s, f = IndexSearcher(spark, nrt_dir), IndexSearcher(spark, full_dir)
    probe = [T[i] for i in (0, 1, 2, 7, 19)]
    sv, fv = s.term_stats(probe), f.term_stats(probe)
    assert set(sv) == set(fv)
    for t in sv:
        assert sv[t][:2] == fv[t][:2], t


def test_compact_clears_dirty_and_preserves_results(spark, nrt_setup):
    nrt_dir, full_dir = nrt_setup
    before = IndexSearcher(spark, nrt_dir).search(
        OrQuery((T[2], T[7], T[19])), k=10)
    NRTIndexWriter(spark, nrt_dir).compact()
    s = IndexSearcher(spark, nrt_dir)
    assert not s.nrt_dirty
    after = s.search(OrQuery((T[2], T[7], T[19])), k=10)
    assert before == after


def test_append_replay_is_noop(spark, nrt_setup):
    """Replaying an already-committed micro-batch id must not ingest."""
    nrt_dir, _ = nrt_setup
    before = IndexSearcher(spark, nrt_dir).doc_count
    batch = (transcripts_df(spark, n_convs=120, seed=42, partitions=4)
             .filter(F.col("conv_id") >= "conv00000100"))
    n = NRTIndexWriter(spark, nrt_dir).append_batch(batch, batch_id=1)
    assert n == 0
    assert IndexSearcher(spark, nrt_dir).doc_count == before


def test_append_recovers_from_partial_crash(spark, tmp_path_factory):
    """A pending-buckets marker with partially written files must be
    cleaned before the next ingest; results equal a clean append."""
    import glob
    import os
    import shutil
    root = tmp_path_factory.mktemp("crash")
    idx = str(root / "idx")
    base = transcripts_df(spark, n_convs=60, seed=42, partitions=2)
    build_index(spark, base, idx, num_buckets=2)
    cat = IndexCatalog(idx)
    before_count = IndexSearcher(spark, idx).doc_count
    # simulate a crash: marker committed, docstore dir partially written
    ds_root = cat.table_path("docstore")
    junk = os.path.join(ds_root, "bucket_id=2")
    os.makedirs(junk, exist_ok=True)
    src_file = glob.glob(os.path.join(ds_root, "bucket_id=0", "*.parquet"))[0]
    shutil.copy(src_file, os.path.join(junk, "part-junk.parquet"))
    cat.commit({}, extra={"pending_buckets": [2]})
    # next append must recover, then ingest cleanly
    batch = (transcripts_df(spark, n_convs=70, seed=42, partitions=2)
             .filter(F.col("conv_id") >= "conv00000060"))
    n = NRTIndexWriter(spark, idx).append_batch(batch, batch_id=1)
    assert n > 0
    s = IndexSearcher(spark, idx)
    truth = transcripts_df(spark, n_convs=70, seed=42, partitions=2).count()
    assert s.doc_count == truth
    assert before_count < truth
    # docstore has no duplicate doc_ids (across all generations)
    from lucene_spark.index.catalog import read_table
    ds = read_table(spark, cat.table_locations("docstore"))
    assert ds.count() == ds.select("doc_id").distinct().count() == truth


def test_streaming_foreachbatch(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("nrt_stream")
    idx = str(root / "idx")
    src = str(root / "src")
    ckpt = str(root / "ckpt")
    base = transcripts_df(spark, n_convs=60, seed=42, partitions=2)
    build_index(spark, base, idx, num_buckets=2)
    # drop two parquet files as the "stream"
    inc = (transcripts_df(spark, n_convs=80, seed=42, partitions=2)
           .filter(F.col("conv_id") >= "conv00000060"))
    inc.write.mode("overwrite").parquet(src)
    stream = (spark.readStream.schema(inc.schema).parquet(src))
    q = index_stream(stream, idx, ckpt, rows_per_bucket=400)
    q.awaitTermination(120)
    s = IndexSearcher(spark, idx)
    f_count = transcripts_df(spark, n_convs=80, seed=42, partitions=2).count()
    assert s.doc_count == f_count
    res = s.search(TermQuery(T[1]), k=5)
    assert len(res) == 5
