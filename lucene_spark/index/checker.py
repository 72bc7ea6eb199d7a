"""check_index: offline invariant checker for a built index
(CheckIndex analog, core:index/CheckIndex.java:113,570,1107).

Invariants (FIXTURES.md §6):
- docstore doc_ids are dense 0..N-1, strictly increasing under
  (conv_id, turn_idx) order; norm == intToByte4(token_count).
- postings: within a (term, bucket) chunk, consecutive block doc ranges
  strictly increasing and disjoint; decoded posting count == df;
  block max_score >= every member's BM25 score.
- termstats df/ttf == sum over chunks; stats sum_ttf == Σ token_count.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..kernels import codec
from ..kernels.bm25 import BM25Scorer
from ..kernels.smallfloat import int_to_byte4
from .catalog import IndexCatalog, read_table


def check_index(spark: SparkSession, index_dir: str, sample_terms: int = 200) -> dict:
    """Runs all invariant checks; raises AssertionError on violation.
    Returns summary counts."""
    cat = IndexCatalog(index_dir)
    ds = read_table(spark, cat.table_locations("docstore"))
    text_field = ((cat.latest_commit().get("extra") or {})
                  .get("field") or "text")
    st = (spark.read.parquet(cat.table_path("stats"))
          .filter(F.col("field") == text_field).collect()[0])
    doc_count, sum_ttf = int(st["doc_count"]), int(st["sum_ttf"])

    # --- docstore invariants (distributed) ---
    n = ds.count()
    assert n == doc_count, (n, doc_count)
    agg = ds.agg(F.min("doc_id"), F.max("doc_id"),
                 F.countDistinct("doc_id"), F.sum("token_count")).collect()[0]
    assert agg[0] == 0 and agg[1] == n - 1 and agg[2] == n, "doc_ids not dense"
    assert int(agg[3]) == sum_ttf
    bad_norm = ds.filter(F.col("norm") < 0).count()
    assert bad_norm == 0
    # norm == intToByte4(token_count) — vectorized spot check on a sample
    sample = ds.select("token_count", "norm").limit(50000).toPandas()
    np.testing.assert_array_equal(
        np.asarray(int_to_byte4(sample["token_count"].to_numpy(np.int64))),
        sample["norm"].to_numpy(np.uint8))
    # doc_id order == (conv_id, turn_idx) order
    disorder = (ds.select("doc_id", "conv_id", "turn_idx")
                .withColumn("rn", F.row_number().over(
                    Window.orderBy("conv_id", "turn_idx")) - 1)
                .filter(F.col("rn") != F.col("doc_id")).count())
    assert disorder == 0, "doc_id does not follow (conv_id, turn_idx) order"

    # --- postings invariants (kernel-side, distributed) ---
    post = read_table(spark, cat.table_locations("postings"))

    def verify(batches):
        for pdf in batches:
            bad = 0
            checked = 0
            for df_, blocks, bms in zip(pdf["df"], pdf["blocks"],
                                        pdf["block_max_scores"]):
                docs, tfs = codec.decode_chunk_docs_tfs(list(blocks))
                checked += 1
                if docs.size != df_:
                    bad += 1
                    continue
                if docs.size > 1 and not np.all(np.diff(docs) > 0):
                    bad += 1
                    continue
                lasts = np.array([b["last_doc"] for b in blocks])
                firsts = np.array([b["first_doc"] for b in blocks])
                if not (np.all(firsts <= lasts) and
                        np.all(firsts[1:] > lasts[:-1])):
                    bad += 1
            yield pd.DataFrame({"checked": [checked], "bad": [bad]})

    res = post.mapInPandas(verify, schema="checked long, bad long") \
              .agg(F.sum("checked"), F.sum("bad")).collect()[0]
    assert res[1] == 0, f"{res[1]} bad posting chunks"

    # --- termstats coherence (delta generations aggregate at read) ---
    ts = read_table(spark, cat.table_locations("termstats"))
    if len(cat.table_locations("termstats")) > 1:
        ts = (ts.groupBy("field", "term")
              .agg(F.sum("df").alias("df"), F.sum("ttf").alias("ttf"),
                   F.max("max_score").alias("max_score")))
    again = post.groupBy("field", "term").agg(F.sum("df").alias("df2"),
                                              F.sum("ttf").alias("ttf2"))
    mism = (ts.join(again, ["field", "term"])
            .filter((F.col("df") != F.col("df2")) | (F.col("ttf") != F.col("ttf2")))
            .count())
    assert mism == 0, "termstats disagree with postings"

    # --- block max_score dominates member scores (sampled) ---
    sample_p = (post.filter(F.col("field") == text_field)
                .limit(sample_terms).toPandas())
    norms_pd = read_table(spark, cat.table_locations("norms")).toPandas()
    norms_by_bucket = {int(r.bucket_id): (int(r.base_doc),
                                          np.frombuffer(bytes(r.norms), np.uint8))
                       for r in norms_pd.itertuples()}
    ts_pd = {r["term"]: int(r["df"]) for r in
             ts.filter((F.col("field") == text_field) &
                       F.col("term").isin([str(t) for t in sample_p["term"]]))
             .collect()}
    # NRT-dirty indexes have stale baked floats by design — searchers
    # recompute bounds from the stored impacts, so the invariant to
    # check is impacts-derived bounds dominating member scores
    dirty = bool((cat.latest_commit().get("extra") or {})
                 .get("nrt_dirty", False))
    for row in sample_p.itertuples():
        sc = BM25Scorer(ts_pd[row.term], doc_count, sum_ttf)
        base, narr = norms_by_bucket[int(row.bucket_id)]
        for blk, bmax in zip(row.blocks, row.block_max_scores):
            docs, tfs = codec.decode_block_docs_tfs(blk)
            scores = sc.score(tfs, narr[docs - base])
            if dirty:
                bmax = sc.max_score_for_impacts(
                    np.asarray(blk["imp_freqs"]),
                    np.asarray(blk["imp_norms"]))
            assert np.all(scores <= np.float32(bmax) + 0), \
                f"block max violated for {row.term}"

    return {"docs": n, "chunks": int(res[0]), "terms": ts.count()}
