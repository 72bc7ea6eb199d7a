"""Streaming exact dedup: keep-first across micro-batches, key parity
with the batch operator."""

import datetime

import pytest
from pyspark.sql import functions as F

from lucene_spark.streaming.dedup_stream import exact_dedup_stream

TS = datetime.datetime(2026, 1, 1, 12, 0, 0)


def _rows(*specs):
    # (doc_id, text, minute_offset)
    return [(d, t, TS + datetime.timedelta(minutes=m))
            for d, t, m in specs]


def test_stream_dedup_keeps_first_across_batches(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("sdedup")
    src = str(root / "src")
    schema = "doc_id long, text string, ts timestamp"
    b1 = spark.createDataFrame(_rows(
        (0, "alpha beta gamma", 0),
        (1, "delta epsilon", 0),
        (2, "Alpha  BETA gamma!", 1),   # normalized dup of doc 0
    ), schema)
    b2 = spark.createDataFrame(_rows(
        (3, "alpha beta gamma", 2),     # cross-batch dup
        (4, "zeta eta", 2),
        (5, "delta epsilon", 3),        # cross-batch dup
    ), schema)
    b1.coalesce(1).write.mode("overwrite").parquet(src)
    b2.coalesce(1).write.mode("append").parquet(src)

    stream = (spark.readStream.schema(b1.schema)
              .option("maxFilesPerTrigger", "1").parquet(src))
    q = (exact_dedup_stream(stream, watermark="30 minutes")
         .writeStream.outputMode("append")
         .format("memory").queryName("sdedup_out")
         .option("checkpointLocation", str(root / "ckpt"))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(180)

    kept_ids = {r["doc_id"] for r in
                spark.sql("SELECT * FROM sdedup_out").collect()}
    # one survivor per NORMALIZED text: docs 0/2/3 share a key
    # ("Alpha  BETA gamma!" normalizes to "alpha beta gamma"), docs
    # 1/5 share a key, doc 4 is unique -> 3 survivors, all from the
    # first batch each key appeared in
    assert kept_ids == {0, 1, 4}
    # the schema passes through unchanged (no internal key column)
    assert spark.sql("SELECT * FROM sdedup_out").columns == \
        ["doc_id", "text", "ts"]


def test_stream_key_matches_batch_operator(spark):
    # the stream's dedup key IS the batch operator's group key
    from lucene_spark.ops.dedup import exact_duplicates
    df = spark.createDataFrame(_rows(
        (0, "alpha beta gamma", 0),
        (2, "Alpha  BETA gamma!", 1),
        (1, "delta epsilon", 0),
    ), "doc_id long, text string, ts timestamp")
    groups = exact_duplicates(df).collect()
    assert len(groups) == 1 and groups[0]["n_docs"] == 2
