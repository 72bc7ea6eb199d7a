"""applyInPandasWithState operator: state accumulates across
micro-batches and final totals equal a batch recomputation."""

import pytest
from pyspark.sql import functions as F

from lucene_spark.fixtures.transcripts import transcripts_df
from lucene_spark.streaming.stateful import running_conv_stats


def test_running_conv_stats_across_batches(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("state")
    src = str(root / "src")
    full = transcripts_df(spark, n_convs=40, seed=42, partitions=2)
    # two files -> two micro-batches with maxFilesPerTrigger=1
    (full.filter(F.col("turn_idx") % 2 == 0)
     .coalesce(1).write.mode("overwrite").parquet(src))
    (full.filter(F.col("turn_idx") % 2 == 1)
     .coalesce(1).write.mode("append").parquet(src))

    stream = (spark.readStream.schema(full.schema)
              .option("maxFilesPerTrigger", "1").parquet(src))
    q = (running_conv_stats(stream)
         .writeStream.outputMode("append")
         .format("memory").queryName("conv_stats")
         .option("checkpointLocation", str(root / "ckpt"))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(180)

    # last emitted row per conv == batch ground truth
    out = spark.sql("SELECT * FROM conv_stats").toPandas()
    last = (out.groupby("conv_id").agg({"n_turns": "max",
                                        "n_tokens": "max",
                                        "max_turn_idx": "max"}))
    from lucene_spark.kernels.tokenizer import tokenize_one
    truth = full.select("conv_id", "turn_idx", "text").toPandas()
    for conv, grp in truth.groupby("conv_id"):
        row = last.loc[conv]
        assert int(row["n_turns"]) == len(grp)
        assert int(row["max_turn_idx"]) == int(grp["turn_idx"].max())
        assert int(row["n_tokens"]) == sum(
            len(tokenize_one(t)) for t in grp["text"])
