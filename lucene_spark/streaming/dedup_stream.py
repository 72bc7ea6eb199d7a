"""Streaming exact deduplication — the ingest-time training-pipeline
stage: drop documents whose normalized token stream was already seen,
as data ARRIVES, with state bounded by a watermark.

Batch dedup (ops/dedup.py exact_duplicates) answers "which docs in this
corpus repeat"; at ingest the right shape is Structured Streaming's
dropDuplicatesWithinWatermark over the same engine-independent md5 key:
state is per-key, TTL'd by the event-time watermark, so a 10^12-turn
firehose holds only the keys seen within the dedup horizon instead of
forever (plain dropDuplicates grows state without bound — documented
trade-off: duplicates farther apart than the horizon pass through; the
periodic BATCH sweep catches them).

The key matches the batch operator exactly (md5 over the normalized
token stream, dedup.tokens_expr), so a stream deduped here and a batch
corpus deduped there agree on what "duplicate" means.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..ops.dedup import tokens_expr

__all__ = ["exact_dedup_stream"]


def exact_dedup_stream(stream_df: DataFrame, text_col: str = "text",
                       ts_col: str = "ts",
                       watermark: str = "10 minutes") -> DataFrame:
    """Streaming keep-first exact dedup: the first arrival of each
    normalized text survives; later arrivals within the watermark
    horizon are dropped. Returns the input stream minus duplicates
    (the key column is internal)."""
    key = F.md5(F.concat_ws(" ", tokens_expr(text_col)))
    return (stream_df.withColumn("_dedup_key", key)
            .withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(["_dedup_key"])
            .drop("_dedup_key"))
