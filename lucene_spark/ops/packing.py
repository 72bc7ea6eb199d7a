"""Sequence packing — concatenate documents into fixed-token training
samples (the GPT-style "concat and chunk" packing every pre-training
pipeline runs between tokenization and batching: shard-concatenate the
corpus, cut it into context-window-sized samples, and record which
slice of which document landed in which sample).

Scale shape: packing is inherently sequential WITHIN a stream, so the
corpus is split into ``n_shards`` deterministic shards that pack
independently — the exact parallelism a 100 TB run uses (one packer per
shard/file). Within a shard everything is pure Catalyst:

  * one window cumulative-sum over (shard, doc order) gives each doc
    its global token offset — Spark's running-total exchange partitions
    on the shard key, so shards pack in parallel;
  * a doc spanning samples ``floor(start/B) .. floor((end-1)/B)``
    explodes into at most ``len/B + 1`` assignment rows via
    ``sequence()`` — no token-level explode, the plan touches
    metadata-sized rows only;
  * slice arithmetic (which token range of the doc fills which range of
    the sample) is closed-form per row.

Zero-token documents vanish (nothing to pack) — the same convention as
dropping empty lines before concatenation.

Output: one row per (doc, sample) assignment:
    shard, sample_id (shard-local), doc_id,
    doc_tok_start / doc_tok_end  — the doc's token slice [start, end)
    sample_off                   — where that slice begins in the sample
    n_toks                       — slice length
Every sample except a shard's last has exactly ``budget`` tokens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .dedup import tokens_expr

__all__ = ["pack_sequences", "pack_stats"]


def pack_sequences(docs: DataFrame, budget: int = 256,
                   n_shards: int = 8, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Pack documents into ``budget``-token samples within
    ``n_shards`` deterministic shards (shard = pmod(doc_id, n_shards),
    docs concatenated in doc_id order). ``id_col`` values must be
    UNIQUE — the running-sum window orders by doc_id, so duplicate
    ids would make the packing order (and thus every offset)
    non-deterministic across executions."""
    if not isinstance(budget, int) or budget < 1:
        raise ValueError("budget must be an int >= 1")
    if not isinstance(n_shards, int) or n_shards < 1:
        raise ValueError("n_shards must be an int >= 1")
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        # pmod: negative doc_ids co-shard with their Python-% residue
        # instead of minting extra negative shard keys
        F.pmod(F.col(id_col), F.lit(n_shards)).alias("shard"),
        F.size(tokens_expr(text_col)).cast("long").alias("n"))
    d = d.filter(F.col("n") > 0)
    w = (Window.partitionBy("shard").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    d = (d.withColumn("end", F.sum("n").over(w))
          .withColumn("start", F.col("end") - F.col("n")))
    b = F.lit(int(budget))
    # integer division ('div'), NOT floor(double /): at shard offsets
    # approaching 2^53 the long->double rounding of a float divide can
    # land floor() on the wrong sample; div stays exact at any long
    d = d.withColumn(
        "sample_id",
        F.explode(F.sequence(
            F.expr(f"start div {int(budget)}"),
            F.expr(f"(end - 1) div {int(budget)}"))))
    lo = F.greatest(F.col("sample_id") * b, F.col("start"))
    hi = F.least((F.col("sample_id") + 1) * b, F.col("end"))
    return d.select(
        "shard", "sample_id", "doc_id",
        (lo - F.col("start")).alias("doc_tok_start"),
        (hi - F.col("start")).alias("doc_tok_end"),
        (lo - F.col("sample_id") * b).alias("sample_off"),
        (hi - lo).alias("n_toks"))


def pack_stats(assignments: DataFrame) -> DataFrame:
    """Per-sample fill stats over a pack_sequences result: docs per
    sample and token fill (== budget everywhere except shard tails)."""
    return (assignments.groupBy("shard", "sample_id")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_toks").alias("fill")))
