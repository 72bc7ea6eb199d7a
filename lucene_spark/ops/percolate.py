"""Percolator / Monitor: match *documents* against stored queries
(reverse search; monitor/src/java/org/apache/lucene/monitor/Monitor.java:42).

Stored queries are rows (query_id, qtype, terms); percolation is a
stream-static-shaped join: tokenize incoming docs, join the (broadcast)
exploded query-term table, count matched distinct terms per
(query, doc), keep pairs satisfying the query's occur semantics
(AND: all terms, OR: any term).

Scale shape: the query table is small and broadcast; the document side
streams through one projection + one partial-aggregated groupBy on
(doc, query) — no corpus shuffle by content. Works identically under
Structured Streaming foreachBatch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import tokens_expr

QUERY_SCHEMA = "query_id string, qtype string, terms array<string>"


def stored_queries(spark: SparkSession, qs: list) -> DataFrame:
    """qs: [(query_id, qtype∈{'term','and','or','phrase'}, [terms...])]"""
    return spark.createDataFrame(qs, QUERY_SCHEMA)


# one occurrence of the terms array as a consecutive run inside toks —
# pure Spark SQL higher-order functions, JVM-side (the ExactPhraseMatcher
# check expressed over two array columns)
_PHRASE_HIT = (
    "exists(sequence(0, size(toks) - size(terms)), "
    "i -> forall(sequence(0, size(terms) - 1), j -> toks[i + j] = terms[j]))")


def percolate(docs: DataFrame, queries: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """Returns (query_id, doc_id) for every stored query each doc
    matches. qtype 'phrase' generates candidates through the same
    broadcast term join (all phrase terms present) and verifies the
    consecutive run with an array HOF — no Python, no position index."""
    qx = (queries
          .withColumn("n_terms", F.size("terms"))
          .select("query_id", "qtype", "n_terms",
                  F.explode("terms").alias("term")))
    toks_full = (docs.select(F.col(id_col).alias("doc_id"),
                             tokens_expr(text_col).alias("toks")))
    toks = toks_full.select(
        "doc_id", F.explode(F.array_distinct("toks")).alias("term"))
    matched = (toks.join(F.broadcast(qx), "term")
               .groupBy("query_id", "doc_id")
               .agg(F.count("*").alias("n_hit"),
                    F.first("qtype").alias("qtype"),
                    F.first("n_terms").alias("n_terms")))
    flat = (matched
            .filter((F.col("qtype") == "or") | (F.col("qtype") == "term") |
                    ((F.col("qtype") == "and") &
                     (F.col("n_hit") == F.col("n_terms"))))
            .select("query_id", "doc_id"))
    ph_cand = (matched
               .filter((F.col("qtype") == "phrase")
                       & (F.col("n_hit") == F.col("n_terms")))
               .select("query_id", "doc_id"))
    ph = (ph_cand
          .join(toks_full, "doc_id")
          .join(F.broadcast(queries.select("query_id", "terms")),
                "query_id")
          .filter(F.expr(_PHRASE_HIT))
          .select("query_id", "doc_id"))
    return flat.unionByName(ph)


def percolate_stream(stream_docs: DataFrame, queries: DataFrame,
                     out_path: str, checkpoint: str,
                     text_col: str = "text", id_col: str = "doc_id",
                     trigger: dict | None = None):
    """Continuous percolation (the Monitor's streaming register-then-
    match loop): every micro-batch of documents is matched against the
    stored queries and appended to ``out_path`` exactly-once (the sink
    write is idempotent per batch via the checkpoint)."""

    def sink(bdf: DataFrame, batch_id: int):
        (percolate(bdf, queries, text_col, id_col)
         .withColumn("batch_id", F.lit(batch_id))
         .write.mode("append").parquet(out_path))

    writer = (stream_docs.writeStream
              .foreachBatch(sink)
              .option("checkpointLocation", checkpoint))
    if trigger:
        writer = writer.trigger(**trigger)
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()
