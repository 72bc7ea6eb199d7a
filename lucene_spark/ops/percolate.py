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
    """qs: [(query_id, qtype∈{'term','and','or'}, [terms...]), ...]"""
    return spark.createDataFrame(qs, QUERY_SCHEMA)


def percolate(docs: DataFrame, queries: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """Returns (query_id, doc_id) for every stored query each doc
    matches."""
    qx = (queries
          .withColumn("n_terms", F.size("terms"))
          .select("query_id", "qtype", "n_terms",
                  F.explode("terms").alias("term")))
    toks = (docs.select(F.col(id_col).alias("doc_id"),
                        tokens_expr(text_col).alias("toks"))
            .select("doc_id", F.explode(F.array_distinct("toks")).alias("term")))
    matched = (toks.join(F.broadcast(qx), "term")
               .groupBy("query_id", "doc_id")
               .agg(F.count("*").alias("n_hit"),
                    F.first("qtype").alias("qtype"),
                    F.first("n_terms").alias("n_terms")))
    return (matched
            .filter((F.col("qtype") == "or") | (F.col("qtype") == "term") |
                    ((F.col("qtype") == "and") &
                     (F.col("n_hit") == F.col("n_terms"))))
            .select("query_id", "doc_id"))
