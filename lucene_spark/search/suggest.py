"""Context-filtered completion suggester.

The reference's AnalyzingInfixSuggester builds its OWN auxiliary index
from (text, weight, contexts) inputs and filters lookups by context
(suggest/src/java/org/apache/lucene/search/suggest/analyzing/
AnalyzingInfixSuggester.java:97 `contexts`, lookup(key, contexts, ...));
the searcher-level prefix/infix/fuzzy suggest over the term dictionary
(searcher.suggest) has no per-context weights, so this module is the
build()+lookup() analog:

- build_suggester: one pass over the corpus — analyze, explode,
  groupBy (context, term) with map-side combine — written as parquet
  partitioned by nothing (context cardinality is usually small; the
  scan prunes on the pushed-down context predicate).
- ContextSuggester.lookup: pushed-down (context, pattern) filter +
  TakeOrderedAndProject top-n. With contexts=None, weights sum across
  contexts (the reference's no-context lookup).

Scale shape: the build is a single shuffle bounded by |contexts| x
|vocabulary| (Zipf-small next to the corpus); lookups never touch the
corpus again.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["build_suggester", "build_suggester_entries",
           "ContextSuggester"]


def build_suggester(docs: DataFrame, path: str, text_col: str = "text",
                    context_col: str = "lang",
                    analyzer: str = "standard") -> None:
    """Materialize the suggestion index: (context, term, weight=ttf
    within the context)."""
    if analyzer == "standard":
        from ..ops.dedup import tokens_expr
        toks = docs.withColumn("_toks", tokens_expr(text_col))
    else:
        from pyspark.sql.functions import pandas_udf
        from ..kernels.tokenizer import analyze_series

        @pandas_udf("array<string>")
        def _an(s: pd.Series) -> pd.Series:
            return analyze_series(s, analyzer)

        toks = docs.withColumn("_toks", _an(F.col(text_col)))
    (toks.select(F.col(context_col).alias("context"),
                 F.explode("_toks").alias("term"))
     .groupBy("context", "term")
     .agg(F.count("*").alias("weight"))
     .write.mode("overwrite").parquet(path))


def build_suggester_entries(entries: DataFrame, path: str,
                            text_col: str = "text",
                            weight_col: str = "weight",
                            payload_col: str | None = None,
                            context_col: str | None = None) -> None:
    """The reference's ACTUAL input model — InputIterator entries of
    (text, weight, payload, contexts)
    (suggest/src/java/org/apache/lucene/search/suggest/InputIterator
    .java; AnalyzingInfixSuggester.build consumes it and returns the
    payload with every LookupResult): suggestions are app-provided
    entries (product names with URLs, commands with help ids), not
    corpus terms. One row per entry (per context if ``context_col``);
    lookup returns (term, weight, payload)."""
    cols = [F.col(text_col).alias("term"),
            F.col(weight_col).cast("long").alias("weight")]
    if context_col is not None:
        cols.insert(0, F.col(context_col).alias("context"))
    else:
        cols.insert(0, F.lit(None).cast("string").alias("context"))
    if payload_col is not None:
        cols.append(F.col(payload_col).cast("string").alias("payload"))
    entries.select(*cols).write.mode("overwrite").parquet(path)


class ContextSuggester:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def lookup(self, pattern: str, kind: str = "prefix", n: int = 5,
               contexts: list | None = None,
               max_edits: int = 1) -> DataFrame:
        """Top-n (term, weight) by (weight desc, term asc), optionally
        restricted to ``contexts`` (IntersectsWith semantics — any
        listed context qualifies). kind: prefix | infix | fuzzy (OSA,
        like FuzzySuggester)."""
        df = self.spark.read.parquet(self.path)
        if contexts is not None:
            df = df.filter(F.col("context").isin(list(contexts)))
        if kind == "prefix":
            df = df.filter(F.col("term").startswith(pattern))
        elif kind == "infix":
            df = df.filter(F.col("term").contains(pattern))
        elif kind == "fuzzy":
            from ..kernels.osa import osa_leq_udf
            df = df.filter(
                F.length("term").between(len(pattern) - max_edits,
                                         len(pattern) + max_edits)
                & osa_leq_udf(pattern, max_edits)(F.col("term")))
        else:
            raise ValueError(f"unknown suggest kind {kind!r}")
        aggs = [F.sum("weight").alias("weight")]
        if "payload" in df.columns:
            # entries-mode index: the payload travels with the entry
            # (LookupResult.payload — one payload per suggestion text,
            # shared across its contexts)
            aggs.append(F.max("payload").alias("payload"))
        out = df.groupBy("term").agg(*aggs)
        return (out.orderBy(F.col("weight").desc(), F.col("term").asc())
                .limit(n))
