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

__all__ = ["build_suggester", "ContextSuggester"]


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
        out = (df.groupBy("term")
               .agg(F.sum("weight").alias("weight")))
        return (out.orderBy(F.col("weight").desc(), F.col("term").asc())
                .limit(n))
