"""FreeTextSuggester: n-gram language-model "type-ahead" suggestions
(suggest/src/java/org/apache/lucene/search/suggest/analyzing/
FreeTextSuggester.java) with stupid-backoff smoothing (Brants et al.
2007, "Large Language Models in Machine Translation").

The reference builds a ShingleFilter'd temp index and moves the n-gram
counts into an FST; lookups walk the FST from the highest-order model
down, multiplying the score by ALPHA=0.4 at each backoff. Re-expressed
Spark-first:

- **build**: one tokenize pass over the corpus text (mapInPandas, the
  field's analyzer chain) emitting every 1..grams-gram, then ONE
  map-side-combined groupBy -> the model table
  (n, context, word, cnt). At 100 TB this is a single shuffle whose
  key space is the n-gram vocabulary; no FST required — parquet +
  pushed-down (n, context) equality filters play the FST's
  prefix-seek role.
- **lookup**: per model order, a pushed-down filter
  (n == order, context == last tokens, word LIKE 'prefix%') + a
  TakeOrdered — 2-3 metadata-sized plans unioned, sorted once.

Semantics mirrored from the reference lookup loop (:440-720):
  * scores: count(ngram) / count(context) for the top order,
    times ALPHA per attempted level below it (:527-604; a level whose
    model lacks the context ALSO decays, :566-570, which is why the
    decay depends only on how many usable levels sit above);
  * trailing separator "upgrades" the context — "foo " suggests
    bigram continuations of foo, never unigrams (:505-520);
  * a word suggested by a higher-order model is skipped by lower
    orders (the `seen` set, :530-535, :674-688);
  * per-level top-num by (count desc, word asc) — the FST TopNSearcher
    returns the num best by weight with byte-order ties (:608-658);
  * final sort: score desc, suggestion asc (:706-716).

Deviation (documented): suggestions join context and word with a
space, not the reference's 0x1E separator byte; scores are plain
doubles, not Long.MAX_VALUE-scaled fixed-point. Ranking is identical.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["FreeTextSuggester", "ALPHA"]

ALPHA = 0.4  # FreeTextSuggester.java:126


class FreeTextSuggester:
    def __init__(self, model: DataFrame, tot_tokens: float,
                 grams: int, analyzer: str = "standard"):
        self.model = model
        self.tot_tokens = float(tot_tokens)
        self.grams = int(grams)
        self.analyzer = analyzer

    # -- build --------------------------------------------------------------
    @classmethod
    def build(cls, docs: DataFrame, text_col: str = "text",
              grams: int = 2, analyzer: str = "standard",
              persist: bool = True) -> "FreeTextSuggester":
        """Count every 1..grams-gram of the analyzed text. ShingleFilter
        never crosses document boundaries, and neither does this."""
        if grams < 1:
            raise ValueError("grams must be >= 1")

        def emit(batches):
            from ..kernels.tokenizer import analyze_series
            for pdf in batches:
                toks = analyze_series(pdf[text_col], analyzer)
                ns, ctxs, ws = [], [], []
                for t in toks:
                    if not t:
                        continue
                    arr = list(t)
                    for n in range(1, grams + 1):
                        for i in range(len(arr) - n + 1):
                            ns.append(n)
                            ctxs.append(" ".join(arr[i:i + n - 1]))
                            ws.append(arr[i + n - 1])
                if ns:
                    yield pd.DataFrame({"n": np.asarray(ns, np.int32),
                                        "context": ctxs, "word": ws})

        model = (docs.select(text_col)
                 .mapInPandas(emit,
                              schema="n int, context string, word string")
                 .groupBy("n", "context", "word")
                 .agg(F.count("*").alias("cnt")))
        if persist:
            model = model.persist()
        tot = (model.filter(F.col("n") == 1)
               .agg(F.sum("cnt")).collect()[0][0]) or 0
        return cls(model, float(tot), grams, analyzer)

    # -- lookup -------------------------------------------------------------
    def _analyze_key(self, key: str):
        """Tokens of the lookup key + whether the last token ENDED (the
        reference's endOffset/posInc test, :493-503): appending a token
        character must start a NEW token for the key to have ended."""
        from ..kernels.tokenizer import analyze_one
        toks = analyze_one(key, self.analyzer)
        if not toks:
            raise ValueError("no tokens produced by analyzer")
        probe = analyze_one(key + "x", self.analyzer)
        ended = (not probe) or probe[-1] == "x" or len(probe) > len(toks)
        return toks, ended

    def lookup(self, key: str, num: int = 10) -> DataFrame:
        """Top-num continuations of ``key`` -> (suggestion, word, score),
        score desc / suggestion asc, one Spark action."""
        toks, ended = self._analyze_key(key)
        prefix = "" if ended else toks[-1]
        ctx_all = toks if ended else toks[:-1]

        # usable levels, highest order first; g = context length
        levels = []
        for g in range(self.grams - 1, -1, -1):
            if g == 0 and ended:
                continue  # never unigram-predict from empty string
            if len(ctx_all) < g:
                continue  # not enough input for this order
            levels.append((g, ctx_all[len(ctx_all) - g:]))

        m = self.model
        out = None
        seen_frames = []
        backoff = 1.0
        for g, ctx in levels:
            ctx_str = " ".join(ctx)
            cand = m.filter((F.col("n") == g + 1)
                            & (F.col("context") == ctx_str))
            if prefix:
                cand = cand.filter(F.col("word").startswith(prefix))
            if g == 0:
                denom = F.lit(self.tot_tokens)
            else:
                # count of the context as a g-gram (:583-592)
                cctx = (m.filter((F.col("n") == g)
                                 & (F.col("context")
                                    == " ".join(ctx[:-1]))
                                 & (F.col("word") == ctx[-1]))
                        .select(F.col("cnt").alias("_cc")))
                cand = cand.crossJoin(F.broadcast(cctx))
                denom = F.col("_cc")
            for s in seen_frames:
                cand = cand.join(F.broadcast(s), "word", "left_anti")
            lvl = (cand
                   .orderBy(F.col("cnt").desc(), F.col("word").asc())
                   .limit(num)
                   .select(
                       F.when(F.lit(bool(ctx_str)),
                              F.concat(F.lit(ctx_str + " "),
                                       F.col("word")))
                       .otherwise(F.col("word")).alias("suggestion"),
                       "word",
                       (F.lit(backoff) * F.col("cnt") / denom)
                       .cast("double").alias("score")))
            seen_frames.append(lvl.select("word"))
            out = lvl if out is None else out.unionByName(lvl)
            backoff *= ALPHA
        if out is None:
            raise ValueError("key has too few tokens for any model order")
        return (out.orderBy(F.col("score").desc(),
                            F.col("suggestion").asc())
                .limit(num))
