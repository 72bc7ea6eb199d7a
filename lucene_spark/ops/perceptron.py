"""BooleanPerceptronClassifier — online binary text classification with
integer term weights (classification/src/java/org/apache/lucene/
classification/BooleanPerceptronClassifier.java).

Reference semantics (all preserved at ``n_parts=1``):

- weights initialize to each term's TOTAL TERM FREQ (the ctor's
  TermsEnum walk, :117-124), held as integers (the FST's
  PositiveIntOutputs longs);
- ``bias`` defaults to sumTotalTermFreq / docCount of the text field
  (:99-114) — the average document length;
- assignClass: output = sum over TOKEN OCCURRENCES of weight(token)
  (:223-240), assigned = output >= bias, confidence =
  1 - exp(-|bias - output| / bias);
- training walks the classed docs in doc order (:128-166; the
  class-wildcard search is constant-score, so score order IS doc
  order): on a misclassification, every term of the doc moves by
  modifier * tf, clamped at 0 (:191-202), modifier = +1 when the true
  class is positive, -1 otherwise.

Documented deviations: updates always read FRESH weights (the
reference rereads a stale FST refreshed every ``batchSize`` docs — a
performance artifact of the FST representation, batchSize=1 semantics
here); and for ``n_parts > 1`` training distributes by ITERATIVE
PARAMETER MIXING (train a sequential perceptron per deterministic doc
shard from the shared broadcast weights, then average the shard
deltas — McDonald, Hall & Mann, NAACL 2010) because the reference's
per-doc online loop is inherently single-stream. n_parts=1 is
bit-exact to the reference rule; n_parts>1 is the standard distributed
reinterpretation and is deterministic in (corpus, n_parts, epochs).

Scale shape: each shard's training runs inside ONE applyInPandas group
(docs arrive sorted, tokens factorized against the broadcast
vocabulary); the driver holds only the vocabulary-sized weight vector
— the same memory the reference spends on its in-RAM FST.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["train_boolean_perceptron", "perceptron_assign"]


def _doc_tokens(searcher, text_field: str):
    an = searcher.analyzers.get(text_field, "standard")

    def tok(pdf: pd.DataFrame) -> pd.DataFrame:
        from ..kernels.tokenizer import analyze_series
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        pdf["toks"] = analyze_series(pdf["text"].fillna(""), an)
        return pdf
    return tok


def train_boolean_perceptron(searcher, positive_expr: str,
                             class_field: str = "role",
                             text_field: str = "text",
                             n_parts: int = 1, epochs: int = 1,
                             bias: float | None = None):
    """Train on the index's classed docs. ``positive_expr`` is a SQL
    boolean over the docstore (the reference's Boolean.valueOf of the
    class field, e.g. ``"role = 'en'"``). Returns (weights DataFrame
    (term, weight double — exact integers at n_parts=1), bias)."""
    spark = searcher.spark
    ts = (searcher._termstats_df(F.col("field") == text_field)
          .select("term", "ttf").collect())
    vocab = sorted(r["term"] for r in ts)
    ttf = {r["term"]: int(r["ttf"]) for r in ts}
    dc, sttf = searcher._field_stats(text_field)
    b = float(bias) if bias is not None else sttf / dc

    docs = (searcher._read_cached(searcher.docstore_paths)
            .filter(F.col(class_field).isNotNull())
            .select("doc_id", "text",
                    F.expr(positive_expr).alias("correct"),
                    (F.col("doc_id") % n_parts).alias("part")))
    vidx = {t: i for i, t in enumerate(vocab)}
    init = np.array([ttf[t] for t in vocab], dtype=np.int64)
    w = init.astype(np.float64)
    tokfn = _doc_tokens(searcher, text_field)

    for _ in range(int(epochs)):
        start = w.copy()
        bstart = spark.sparkContext.broadcast(start)

        def train(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = tokfn(pdf)
            wv = bstart.value.copy()
            for toks, correct in zip(pdf["toks"], pdf["correct"]):
                idx = np.array([vidx[t] for t in toks if t in vidx],
                               dtype=np.int64)
                if idx.size == 0:
                    continue
                ui, tf = np.unique(idx, return_counts=True)
                out = float(wv[ui] @ tf)
                assigned = out >= b
                if assigned != bool(correct):
                    mod = 1 if correct else -1
                    wv[ui] = np.maximum(0, wv[ui] + mod * tf)
            return pd.DataFrame({"part": pdf["part"].iloc[:1],
                                 "delta": [(wv - bstart.value).tolist()]})

        deltas = (docs.repartition(max(n_parts, 1), "part")
                  .groupBy("part")
                  .applyInPandas(train,
                                 schema="part long, delta array<double>")
                  .collect())
        bstart.destroy()  # one vocabulary-sized broadcast per epoch
        if deltas:
            # average over ALL n_parts shards (McDonald/Hall/Mann
            # parameter mixing): a shard with no rows contributes a
            # ZERO delta, it does not shrink the denominator
            tot = np.sum([np.asarray(r["delta"]) for r in deltas],
                         axis=0)
            w = start + tot / max(n_parts, 1)
            w = np.maximum(0.0, w)

    wdf = spark.createDataFrame(
        [(t, float(w[i])) for t, i in vidx.items()],
        "term string, weight double")
    return wdf, b


def perceptron_assign(texts: DataFrame, weights: DataFrame,
                      bias: float, id_col: str = "id",
                      text_col: str = "text",
                      analyzer: str = "standard") -> DataFrame:
    """assignClass over a batch: tokenize, sum each doc's token weights
    (unknown terms contribute 0, :230-233), threshold against the
    bias. Returns (id, output, assigned, score) — score is the
    reference's 1 - exp(-|bias - output| / bias) confidence. One
    tokenize pass + a broadcast weight join + a map-side-combined
    sum."""
    def tok(batches):
        from ..kernels.tokenizer import analyze_series
        for pdf in batches:
            toks = analyze_series(pdf[text_col].fillna(""), analyzer)
            lens = toks.str.len().to_numpy(np.int64)
            ids = np.repeat(pdf[id_col].to_numpy(np.int64), lens)
            if ids.size == 0:
                continue
            flat = np.concatenate(
                [np.asarray(t, object) for t in toks if len(t)])
            yield pd.DataFrame({"id": ids, "term": flat})

    tokens = (texts.select(F.col(id_col).cast("long").alias(id_col),
                           text_col)
              .mapInPandas(tok, schema="id bigint, term string"))
    ids = texts.select(F.col(id_col).cast("long").alias("id"))
    summed = (tokens.join(F.broadcast(weights), "term", "left")
              .groupBy("id")
              .agg(F.sum(F.coalesce("weight", F.lit(0.0)))
                   .alias("output")))
    out = (ids.join(summed, "id", "left")
           .withColumn("output", F.coalesce("output", F.lit(0.0))))
    return out.select(
        "id", "output",
        (F.col("output") >= F.lit(bias)).alias("assigned"),
        (F.lit(1.0) - F.exp(-F.abs(F.lit(bias) - F.col("output"))
                            / F.lit(bias))).alias("score"))
