"""Document chunking — fixed token windows with overlap, the standard
pre-training windowing stage (every LLM data pipeline slices long
documents into model-context-sized pieces; the sliding-window
convention here is the end-aligned one tokenizer libraries use:
interior windows at stride = window - overlap, plus one final window
aligned to the document end so no tail tokens are dropped).

Two variants:

  * :func:`chunk_documents` — windows over the analyzer-equivalent
    token array (lowercase alnum runs, the shared Spark/DuckDB token
    model every dedup/textstats oracle uses). PURE CATALYST: one
    projection with sequence/slice/array_join inside whole-stage
    codegen — zero Python, zero shuffle, scale-free.
  * :func:`chunk_documents_spans` — windows that slice the ORIGINAL
    text via the real tokenizer's character spans (what a training
    pipeline actually feeds the model, whitespace and case intact).
    One Arrow-batched pass; not SQL-expressible (UAX#29 spans), so
    test-gated rather than oracle-gated.

Chunk-start rule (both variants): with n tokens, window W, overlap V,
stride S = W - V:
    n == 0 -> no chunks;  n <= W -> one chunk [0, n)
    else   -> starts {0, S, 2S, ...} while start + W < n,
              plus the end-aligned start n - W (never a duplicate:
              interior starts are strictly below it).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import tokens_expr

__all__ = ["chunk_documents", "chunk_documents_spans"]

CHUNK_SCHEMA = ("doc_id bigint, chunk_idx int, start_tok int, "
                "n_chunk_tokens int, chunk_text string")


def _validate(window: int, overlap: int):
    if window < 1:
        raise ValueError("window must be >= 1")
    if not 0 <= overlap < window:
        raise ValueError("overlap must be in [0, window)")


def chunk_documents(docs: DataFrame, window: int = 128, overlap: int = 32,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """-> (doc_id, chunk_idx, start_tok, n_chunk_tokens, chunk_text)
    with chunk_text = space-joined normalized tokens. One codegen
    projection + posexplode; chunk membership depends only on the row,
    never on partitioning."""
    _validate(window, overlap)
    stride = window - overlap
    starts = (f"CASE WHEN n = 0 THEN array() "
              f"WHEN n <= {window} THEN array(0) "
              f"ELSE concat(sequence(0, n - {window} - 1, {stride}), "
              f"array(n - {window})) END")
    return (docs
            .select(F.col(id_col).alias("doc_id"),
                    tokens_expr(text_col).alias("toks"))
            .withColumn("n", F.size("toks"))
            .select("doc_id", "toks", "n",
                    F.posexplode(F.expr(starts)).alias("chunk_idx", "st"))
            .select("doc_id",
                    F.col("chunk_idx").cast("int"),
                    F.col("st").cast("int").alias("start_tok"),
                    F.least(F.lit(window), F.col("n") - F.col("st"))
                    .cast("int").alias("n_chunk_tokens"),
                    F.array_join(
                        F.slice(F.col("toks"), F.col("st") + 1,
                                F.least(F.lit(window),
                                        F.col("n") - F.col("st"))),
                        " ").alias("chunk_text")))


def chunk_documents_spans(docs: DataFrame, window: int = 128,
                          overlap: int = 32, id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """Same windowing over the REAL tokenizer's character spans: each
    chunk is text[span(start).begin : span(end-1).end] — original
    casing/whitespace preserved, the shape a training pipeline feeds
    the model. Arrow-batched (tokenize_spans is the highlighter's
    vectorized span path); token counts here are UAX#29 counts and may
    differ from the normalized-token variant on punctuation-heavy
    text."""
    _validate(window, overlap)
    stride = window - overlap
    from ..kernels.tokenizer import tokenize_spans

    def run(batches):
        for pdf in batches:
            out = {"doc_id": [], "chunk_idx": [], "start_tok": [],
                   "n_chunk_tokens": [], "chunk_text": []}
            for did, text in zip(pdf[id_col], pdf[text_col]):
                spans = [(m.start(), m.end())
                         for m in tokenize_spans(text or "")]
                n = len(spans)
                if n == 0:
                    continue
                if n <= window:
                    starts = [0]
                else:
                    starts = list(range(0, n - window, stride))
                    starts.append(n - window)
                for ci, st in enumerate(starts):
                    en = min(st + window, n)
                    out["doc_id"].append(int(did))
                    out["chunk_idx"].append(ci)
                    out["start_tok"].append(st)
                    out["n_chunk_tokens"].append(en - st)
                    out["chunk_text"].append(
                        text[spans[st][0]:spans[en - 1][1]])
            yield pd.DataFrame(out)

    return (docs.select(id_col, text_col)
            .mapInPandas(run, CHUNK_SCHEMA))
