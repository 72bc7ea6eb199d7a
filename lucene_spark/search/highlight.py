"""Snippet extraction over retrieved docs — UnifiedHighlighter analog
(highlighter/.../uhighlight/UnifiedHighlighter.java:97).

Runs as post-processing over the k retrieved rows (k ≈ 10-100, so a
per-row pass is fine — same stance as the reference, which re-analyzes
only the returned documents). Offsets come from the same analyzer
tokenization used at index time, so highlights align with matches.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernels.tokenizer import tokenize_spans

SNIPPET_SCHEMA = "doc_id bigint, snippet string, n_hits int"


def highlight(retrieved: DataFrame, terms: list, text_col: str = "text",
              window: int = 6, pre: str = "<b>", post: str = "</b>",
              max_snippets: int = 1) -> DataFrame:
    """(doc_id, text, ...) -> (doc_id, snippet, n_hits).

    Picks the window of ±`window` tokens around the first matching term
    occurrence(s) and wraps matched tokens in pre/post markers.
    """
    tset = {t.lower() for t in terms}

    def run(batches):
        for pdf in batches:
            out_ids, out_snips, out_hits = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                toks = [(m.group(0), m.start(), m.end())
                        for m in tokenize_spans(text)]
                hits = [i for i, (w, _, _) in enumerate(toks)
                        if w.lower() in tset]
                n = len(hits)
                snips = []
                for h in hits[:max_snippets]:
                    lo = max(0, h - window)
                    hi = min(len(toks), h + window + 1)
                    parts = []
                    for i in range(lo, hi):
                        w = toks[i][0]
                        parts.append(f"{pre}{w}{post}"
                                     if w.lower() in tset else w)
                    snips.append(" ".join(parts))
                out_ids.append(doc_id)
                out_snips.append(" … ".join(snips))
                out_hits.append(n)
            yield pd.DataFrame({"doc_id": out_ids, "snippet": out_snips,
                                "n_hits": out_hits})

    return (retrieved.select("doc_id", text_col)
            .mapInPandas(run, schema=SNIPPET_SCHEMA))


PASSAGE_SCHEMA = ("doc_id bigint, passage string, p_score float, "
                  "p_start int, n_hits int")

_SENT_RE = re.compile(r"[^.!?\n]+[.!?\n]?")


def _passage_score(tf_by_term: dict, weights: dict, start: int,
                   plen: int, k1: float = 1.2, b: float = 0.75,
                   pivot: int = 87) -> float:
    """BM25-family passage score (highlighter/.../uhighlight/
    PassageScorer.java): position-decay norm(start) = 1 + 1/ln(pivot +
    start) times Σ_t idf_t * (k1+1)·tf / (tf + k1·(1 - b + b·len/pivot)).
    pivot plays avgdl's role (the reference's default pivot=87)."""
    import math
    norm = 1.0 + 1.0 / math.log(pivot + start + 2)
    total = 0.0
    for t, tf in tf_by_term.items():
        w = weights.get(t, 0.0)
        total += w * ((k1 + 1.0) * tf
                      / (tf + k1 * (1.0 - b + b * plen / pivot)))
    return norm * total


def highlight_passages(retrieved: DataFrame, terms: list, df_by_term: dict,
                       doc_count: int, text_col: str = "text",
                       max_passages: int = 1, pre: str = "<b>",
                       post: str = "</b>") -> DataFrame:
    """UnifiedHighlighter passage selection (highlighter/.../uhighlight/
    FieldHighlighter.java + PassageScorer.java): split each retrieved
    doc into sentence-bounded passages, score every passage with the
    BM25-family passage scorer (idf weights from the supplied per-term
    df + collection doc_count), return the top ``max_passages`` per doc
    with matched terms wrapped.

    Post-processing over k retrieved rows, like the reference (only
    returned documents are re-analyzed)."""
    import math
    tset = {t.lower() for t in terms}
    weights = {t: math.log(1.0 + (doc_count - df_by_term.get(t, 0) + 0.5)
                           / (df_by_term.get(t, 0) + 0.5))
               for t in tset}

    def run(batches):
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                best = []
                for m in _SENT_RE.finditer(text or ""):
                    seg = m.group(0)
                    toks = [(w.group(0), w.start()) for w in
                            tokenize_spans(seg)]
                    tf: dict = {}
                    for w, _ in toks:
                        lw = w.lower()
                        if lw in tset:
                            tf[lw] = tf.get(lw, 0) + 1
                    if not tf:
                        continue
                    sc = _passage_score(tf, weights, m.start(), len(toks))
                    best.append((sc, m.start(), seg, sum(tf.values())))
                best.sort(key=lambda r: (-r[0], r[1]))
                for sc, start, seg, nh in best[:max_passages]:
                    parts, prev = [], 0
                    for w in tokenize_spans(seg):
                        if w.group(0).lower() in tset:
                            parts.append(seg[prev:w.start()])
                            parts.append(f"{pre}{seg[w.start():w.end()]}"
                                         f"{post}")
                            prev = w.end()
                    parts.append(seg[prev:])
                    marked = "".join(parts).strip()
                    rows.append((int(doc_id), marked, float(sc),
                                 int(start), int(nh)))
            import numpy as np
            yield pd.DataFrame(rows, columns=["doc_id", "passage",
                                              "p_score", "p_start",
                                              "n_hits"]).astype(
                {"doc_id": "int64", "p_score": "float32",
                 "p_start": "int32", "n_hits": "int32"})

    return (retrieved.select("doc_id", text_col)
            .mapInPandas(run, schema=PASSAGE_SCHEMA))
