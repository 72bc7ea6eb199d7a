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

from ..kernels.tokenizer import _WORD_RE

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
                        for m in _WORD_RE.finditer(text or "")]
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
