"""Delimited-payload analysis + payload extraction kernels.

Reference surfaces:
- analysis/common/src/java/org/apache/lucene/analysis/payloads/
  DelimitedPayloadTokenFilter.java:55-70 — each whitespace token is cut
  at the FIRST delimiter ('|' by default); the prefix is the indexed
  term, the suffix is the payload (FloatEncoder.java parses it as a
  float). Tokens without the delimiter carry no payload.
- queries/src/java/org/apache/lucene/queries/payloads/
  PayloadDecoder.java:29 — a missing (null) payload decodes to factor 1.

Storage model: the reference encodes payload bytes into the postings
(Postings.PAYLOADS). This engine persists the analyzer chain in the
commit manifest and keeps the stored field in the docstore, so payloads
are RE-DERIVED at query time from the stored text of MATCHING docs only
(the same no-second-copy argument as term_vectors: the chain is
deterministic, the scan is a pushed-down point/join scan, and at 100 TB
the postings stay payload-free). Documented deviation: a zero-length
term part (token starting with the delimiter) is dropped instead of
indexed as the empty term.

The chain tokenizer is WhitespaceTokenizer + LowerCaseFilter +
DelimitedPayloadTokenFilter — the reference's canonical payload
pipeline (DelimitedPayloadTokenFilterFactory javadoc).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

PAYLOAD_DELIM = "|"

__all__ = ["PAYLOAD_DELIM", "payload_tokenize_series",
           "payload_analyze_one", "payload_term", "payload_stats_frame"]


def payload_tokenize_series(texts: pd.Series) -> pd.Series:
    """text -> list[str] of indexed TERMS (payload suffixes cut off,
    lowercased, empty term parts dropped), vectorized at the flat-token
    level: one C-level split + one partition over the batch."""
    toks = texts.fillna("").str.lower().str.split()
    lens = toks.str.len().to_numpy(dtype=np.int64)
    total = int(lens.sum())
    if total == 0:
        return pd.Series([[] for _ in range(len(texts))],
                         index=texts.index, dtype=object)
    flat = np.concatenate([np.asarray(t, dtype=object) if t
                           else np.empty(0, object) for t in toks])
    terms = pd.Series(flat, dtype=object).str.partition(PAYLOAD_DELIM)[0] \
        .to_numpy(dtype=object)
    bounds = np.cumsum(lens)[:-1]
    return pd.Series([[t for t in chunk if t]
                      for chunk in np.split(terms, bounds)],
                     index=texts.index, dtype=object)


def payload_analyze_one(text: str) -> list:
    """Single-string chain (query/driver side)."""
    out = []
    for tok in (text or "").lower().split():
        term = tok.split(PAYLOAD_DELIM, 1)[0]
        if term:
            out.append(term)
    return out


def payload_term(term: str) -> str:
    """One query-term slot through the chain's filters."""
    return term.lower().split(PAYLOAD_DELIM, 1)[0]


def payload_stats_frame(texts: pd.Series, term: str) -> pd.DataFrame:
    """Per-row payload statistics for occurrences of ``term`` (already
    analyzed/lowercased): columns n_seen, p_min, p_max, p_sum, float32
    accumulation like the reference's float payloadScore.

    Occurrences WITHOUT a payload decode to factor 1
    (PayloadDecoder.java:29); unparsable payload text decodes to NaN
    (FloatEncoder would throw at index time — the reference never
    stores one; NaN propagates to the doc score where PayloadScoreQuery
    maps it to 0). Vectorized: one flat split + partition per batch,
    one groupby over matching tokens.
    """
    toks = texts.fillna("").str.lower().str.split()
    lens = toks.str.len().to_numpy(dtype=np.int64)
    n = len(texts)
    out = pd.DataFrame({
        "n_seen": np.zeros(n, dtype=np.int64),
        "p_min": np.zeros(n, dtype=np.float32),
        "p_max": np.zeros(n, dtype=np.float32),
        "p_sum": np.zeros(n, dtype=np.float32),
    }, index=texts.index)
    total = int(lens.sum())
    if total == 0:
        return out
    flat = np.concatenate([np.asarray(t, dtype=object) if t
                           else np.empty(0, object) for t in toks])
    row_of = np.repeat(np.arange(n, dtype=np.int64), lens)
    parts = pd.Series(flat, dtype=object).str.partition(PAYLOAD_DELIM)
    hit = (parts[0] == term).to_numpy()
    if not hit.any():
        return out
    has_pay = (parts[1].to_numpy(dtype=object) == PAYLOAD_DELIM) & hit
    factors = np.ones(total, dtype=np.float32)
    if has_pay.any():
        vals = pd.to_numeric(parts[2][has_pay], errors="coerce") \
            .to_numpy(dtype=np.float32)
        factors[np.flatnonzero(has_pay)] = vals
    rows = row_of[hit]
    f = factors[hit]
    grp = pd.DataFrame({"r": rows, "f": f}).groupby("r")["f"]
    agg = grp.agg(["count", "min", "max", "sum"])
    ridx = agg.index.to_numpy()
    out.iloc[ridx, out.columns.get_loc("n_seen")] = \
        agg["count"].to_numpy(dtype=np.int64)
    out.iloc[ridx, out.columns.get_loc("p_min")] = \
        agg["min"].to_numpy(dtype=np.float32)
    out.iloc[ridx, out.columns.get_loc("p_max")] = \
        agg["max"].to_numpy(dtype=np.float32)
    out.iloc[ridx, out.columns.get_loc("p_sum")] = \
        agg["sum"].to_numpy(dtype=np.float32)
    return out
