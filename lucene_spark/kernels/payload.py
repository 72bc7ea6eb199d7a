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
           "payload_analyze_one", "payload_term", "payload_stats_frame",
           "span_payload_check_batch"]


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


# ---------------------------------------------------------------------------
# SpanPayloadCheckQuery kernel
# ---------------------------------------------------------------------------

_OPS = ("eq", "gt", "gte", "lt", "lte")


def _decode(pays: np.ndarray, has: np.ndarray, ptype: str):
    """payload strings -> typed values (NaN/sentinel where absent)."""
    if ptype == "string":
        return pays  # compare as UTF-8 strings (StringPayloadMatcher)
    vals = pd.to_numeric(pd.Series(pays, dtype=object).where(has),
                         errors="coerce").to_numpy(dtype=np.float64)
    if ptype == "int":
        # IntPayloadMatcher decodes a packed int; unparsable -> NaN
        with np.errstate(invalid="ignore"):
            frac = vals != np.floor(vals)
        vals = np.where(frac, np.nan, vals)
    return vals


def _compare(vals, expected, op: str, ptype: str) -> np.ndarray:
    if ptype == "string":
        v = pd.Series(vals, dtype=object).fillna("")
        e = str(expected)
        if op == "eq":
            return (v == e).to_numpy()
        m = {"gt": v > e, "gte": v >= e, "lt": v < e, "lte": v <= e}[op]
        return m.to_numpy()
    e = float(expected)
    with np.errstate(invalid="ignore"):
        if op == "eq":
            # EQ is BINARY payload equality in the reference
            # (PayloadMatcherFactory.java:105); for FLOAT/INT-encoded
            # payloads that is value equality
            return vals == e
        if op == "gt":
            return vals > e
        if op == "gte":
            return vals >= e
        if op == "lt":
            return vals < e
        return vals <= e


def span_payload_check_batch(texts: pd.Series, terms: list,
                             expected: list, op: str = "eq",
                             ptype: str = "float") -> np.ndarray:
    """Accepted-span count per row for SpanPayloadCheckQuery
    (queries/payloads/SpanPayloadCheckQuery.java PayloadChecker): the
    ordered ``terms`` must occur at consecutive positions and the
    payload at position j must satisfy (op, ptype) against
    ``expected[j]``; a None expectation matches ONLY a missing payload
    (:222-224); a missing payload fails any non-None expectation
    (:226-229). Vectorized: one flat split + partition, shifted-mask
    conjunction over the flat stream (the phrase-kernel shape).
    """
    if op not in _OPS:
        raise ValueError(f"unknown operation {op!r}; expected {_OPS}")
    if len(expected) != len(terms):
        raise ValueError("expected must align with terms (one payload "
                         "check per span position)")
    n = len(texts)
    counts = np.zeros(n, dtype=np.int64)
    toks = texts.fillna("").str.lower().str.split()
    lens = toks.str.len().to_numpy(dtype=np.int64)
    total = int(lens.sum())
    L = len(terms)
    if total == 0 or L == 0 or total < L:
        return counts
    flat = np.concatenate([np.asarray(t, dtype=object) if t
                           else np.empty(0, object) for t in toks])
    row_of = np.repeat(np.arange(n, dtype=np.int64), lens)
    parts = pd.Series(flat, dtype=object).str.partition(PAYLOAD_DELIM)
    tarr = parts[0].to_numpy(dtype=object)
    has_pay = parts[1].to_numpy(dtype=object) == PAYLOAD_DELIM
    pays = parts[2].to_numpy(dtype=object)
    vals = _decode(pays, has_pay, ptype)
    m = total - L + 1
    ok = np.ones(m, dtype=bool)
    for j, (term, exp) in enumerate(zip(terms, expected)):
        sl = slice(j, j + m)
        ok &= tarr[sl] == term
        if exp is None:
            ok &= ~has_pay[sl]
        elif ptype == "string":
            ok &= has_pay[sl] & _compare(pays[sl], exp, op, ptype)
        else:
            ok &= has_pay[sl] & _compare(vals[sl], exp, op, ptype)
    # the span must not straddle a document boundary
    ok &= row_of[:m] == row_of[L - 1:]
    hit_rows = row_of[:m][ok]
    if hit_rows.size:
        np.add.at(counts, hit_rows, 1)
    return counts
