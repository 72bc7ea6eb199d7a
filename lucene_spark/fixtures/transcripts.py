"""Deterministic multi-turn transcript generator (FIXTURES.md §1).

Schema (BASELINE.json input_hint): conv_id string, turn_idx int32,
role string, text string, tool string, ts timestamp.

Every conversation is generated from its own PCG64 stream seeded by
(seed, conv_idx), so generation is embarrassingly parallel and
insensitive to partitioning: `spark.range(n_convs)` → `mapInPandas`
produces identical data at local[1] and on a 1000-executor cluster.

Text: Zipf(s=1.07) over a 30,000-token vocabulary (lowercase ASCII words
`w000000`…, ~2% numeric tokens, ~1% mixed-case to exercise lowercasing);
length ~ LogNormal(mu=3.4, sigma=0.8) capped at 800 tokens so norm codes
cross SmallFloat's lossy range (>39).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

VOCAB_SIZE = 30_000
ZIPF_S = 1.07
MAX_TURNS = 40
MAX_TOKENS = 800
TOOLS = [f"tool_{i:02d}" for i in range(12)]
BASE_TS = np.datetime64("2026-01-01T00:00:00")

_CUMPROBS = None
_TOKEN_STRINGS = None


def _cumprobs() -> np.ndarray:
    global _CUMPROBS
    if _CUMPROBS is None:
        ranks = np.arange(1, VOCAB_SIZE + 1, dtype=np.float64)
        p = ranks ** -ZIPF_S
        p /= p.sum()
        _CUMPROBS = np.cumsum(p)
    return _CUMPROBS


def token_string(k: int) -> str:
    """Deterministic surface form of vocab id k (0-based rank)."""
    if k % 50 == 0:
        return str(100000 + k)          # ~2% numeric tokens
    if k % 100 == 37:
        return f"W{k:06d}"              # ~1% mixed-case (lowercases to w...)
    return f"w{k:06d}"


def term_string(k: int) -> str:
    """Post-analysis (lowercased) term for vocab id k."""
    return token_string(k).lower()


def _token_strings() -> np.ndarray:
    global _TOKEN_STRINGS
    if _TOKEN_STRINGS is None:
        _TOKEN_STRINGS = np.array([token_string(k) for k in range(VOCAB_SIZE)], dtype=object)
    return _TOKEN_STRINGS


def generate_conversations(conv_ids: np.ndarray, seed: int = 42) -> pd.DataFrame:
    """Generate all turns for the given conversation indices.

    Returns a pandas DataFrame with the transcript schema; deterministic
    per (seed, conv_idx) regardless of how conv_ids are batched.
    """
    cum = _cumprobs()
    toks = _token_strings()
    rows_conv, rows_turn, rows_role, rows_text, rows_tool, rows_ts = [], [], [], [], [], []
    for ci in np.asarray(conv_ids, dtype=np.int64):
        rng = np.random.default_rng([seed, int(ci)])
        n_turns = min(1 + rng.poisson(7), MAX_TURNS)
        lengths = np.minimum(
            np.maximum(rng.lognormal(3.4, 0.8, n_turns).astype(np.int64), 1), MAX_TOKENS)
        total = int(lengths.sum())
        draws = np.searchsorted(cum, rng.random(total))
        texts = []
        off = 0
        for ln in lengths:
            texts.append(" ".join(toks[draws[off:off + ln]]))
            off += ln
        is_tool = rng.random(n_turns) < 0.10
        conv_id = f"conv{ci:08d}"
        for t in range(n_turns):
            rows_conv.append(conv_id)
            rows_turn.append(t)
            if is_tool[t]:
                rows_role.append("tool")
                rows_tool.append(TOOLS[int(rng.integers(0, len(TOOLS)))])
            else:
                rows_role.append("user" if t % 2 == 0 else "assistant")
                rows_tool.append(None)
            rows_text.append(texts[t])
            rows_ts.append(BASE_TS + np.timedelta64(int(ci) * 60 + t, "s"))
    return pd.DataFrame({
        "conv_id": pd.Series(rows_conv, dtype="string"),
        "turn_idx": pd.Series(rows_turn, dtype="int32"),
        "role": pd.Series(rows_role, dtype="string"),
        "text": pd.Series(rows_text, dtype="string"),
        "tool": pd.Series(rows_tool, dtype="string"),
        "ts": pd.Series(rows_ts, dtype="datetime64[us]"),
    })


TRANSCRIPT_SCHEMA = ("conv_id string, turn_idx int, role string, "
                     "text string, tool string, ts timestamp")


def transcripts_df(spark, n_convs: int, seed: int = 42, partitions: int | None = None):
    """Distributed deterministic transcripts DataFrame.

    `spark.range` over conv indices → mapInPandas(generate) — scales to any
    corpus size with no driver-side materialization and no shuffle.
    """
    parts = partitions or max(1, min(n_convs // 64, spark.sparkContext.defaultParallelism * 4))
    base = spark.range(0, n_convs, 1, parts)

    def gen(batches):
        for pdf in batches:
            if len(pdf):
                yield generate_conversations(pdf["id"].to_numpy(), seed=seed)

    return base.mapInPandas(gen, schema=TRANSCRIPT_SCHEMA)
