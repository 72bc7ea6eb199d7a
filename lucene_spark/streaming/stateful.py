"""Custom stateful streaming operator: running per-conversation stats.

Demonstrates the applyInPandasWithState extension point (the Spark
analog of a custom stateful Collector) on the transcript stream: state
per conv_id = (turns seen, tokens seen, last turn index); each
micro-batch emits the updated totals for the conversations it touched.
At 10^12-turn scale this is the canonical shape for incremental
per-conversation quality/length accounting feeding curation decisions.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..kernels.tokenizer import tokenize_series

OUTPUT_SCHEMA = ("conv_id string, n_turns bigint, n_tokens bigint, "
                 "max_turn_idx int")
STATE_SCHEMA = "n_turns bigint, n_tokens bigint, max_turn_idx int"


def _update(key, pdfs, state: GroupState):
    n_turns, n_tokens, max_ti = (state.get if state.exists else (0, 0, -1))
    for pdf in pdfs:
        if not len(pdf):
            continue
        n_turns += len(pdf)
        n_tokens += int(tokenize_series(pdf["text"]).str.len().sum())
        max_ti = max(max_ti, int(pdf["turn_idx"].max()))
    state.update((n_turns, n_tokens, max_ti))
    yield pd.DataFrame({"conv_id": [key[0]], "n_turns": [n_turns],
                        "n_tokens": [n_tokens], "max_turn_idx": [max_ti]})


def running_conv_stats(stream_df: DataFrame) -> DataFrame:
    """transcripts stream -> stream of updated per-conversation totals."""
    return (stream_df
            .groupBy("conv_id")
            .applyInPandasWithState(
                _update, OUTPUT_SCHEMA, STATE_SCHEMA,
                "append", GroupStateTimeout.NoTimeout))
