"""Tokenizer parity tests (StandardAnalyzer subset: ASCII alphanumeric,
lowercase, empty stop set, maxTokenLength=255)."""

import numpy as np
import pandas as pd

from lucene_spark.kernels.tokenizer import (MAX_TOKEN_LENGTH, token_counts,
                                            tokenize_one, tokenize_series)


def test_basic_split_and_lowercase():
    s = pd.Series(["Hello World w000017", "a,b;c--d", "", None, "123 abc123 ABC"])
    toks = tokenize_series(s)
    assert toks[0] == ["hello", "world", "w000017"]
    assert toks[1] == ["a", "b", "c", "d"]
    assert toks[2] == []
    assert toks[3] == []
    assert toks[4] == ["123", "abc123", "abc"]


def test_long_token_split_at_255():
    long_tok = "x" * 600
    toks = tokenize_one("a " + long_tok + " b")
    assert toks == ["a", "x" * 255, "x" * 255, "x" * 90, "b"]
    s = pd.Series(["a " + long_tok])
    assert tokenize_series(s)[0] == ["a", "x" * 255, "x" * 255, "x" * 90]
    assert MAX_TOKEN_LENGTH == 255


def test_token_counts_vectorized():
    s = pd.Series(["one two three", "", "x y"])
    np.testing.assert_array_equal(token_counts(s), [3, 0, 2])


def test_positions_are_sequential():
    # position = token index after filtering; our analyzer drops nothing,
    # so positions are 0..n-1 (StandardAnalyzer: empty stop set)
    toks = tokenize_one("The quick brown fox")
    assert toks == ["the", "quick", "brown", "fox"]
