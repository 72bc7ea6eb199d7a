"""Tokenizer parity tests (StandardAnalyzer subset: ASCII alphanumeric,
lowercase, empty stop set, maxTokenLength=255)."""

import numpy as np
import pandas as pd
import pytest

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


# ---- UAX#29-flavored word break (round-3 upgrade) ----------------------

UAX_CASES = [
    ("Don't stop", ["don't", "stop"]),
    ("o’clock", ["o’clock"]),
    ("U.S.A. works", ["u.s.a", "works"]),
    ("state-of-the-art", ["state", "of", "the", "art"]),
    ("3.14 and 1,000 items", ["3.14", "and", "1,000", "items"]),
    ("1:2 vs a:b", ["1", "2", "vs", "a:b"]),  # MidLetter ':' letters only
    ("a,b", ["a", "b"]),                      # MidNum ',' digits only
    ("snake_case MP3 Café", ["snake_case", "mp3", "café"]),
    ("hello, world!", ["hello", "world"]),
    ("日本語テスト", ["日", "本", "語", "テスト"]),  # Han singles, Katakana run
    ("ひらがな", ["ひ", "ら", "が", "な"]),
    ("emoji 😀 here", ["emoji", "here"]),
    ("trailing' quote'", ["trailing", "quote"]),
    ("'leading", ["leading"]),
]


@pytest.mark.parametrize("text,want", UAX_CASES,
                         ids=[c[0][:16] for c in UAX_CASES])
def test_uax29_word_break(text, want):
    assert tokenize_one(text) == want


def test_uax29_series_matches_one():
    import pandas as pd
    texts = pd.Series([c[0] for c in UAX_CASES] + [None, ""])
    got = tokenize_series(texts).tolist()
    assert got[:len(UAX_CASES)] == [c[1] for c in UAX_CASES]
    assert got[-2:] == [[], []]


def test_ascii_alnum_subset_unchanged():
    """The fixture corpora and the DuckDB oracle prelude tokenize with
    [0-9a-z]+ — pure ASCII-alnum text must tokenize identically."""
    import re
    old = re.compile(r"[0-9a-z]+")
    samples = ["slow fast merge scan 42 sort7", "a b c",
               "batch  hash\tvector\nstream", "Mixed CASE tokens 007"]
    for s in samples:
        assert tokenize_one(s) == old.findall(s.lower())
