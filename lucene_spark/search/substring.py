"""Trigram-accelerated substring search (index-backed grep).

The classic trigram-index design (the field layout of code-search
engines; in the reference the same role is played by running a
WildcardQuery('*pat*') through AutomatonTermsEnum over the term
dictionary, core:search/WildcardQuery.java +
core:index/AutomatonTermsEnum.java — a full dictionary scan per
query). Over a field indexed with the 'ngram' chain
(kernels/ngram.py: NGramTokenFilter(3, 3, preserveOriginal)), a
case-insensitive within-token substring predicate becomes:

  len(pattern) <= 3
      every token containing the pattern contributes an index term
      that CONTAINS the pattern (one of its trigrams, or the short
      token itself), so a wildcard '*pat*' expansion over the
      (ngram-field) term dictionary followed by a TermInSet match is
      EXACT — no verification needed. The dictionary scan is the
      pushed-down executor-side predicate expand_terms already runs;
      its cost is O(|trigram vocabulary|) <= O(alphabet^3 + short
      tokens), independent of corpus size.

  len(pattern) > 3
      the pattern's trigrams occupy consecutive positions inside any
      token that contains it, so PhraseQuery(trigrams) PRUNES the
      corpus to docs whose gram stream contains the pattern
      contiguously (false positives only when the phrase bridges a
      token boundary — sequential position assignment, see
      kernels/ngram.py). Candidates then VERIFY against the stored
      text with the engine's own tokenizer, vectorized over the flat
      candidate token stream (numpy find, no per-row Python).

At 100 TB this is the right shape: the phrase step is the ordinary
distributed postings intersection (per-bucket kernels, block-max
machinery), the verify step touches only candidate doc_ids via the
docstore broadcast join, and nothing ever scans raw text corpus-wide.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..kernels.ngram import NGRAM_SIZE
from .query import MultiTermQuery, PhraseQuery, PreAnalyzed, TermQuery


def _grams(pat: str) -> list:
    """The pattern's sliding trigram sequence — deliberately NOT
    kernels.ngram._ngrams_of, which also appends the preserveOriginal
    whole token; the query needs only the gram window."""
    return [pat[i:i + NGRAM_SIZE] for i in range(len(pat) - NGRAM_SIZE + 1)]


def substring_search(searcher, pattern: str, field: str = "text",
                     text_col: str = "text") -> DataFrame:
    """All doc_ids whose ``text_col`` contains ``pattern`` as a
    case-insensitive substring of a single token. ``field`` must be
    indexed with the 'ngram' analyzer chain; ``text_col`` is the
    stored column the long-pattern path verifies against.

    Returns a DataFrame with one column ``doc_id`` (unsorted — order
    downstream like any match stream).
    """
    from ..kernels.tokenizer import tokenize_one, tokenize_series

    pat = (pattern or "").lower()
    if tokenize_one(pat) != [pat]:
        raise ValueError(
            f"pattern {pattern!r} is not a single token substring "
            "(substring_search matches within tokens)")
    chain = searcher._field_chain(field)
    if chain != "ngram":
        raise ValueError(
            f"field {field!r} uses analyzer {chain!r}; substring_search "
            "needs the 'ngram' (trigram) chain")

    if len(pat) == NGRAM_SIZE:
        # a token contains a 3-char pattern iff the pattern IS one of
        # its emitted grams (or the whole short token) — one exact
        # TermQuery, no dictionary scan at all
        return (searcher.matches_df(PreAnalyzed(TermQuery(pat,
                                                          field=field)))
                .select("doc_id"))

    if len(pat) < NGRAM_SIZE:
        # exact via the dictionary: every indexed gram/short-token of a
        # containing token itself contains the pattern. The wildcard
        # scan is bounded by the trigram vocabulary (alphabet^3 + short
        # tokens + preserved originals); expansion is materialized ONCE
        # here so a cap hit RAISES instead of silently dropping matches
        cap = 1 << 22
        q = MultiTermQuery("wildcard", f"*{pat}*", field=field,
                           rewrite="constant_score", max_expansions=cap)
        expanded = searcher.expand_terms(q)
        if len(expanded) >= cap:
            raise RuntimeError(
                f"substring_search: '*{pat}*' expansion hit the "
                f"{cap}-term cap; result would be silently partial — "
                "use a longer pattern")
        if not expanded:
            return searcher.matches_df(
                PreAnalyzed(TermQuery("\x00none", field=field))
            ).select("doc_id")
        return searcher.matches_df(
            MultiTermQuery("set", tuple(expanded), field=field,
                           rewrite="constant_score",
                           max_expansions=len(expanded))
        ).select("doc_id")

    # prune: the pattern's trigrams, consecutively, somewhere in the
    # gram stream. PreAnalyzed: grams are dictionary-level strings —
    # don't re-analyze them through the chain.
    phrase = PhraseQuery(tuple(_grams(pat)), field=field)
    cand = searcher.matches_df(PreAnalyzed(phrase)).select("doc_id")

    # verify: engine-tokenizer parity, vectorized over the flat token
    # stream of the (small) candidate set
    @F.pandas_udf("boolean")
    def _contains_tok(texts: pd.Series) -> pd.Series:
        toks = tokenize_series(texts)
        lens = toks.str.len().to_numpy(dtype=np.int64)
        if int(lens.sum()) == 0:
            return pd.Series(np.zeros(lens.size, dtype=bool),
                             index=toks.index)
        flat = np.concatenate(
            [np.asarray(t, dtype=object) if t else np.empty(0, object)
             for t in toks]).astype("U")
        hit = np.char.find(flat, pat) >= 0
        row_id = np.repeat(np.arange(lens.size), lens)
        n_hits = np.bincount(row_id[hit], minlength=lens.size)
        return pd.Series(n_hits > 0, index=toks.index)

    # candidate-side join WITHOUT a broadcast hint: a selective
    # pattern's candidates are tiny (AQE broadcasts them), but a
    # common substring can match most of the corpus — forcing
    # broadcast there (retrieve()'s top-k assumption) would ship a
    # corpus-sized doc_id set to every executor at 10^12 docs
    ds = searcher._read_cached(searcher.docstore_paths)
    return (ds.join(cand, "doc_id")
            .filter(_contains_tok(F.col(text_col)))
            .select("doc_id"))
