"""Deterministic reference query set (FIXTURES.md §2).

Mix: ~40% term, 25% AND (2-4 terms), 25% OR (2-5 terms), 10% phrase;
terms sampled across the df spectrum (head/torso/tail of the Zipf vocab)
so WAND pruning, singleton postings, and tail blocks are all exercised.
k in {10, 100}.
"""

from __future__ import annotations

import json

import numpy as np

from .transcripts import VOCAB_SIZE, term_string


def _sample_term(rng) -> str:
    bucket = rng.random()
    if bucket < 0.34:        # head: very frequent terms
        k = int(rng.integers(0, 10))
    elif bucket < 0.74:      # torso
        k = int(rng.integers(10, 1000))
    else:                    # tail: rare/singleton terms
        k = int(rng.integers(1000, VOCAB_SIZE))
    return term_string(k)


def generate_queries(n_queries: int = 60, seed: int = 4242) -> list:
    """Returns a list of query dicts: {qid, type, field, terms, k[, slop]}."""
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n_queries):
        r = rng.random()
        k = 10 if rng.random() < 0.7 else 100
        if r < 0.40:
            q = {"type": "term", "terms": [_sample_term(rng)]}
        elif r < 0.65:
            n = int(rng.integers(2, 5))
            q = {"type": "and", "terms": [_sample_term(rng) for _ in range(n)]}
        elif r < 0.90:
            n = int(rng.integers(2, 6))
            q = {"type": "or", "terms": [_sample_term(rng) for _ in range(n)]}
        else:
            # phrase terms drawn from the head so matches actually exist
            q = {"type": "phrase", "slop": 0,
                 "terms": [term_string(int(rng.integers(0, 30))) for _ in range(2)]}
        q.update(qid=f"q{i:04d}", field="text", k=k)
        out.append(q)
    return out


def write_queries_jsonl(path: str, n_queries: int = 60, seed: int = 4242) -> list:
    qs = generate_queries(n_queries, seed)
    with open(path, "w") as fh:
        for q in qs:
            fh.write(json.dumps(q) + "\n")
    return qs
