"""Document chunking (ops/chunking.py): sliding token windows with the
end-aligned final chunk, Catalyst variant vs a brute recompute and the
span variant vs the real tokenizer's character offsets."""

import re

import pytest
from pyspark.sql import functions as F

from lucene_spark.kernels.tokenizer import tokenize_spans
from lucene_spark.ops.chunking import chunk_documents, chunk_documents_spans

TEXTS = [
    (0, "The quick brown fox jumps over the lazy dog again and again"),
    (1, "short one"),
    (2, "... !!! ???"),                        # zero tokens
    (3, " ".join(f"tok{i}" for i in range(17))),   # n = W + 1 edge
    (4, " ".join(f"w{i}" for i in range(16))),     # n == W exactly
    (5, " ".join(f"x{i}" for i in range(28))),     # end aligned to stride
    (6, "MiXeD Case, punct-uation; and   spacing\tkept!"),
]
W, V = 16, 4  # window, overlap -> stride 12


def _brute_starts(n, w, s):
    if n == 0:
        return []
    if n <= w:
        return [0]
    starts = [st for st in range(0, n - w, s) if st + w < n]
    starts.append(n - w)
    return starts


def _brute(texts, w, v):
    s = w - v
    rows = []
    for did, t in texts:
        toks = re.findall("[0-9a-z]+", t.lower())
        for ci, st in enumerate(_brute_starts(len(toks), w, s)):
            en = min(st + w, len(toks))
            rows.append((did, ci, st, en - st, " ".join(toks[st:en])))
    return sorted(rows)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(TEXTS, "doc_id bigint, text string")


def test_catalyst_chunks_match_brute(spark, docs):
    got = sorted((int(r["doc_id"]), int(r["chunk_idx"]),
                  int(r["start_tok"]), int(r["n_chunk_tokens"]),
                  r["chunk_text"])
                 for r in chunk_documents(docs, W, V).collect())
    assert got == _brute(TEXTS, W, V)


def test_zero_overlap_and_full_window_edges(spark, docs):
    got = sorted((int(r["doc_id"]), int(r["start_tok"]))
                 for r in chunk_documents(docs, 8, 0).collect())
    assert got == [(d, st) for d, _c, st, _n, _t in _brute(TEXTS, 8, 0)]
    # n == W -> exactly one chunk
    one = chunk_documents(docs.filter(F.col("doc_id") == 4), 16, 4).collect()
    assert len(one) == 1 and one[0]["n_chunk_tokens"] == 16


def test_no_shuffle_plan(spark, docs):
    plan = chunk_documents(docs, W, V)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_span_chunks_slice_original_text(spark, docs):
    got = chunk_documents_spans(docs, 10, 2).collect()
    by_doc: dict = {}
    for r in got:
        by_doc.setdefault(int(r["doc_id"]), []).append(r)
    for did, text in TEXTS:
        spans = [(m.start(), m.end()) for m in tokenize_spans(text)]
        starts = _brute_starts(len(spans), 10, 8)
        rows = sorted(by_doc.get(did, []), key=lambda r: r["chunk_idx"])
        assert len(rows) == len(starts)
        for r, st in zip(rows, starts):
            en = min(st + 10, len(spans))
            assert r["chunk_text"] == text[spans[st][0]:spans[en - 1][1]]
            # original casing/spacing preserved: chunk is a substring
            assert r["chunk_text"] in text


def test_invalid_params_raise(spark, docs):
    with pytest.raises(ValueError):
        chunk_documents(docs, 0, 0)
    with pytest.raises(ValueError):
        chunk_documents(docs, 8, 8)
