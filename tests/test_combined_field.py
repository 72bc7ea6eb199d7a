"""CombinedFieldQuery: BM25F-style cross-field scoring.

Reference parity (core:search/CombinedFieldQuery.java,
MultiNormsLeafSimScorer.java; test model
core/src/test/org/apache/lucene/search/TestCombinedFieldQuery.java):
- per-doc freq = float32 sum of weight * tf over every (term, field)
  posting (CombinedFieldScorer.freq, :430-437)
- combined norm = SmallFloat re-encode of round(sum weight * decoded
  length) over fields WITH norms; omitted-norms keyword fields
  contribute nothing (MultiNormsLeafSimScorer.java:163-174)
- pseudo stats: df = max over (term, field); ttf & sumTotalTermFreq =
  weighted sums with long truncation; docCount = max (:274-316)

The brute oracle below replicates those rules literally from the
docstore; the engine must match bit-for-bit (float32).
"""

import numpy as np
import pytest

from lucene_spark.fixtures.transcripts import term_string, transcripts_df
from lucene_spark.index import build_index
from lucene_spark.index.catalog import IndexCatalog
from lucene_spark.kernels.bm25 import BM25Scorer
from lucene_spark.kernels.smallfloat import (LENGTH_TABLE, byte4_to_int,
                                             int_to_byte4)
from lucene_spark.kernels.tokenizer import tokenize_one
from lucene_spark.search import IndexSearcher
from lucene_spark.search.query import (BooleanQuery, CombinedFieldQuery,
                                       TermQuery)

T = [term_string(k) for k in range(30)]


@pytest.fixture(scope="module")
def cf_index(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("cf") / "idx")
    src = transcripts_df(spark, n_convs=60, seed=7, partitions=4)
    build_index(spark, src, out, num_buckets=4,
                keyword_fields=("role", "tool"))
    return out


@pytest.fixture(scope="module")
def corpus(spark, cf_index):
    cat = IndexCatalog(cf_index)
    pdf = (spark.read.parquet(cat.table_path("docstore"))
           .select("doc_id", "text", "role").orderBy("doc_id").toPandas())
    pdf["toks"] = [tokenize_one(t) for t in pdf["text"].fillna("")]
    return pdf


def brute_combined(corpus, field_stats, keyword_fields, terms, fields,
                   boost=1.0):
    """Literal per-doc replication of the reference scoring rules."""
    df = 0
    ttf = 0
    tf_cols = []  # (weight, per-doc tf array) per present (field, term)
    n = len(corpus)
    for f, w in fields:
        for t in terms:
            if f == "text":
                tfs = np.array([toks.count(t) for toks in corpus["toks"]],
                               dtype=np.int64)
            elif f == "role":
                tfs = (corpus["role"] == t).to_numpy().astype(np.int64)
            else:
                tfs = np.zeros(n, dtype=np.int64)
            d = int((tfs > 0).sum())
            if d == 0:
                continue
            df = max(df, d)
            ttf = int(ttf + float(w) * int(tfs.sum()))
            tf_cols.append((np.float32(w), tfs))
    dc = 0
    sttf = 0
    for f, w in fields:
        fdc, fsttf = field_stats[f]
        dc = max(dc, fdc)
        sttf = int(sttf + float(w) * fsttf)
    freq = np.zeros(n, dtype=np.float32)
    for w, tfs in tf_cols:
        freq = freq + w * tfs.astype(np.float32)
    # combined norms: text is the only norms field in this index
    text_w = dict(fields).get("text")
    lens = np.array([len(toks) for toks in corpus["toks"]], dtype=np.int64)
    ql = LENGTH_TABLE[np.asarray(int_to_byte4(lens), dtype=np.int64)]
    comb = np.float32(text_w) * ql.astype(np.float32)
    codes = np.asarray(int_to_byte4(
        np.floor(comb + np.float32(0.5)).astype(np.int64)), dtype=np.uint8)
    sc = BM25Scorer(df, dc, sttf, boost=boost)
    scores = sc.score(freq, codes)
    hit = freq > 0
    docs = corpus["doc_id"].to_numpy()[hit]
    return {int(d): np.float32(s) for d, s in zip(docs, scores[hit])}


def _rank(d, k):
    return sorted(d.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


@pytest.mark.parametrize("fields", [
    (("text", 1.0), ("role", 1.0)),
    (("text", 1.0), ("role", 2.0)),
    (("text", 2.5), ("role", 1.0)),  # norm re-encode exercised
])
def test_combined_matches_brute(spark, cf_index, corpus, fields):
    s = IndexSearcher(spark, cf_index)
    terms = (T[2], "user")
    q = CombinedFieldQuery(terms=terms, fields=fields)
    got = s.search(q, k=25)
    want = _rank(brute_combined(corpus, s.field_stats, s.keyword_fields,
                                terms, fields), 25)
    assert [(d, float(sc)) for d, sc in got] \
        == [(d, float(sc)) for d, sc in want]


def test_combined_boost_and_count(spark, cf_index, corpus):
    s = IndexSearcher(spark, cf_index)
    q = CombinedFieldQuery(terms=(T[1],), fields=(("text", 1.0),
                                                  ("role", 1.0)),
                           boost=2.0)
    got = s.search(q, k=10)
    want = _rank(brute_combined(corpus, s.field_stats, s.keyword_fields,
                                (T[1],), (("text", 1.0), ("role", 1.0)),
                                boost=2.0), 10)
    assert [(d, float(sc)) for d, sc in got] \
        == [(d, float(sc)) for d, sc in want]
    # count path sees every match
    n_match = len(brute_combined(corpus, s.field_stats, s.keyword_fields,
                                 (T[1],), (("text", 1.0), ("role", 1.0))))
    assert s.count(q) == n_match


def test_combined_pruned_equals_exhaustive(spark, cf_index):
    s = IndexSearcher(spark, cf_index)
    q = CombinedFieldQuery(terms=(T[2], T[5], "user"),
                           fields=(("text", 1.0), ("role", 3.0)))
    a = s.search_df(q, k=15, pruned=True).collect()
    b = s.search_df(q, k=15, pruned=False).collect()
    assert [(r["doc_id"], r["score"]) for r in a] \
        == [(r["doc_id"], r["score"]) for r in b]


def test_combined_nested_in_bool_pruned(spark, cf_index):
    s = IndexSearcher(spark, cf_index)
    cf = CombinedFieldQuery(terms=(T[2],), fields=(("text", 1.0),
                                                   ("role", 2.0)))
    q = BooleanQuery(must=(cf,), should=(TermQuery(T[4]),))
    a = s.search_df(q, k=10, pruned=True).collect()
    b = s.search_df(q, k=10, pruned=False).collect()
    assert [(r["doc_id"], r["score"]) for r in a] \
        == [(r["doc_id"], r["score"]) for r in b]
    assert len(a) > 0


def test_weight_below_one_rejected():
    with pytest.raises(ValueError):
        CombinedFieldQuery(terms=("x",), fields=(("text", 0.5),))


def test_norm_reencode_is_quantized():
    # Q(round(w * decoded)) must itself be a representable code value
    lens = np.arange(0, 256, dtype=np.int64)
    codes = np.asarray(int_to_byte4(lens), dtype=np.int64)
    dec = np.asarray([byte4_to_int(c) for c in codes])
    again = np.asarray(int_to_byte4(dec), dtype=np.int64)
    assert (again == codes).all()  # idempotent on decoded values
