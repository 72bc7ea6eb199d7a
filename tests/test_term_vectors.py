"""Term vectors: per-doc (term, freq, positions) reconstruction
(core:index/TermVectors.java; IndexReader.getTermVector)."""

import pytest
from pyspark.sql import functions as F

from lucene_spark.kernels.tokenizer import analyze_one
from lucene_spark.search import IndexSearcher


@pytest.fixture(scope="module")
def searcher(spark, small_index):
    return IndexSearcher(spark, small_index)


def _stored_text(searcher, doc_id):
    return (searcher._read_cached(searcher.docstore_paths)
            .filter(F.col("doc_id") == doc_id)
            .select("text").collect()[0]["text"])


def test_term_vector_matches_reanalysis(searcher):
    doc_ids = [3, 17, 42]
    got = {}
    for r in searcher.term_vectors(doc_ids).collect():
        got.setdefault(r["doc_id"], {})[r["term"]] = (
            r["freq"], list(r["positions"]))
    assert set(got) == set(doc_ids)
    for d in doc_ids:
        toks = analyze_one(_stored_text(searcher, d), "standard")
        want = {}
        for i, t in enumerate(toks):
            want.setdefault(t, []).append(i)
        assert got[d] == {t: (len(p), p) for t, p in want.items()}


def test_term_vector_freqs_agree_with_postings(searcher):
    """The reconstructed vector must agree with the inverted index:
    freq(t, d) from the vector == tf from the term's posting list."""
    d = 5
    vec = {r["term"]: r["freq"]
           for r in searcher.term_vectors([d]).collect()}
    assert vec
    for t in sorted(vec)[:5]:
        post = {r["doc_id"]: r["tf"]
                for r in searcher.term_postings(t).collect()}
        assert post[d] == vec[t], t


def test_term_vector_keyword_field(searcher):
    rows = searcher.term_vectors([2, 9], field="role").collect()
    assert {r["doc_id"] for r in rows} == {2, 9}
    for r in rows:
        assert r["freq"] == 1 and list(r["positions"]) == [0]
        assert r["term"]  # the untokenized stored value


def test_term_vector_positions_drive_phrases(searcher):
    """Adjacent positions in the vector are exactly the phrase matcher's
    evidence: pick an adjacent pair from doc 4's vector and assert
    phrase_matches finds doc 4."""
    rows = searcher.term_vectors([4]).collect()
    pos2term = {}
    for r in rows:
        for p in r["positions"]:
            pos2term[p] = r["term"]
    pair = next((pos2term[i], pos2term[i + 1])
                for i in sorted(pos2term) if i + 1 in pos2term)
    hits = {r["doc_id"]
            for r in searcher.phrase_matches(list(pair)).collect()}
    assert 4 in hits
