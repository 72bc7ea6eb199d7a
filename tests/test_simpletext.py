"""SimpleText codec analog: export grammar, independent re-reader,
cross-reader BM25 equivalence (lucene/codecs/simpletext parity)."""

import os

import pytest

from lucene_spark.index.simpletext import (export_simpletext,
                                           read_simpletext_postings,
                                           verify_simpletext)
from lucene_spark.search import IndexSearcher
from lucene_spark.fixtures.transcripts import term_string


@pytest.fixture(scope="module")
def exported(spark, small_index, tmp_path_factory):
    s = IndexSearcher(spark, small_index)
    out = str(tmp_path_factory.mktemp("simpletext"))
    counts = export_simpletext(s, out)
    return s, out, counts


def test_export_files_and_grammar(exported):
    s, out, counts = exported
    for f in ("postings.txt", "norms.txt", "stats.txt", "docstore.txt"):
        assert counts[f] > 0 and os.path.exists(os.path.join(out, f))
    lines = open(os.path.join(out, "postings.txt")).read().splitlines()
    assert lines[0] == "field text" and lines[-1] == "END"
    assert any(l.startswith("  term ") for l in lines)
    assert any(l.startswith("    doc ") for l in lines)
    assert any(l.startswith("      freq ") for l in lines)


def test_independent_reader_matches_engine(exported):
    s, out, _ = exported
    post = read_simpletext_postings(os.path.join(out, "postings.txt"))
    t = term_string(2)
    assert t in post
    want = sorted((int(r["doc_id"]), int(r["tf"]))
                  for r in s.term_postings(t).collect())
    assert sorted(post[t]) == want
    # df in the dump == the dictionary's df
    assert len(post[t]) == s.term_stats([t], "text")[t][0]


def test_cross_reader_bm25_equivalence(exported):
    s, out, _ = exported
    assert verify_simpletext(out, s, [term_string(2), term_string(5)],
                             k=10)


def test_docstore_dump_roundtrips_tokens(exported, spark, small_index):
    s, out, _ = exported
    from lucene_spark.kernels.tokenizer import tokenize_one
    stored = {}
    for line in open(os.path.join(out, "docstore.txt")):
        _, doc_id, _, text = line.split(" ", 3)
        stored[int(doc_id)] = tokenize_one(text.rstrip("\n"))
    rows = (s._read_cached(s.docstore_paths)
            .select("doc_id", "text").collect())
    for r in rows[:50]:
        assert stored[int(r["doc_id"])] == tokenize_one(r["text"] or "")


def test_export_keyword_field_norms_constant(spark, tmp_path):
    """Keyword fields omit norms (StringField omitNorms): the export
    writes constant code 1 per doc and verify scores with it; a
    non-default field without stored norms raises."""
    import os
    import pytest
    from lucene_spark.fixtures.transcripts import transcripts_df
    from lucene_spark.index import build_index
    from lucene_spark.index.simpletext import (export_simpletext,
                                               verify_simpletext)
    from lucene_spark.search.searcher import IndexSearcher
    idx = str(tmp_path / "kwidx")
    build_index(spark, transcripts_df(spark, n_convs=30, seed=3,
                                      partitions=2),
                idx, num_buckets=2, keyword_fields=("role",))
    s = IndexSearcher(spark, idx)
    out = str(tmp_path / "st_role")
    counts = export_simpletext(s, out, field="role", max_terms=10)
    norms = open(os.path.join(out, "norms.txt")).read().splitlines()
    assert norms and all(line.endswith("norm 1") for line in norms)
    assert counts["norms.txt"] == len(norms)
    roles = [line.split()[1] for line in
             open(os.path.join(out, "postings.txt"))
             if line.strip().startswith("term ")]
    assert roles
    assert verify_simpletext(out, s, roles[:2], k=5, field="role")
    with pytest.raises(ValueError):
        export_simpletext(s, str(tmp_path / "bad"), field="nosuch")
