"""spark-submit packaging: the dist zip must be zipimport-able (the
--py-files contract) and a spark-submit-shaped build driven through a
local session must produce a searchable index."""

import os
import subprocess
import sys


def test_zip_is_importable(tmp_path):
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from tools.make_pyfiles import build
    zp = build(str(tmp_path))
    assert os.path.exists(zp)
    code = (
        "import sys; sys.path.insert(0, %r); "
        "import lucene_spark.kernels.bm25 as b; "
        "import lucene_spark.search.query as q; "
        "import lucene_spark.index.builder as ib; "
        "print(b.BM25Scorer(1, 10, 100).idf > 0)" % zp)
    out = subprocess.run([sys.executable, "-c", code],
                         capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    assert out.stdout.strip() == "True"


def test_submit_build_end_to_end(spark, tmp_path):
    """Drive tools/submit_build.py's main() against a local session —
    the same code path spark-submit runs on a cluster."""
    from lucene_spark.fixtures.transcripts import transcripts_df
    src = str(tmp_path / "src")
    out = str(tmp_path / "idx")
    transcripts_df(spark, n_convs=20, seed=1, partitions=2) \
        .write.parquet(src)
    import sys as _s
    argv = _s.argv
    _s.argv = ["submit_build.py", "--input", src, "--output", out,
               "--buckets", "2", "--keyword-fields", "role"]
    try:
        from tools import submit_build
        submit_build.main(spark)  # reuse the test session
    finally:
        _s.argv = argv
    from lucene_spark.search import IndexSearcher
    from lucene_spark.search.query import MatchAllQuery, TermQuery
    s = IndexSearcher(spark, out)
    assert s.count(MatchAllQuery()) == s.doc_count > 0
    assert "role" in s.keyword_fields
    assert s.search(TermQuery("user", field="role"), k=5)
