"""DirectSpellChecker analog (suggest/spell/DirectSpellChecker.java):
"did you mean" over the term dictionary, OSA-ranked by the
SuggestWordQueue default comparator (similarity desc, df desc)."""

import pytest

from lucene_spark.search import IndexSearcher
from lucene_spark.search.query import TermQuery


@pytest.fixture(scope="module")
def spell_index(spark, tmp_path_factory):
    from lucene_spark.index import build_index
    texts = (["the vector index stores vectors"] * 4
             + ["a victor among detectors"]
             + ["vectors and sectors"] * 2
             + ["common common common words here"] * 20)
    rows = [(f"c{i:04d}", 0, "user", t, "none")
            for i, t in enumerate(texts)]
    src = (spark.createDataFrame(rows,
                                 "conv_id string, turn_idx int, role string, "
                                 "text string, tool string")
           .selectExpr("*", "timestamp('2026-01-01') as ts"))
    out = str(tmp_path_factory.mktemp("spell") / "idx")
    build_index(spark, src, out, num_buckets=2)
    return out


def test_spell_basic_ranking(spark, spell_index):
    s = IndexSearcher(spark, spell_index)
    got = s.spell_suggest("vectro", n=3).collect()
    terms = [r["term"] for r in got]
    # transposition = ONE edit (LuceneLevenshteinDistance):
    # 'vector' (dist 1) ranks above 'vectors' (dist 2)
    assert terms[0] == "vector"
    assert "vectors" in terms
    d = {r["term"]: r["dist"] for r in got}
    assert d["vector"] == 1 and d["vectors"] == 2
    sc = {r["term"]: r["score"] for r in got}
    assert sc["vector"] > sc["vectors"]


def test_spell_gates(spark, spell_index):
    s = IndexSearcher(spark, spell_index)
    # min_query_length: too-short queries get nothing
    assert s.spell_suggest("vec", min_query_length=4).count() == 0
    # a correctly-spelled (indexed) term gets nothing by default
    assert s.spell_suggest("vector").count() == 0
    # ... unless mode='always' (with the frequency gate relaxed — it
    # applies regardless of mode, like the reference)
    got = s.spell_suggest("vector", mode="always", n=5,
                          max_query_frequency=1.0).collect()
    assert "vectors" in {r["term"] for r in got}
    assert "vector" not in {r["term"] for r in got}  # never itself
    # max_query_frequency: a too-common term is "correct" even under
    # mode='always'
    assert s.spell_suggest("common", mode="always",
                           max_query_frequency=0.01).count() == 0
    # more_popular: candidates need df above the query's
    got = s.spell_suggest("victor", mode="more_popular", n=5,
                          max_query_frequency=1.0).collect()
    # vector (dist 1, df 4) and vectors (dist 2, df 6) — both more
    # popular than victor's df 1; similarity ranks vector first
    assert [r["term"] for r in got] == ["vector", "vectors"]
    # min_prefix=1 (default): candidates must share the first char
    got = s.spell_suggest("dector", n=10, mode="always",
                          max_query_frequency=1.0).collect()
    assert all(r["term"].startswith("d") for r in got)


def test_spell_plan_pushdown(spark, spell_index):
    """The length band + prefix predicates reach the parquet scan."""
    s = IndexSearcher(spark, spell_index)
    df = s.spell_suggest("vectro", n=3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "StartsWith" in plan, plan
