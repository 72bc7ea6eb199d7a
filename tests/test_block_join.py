"""ToParentBlockJoinQuery analog: conversation rollup of child-turn
scores with ScoreMode Max/Total/Avg/Min/None
(join/.../ToParentBlockJoinQuery.java:68), verified against a pandas
recomputation from the exhaustive match stream."""

import numpy as np
import pytest

from lucene_spark.fixtures.transcripts import term_string
from lucene_spark.index.catalog import IndexCatalog
from lucene_spark.search import IndexSearcher
from lucene_spark.search.query import BooleanQuery, OrQuery, TermQuery

T = [term_string(k) for k in range(30)]


@pytest.fixture(scope="module")
def env(spark, small_index):
    s = IndexSearcher(spark, small_index)
    ds = (spark.read.parquet(IndexCatalog(small_index).table_path("docstore"))
          .select("doc_id", "conv_id").toPandas())
    conv_of = dict(zip(ds["doc_id"], ds["conv_id"]))
    return s, conv_of


def _brute(matches, conv_of, mode, k):
    by_conv: dict = {}
    for d, sc in matches:
        by_conv.setdefault(conv_of[d], []).append(float(sc))
    rows = []
    for c, ss in by_conv.items():
        if mode == "max":
            v = max(ss)
        elif mode == "min":
            v = min(ss)
        elif mode == "total":
            v = sum(ss)
        elif mode == "avg":
            v = sum(ss) / len(ss)
        rows.append((c, np.float32(v), len(ss)))
    rows.sort(key=lambda r: (-r[1], r[0]))
    return rows[:k]


@pytest.mark.parametrize("mode", ["max", "total", "avg", "min"])
def test_block_join_modes_match_brute(spark, env, mode):
    s, conv_of = env
    q = OrQuery((T[1], T[4], T[9]))
    matches = [(int(r["doc_id"]), np.float32(r["score"]))
               for r in s.matches_df(q).collect()]
    assert matches
    got = [(r["conv_id"], np.float32(r["score"]), int(r["n_children"]))
           for r in s.block_join_search(q, k=8, score_mode=mode).collect()]
    want = _brute(matches, conv_of, mode, 8)
    assert [g[0] for g in got] == [w[0] for w in want]
    for g, w in zip(got, want):
        assert g[1] == pytest.approx(w[1], rel=1e-6)
        assert g[2] == w[2]


def test_block_join_none_mode(spark, env):
    s, conv_of = env
    q = TermQuery(T[2])
    matched_convs = sorted({conv_of[int(r["doc_id"])]
                            for r in s.matches_df(q).collect()})
    got = s.block_join_search(q, k=5, score_mode="none").collect()
    assert [r["conv_id"] for r in got] == matched_convs[:5]
    assert all(r["score"] == 0.0 for r in got)


def test_matches_df_nested_shape(spark, env):
    s, conv_of = env
    q = BooleanQuery(must=(T[0],), should=(T[4],))
    exhaustive = {int(r["doc_id"]): np.float32(r["score"])
                  for r in s.matches_df(q).collect()}
    # matches == the full ranking (searched with a huge k)
    full = dict(s.search(q, k=10 ** 6, pruned=False))
    assert exhaustive == {d: np.float32(v) for d, v in full.items()}
