"""HTMLStripCharFilter subset — goldens lifted from the reference's
TestHTMLStripCharFilter.java (analysis/common charfilter tests)."""

import pandas as pd
import pytest

from lucene_spark.kernels.htmlstrip import (html_analyze_one, html_strip,
                                            html_strip_series,
                                            html_tokenize_series)
from lucene_spark.kernels.tokenizer import analyze_one, analyze_series, \
    analyze_term


def test_reference_main_golden():
    # TestHTMLStripCharFilter.test() — div is block (-> \n), <a> is
    # inline (-> removed), entities decode, comments vanish
    html = ('<div class="foo">this is some text</div> here is a '
            '<a href="#bar">link</a> and another '
            '<a href="http://lucene.apache.org/">link</a>. '
            'This is an entity: &amp; plus a &lt;.  Here is an &. '
            '<!-- is a comment -->')
    gold = ("\nthis is some text\n here is a link and another link. "
            "This is an entity: & plus a <.  Here is an &. ")
    assert html_strip(html) == gold


def test_reference_entities_goldens():
    # testEntities(): nbsp -> PLAIN SPACE (the reference's deliberate
    # exception), named + numeric dec/hex entities
    assert html_strip("&nbsp; &lt;foo&gt; &Uuml;bermensch &#61; "
                      "&Gamma; bar &#x393;") == \
        "  <foo> Übermensch = Γ bar Γ"
    # testMoreEntities()
    assert html_strip("&nbsp; &lt;junk/&gt; &nbsp; &#33; &#64; "
                      "and &#8217;") == "  <junk/>   ! @ and ’"
    # testGamma()
    assert html_strip("&Gamma;") == "Γ"


def test_script_style_br_and_declarations():
    assert html_strip("a<script type='x'>var y = '<div>';</script>b") \
        == "a\nb"
    assert html_strip("a<style>p { color: red }</style>b") == "a\nb"
    assert html_strip("one<br>two<br/>three") == "one\ntwo\nthree"
    assert html_strip("<!DOCTYPE html><p>hi</p>") == "\n\nhi\n"
    assert html_strip("<?xml version='1.0'?>x") == "\nx"


def test_inline_vs_block():
    # inline: no residue; unknown/other tags: block-level newline
    assert html_strip("x<b>y</b>z") == "xyz"
    assert html_strip("x<em>y</em>z") == "xyz"
    assert html_strip("x<span a=b>y</span>z") == "xyz"
    assert html_strip("x<p>y</p>z") == "x\ny\nz"
    assert html_strip("x<table>y</table>z") == "x\ny\nz"
    # tag names PREFIXED by an inline name are not inline ("abbrx")
    assert html_strip("x<abbrx>y</abbrx>z") == "x\ny\nz"


def test_series_and_chain_dispatch():
    s = html_strip_series(pd.Series(
        ["<p>Hello <b>World</b></p>", None, "no markup &amp; fine"]))
    assert list(s) == ["\nHello World\n", "", "no markup & fine"]
    toks = html_tokenize_series(pd.Series(["<p>Hello <b>World</b></p>"]))
    assert list(toks) == [["hello", "world"]]
    assert analyze_one("<p>Hello <b>W</b>orld</p>", "html") \
        == ["hello", "world"]
    assert analyze_term("Hello", "html") == "hello"
    out = analyze_series(pd.Series(["<p>A &amp; B</p>"]), "html")
    assert list(out) == [["a", "b"]]


def test_end_to_end_search_on_html_corpus(spark, tmp_path):
    """An 'html'-chain index matches the text CONTENT, not the markup."""
    import datetime
    from lucene_spark.index import build_index
    from lucene_spark.search import IndexSearcher
    from lucene_spark.search.query import PhraseQuery, TermQuery
    rows = [
        ("c0", 0, "user", '<div><b>merge</b> join strategies</div>',
         "t", datetime.datetime(2026, 1, 1)),
        ("c1", 0, "user", 'merge<br>join &amp; scan', "t",
         datetime.datetime(2026, 1, 1)),
        ("c2", 0, "user", '<script>var merge = "join";</script>plain',
         "t", datetime.datetime(2026, 1, 1)),
        ("c3", 0, "user", 'div span script b', "t",
         datetime.datetime(2026, 1, 1)),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")
    out = str(tmp_path / "hidx")
    build_index(spark, df, out, num_buckets=2,
                analyzers={"text": "html"})
    s = IndexSearcher(spark, out)
    # "merge join" phrase: doc 0 (inline <b> leaves no hole) matches;
    # doc 1 does NOT (the <br> is a block break, but positions are
    # token indices so 'merge join' IS adjacent there too — both match)
    hits = {r["doc_id"] for r in
            s.search_df(PhraseQuery(("merge", "join")), k=10).collect()}
    assert hits == {0, 1}
    # script content is stripped: 'var' only matches nothing
    assert s.count(TermQuery("var")) == 0
    # tag names never leak into the index: doc 3 holds the only
    # literal 'div'/'script' WORDS
    assert {r["doc_id"] for r in
            s.search_df(TermQuery("div"), k=10).collect()} == {3}
    assert {r["doc_id"] for r in
            s.search_df(TermQuery("script"), k=10).collect()} == {3}
