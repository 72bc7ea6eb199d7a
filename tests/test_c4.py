"""C4 cleaning filters (ops/c4.py): rule-by-rule behavior on crafted
lines, plan purity (no shuffle, no Python)."""

import pytest

from lucene_spark.ops.c4 import c4_clean


@pytest.fixture(scope="module")
def out(spark):
    rows = [
        (0, "one good sentence stays here.\nshort one.\n"
            "no terminal punctuation here\n"
            "another perfectly fine sentence survives!"),
        (1, "does this line survive with a question mark?\n"
            "the javascript line is removed even when punctuated.\n"
            'quoted sentence ends well."'),
        (2, "lorem ipsum dolor sit amet.\nfine line number one stays.\n"
            "fine line number two stays."),
        (3, "var config = { nested: true };\ngood line one stays here.\n"
            "good line two stays here."),
        (4, "only one valid sentence lives here."),
        (5, "banned manatee phrase appears here.\n"
            "second acceptable sentence stays around.\n"
            "third acceptable sentence stays around."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    res = c4_clean(df, min_words=4, min_sentences=2,
                   banned_words=["manatee"])
    return {int(r.doc_id): r for r in res.collect()}, res


def test_line_rules(out):
    o, _ = out
    # doc 0: 'short one.' (<4 words) and the unpunctuated line drop
    assert o[0].n_lines == 4 and o[0].n_kept == 2
    assert "short one" not in o[0].clean_text
    assert "no terminal" not in o[0].clean_text
    assert o[0].keep
    # doc 1: ? and ." both terminal; javascript line dropped
    assert o[1].n_kept == 2 and o[1].keep
    assert "javascript" not in o[1].clean_text


def test_page_rules(out):
    o, _ = out
    assert o[2].has_lorem and not o[2].keep and o[2].n_kept == 3
    assert o[3].has_brace and not o[3].keep
    assert o[4].n_kept == 1 and not o[4].keep  # < min_sentences
    assert o[5].has_banned and not o[5].keep


def test_plan_is_pure_projection(out):
    _, res = out
    plan = res._jdf.queryExecution().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan and "ArrowEval" not in plan
