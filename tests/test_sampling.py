"""UniMax budget allocation (ops/sampling.py unimax_allocation):
waterfill semantics, epoch-cap redistribution, validation."""

import pytest



def test_unimax_waterfill(spark):
    from lucene_spark.ops.sampling import unimax_allocation
    rows = [(i, "lang%d" % (i % 4), "w " * ((i % 4 + 1) * 10))
            for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    # availability per lang: lang0=100, lang1=200, lang2=300, lang3=400
    a = {r["stratum"]: r for r in
         unimax_allocation(df, "lang", budget=600,
                           max_epochs=1.5).collect()}
    # waterfill ascending: lang0 min(150, 600/4=150)=150, rem 450
    # lang1 min(300, 450/3=150)=150, rem 300
    # lang2 min(450, 300/2=150)=150, rem 150; lang3 min(600,150)=150
    for lang, avail in [("lang0", 100.0), ("lang1", 200.0),
                        ("lang2", 300.0), ("lang3", 400.0)]:
        assert a[lang]["available"] == avail
        assert a[lang]["allocated"] == pytest.approx(150.0)
    assert a["lang0"]["epochs"] == pytest.approx(1.5)
    assert a["lang0"]["rate"] == 1.0          # >1 epoch -> full pass
    assert a["lang3"]["rate"] == pytest.approx(150 / 400)


def test_unimax_epoch_cap_redistributes(spark):
    from lucene_spark.ops.sampling import unimax_allocation
    rows = [(0, "small", "w w w"), (1, "big", "w " * 100)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    a = {r["stratum"]: r for r in
         unimax_allocation(df, "lang", budget=50,
                           max_epochs=1.0).collect()}
    # small: min(3, 25) = 3; leftover 47 flows to big: min(100, 47)
    assert a["small"]["allocated"] == pytest.approx(3.0)
    assert a["big"]["allocated"] == pytest.approx(47.0)
    total = sum(r["allocated"] for r in a.values())
    assert total == pytest.approx(50.0)


def test_unimax_validation(spark):
    from lucene_spark.ops.sampling import unimax_allocation
    df = spark.createDataFrame([(0, "x", "w")],
                               "doc_id long, lang string, text string")
    with pytest.raises(ValueError):
        unimax_allocation(df, "lang", budget=0)
    with pytest.raises(ValueError):
        unimax_allocation(df, "lang", budget=10, max_epochs=0)


def test_unimax_null_texts_and_nonstring_strata(spark):
    from lucene_spark.ops.sampling import unimax_allocation
    rows = [(0, 1, None), (1, 1, None), (2, 2, "w w w w")]
    df = spark.createDataFrame(rows, "doc_id long, lang int, text string")
    a = {r["stratum"]: r for r in
         unimax_allocation(df, "lang", budget=3).collect()}
    # all-NULL stratum -> available 0, allocated 0; int strata stringify
    assert a["1"]["available"] == 0.0 and a["1"]["allocated"] == 0.0
    assert a["2"]["allocated"] == pytest.approx(3.0)
