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


def test_temperature_uncapped_closed_form(spark):
    from lucene_spark.ops.sampling import temperature_allocation
    rows = [(0, "a", "w " * 100), (1, "b", "w " * 25), (2, "c", "w " * 4)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    a = {r["stratum"]: r for r in
         temperature_allocation(df, "lang", budget=100,
                                alpha=0.5).collect()}
    # q = sqrt(n): 10, 5, 2 -> shares 10/17, 5/17, 2/17
    assert a["a"]["allocated"] == pytest.approx(1000 / 17)
    assert a["b"]["allocated"] == pytest.approx(500 / 17)
    assert a["c"]["allocated"] == pytest.approx(200 / 17)
    assert sum(r["allocated"] for r in a.values()) == pytest.approx(100.0)
    # alpha=1 is proportional sampling
    p = {r["stratum"]: r for r in
         temperature_allocation(df, "lang", budget=129,
                                alpha=1.0).collect()}
    assert p["a"]["allocated"] == pytest.approx(100.0)
    assert p["c"]["rate"] == pytest.approx(1.0)


def test_temperature_cap_redistributes_exactly(spark):
    import itertools
    from lucene_spark.ops.sampling import temperature_allocation
    rows = [(0, "a", "w " * 100), (1, "b", "w " * 25), (2, "c", "w " * 4),
            (3, "d", "w " * 9)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    alpha, budget, cap = 0.2, 120.0, 2.0
    got = {r["stratum"]: r["allocated"] for r in
           temperature_allocation(df, "lang", budget=budget, alpha=alpha,
                                  max_epochs=cap).collect()}
    # brute: solve min(cap_i, lam*q_i) summing to budget by bisection
    n = {"a": 100.0, "b": 25.0, "c": 4.0, "d": 9.0}
    q = {s: v ** alpha for s, v in n.items()}
    lo, hi = 0.0, 1e9
    for _ in range(200):
        lam = (lo + hi) / 2
        tot = sum(min(cap * n[s], lam * q[s]) for s in n)
        lo, hi = (lam, hi) if tot < budget else (lo, lam)
    want = {s: min(cap * n[s], lam * q[s]) for s in n}
    for s in n:
        assert got[s] == pytest.approx(want[s], rel=1e-9), s
    assert sum(got.values()) == pytest.approx(budget)
    # caps bind where expected: small strata cap at max_epochs
    assert got["c"] == pytest.approx(cap * 4)


def test_temperature_budget_above_total_caps(spark):
    from lucene_spark.ops.sampling import temperature_allocation
    rows = [(0, "a", "w w"), (1, "b", "w w w")]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    a = {r["stratum"]: r for r in
         temperature_allocation(df, "lang", budget=1000, alpha=0.5,
                                max_epochs=2.0).collect()}
    assert a["a"]["allocated"] == pytest.approx(4.0)
    assert a["b"]["allocated"] == pytest.approx(6.0)


def test_temperature_validation_and_nulls(spark):
    from lucene_spark.ops.sampling import temperature_allocation
    df = spark.createDataFrame([(0, "x", "w"), (1, "y", None)],
                               "doc_id long, lang string, text string")
    with pytest.raises(ValueError):
        temperature_allocation(df, "lang", budget=0)
    with pytest.raises(ValueError):
        temperature_allocation(df, "lang", budget=1, alpha=0.0)
    with pytest.raises(ValueError):
        temperature_allocation(df, "lang", budget=1, alpha=0.5,
                               max_epochs=-1)
    a = {r["stratum"]: r for r in
         temperature_allocation(df, "lang", budget=10,
                                alpha=0.5).collect()}
    assert a["y"]["available"] == 0.0 and a["y"]["allocated"] == 0.0
    assert a["x"]["allocated"] == pytest.approx(10.0)
