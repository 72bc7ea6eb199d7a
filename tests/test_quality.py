"""ops.quality vs a brute Python mirror of the reference accumulation.

The mirror transcribes QualityStats.addResult / getPrecisionAt / getAvp
/ average (benchmark/quality/QualityStats.java:79-135,192-235)
independently of the Catalyst implementation; randomized result lists +
judgments must agree on every metric.
"""

from __future__ import annotations

import random

import pytest


def brute_stats(ranked: list, relevant: set, max_good: int,
                p_points=(5, 10, 20)):
    """ranked: doc ids in rank order (rank = position + 1)."""
    num_points = 0
    num_good = 0
    prel_sum = 0.0
    mrr = 0.0
    p_at = {}
    recall = 0.0
    first = True
    for i, doc in enumerate(ranked):
        n = i + 1
        is_rel = doc in relevant
        if is_rel:
            num_good += 1
            if first and n <= 5:
                mrr = 1.0 / n
            first = False
        num_points = n
        p = num_good / num_points
        if is_rel:
            prel_sum += p
        p_at[n] = p
        recall = p if max_good <= 0 else num_good / max_good
    out = {"num_points": float(num_points), "num_good": float(num_good),
           "max_good": float(max_good),
           "mrr": mrr,
           "avp": 0.0 if max_good == 0 else prel_sum / max_good,
           "recall": recall}
    for n in p_points:
        if n > num_points:
            out[f"p_at_{n}"] = (num_points * p_at.get(num_points, 0.0) / n
                                if num_points else 0.0)
        else:
            out[f"p_at_{n}"] = p_at[n]
    return out


def _run(spark, per_query):
    """per_query: {qid: (ranked list, relevant set, extra_relevant)}.
    Judgments = relevant ∪ extra (docs the judge knows but the engine
    missed)."""
    from lucene_spark.ops import quality as QS
    res_rows, jud_rows = [], []
    for qid, (ranked, rel, extra) in per_query.items():
        for i, d in enumerate(ranked):
            res_rows.append((qid, d, i + 1))
        for d in sorted(rel | extra):
            jud_rows.append((qid, d))
    res = spark.createDataFrame(res_rows or [("_", 0, 1)],
                                "qid string, doc_id long, rank long")
    if not res_rows:
        res = res.filter("false")
    jud = spark.createDataFrame(jud_rows or [("_", 0)],
                                "qid string, doc_id long")
    if not jud_rows:
        jud = jud.filter("false")
    stats = QS.quality_stats(res, jud)
    got = {r["qid"]: r.asDict() for r in stats.collect()}
    avg = {r["qid"]: r.asDict()
           for r in QS.quality_average(stats).collect()}
    return got, avg


def check(spark, per_query):
    got, avg = _run(spark, per_query)
    briefs = {}
    for qid, (ranked, rel, extra) in per_query.items():
        known = rel | extra
        ranked_rel = set(ranked) & known
        briefs[qid] = brute_stats(ranked, ranked_rel, len(known))
    assert set(got) == set(briefs)
    for qid, want in briefs.items():
        for k, v in want.items():
            assert got[qid][k] == pytest.approx(v, abs=2e-6), (qid, k)
    # reference average: judged queries only
    judged = [b for b in briefs.values() if b["max_good"] > 0]
    if judged:
        row = avg["__avg__"]
        for k in judged[0]:
            want = sum(b[k] for b in judged) / len(judged)
            assert row[k] == pytest.approx(want, abs=2e-6), k
    return got


def test_hand_case(spark):
    # ranks:      1  2  3  4  5  6
    # relevant:   y  n  y  n  n  y    max_good = 5 (2 unretrieved)
    got = check(spark, {"q": ([10, 11, 12, 13, 14, 15],
                              {10, 12, 15}, {90, 91})})
    q = got["q"]
    assert q["p_at_5"] == pytest.approx(2 / 5)
    # 6 points < 10 -> extrapolated: num_good/10
    assert q["p_at_10"] == pytest.approx(3 / 10)
    assert q["mrr"] == 1.0
    assert q["avp"] == pytest.approx((1 / 1 + 2 / 3 + 3 / 6) / 5)
    assert q["recall"] == pytest.approx(3 / 5)


def test_mrr_window_and_zero_judged(spark):
    # first relevant at rank 6 -> outside the reference's top-5 MRR
    # window -> mrr 0; a judged-empty query scores 0 and is excluded
    # from the average
    got = check(spark, {
        "late": ([1, 2, 3, 4, 5, 6, 7], {6}, set()),
        "none": ([1, 2, 3], set(), set()),
        "missed": ([], set(), {50}),  # judged but engine returned nothing
    })
    assert got["late"]["mrr"] == 0.0
    assert got["none"]["max_good"] == 0.0 and got["none"]["avp"] == 0.0
    assert got["missed"]["num_points"] == 0
    assert got["missed"]["recall"] == 0.0


def test_randomized_vs_brute(spark):
    rng = random.Random(7)
    per = {}
    for i in range(12):
        n = rng.randint(0, 25)
        ranked = rng.sample(range(1000), n)
        rel = {d for d in ranked if rng.random() < 0.35}
        extra = {rng.randint(2000, 3000) for _ in range(rng.randint(0, 4))}
        per[f"q{i}"] = (ranked, rel, extra)
    check(spark, per)
