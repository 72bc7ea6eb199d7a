"""Training-data pipeline ops: benchmark decontamination, Gopher
repetition signals, deterministic stratified sampling.

References (published recipes, not the Lucene tree):
- decontamination: GPT-3 appendix C / PaLM / Llama n-gram overlap
- repetition: Rae et al. 2021 (Gopher), appendix A1.1
- sampling: hash-threshold Bernoulli sampling (standard reproducible
  training-mix construction)
"""

import pytest
from pyspark.sql import functions as F

from lucene_spark.ops.decontaminate import decontaminate, ngram_sets
from lucene_spark.ops.sampling import (rate_threshold, sample_rates_table,
                                       stratified_sample)
from lucene_spark.ops.textstats import repetition_signals


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog", "en", "a"),
        (1, "quick brown fox jumps over a sleeping cat today", "en", "a"),
        (2, "completely different words about spark and parquet", "en", "b"),
        (3, "the quick brown fox appears here too somehow", "de", "b"),
        (4, "buy now buy now buy now buy now buy now", "de", "a"),
        (5, "spark reads parquet files with pushdown filters", "fr", "a"),
        (6, "one two three four five one two three four five", "fr", "b"),
        (7, "short", "zz", "b"),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string")


def test_decontaminate_counts(spark, corpus):
    bench = corpus.filter("doc_id = 0")       # the fox sentence
    rest = corpus.filter("doc_id <> 0")
    rep = {r.doc_id: r for r in decontaminate(rest, bench, n=3).collect()}
    assert set(rep) == {1, 2, 3, 4, 5, 6, 7}
    # doc 1 shares 'quick brown fox' + 'brown fox jumps' +
    # 'fox jumps over'; doc 3 shares 'the quick brown' + 'quick brown
    # fox'; others share none
    assert rep[1].n_contaminated == 3
    assert rep[3].n_contaminated == 2
    for d in (2, 4, 5, 6, 7):
        assert rep[d].n_contaminated == 0
        assert rep[d].contamination_frac == 0.0
    # distinct n-grams: doc 4 repeats one 3-gram pattern heavily
    assert rep[4].n_grams < 8
    # doc shorter than n has zero grams and zero frac (no div-by-zero)
    assert rep[7].n_grams == 0


def test_decontaminate_benchmark_broadcasts(spark, corpus):
    plan = _formatted(decontaminate(corpus, corpus.limit(2), n=3))
    # the MATCH join (gram equality) broadcasts the benchmark side —
    # the corpus gram stream never shuffles; the remaining exchanges
    # are the sparse doc_id rollup + its left join back to totals
    assert "BroadcastHashJoin Inner BuildRight" in plan


def test_ngram_sets_distinct_per_doc(spark, corpus):
    g = (ngram_sets(corpus.filter("doc_id = 4"), 3)
         .groupBy("doc_id").agg(F.count("*").alias("c")).collect())
    # 'buy now buy' and 'now buy now' are each emitted ONCE
    assert g[0].c == 2


def test_repetition_signals_values(spark, corpus):
    r = {x.doc_id: x for x in repetition_signals(corpus).collect()}
    # doc 4: 2 distinct tokens over 10 -> dup_token_frac 0.8, and its
    # repeated 5-grams dominate: dup_5gram_frac = 1.0 (every 5-gram
    # occurs >1 time: 'buy now buy now buy' x3, 'now buy now buy now' x3)
    assert r[4].dup_token_frac == 0.8
    assert r[4].dup_5gram_frac == 1.0
    assert r[4].top_2gram_frac > 0.4
    # doc 2: all-unique words -> zero everywhere
    assert r[2].dup_token_frac == 0.0
    assert r[2].dup_5gram_frac == 0.0
    # doc 7: single token, shorter than both gram sizes -> zeros
    assert r[7].n_tokens == 1
    assert r[7].top_2gram_frac == 0.0 and r[7].dup_5gram_frac == 0.0
    # doc 6 repeats the 5-token phrase exactly twice: both 5-gram
    # windows of the second copy duplicate the first
    assert r[6].dup_token_frac == 0.5
    assert r[6].dup_5gram_frac > 0.3


def test_bpe_token_stats(spark, corpus):
    from lucene_spark.ops.textstats import bpe_token_stats
    r = {x.doc_id: x for x in bpe_token_stats(corpus).collect()}
    # doc 7 "short": one piece
    assert r[7].n_pieces == 1 and r[7].n_chars == 5
    # doc 0: 9 space-prefixed word pieces, no contractions/punct
    assert r[0].n_pieces == 9
    assert abs(r[0].chars_per_piece - r[0].n_chars / 9) < 1e-3


def test_bpe_pattern_pieces():
    # pin the RE2-subset pretokenizer on a mixed string (contraction,
    # number, punctuation run, multi-space merge deviation)
    import re
    from lucene_spark.ops.textstats import BPE_PRETOKEN_RE
    ascii_re = (BPE_PRETOKEN_RE
                .replace(r"[^\s\p{L}\p{N}]", "[^\\sa-zA-Z0-9]")
                .replace(r"\p{L}", "[a-zA-Z]")
                .replace(r"\p{N}", "[0-9]"))
    got = re.findall(ascii_re, "It's 42%  done!")
    assert got == ["It", "'s", " 42", "%", "  ", "done", "!"]


def test_gopher_quality_rules(spark):
    rows = [
        # long-enough, healthy English-ish doc -> keep
        (0, ("the quick brown fox jumps over the lazy dog and then "
             "that same fox went back home to rest with a friend "
             "because it had been a very long day of running around "
             "the field and the barn and it was happy to be done")),
        # too short
        (1, "tiny doc with the and that"),
        # heavy repetition -> fails ok_top2/ok_dup5 even when long
        (2, " ".join(["buy now buy now buy"] * 12)),
        # no required stopwords
        (3, " ".join(f"w{i:03d}" for i in range(40))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from lucene_spark.ops.textstats import gopher_quality
    g = {x.doc_id: x for x in gopher_quality(df, min_tokens=30).collect()}
    assert g[0].keep
    assert not g[1].ok_len and not g[1].keep
    assert g[2].ok_len and not g[2].ok_top2 and not g[2].ok_dup5
    assert not g[2].keep
    assert not g[3].ok_stopwords and not g[3].keep


def test_rate_threshold_bounds():
    assert rate_threshold(0.0) == "00000000"
    assert rate_threshold(0.5) == "80000000"
    assert rate_threshold(1.0) == "g"
    assert "ffffffff" < "g"  # lexicographic keep-all sentinel


def test_stratified_sample_deterministic_and_partition_independent(
        spark, corpus):
    rates = {"en": 1.0, "de": 0.5, "fr": 0.0}
    a = sorted(r.doc_id for r in
               stratified_sample(corpus, "lang", rates, seed=3).collect())
    b = sorted(r.doc_id for r in
               stratified_sample(corpus.repartition(7), "lang", rates,
                                 seed=3).collect())
    assert a == b                      # partitioning-independent
    ids = set(a)
    assert {0, 1, 2} & ids == {0, 1, 2}          # rate-1.0 keeps all en
    assert not ids & {5, 6}                      # rate-0.0 drops all fr
    assert not ids & {7}                         # default_rate=0.0
    # a different seed reshuffles membership of the 0.5 stratum
    # deterministically (same call twice -> identical)
    c = sorted(r.doc_id for r in
               stratified_sample(corpus, "lang", rates, seed=3).collect())
    assert a == c


def test_sample_rates_table_counts(spark, corpus):
    t = {r.lang: r for r in sample_rates_table(
        corpus, "lang", {"en": 1.0, "de": 0.0}, seed=1,
        default_rate=1.0).collect()}
    assert t["en"].n_sampled == t["en"].n_total == 3
    assert t["de"].n_sampled == 0 and t["de"].n_total == 2
    assert t["fr"].realized_rate == 1.0
    assert t["zz"].n_sampled == 1


def test_sample_is_pure_filter(spark, corpus):
    plan = _formatted(stratified_sample(corpus, "lang", {"en": 0.5}))
    assert "Exchange" not in plan      # zero shuffle


def test_redact_families_and_order(spark):
    from lucene_spark.ops.redact import redact
    rows = [
        (0, "mail a.b+c@ex-ample.co.uk call +1 (415) 555-0123"),
        (1, "host 192.168.0.1 ssn 123-45-6789 and 10.0.0.255"),
        (2, "totally clean text with numbers 42 and 7"),
        (3, "id 999-88-7777 phone 415 555 0199"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    r = {x.doc_id: x for x in redact(df).collect()}
    assert r[0].redacted == "mail <EMAIL> call <PHONE>"
    assert (r[0].n_email, r[0].n_phone) == (1, 1)
    # order: IP and SSN are consumed BEFORE the loose phone family
    assert r[1].redacted == "host <IP> ssn <ID> and <IP>"
    assert (r[1].n_ip, r[1].n_id, r[1].n_phone) == (2, 1, 0)
    assert r[3].redacted == "id <ID> phone <PHONE>"
    # clean text: no false positives, byte-identical output
    assert r[2].redacted == rows[2][1]
    assert r[2].n_email == r[2].n_id == r[2].n_ip == r[2].n_phone == 0


def test_redact_no_false_positives_on_corpus(spark):
    # the whole sf0.001 corpus is PII-free: zero counts, unchanged text
    from lucene_spark.ops.redact import redact
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    row = (redact(docs).join(docs.select("doc_id", "text"), "doc_id")
           .selectExpr("sum(n_email + n_id + n_ip + n_phone) as s",
                       "sum(case when redacted = text then 0 else 1 end)"
                       " as changed").collect()[0])
    assert row.s == 0 and row.changed == 0


def test_redact_is_pure_projection(spark):
    from lucene_spark.ops.redact import redact
    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    plan = _formatted(redact(df))
    assert "Exchange" not in plan
