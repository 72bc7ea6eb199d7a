"""Sequence packing (ops/packing.py): concat-and-chunk assignments
validated against a brute-force per-shard packer, plus fill/coverage
invariants."""

import pytest
from pyspark.sql import functions as F

from lucene_spark.ops.packing import pack_sequences, pack_stats


@pytest.fixture(scope="module")
def docs(spark):
    rows = []
    words = ["alpha", "beta", "gamma", "delta"]
    for i in range(40):
        n = (i * 7) % 23  # includes 0-token docs (i=0 -> n=0)
        rows.append((i, " ".join(words[j % 4] for j in range(n))))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _brute(n_by_doc, budget, n_shards):
    out = []
    for shard in range(n_shards):
        off = 0
        for d in sorted(n_by_doc):
            if d % n_shards != shard or n_by_doc[d] == 0:
                continue
            start, end = off, off + n_by_doc[d]
            s = start // budget
            while s * budget < end:
                lo = max(s * budget, start)
                hi = min((s + 1) * budget, end)
                out.append((shard, s, d, lo - start, hi - start,
                            lo - s * budget, hi - lo))
                s += 1
            off = end
    return sorted(out)


def test_assignments_match_bruteforce(spark, docs):
    got = sorted(tuple(int(v) for v in r)
                 for r in pack_sequences(docs, budget=16,
                                         n_shards=3).collect())
    n_by_doc = {int(r.doc_id): (int(r.doc_id) * 7) % 23
                for r in docs.select("doc_id").collect()}
    assert got == _brute(n_by_doc, 16, 3)


def test_samples_full_except_shard_tail(spark, docs):
    a = pack_sequences(docs, budget=16, n_shards=3)
    st = pack_stats(a).collect()
    last = {}
    for r in st:
        last[int(r.shard)] = max(last.get(int(r.shard), -1),
                                 int(r.sample_id))
    for r in st:
        if int(r.sample_id) != last[int(r.shard)]:
            assert int(r.fill) == 16
        else:
            assert 0 < int(r.fill) <= 16


def test_slices_reassemble_each_doc(spark, docs):
    a = pack_sequences(docs, budget=16, n_shards=3).collect()
    by_doc = {}
    for r in a:
        by_doc.setdefault(int(r.doc_id), []).append(
            (int(r.doc_tok_start), int(r.doc_tok_end)))
    for d, spans in by_doc.items():
        spans.sort()
        n = (d * 7) % 23
        assert spans[0][0] == 0 and spans[-1][1] == n
        for (a0, a1), (b0, b1) in zip(spans, spans[1:]):
            assert a1 == b0  # contiguous, no gap or overlap


def test_zero_token_docs_dropped(spark, docs):
    a = pack_sequences(docs, budget=16, n_shards=3)
    ids = {int(r.doc_id) for r in a.select("doc_id").distinct().collect()}
    assert 0 not in ids  # doc 0 has 0 tokens


def test_single_shard_is_global_concat(spark, docs):
    a = pack_sequences(docs, budget=1000, n_shards=1).collect()
    # budget > corpus: every doc lands in sample 0 at its running offset
    assert {int(r.sample_id) for r in a} == {0}
    offs = sorted((int(r.doc_id), int(r.sample_off)) for r in a)
    run = 0
    for d, off in offs:
        assert off == run
        run += (d * 7) % 23


def test_validation(spark, docs):
    with pytest.raises(ValueError):
        pack_sequences(docs, budget=0)
    with pytest.raises(ValueError):
        pack_sequences(docs, n_shards=0)


def test_shuffle_partitions_on_shard_key_only(spark, docs):
    plan = pack_sequences(docs, budget=16,
                          n_shards=3)._jdf.queryExecution().toString()
    # the only exchange is the per-shard window sort — shards pack in
    # parallel; no global single-partition window
    assert "SinglePartition" not in plan


def test_negative_ids_pmod_sharding(spark):
    from lucene_spark.ops.packing import pack_sequences
    rows = [(-5, "a b c"), (3, "d e")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = pack_sequences(df, budget=4, n_shards=4).collect()
    # Python residue: -5 % 4 == 3 — both docs co-shard on 3 (no
    # negative shard keys), concatenated in doc_id order (-5 first)
    assert {r["shard"] for r in got} == {3}
    first = min(got, key=lambda r: (r["sample_id"], r["sample_off"]))
    assert first["doc_id"] == -5
    import pytest as _pt
    with _pt.raises(ValueError):
        pack_sequences(df, budget=4.5)
