"""Classification module tests (classification/src/java/org/apache/
lucene/classification/): SimpleNaiveBayesClassifier parity against an
independent brute-force NB over the same corpus, null-class handling,
and the KNearestNeighborClassifier vote formula."""

import math
from collections import Counter, defaultdict

import pytest
from pyspark.sql import functions as F

from lucene_spark.ops.classify import knn_classify, naive_bayes_classify
from lucene_spark.search.searcher import IndexSearcher


def _brute_nb(docs, queries, class_field):
    """Independent pure-Python SimpleNaiveBayesClassifier: docs =
    [(doc_id, tokens, cls)], queries = {qid: tokens}. Returns
    {(qid, cls): score} over all classes."""
    classed = [(d, t, c) for d, t, c in docs if c is not None]
    docs_with_class = len(classed)
    class_docs = Counter(c for _, _, c in classed)
    # avgUniqueTerms over the TEXT field uses every doc with tokens,
    # classed or not (sumDocFreq / docCount of the field)
    with_tokens = [(d, t) for d, t, _ in docs if t]
    sum_doc_freq = sum(len(set(t)) for _, t in with_tokens)
    avg_unique = sum_doc_freq / len(with_tokens)
    hits = defaultdict(int)
    for _, toks, c in classed:
        for w in set(toks):
            hits[(w, c)] += 1
    out = {}
    for qid, qtoks in queries.items():
        for c, cd in class_docs.items():
            den = avg_unique * cd + docs_with_class
            s = math.log(cd) - math.log(docs_with_class)
            for w in qtoks:
                s += math.log((hits[(w, c)] + 1) / den)
            out[(qid, c)] = s
    return out


@pytest.fixture(scope="module")
def corpus(spark, small_index):
    s = IndexSearcher(spark, small_index)
    rows = (s._read_cached(s.docstore_paths)
            .select("doc_id", "text", "role", "tool").collect())
    from lucene_spark.kernels.tokenizer import tokenize_one
    docs = [(r["doc_id"], tokenize_one(r["text"] or ""), r["role"],
             r["tool"]) for r in rows]
    return s, docs


def _run_nb(s, spark, ids, docs, class_field):
    texts = {d: None for d in ids}
    texts_df = (s._read_cached(s.docstore_paths)
                .filter(F.col("doc_id").isin(ids))
                .select(F.col("doc_id").alias("id"), "text"))
    got = naive_bayes_classify(s, texts_df, class_field=class_field,
                               all_scores=True).collect()
    return {(r["id"], r["cls"]): r["score"] for r in got}


def test_nb_matches_brute_force(spark, corpus):
    s, docs = corpus
    ids = [d for d, toks, _, _ in docs if toks][:8]
    queries = {d: toks for d, toks, _, _ in docs if d in ids}
    expect = _brute_nb([(d, t, c) for d, t, c, _ in docs],
                       queries, "role")
    got = _run_nb(s, spark, ids, docs, "role")
    assert set(got) == set(expect)
    for k in expect:
        assert got[k] == pytest.approx(expect[k], rel=1e-9), k


def test_nb_null_classes_excluded(spark, corpus):
    """class_field='tool' is NULL on ~90% of docs: null-class docs must
    drop out of priors/hits but still count in avgUniqueTerms."""
    s, docs = corpus
    tool_classes = {c for _, _, _, c in docs if c is not None}
    assert len(tool_classes) >= 2
    ids = [d for d, toks, _, _ in docs if toks][:4]
    queries = {d: toks for d, toks, _, _ in docs if d in ids}
    expect = _brute_nb([(d, t, c) for d, t, _, c in docs],
                       queries, "tool")
    got = _run_nb(s, spark, ids, docs, "tool")
    assert set(got) == set(expect)
    for k in expect:
        assert got[k] == pytest.approx(expect[k], rel=1e-9), k


def test_nb_argmax_consistent(spark, corpus):
    s, docs = corpus
    ids = [d for d, toks, _, _ in docs if toks][:5]
    texts_df = (s._read_cached(s.docstore_paths)
                .filter(F.col("doc_id").isin(ids))
                .select(F.col("doc_id").alias("id"), "text"))
    allsc = naive_bayes_classify(s, texts_df, all_scores=True).collect()
    best = naive_bayes_classify(s, texts_df).collect()
    by_id = defaultdict(list)
    for r in allsc:
        by_id[r["id"]].append((-r["score"], r["cls"]))
    for r in best:
        want = min(by_id[r["id"]])
        assert (pytest.approx(-want[0]) == r["score"]
                and want[1] == r["cls"])


def test_knn_vote_formula(spark, corpus):
    """Replicate KNearestNeighborClassifier.buildListFromTopDocs by hand
    from the engine's own MLT top-k and compare."""
    s, docs = corpus
    doc_id = next(d for d, toks, _, _ in docs if len(toks) >= 5)
    k = 10
    q = s.more_like_this(doc_id, max_terms=5, min_df=2)
    top = s.search_df(q, k=k, doc_filter="role is not null").collect()
    cls_of = {d: r for d, _, r, _ in docs}
    mx = max(r["score"] for r in top)
    sboost, cnt = defaultdict(float), Counter()
    for r in top:
        c = cls_of[r["doc_id"]]
        sboost[c] += float(r["score"]) / mx
        cnt[c] += 1
    sumdoc = sum(cnt.values())
    expect = {c: sboost[c] / (k if sumdoc >= k else sumdoc)
              for c in sboost}
    got = {r["cls"]: r["score"]
           for r in knn_classify(s, doc_id, k=k, max_terms=5,
                                 min_df=2).collect()}
    assert set(got) == set(expect)
    for c in expect:
        assert got[c] == pytest.approx(expect[c], rel=1e-5), c
    # ordering: score desc, cls asc
    rows = knn_classify(s, doc_id, k=k, max_terms=5, min_df=2).collect()
    keys = [(-r["score"], r["cls"]) for r in rows]
    assert keys == sorted(keys)


def test_knn_fuzzy_vote_formula(spark, corpus):
    """KNearestFuzzyClassifier: same vote as plain KNN, but the top-k
    comes from the NearestFuzzyQuery rewrite (fuzzy_like_this with
    prefix filter and no global term cut)."""
    from collections import Counter, defaultdict
    from lucene_spark.ops.classify import knn_fuzzy_classify
    s, docs = corpus
    text = "w00000a w000012"
    k = 10
    q = s.fuzzy_like_this(text, max_edits=1, prefix_length=2,
                          max_num_terms=1 << 30)
    top = s.search_df(q, k=k, doc_filter="role is not null").collect()
    assert top, "fixture must produce fuzzy matches"
    cls_of = {d: r for d, _, r, _ in docs}
    mx = max(r["score"] for r in top)
    sboost, cnt = defaultdict(float), Counter()
    for r in top:
        c = cls_of[r["doc_id"]]
        sboost[c] += float(r["score"]) / mx
        cnt[c] += 1
    sumdoc = sum(cnt.values())
    expect = {c: sboost[c] / (k if sumdoc >= k else sumdoc)
              for c in sboost}
    got = {r["cls"]: r["score"]
           for r in knn_fuzzy_classify(s, text, k=k,
                                       prefix_length=2).collect()}
    assert set(got) == set(expect)
    for c in expect:
        assert got[c] == pytest.approx(expect[c], rel=1e-5), c


def test_knn_fuzzy_prefix_prunes_variants(spark, corpus):
    """prefix_length is honored: a long prefix that matches no
    dictionary term yields no classes."""
    from lucene_spark.ops.classify import knn_fuzzy_classify
    s, _ = corpus
    out = knn_fuzzy_classify(s, "zzzzzz", k=5, prefix_length=3)
    assert out.collect() == []


@pytest.fixture(scope="module")
def kw_searcher(spark, tmp_path_factory):
    """Index with keyword class fields (the BM25NB classifier needs the
    class field indexed, like the reference's StrField)."""
    from lucene_spark.fixtures.transcripts import transcripts_df
    from lucene_spark.index import build_index
    out = str(tmp_path_factory.mktemp("bm25nb") / "idx")
    src = transcripts_df(spark, n_convs=60, seed=7, partitions=4)
    build_index(spark, src, out, num_buckets=4,
                keyword_fields=("role", "tool"))
    return IndexSearcher(spark, out)


def test_bm25_nb_matches_reference_decomposition(spark, kw_searcher):
    """BM25NBClassifier: recompute per-class scores from the engine's
    own primitives — per-class constant keyword score + per-word
    in-class best BM25 — and compare with the softmax output."""
    from lucene_spark.ops.classify import bm25_nb_classify
    from lucene_spark.search.query import TermQuery
    s = kw_searcher
    text = "w000002 w000005 w000002"  # duplicate token counts twice
    toks = text.split()
    rows = (s._read_cached(s.docstore_paths)
            .select("doc_id", "role").collect())
    cls_of = {int(r["doc_id"]): r["role"] for r in rows}
    classes = sorted({c for c in cls_of.values() if c is not None})
    # class constant: top-1 of a class-field-only search
    s_c = {c: s.search(TermQuery(c, field="role"), k=1)[0][1]
           for c in classes}
    best = {}
    for w in set(toks):
        for d, sc in s.search(TermQuery(w), k=10 ** 6):
            c = cls_of[d]
            best[(c, w)] = max(best.get((c, w), 0.0), sc)
    logs = {}
    for c in classes:
        ll = math.log(s_c[c])
        for w in toks:
            ll += math.log(s_c[c] + best.get((c, w), 0.0))
        logs[c] = ll
    a = max(logs.values())
    z = a + math.log(sum(math.exp(v - a) for v in logs.values()))
    expect = {c: math.exp(logs[c] - z) for c in classes}
    got = {r["cls"]: r["score"]
           for r in bm25_nb_classify(s, text, class_field="role")
           .collect()}
    assert set(got) == set(expect)
    for c in expect:
        assert got[c] == pytest.approx(expect[c], rel=1e-6), c
    assert sum(got.values()) == pytest.approx(1.0, rel=1e-9)


def test_bm25_nb_on_stemmed_index(spark, tmp_path_factory):
    """Input tokens are analyzed ONCE: on a porter-chain index the
    match lookups use the stemmed index terms directly (PreAnalyzed),
    so in-class word maxima are found, not silently empty."""
    from lucene_spark.fixtures.transcripts import transcripts_df
    from lucene_spark.index import build_index
    from lucene_spark.ops.classify import bm25_nb_classify
    from lucene_spark.search.query import PreAnalyzed, TermQuery
    out = str(tmp_path_factory.mktemp("bm25nbp") / "idx")
    src = transcripts_df(spark, n_convs=40, seed=9, partitions=2)
    build_index(spark, src, out, num_buckets=2,
                keyword_fields=("role",), analyzers={"text": "porter"})
    s = IndexSearcher(spark, out)
    # find a corpus term whose porter stem differs from itself would
    # need real words; the synthetic vocab is stem-stable, so instead
    # assert the likelihood path found in-class maxima (not the
    # degenerate all-log(s_c) case) for a present term
    from lucene_spark.kernels.tokenizer import analyze_one
    probe = analyze_one("w000002", "porter")[0]
    hits = s.search(PreAnalyzed(TermQuery(probe)), k=1)
    assert hits, "probe term must exist"
    res = bm25_nb_classify(s, "w000002", class_field="role").collect()
    assert res and sum(r["score"] for r in res) == pytest.approx(1.0)
    scores = sorted({round(r["score"], 9) for r in res})
    assert len(scores) > 1, "likelihoods must differentiate classes"


def test_bm25_nb_dead_class_eliminated(spark, tmp_path_factory):
    """A class whose docs are ALL deleted must drop out entirely (the
    reference prior is the top-1 of an actual live search — no hits
    means log(0) elimination), even though termstats still carry the
    class term until compaction."""
    from lucene_spark.fixtures.transcripts import transcripts_df
    from lucene_spark.index import build_index
    from lucene_spark.index.deletes import delete_docs
    from lucene_spark.ops.classify import bm25_nb_classify
    out = str(tmp_path_factory.mktemp("bm25nbd") / "idx")
    src = transcripts_df(spark, n_convs=40, seed=11, partitions=2)
    build_index(spark, src, out, num_buckets=2,
                keyword_fields=("role",))
    s0 = IndexSearcher(spark, out)
    roles = sorted({r["role"] for r in
                    s0._read_cached(s0.docstore_paths)
                    .select("role").distinct().collect()
                    if r["role"] is not None})
    assert len(roles) >= 2
    dead = roles[0]
    delete_docs(spark, out, f"role = '{dead}'")
    s = IndexSearcher(spark, out)
    got = {r["cls"]: r["score"]
           for r in bm25_nb_classify(s, "w000002",
                                     class_field="role").collect()}
    assert dead not in got, got
    assert set(got) == set(roles[1:])
    assert sum(got.values()) == pytest.approx(1.0, rel=1e-9)
