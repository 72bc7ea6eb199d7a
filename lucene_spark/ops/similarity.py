"""Embedding similarity search: brute-force cosine top-k + LSH scale path.

Input: a table with (vec_id: bigint, embedding: array<float>).

Brute-force path: broadcast the (small) query set against the corpus —
one scan, no shuffle of the corpus, dot products inside whole-stage
codegen (zip_with/aggregate in double). This is the exact baseline and
the oracle for the approximate path.

Scale paths (100 TB corpora):

- random-hyperplane LSH — sign-bit sketch from md5-derived
  pseudo-random hyperplanes, bucket join on band keys, exact cosine
  re-rank only within colliding buckets;
- IVF-flat — a deterministic coarse quantizer (seed centroids = the
  vectors with smallest md5(vec_id), fixed Lloyd iterations as
  DataFrame jobs), corpus partitioned by nearest centroid, queries
  probe their n_probe nearest cells and re-rank exactly. Candidates
  shrink to ~n_probe/|C| of the corpus; the centroid table is tiny and
  broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DOT = ("aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * "
        "cast(y as double)), cast(0.0 as double), (acc, v) -> acc + v)")


def _norm_sql(col: str) -> str:
    return f"sqrt({_DOT.format(a=col, b=col)})"


def cosine_topk(vectors: DataFrame, queries: DataFrame, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding",
                q_id_col: str = "q_id") -> DataFrame:
    """Exact cosine top-k per query vector.

    queries: (q_id, embedding). The query side is broadcast; per-query
    top-k uses a window rank over (cos desc, vec_id asc) — Spark plans
    this as a partial top-k per partition before the shuffle.
    Returns (q_id, vec_id, cos) — self-matches excluded when ids collide.
    """
    q = queries.select(F.col(q_id_col), F.col(vec_col).alias("_qv"))
    dot = _DOT.format(a=vec_col, b="_qv")
    cos = F.expr(f"{dot} / ({_norm_sql(vec_col)} * {_norm_sql('_qv')})")
    scored = (vectors.join(F.broadcast(q))
              .filter(F.col(id_col) != F.col(q_id_col))
              .select(F.col(q_id_col), F.col(id_col), cos.alias("cos")))
    w = Window.partitionBy(q_id_col).orderBy(F.col("cos").desc(),
                                             F.col(id_col).asc())
    return (scored.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= k)
            .drop("_rk"))


def cosine_pairs(vectors: DataFrame, threshold: float = 0.9,
                 id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (a, b, cos) with a < b and
    cos >= threshold. Exact all-pairs verification — the oracle path.

    Scale path: feed `lsh_cosine_topk`-style band buckets as candidates
    instead of the full self-join; this exact form is for corpora where
    one side fits in broadcast (or as the per-bucket verify stage).
    """
    a = vectors.select(F.col(id_col).alias("a"), F.col(vec_col).alias("_va"))
    b = vectors.select(F.col(id_col).alias("b"), F.col(vec_col).alias("_vb"))
    dot = _DOT.format(a="_va", b="_vb")
    cos = F.expr(f"{dot} / ({_norm_sql('_va')} * {_norm_sql('_vb')})")
    return (a.join(b, F.col("a") < F.col("b"))
            .select("a", "b", cos.alias("cos"))
            .filter(F.col("cos") >= threshold))


def _hyperplanes_sql(dim: int, n_planes: int) -> str:
    """Deterministic pseudo-random hyperplanes: component (p, i) derived
    from md5(p:i) mapped to [-1, 1). Pure SQL, engine-independent."""
    comp = ("(cast(conv(substring(md5(concat(cast(p as string), ':', "
            "cast(i as string))), 1, 12), 16, 10) as double) / 140737488355328.0"
            " - 1.0)")
    return (f"transform(sequence(0, {n_planes - 1}), p -> "
            f"transform(sequence(0, {dim - 1}), i -> {comp}))")


def sketch_expr(vec_col: str, dim: int, n_planes: int = 16) -> F.Column:
    """Sign-bit LSH sketch of a vector column: bit p = sign(v · H_p)."""
    planes = _hyperplanes_sql(dim, n_planes)
    dot = _DOT.format(a=vec_col, b="h")
    return F.expr(
        f"aggregate(transform({planes}, h -> if({dot} > 0, 1, 0)), "
        f"named_struct('acc', 0L, 'i', 0), "
        f"(s, b) -> named_struct('acc', s.acc + shiftleft(cast(b as bigint), s.i), "
        f"'i', s.i + 1)).acc")


def _nearest_cells(df: DataFrame, centroids: DataFrame, id_col: str,
                   vec_col: str, n_probe: int) -> DataFrame:
    """(id, cid) pairs: each row's n_probe nearest centroids by cosine
    (ties by cid asc). Centroids are broadcast — no corpus shuffle."""
    c = centroids.select(F.col("cid"), F.col("centroid").alias("_cv"))
    dot = _DOT.format(a=vec_col, b="_cv")
    cos = F.expr(f"{dot} / ({_norm_sql(vec_col)} * {_norm_sql('_cv')})")
    scored = (df.join(F.broadcast(c))
              .select(F.col(id_col), F.col("cid"), cos.alias("_cc")))
    w = Window.partitionBy(id_col).orderBy(F.col("_cc").desc(),
                                           F.col("cid").asc())
    return (scored.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= n_probe)
            .select(id_col, "cid"))


def ivf_train(vectors: DataFrame, n_centroids: int = 16, iters: int = 2,
              id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Deterministic IVF coarse quantizer -> (cid, centroid).

    Seeds are the n_centroids vectors with the smallest md5(vec_id)
    (reproducible pseudo-random sample), selected with orderBy().limit()
    — a distributed TakeOrderedAndProject partial top-k, NOT a global
    un-partitioned Window (advisor r03: row_number() over
    Window.orderBy(md5) forced the whole corpus through one task). The
    n_centroids winning rows (metadata-sized) are collected to assign
    dense cids; each Lloyd iteration is one assign (broadcast argmax) +
    one per-dimension mean (posexplode + groupBy — map-side combined).
    No RNG, no collect of the corpus."""
    seed_rows = (vectors
                 .select(F.md5(F.col(id_col).cast("string")).alias("_h"),
                         F.expr(f"transform({vec_col}, "
                                "x -> cast(x as double))")
                         .alias("centroid"))
                 .orderBy("_h")
                 .limit(n_centroids)
                 .collect())
    spark = vectors.sparkSession
    cents = spark.createDataFrame(
        [(i + 1, list(r["centroid"])) for i, r in enumerate(seed_rows)],
        "cid int, centroid array<double>")
    for _ in range(iters):
        assign = _nearest_cells(vectors, cents, id_col, vec_col, 1)
        cents = (vectors.join(assign, id_col)
                 .select("cid", F.posexplode(vec_col).alias("pos", "v"))
                 .groupBy("cid", "pos")
                 .agg(F.avg("v").alias("m"))
                 .groupBy("cid")
                 .agg(F.expr("transform(array_sort(collect_list("
                             "struct(pos, m))), s -> s.m)")
                      .alias("centroid")))
    return cents


def ivf_cosine_topk(vectors: DataFrame, queries: DataFrame,
                    centroids: DataFrame, k: int = 10, n_probe: int = 4,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    q_id_col: str = "q_id") -> DataFrame:
    """IVF-flat approximate top-k: corpus rows live in their nearest
    centroid's cell; each query probes its n_probe nearest cells and
    re-ranks candidates with exact cosine. Returns (q_id, vec_id, cos)."""
    v_cell = _nearest_cells(vectors, centroids, id_col, vec_col, 1)
    q = queries.select(F.col(q_id_col), F.col(vec_col).alias("_qv"))
    q_cell = _nearest_cells(
        queries.select(q_id_col, vec_col), centroids, q_id_col, vec_col,
        n_probe)
    cand_ids = (v_cell.join(F.broadcast(q_cell), "cid")
                .select(q_id_col, id_col).dropDuplicates())
    dot = _DOT.format(a=vec_col, b="_qv")
    cos = F.expr(f"{dot} / ({_norm_sql(vec_col)} * {_norm_sql('_qv')})")
    scored = (vectors.join(cand_ids, id_col)
              .join(F.broadcast(q), q_id_col)
              .filter(F.col(id_col) != F.col(q_id_col))
              .select(q_id_col, id_col, cos.alias("cos")))
    w = Window.partitionBy(q_id_col).orderBy(F.col("cos").desc(),
                                             F.col(id_col).asc())
    return (scored.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= k)
            .drop("_rk"))


def lsh_candidates(vectors: DataFrame, queries: DataFrame, dim: int,
                   n_planes: int = 16, bands: int = 4,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   q_id_col: str = "q_id") -> DataFrame:
    """The LSH candidate stage, exposed so pruning power is measurable:
    (q_id, vec_id, cos) for every distinct corpus vector sharing at
    least one sign-sketch band with the query. lsh_cosine_topk re-ranks
    exactly over THIS set — |candidates| / |corpus| is the fraction of
    the corpus the approximate path touches per query."""
    rows = n_planes // bands

    def banded(df, idc):
        s = df.withColumn("_sk", sketch_expr(vec_col, dim, n_planes))
        return s.select(
            F.col(idc), F.col(vec_col),
            F.explode(F.expr(
                f"transform(sequence(0, {bands - 1}), b -> struct(b as band, "
                f"cast(shiftright(_sk, b * {rows}) % shiftleft(1L, {rows}) "
                f"as bigint) as key))")).alias("bk")
        ).select(idc, vec_col, "bk.band", "bk.key")

    vb = banded(vectors, id_col)
    qb = banded(queries.select(F.col(q_id_col).alias("_qid"),
                               F.col(vec_col)), "_qid")
    qb = qb.select(F.col("_qid"), F.col(vec_col).alias("_qv"), "band", "key")
    dot = _DOT.format(a=vec_col, b="_qv")
    cos = F.expr(f"{dot} / ({_norm_sql(vec_col)} * {_norm_sql('_qv')})")
    return (vb.join(F.broadcast(qb), ["band", "key"])
            .filter(F.col(id_col) != F.col("_qid"))
            .select(F.col("_qid").alias(q_id_col), F.col(id_col),
                    cos.alias("cos"))
            .dropDuplicates([q_id_col, id_col]))


def lsh_cosine_topk(vectors: DataFrame, queries: DataFrame, dim: int,
                    k: int = 10, n_planes: int = 16, bands: int = 4,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    q_id_col: str = "q_id") -> DataFrame:
    """Approximate cosine top-k: band-bucketed sign sketches prune the
    corpus, exact cosine re-ranks candidates. Recall grows with bands;
    candidates per query shrink ~|corpus| / 2^(n_planes/bands) per band.
    """
    cand = lsh_candidates(vectors, queries, dim, n_planes, bands,
                          id_col, vec_col, q_id_col)
    w = Window.partitionBy(q_id_col).orderBy(F.col("cos").desc(),
                                             F.col(id_col).asc())
    return (cand.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= k)
            .drop("_rk"))


def filtered_ann_topk(vectors: DataFrame, queries: DataFrame, dim: int,
                      k: int = 10, filter_cond: str | None = None,
                      method: str = "lsh", fallback_factor: int = 10,
                      n_planes: int = 16, bands: int = 4,
                      centroids: DataFrame | None = None, n_probe: int = 4,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      q_id_col: str = "q_id") -> tuple:
    """Metadata-filtered ANN (the KnnFloatVectorQuery-with-filter shape,
    core:search/KnnFloatVectorQuery.java:48 + AbstractKnnVectorQuery.
    java rewrite): ``filter_cond`` (a SQL predicate over the corpus
    columns) restricts the eligible corpus BEFORE the approximate
    structure is probed, so candidates are spent only on eligible rows.

    Selective-filter fallback: the reference computes the filter's
    cardinality and runs EXACT search when approximate traversal cannot
    beat it (filterIterator.cost() <= k; visited-limit fallback). Here:
    one pushed-down count of the filtered corpus; when it is <=
    fallback_factor * k, brute-force cosine over the filtered set (its
    cost is the candidate re-rank's floor anyway). Otherwise the LSH
    band join or IVF cell probe runs on the filtered corpus.

    Returns (top-k DataFrame (q_id, vec_id, cos), method_used) where
    method_used is 'exact' | 'lsh' | 'ivf'.
    """
    vf = vectors.filter(filter_cond) if filter_cond else vectors
    n_eligible = vf.count()  # metadata-sized job, pushed-down predicate
    if n_eligible <= fallback_factor * k:
        return (cosine_topk(vf, queries, k, id_col, vec_col, q_id_col),
                "exact")
    if method == "lsh":
        return (lsh_cosine_topk(vf, queries, dim, k, n_planes, bands,
                                id_col, vec_col, q_id_col), "lsh")
    if method == "ivf":
        cents = centroids if centroids is not None else ivf_train(
            vf, id_col=id_col, vec_col=vec_col)
        return (ivf_cosine_topk(vf, queries, cents, k, n_probe,
                                id_col, vec_col, q_id_col), "ivf")
    raise ValueError(f"unknown ANN method {method!r}")
