"""Graph-based ANN: distributed k-NN graph (NN-Descent) + beam search.

The reference's graph ANN is HNSW
(core:codecs/lucene99/Lucene99HnswVectorsFormat.java,
util/hnsw/HnswGraphBuilder.java) — a sequentially inserted multi-layer
proximity graph. Sequential insertion has a hard chain dependency and
does not distribute; the published Spark-shaped equivalent is
NN-Descent (Dong, Moses, Li — "Efficient k-nearest neighbor graph
construction for generic similarity measures", WWW 2011): start from
cheap candidate neighbors, then iterate "my neighbors' neighbors are
probably my neighbors" to a fixed point. Every step here is a
DataFrame join + per-node top-k — no driver-side graph, no sequential
insert, shuffles keyed by node id only.

Query-time: greedy BEAM search over the built graph (the HNSW search
loop without the layer hierarchy): a fixed deterministic entry-point
set, then L rounds of expand-frontier-by-graph-edges / score / keep
top-beam, exactly one broadcast-join round per hop.

All randomness is md5-derived (deterministic, resume-safe). Recall is
gated in tests against the exact brute force, like the LSH/IVF paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .similarity import _DOT, _norm_sql, cosine_topk, sketch_expr


def _cos(a: str, b: str) -> F.Column:
    return F.expr(f"{_DOT.format(a=a, b=b)} / ({_norm_sql(a)} * {_norm_sql(b)})")


def _topk_edges(cand: DataFrame, k_graph: int) -> DataFrame:
    """Per-src top-k by (cos desc, dst asc) -> (src, dst, cos)."""
    w = Window.partitionBy("src").orderBy(F.col("cos").desc(),
                                          F.col("dst").asc())
    return (cand.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= k_graph)
            .drop("_rk"))


def nn_descent(vectors: DataFrame, dim: int, k_graph: int = 10,
               iters: int = 2, n_planes: int = 16, bands: int = 8,
               id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """Build a k-NN graph: LSH band collisions seed candidate edges,
    then ``iters`` NN-Descent rounds join each node's neighbourhood
    with itself (neighbors-of-neighbors, both edge directions) and
    keep the per-node top-k_graph. Returns (src, dst, cos).

    Scale shape: the seed join is the banded LSH join (bucket-bounded);
    each round is one self-join of the edge list keyed by node id
    (edges per node capped at k_graph, so the join fan-out is at most
    k_graph^2 rows per node) + one windowed top-k. No step touches the
    driver."""
    v = vectors.select(F.col(id_col).alias("_id"),
                       F.col(vec_col).alias("_v"))
    rows = n_planes // bands
    sk = v.withColumn("_sk", sketch_expr("_v", dim, n_planes))
    banded = sk.select(
        "_id", "_v",
        F.explode(F.expr(
            f"transform(sequence(0, {bands - 1}), b -> struct(b as band, "
            f"cast(shiftright(_sk, b * {rows}) % shiftleft(1L, {rows}) "
            f"as bigint) as key))")).alias("bk")
    ).select("_id", "_v", "bk.band", "bk.key")
    l = banded.select(F.col("_id").alias("src"), F.col("_v").alias("_sv"),
                      "band", "key")
    r = banded.select(F.col("_id").alias("dst"), F.col("_v").alias("_dv"),
                      "band", "key")
    seed = (l.join(r, ["band", "key"])
            .filter(F.col("src") != F.col("dst"))
            .select("src", "dst", _cos("_sv", "_dv").alias("cos"))
            .dropDuplicates(["src", "dst"]))
    graph = _topk_edges(seed, k_graph)
    for _ in range(iters):
        # undirected neighbourhood: edges both ways, then one hop
        und = (graph.select("src", "dst")
               .unionByName(graph.select(F.col("dst").alias("src"),
                                         F.col("src").alias("dst")))
               .dropDuplicates())
        hop = (und.alias("a")
               .join(und.alias("b"), F.col("a.dst") == F.col("b.src"))
               .select(F.col("a.src").alias("src"),
                       F.col("b.dst").alias("dst"))
               .filter(F.col("src") != F.col("dst"))
               .dropDuplicates())
        scored = (hop
                  .join(v.select(F.col("_id").alias("src"),
                                 F.col("_v").alias("_sv")), "src")
                  .join(v.select(F.col("_id").alias("dst"),
                                 F.col("_v").alias("_dv")), "dst")
                  .select("src", "dst", _cos("_sv", "_dv").alias("cos")))
        graph = _topk_edges(
            graph.unionByName(scored).dropDuplicates(["src", "dst"]),
            k_graph)
    return graph


def entry_points(vectors: DataFrame, n_entry: int = 4,
                 id_col: str = "vec_id") -> DataFrame:
    """Deterministic entry set: the n_entry ids with smallest
    md5(id) — a distributed TakeOrderedAndProject (the same seeding
    rule as ivf_train; HNSW's entry point is its first insert, equally
    arbitrary)."""
    return (vectors
            .select(F.col(id_col).alias("ep"),
                    F.md5(F.col(id_col).cast("string")).alias("_h"))
            .orderBy("_h").limit(n_entry).select("ep"))


def graph_search(vectors: DataFrame, graph: DataFrame, queries: DataFrame,
                 k: int = 10, beam: int = 16, hops: int = 3,
                 n_entry: int = 4, id_col: str = "vec_id",
                 vec_col: str = "embedding",
                 q_id_col: str = "q_id") -> DataFrame:
    """Beam search over the k-NN graph (the HnswGraphSearcher loop,
    flattened: per hop, expand the frontier along graph edges, score
    against the query, keep the best ``beam``). All queries advance in
    the SAME Spark jobs — one edge join + one windowed top-beam per
    hop, queries broadcast. Returns (q_id, vec_id, cos) top-k from all
    visited candidates."""
    v = vectors.select(F.col(id_col).alias("node"),
                       F.col(vec_col).alias("_nv"))
    q = queries.select(F.col(q_id_col), F.col(vec_col).alias("_qv"))
    eps = entry_points(vectors, n_entry, id_col)
    frontier = (q.select(q_id_col).join(eps)
                .select(q_id_col, F.col("ep").alias("node")))
    edges = graph.select(F.col("src").alias("node"),
                         F.col("dst").alias("nbr"))
    visited = frontier
    for _ in range(hops):
        expanded = (frontier.join(edges, "node")
                    .select(q_id_col, F.col("nbr").alias("node"))
                    .unionByName(frontier)
                    .dropDuplicates([q_id_col, "node"]))
        scored = (expanded.join(v, "node")
                  .join(F.broadcast(q), q_id_col)
                  .select(q_id_col, "node", _cos("_nv", "_qv").alias("cos")))
        w = Window.partitionBy(q_id_col).orderBy(F.col("cos").desc(),
                                                 F.col("node").asc())
        frontier = (scored.withColumn("_rk", F.row_number().over(w))
                    .filter(F.col("_rk") <= beam)
                    .select(q_id_col, "node"))
        visited = (visited.unionByName(frontier)
                   .dropDuplicates([q_id_col, "node"]))
    final = (visited.join(v, "node")
             .join(F.broadcast(q), q_id_col)
             .filter(F.col("node") != F.col(q_id_col))
             .select(q_id_col, F.col("node").alias(id_col),
                     _cos("_nv", "_qv").alias("cos")))
    w = Window.partitionBy(q_id_col).orderBy(F.col("cos").desc(),
                                             F.col(id_col).asc())
    return (final.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= k)
            .drop("_rk"))
